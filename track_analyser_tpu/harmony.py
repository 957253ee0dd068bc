"""Harmony analysis: key estimation, chord hints, change points, MIDI seeds.

Public surface parity with the reference (harmony.py:15-480): the
Krumhansl–Schmuckler profiles, the 24-key scoring, the 60 chord templates
(12 roots x maj/min/dim/sus2/sus4), beat-synchronous chord hints with a
deterministic RNG tie-break, cosine change points with the 90th-percentile/
0.15 threshold merge, and the scale-degree MIDI generators.

TPU-first difference: the reference runs librosa's recursive CQT plus an
STFT chroma (harmony.py:107-108) and then Python-loops over beats
(harmony.py:295-319). Here both chroma projections are filterbank matmuls
over jitted STFTs (ops/chroma.py), beat-window aggregation is a cumsum
gather, and all template scoring is one (beats x 12) @ (12 x 60) matmul.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .config import DEFAULT_CONFIG
from .ops.chroma import (
    chroma_from_power,
    chroma_stft_filterbank,
    cq_chroma_filterbank,
)
from .ops.stft import fft_frequencies, magnitude
from .utils import AudioInput, deterministic_rng, seed_everything
from .analysis.beats import BeatAnalysis, DownbeatAnalysis

MAJOR_PROFILE = np.array(
    [6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88]
)
MINOR_PROFILE = np.array(
    [6.33, 2.68, 3.52, 5.38, 2.6, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17]
)
PITCH_CLASS_NAMES = [
    "C",
    "C#",
    "D",
    "Eb",
    "E",
    "F",
    "F#",
    "G",
    "Ab",
    "A",
    "Bb",
    "B",
]

__all__ = [
    "HarmonyAnalysis",
    "ChordChangePoint",
    "ChordHint",
    "KeyEstimation",
    "KeyEstimate",
    "MidiSuggestion",
    "SpectralBalance",
    "StereoImage",
    "analyse_harmony",
    "key_estimate",
    "MAJOR_PROFILE",
    "MINOR_PROFILE",
    "PITCH_CLASS_NAMES",
]


@dataclass(slots=True)
class SpectralBalance:
    low_band: float
    mid_band: float
    high_band: float


@dataclass(slots=True)
class StereoImage:
    correlation: float
    balance: float


@dataclass(slots=True)
class KeyEstimate:
    key: str
    confidence: float


@dataclass(slots=True)
class KeyEstimation:
    best: KeyEstimate
    second_best: KeyEstimate


@dataclass(slots=True)
class ChordHint:
    time: float
    chord: str
    confidence: float


@dataclass(slots=True)
class ChordChangePoint:
    time: float
    strength: float


@dataclass(slots=True)
class MidiSuggestion:
    name: str
    notes: pd.DataFrame


@dataclass(slots=True)
class HarmonyAnalysis:
    spectral_balance: SpectralBalance
    stereo_image: StereoImage
    primary_key: KeyEstimate
    secondary_key: KeyEstimate
    chord_hints: List[ChordHint]
    chord_change_points: List[ChordChangePoint]
    hook_suggestion: MidiSuggestion
    bass_suggestion: MidiSuggestion

    @property
    def key_estimate(self) -> KeyEstimate:
        """Backward compatible accessor for the best key estimate."""

        return self.primary_key


# ---------------------------------------------------------------------------
# Device graphs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("sr", "hop_length"))
def _chroma_graph(y: jnp.ndarray, *, sr: int, hop_length: int):
    """Both chroma projections from one pass over the signal."""

    cfg = DEFAULT_CONFIG
    stft_power = magnitude(y, 2048, hop_length, power=2.0)
    chroma_stft = chroma_from_power(stft_power, chroma_stft_filterbank(sr, 2048))

    cq_mag = magnitude(y, cfg.cq_n_fft, cfg.cq_hop, power=1.0)
    chroma_cq = chroma_from_power(cq_mag, cq_chroma_filterbank(sr, cfg.cq_n_fft))
    # Upsample the coarse-hop chroma to hop_length frame indexing (a 93 ms
    # analysis window moves little in 12 ms; 4x fewer FFTs).
    chroma_cq = jnp.repeat(chroma_cq, cfg.cq_hop // hop_length, axis=1)[
        :, : stft_power.shape[1]
    ]
    return chroma_cq, chroma_stft


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length"))
def _balance_graph(y: jnp.ndarray, *, sr: int, n_fft: int, hop_length: int):
    spec = magnitude(y, n_fft, hop_length, power=1.0)
    freqs = jnp.asarray(fft_frequencies(sr, n_fft), dtype=jnp.float32)[:, None]
    total = jnp.sum(spec)
    low = jnp.sum(jnp.where(freqs < 200.0, spec, 0.0))
    mid = jnp.sum(jnp.where((freqs >= 200.0) & (freqs < 2000.0), spec, 0.0))
    high = jnp.sum(jnp.where(freqs >= 2000.0, spec, 0.0))
    return total, low, mid, high


def _compute_chromas(y: np.ndarray, sr: int, hop_length: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    cq, st = _chroma_graph(jnp.asarray(y, dtype=jnp.float32), sr=sr, hop_length=hop_length)
    return np.asarray(cq, dtype=np.float64), np.asarray(st, dtype=np.float64)


# ---------------------------------------------------------------------------
# Key scoring
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _profile_matrices() -> Tuple[np.ndarray, np.ndarray]:
    """Rows: all 12 rotations of the normalised K-S profiles."""

    major = MAJOR_PROFILE / np.linalg.norm(MAJOR_PROFILE)
    minor = MINOR_PROFILE / np.linalg.norm(MINOR_PROFILE)
    maj_rot = np.stack([np.roll(major, s) for s in range(12)])
    min_rot = np.stack([np.roll(minor, s) for s in range(12)])
    return maj_rot, min_rot


def _correlate_chroma(chroma: np.ndarray, template: np.ndarray) -> np.ndarray:
    return np.array(
        [float(np.dot(chroma, np.roll(template, shift))) for shift in range(12)]
    )


def _score_keys(chroma_matrices: Sequence[np.ndarray]) -> Tuple[np.ndarray, List[str]]:
    if not chroma_matrices:
        return np.array([]), []

    keys = [f"{pitch} major" for pitch in PITCH_CLASS_NAMES]
    keys += [f"{pitch} minor" for pitch in PITCH_CLASS_NAMES]

    maj_rot, min_rot = _profile_matrices()
    aggregated = np.zeros(24, dtype=float)
    for chroma in chroma_matrices:
        if chroma.size == 0:
            continue
        chroma_mean = np.mean(chroma, axis=1)
        norm = np.linalg.norm(chroma_mean)
        if norm <= 0:
            continue
        chroma_norm = chroma_mean / norm
        aggregated[:12] += maj_rot @ chroma_norm
        aggregated[12:] += min_rot @ chroma_norm
    return aggregated, keys


def _keys_from_scores(scores: np.ndarray, keys: List[str]) -> KeyEstimation:
    if not scores.size:
        fallback = KeyEstimate(key="C major", confidence=0.0)
        return KeyEstimation(best=fallback, second_best=fallback)

    positive = np.maximum(scores, 0.0)
    total = float(np.sum(positive)) or 1.0
    confidences = positive / total

    best_idx = int(np.argmax(confidences))
    best = KeyEstimate(key=keys[best_idx], confidence=float(confidences[best_idx]))
    confidences[best_idx] = -np.inf
    second_idx = int(np.argmax(confidences))
    second = KeyEstimate(
        key=keys[second_idx], confidence=float(max(confidences[second_idx], 0.0))
    )
    return KeyEstimation(best=best, second_best=second)


def key_estimate(y: np.ndarray, sr: int) -> KeyEstimation:
    """Best and second-best key hypotheses from combined chroma evidence."""

    chroma_cq, chroma_stft = _compute_chromas(np.asarray(y, dtype=np.float32), sr)
    scores, keys = _score_keys([chroma_cq, chroma_stft])
    return _keys_from_scores(scores, keys)


def _estimate_keys_from_chroma(
    chroma_cqt: np.ndarray, chroma_stft: np.ndarray
) -> KeyEstimation:
    scores, keys = _score_keys([chroma_cqt, chroma_stft])
    return _keys_from_scores(scores, keys)


# ---------------------------------------------------------------------------
# Beat-synchronous chroma profiles, chords, change points
# ---------------------------------------------------------------------------


def _beat_chroma_profiles(
    chroma: np.ndarray, beat_frames: Sequence[int], window: int = 2
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-beat L2-normalised mean chroma over frames [f-window, f+window).

    Returns (profiles (B, 12), valid mask (B,)); invalid = empty window or
    zero-norm (reference skips those beats, harmony.py:296-303).
    """

    frames = np.asarray(beat_frames, dtype=int)
    n = chroma.shape[1]
    if frames.size == 0 or n == 0:
        return np.zeros((0, 12)), np.zeros(0, dtype=bool)
    cs = np.concatenate([np.zeros((chroma.shape[0], 1)), np.cumsum(chroma, axis=1)], axis=1)
    lo = np.clip(frames - window, 0, n)
    hi = np.clip(frames + window, 0, n)
    counts = np.maximum(hi - lo, 1)
    sums = cs[:, hi] - cs[:, lo]
    means = (sums / counts).T  # (B, 12)
    norms = np.linalg.norm(means, axis=1)
    valid = (hi > lo) & (norms > 0)
    safe = np.where(norms > 0, norms, 1.0)
    return means / safe[:, None], valid


@lru_cache(maxsize=1)
def _chord_template_matrix() -> Tuple[np.ndarray, List[str]]:
    templates = _build_chord_templates()
    names = list(templates.keys())
    matrix = np.stack([templates[name] for name in names])  # (60, 12)
    return matrix, names


def _build_chord_templates() -> Dict[str, np.ndarray]:
    intervals = {
        "maj": [0, 4, 7],
        "min": [0, 3, 7],
        "dim": [0, 3, 6],
        "sus2": [0, 2, 7],
        "sus4": [0, 5, 7],
    }
    templates: Dict[str, np.ndarray] = {}
    for root_idx, pitch in enumerate(PITCH_CLASS_NAMES):
        for quality, ints in intervals.items():
            template = np.zeros(12)
            for interval in ints:
                template[(root_idx + interval) % 12] = 1.0
            norm = np.linalg.norm(template)
            if norm > 0:
                template = template / norm
            templates[f"{pitch}{quality}"] = template
    return templates


def _estimate_chords(
    chroma: np.ndarray,
    beat_result: BeatAnalysis,
    rng: np.random.Generator,
) -> List[ChordHint]:
    beat_frames = beat_result.beat_frames
    if not beat_frames:
        return []
    profiles, valid = _beat_chroma_profiles(
        chroma, beat_frames, DEFAULT_CONFIG.chord_window_frames
    )
    matrix, names = _chord_template_matrix()
    scores = profiles @ matrix.T  # (B, 60)
    noise = rng.normal(0.0, 1e-6, size=scores.shape)
    best = np.argmax(scores + noise, axis=1)
    hints: List[ChordHint] = []
    for idx in range(len(beat_frames)):
        if not valid[idx]:
            continue
        base = scores[idx]
        b = int(best[idx])
        confidence = float(base[b] / float(np.max(base + 1e-9)))
        hints.append(
            ChordHint(
                time=float(beat_result.beat_times[idx]),
                chord=names[b],
                confidence=confidence,
            )
        )
    return hints


def _detect_chord_changes(
    chroma: np.ndarray, beat_result: BeatAnalysis, chord_hints: Sequence[ChordHint]
) -> List[ChordChangePoint]:
    beat_frames = beat_result.beat_frames
    if len(beat_frames) < 2:
        return []

    profiles, valid = _beat_chroma_profiles(
        chroma, beat_frames, DEFAULT_CONFIG.chord_window_frames
    )
    kept = np.flatnonzero(valid)
    if kept.size < 2:
        return []
    profiles = profiles[kept]
    times = np.asarray(beat_result.beat_times, dtype=float)[kept]

    similarity = np.clip(np.sum(profiles[:-1] * profiles[1:], axis=1), -1.0, 1.0)
    strengths = np.clip(1.0 - similarity, 0.0, 1.0)
    changes = [
        ChordChangePoint(time=float(t), strength=float(s))
        for t, s in zip(times[1:], strengths)
    ]
    if not changes:
        return []

    change_map: Dict[float, float] = {}
    keep = max(1, int(np.ceil(strengths.size * DEFAULT_CONFIG.chord_change_keep_fraction)))
    if keep >= strengths.size:
        threshold = float(np.min(strengths))
    else:
        cutoff_index = strengths.size - keep
        threshold = float(np.partition(strengths, cutoff_index)[cutoff_index])
    threshold = float(max(threshold, DEFAULT_CONFIG.chord_change_threshold))
    for change in changes:
        if change.strength >= threshold:
            change_map[change.time] = max(change_map.get(change.time, 0.0), change.strength)
    first_change = changes[0]
    change_map[first_change.time] = max(
        change_map.get(first_change.time, 0.0), first_change.strength
    )

    if len(chord_hints) >= 2:
        templates = _build_chord_templates()
        for prev_hint, curr_hint in zip(chord_hints, chord_hints[1:]):
            if curr_hint.chord == prev_hint.chord:
                continue
            prev_template = templates.get(prev_hint.chord)
            curr_template = templates.get(curr_hint.chord)
            if prev_template is None or curr_template is None:
                similarity_t = 0.0
            else:
                similarity_t = float(
                    np.clip(np.dot(prev_template, curr_template), -1.0, 1.0)
                )
            strength = float(np.clip(1.0 - similarity_t, 0.0, 1.0))
            change_map[curr_hint.time] = max(change_map.get(curr_hint.time, 0.0), strength)

    if not change_map:
        return []

    max_strength = max(change_map.values()) or 1.0
    return [
        ChordChangePoint(time=float(time), strength=float(value / max_strength))
        for time, value in sorted(change_map.items())
    ]


# ---------------------------------------------------------------------------
# MIDI suggestion
# ---------------------------------------------------------------------------


def _generate_midi(
    chroma: np.ndarray,
    beat_result: BeatAnalysis,
    key_estimate_: KeyEstimate,
    rng: np.random.Generator,
    *,
    name: str,
    octave: int = 0,
    start_offset: float = 0.0,
) -> MidiSuggestion:
    scale = _scale_for_key(key_estimate_.key)
    beats = [max(0.0, beat - start_offset) for beat in beat_result.beat_times[:8]]
    if not beats:
        beats = [0.0, 0.5, 1.0, 1.5]
    notes = []
    duration = float(np.median(np.diff(beats))) if len(beats) > 1 else 0.5
    for beat_time in beats:
        pitch_class = int(scale[int(rng.integers(0, len(scale)))])
        velocity = int(np.clip(96 + rng.integers(-12, 12), 20, 127))
        pitch = 60 + pitch_class + octave * 12
        notes.append(
            {
                "start": float(beat_time),
                "duration": float(duration),
                "pitch": int(pitch),
                "velocity": int(velocity),
                "channel": 0,
            }
        )
    df = pd.DataFrame(notes, columns=["start", "duration", "pitch", "velocity", "channel"])
    return MidiSuggestion(name=name, notes=df)


def _scale_for_key(key: str) -> List[int]:
    key_root, _, mode = key.partition(" ")
    root_idx = PITCH_CLASS_NAMES.index(key_root)
    if mode.strip().lower().startswith("major"):
        pattern = [0, 2, 4, 5, 7, 9, 11]
    else:
        pattern = [0, 2, 3, 5, 7, 8, 10]
    return [(root_idx + interval) % 12 for interval in pattern]


# ---------------------------------------------------------------------------
# Spectral balance / stereo image
# ---------------------------------------------------------------------------


def _spectral_balance(audio: AudioInput) -> SpectralBalance:
    total, low, mid, high = _balance_graph(
        jnp.asarray(audio.samples, dtype=jnp.float32),
        sr=audio.sample_rate,
        n_fft=DEFAULT_CONFIG.balance_n_fft,
        hop_length=DEFAULT_CONFIG.balance_hop,
    )
    total = float(total)
    if total <= 0:
        return SpectralBalance(0.0, 0.0, 0.0)
    return SpectralBalance(
        low_band=float(low) / total,
        mid_band=float(mid) / total,
        high_band=float(high) / total,
    )


def _stereo_image(audio: AudioInput) -> StereoImage:
    samples = (
        audio.stereo_samples if audio.stereo_samples is not None else audio.samples
    )
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1 or samples.shape[0] < 2:
        return StereoImage(correlation=1.0, balance=0.0)

    left = samples[0]
    right = samples[1]
    corr = float(np.corrcoef(left, right)[0, 1]) if left.size and right.size else 0.0
    balance = float(np.mean(np.abs(left)) - np.mean(np.abs(right)))
    return StereoImage(correlation=corr, balance=balance)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def analyse_harmony(
    audio: "AudioInput | str",
    beat_result: BeatAnalysis,
    downbeat_result: Optional[DownbeatAnalysis],
    *,
    seed: int,
) -> HarmonyAnalysis:
    if not isinstance(audio, AudioInput):
        raise TypeError("analyse_harmony expects an AudioInput instance")

    seed_everything(seed)
    rng = deterministic_rng(seed)

    spectral_balance = _spectral_balance(audio)
    stereo_image = _stereo_image(audio)

    chroma_cqt, chroma_stft = _compute_chromas(audio.samples, audio.sample_rate)
    key_result = _estimate_keys_from_chroma(chroma_cqt, chroma_stft)

    chord_hints = _estimate_chords(chroma_cqt, beat_result, rng)
    change_points = _detect_chord_changes(chroma_cqt, beat_result, chord_hints)

    start_offset = (
        downbeat_result.downbeat_times[0]
        if downbeat_result and downbeat_result.downbeat_times
        else (beat_result.beat_times[0] if beat_result.beat_times else 0.0)
    )

    hook = _generate_midi(
        chroma_cqt, beat_result, key_result.best, rng, name="hook", start_offset=start_offset
    )
    bass = _generate_midi(
        chroma_cqt,
        beat_result,
        key_result.best,
        rng,
        name="bass",
        octave=-1,
        start_offset=start_offset,
    )

    return HarmonyAnalysis(
        spectral_balance=spectral_balance,
        stereo_image=stereo_image,
        primary_key=key_result.best,
        secondary_key=key_result.second_best,
        chord_hints=chord_hints,
        chord_change_points=change_points,
        hook_suggestion=hook,
        bass_suggestion=bass,
    )
