"""Deterministic signal builders shared by the accuracy test suites.

Every generator here is seeded and shape-stable so the numeric gates the
suites enforce (BPM ±0.1, grid ≤5 ms, LUFS ±0.3, true peak ±0.2 dB,
boundary ±0.5 s, key exactness, ≥70% chord-change recall — the reference
project's published tolerances) are reproducible run to run.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np


def time_axis(seconds: float, sr: int) -> np.ndarray:
    return np.arange(int(round(seconds * sr)), dtype=np.float64) / sr


def sine(freq: float, seconds: float, sr: int, *, amplitude: float = 1.0) -> np.ndarray:
    return (amplitude * np.sin(2.0 * np.pi * freq * time_axis(seconds, sr))).astype(
        np.float32
    )


def sine_at_rms_db(db: float, freq: float, seconds: float, sr: int) -> np.ndarray:
    """Pure tone whose RMS sits exactly at ``db`` dBFS (peak = rms·√2)."""

    return sine(freq, seconds, sr, amplitude=10.0 ** (db / 20.0) * np.sqrt(2.0))


def click_grid(
    bpm: float,
    n_beats: int,
    sr: int,
    *,
    click_seconds: float = 0.01,
    noise_db: "float | None" = None,
    seed: int = 99,
) -> Tuple[np.ndarray, np.ndarray]:
    """(signal, true beat times): decaying clicks on an exact BPM grid,
    optionally buried in Gaussian noise at ``noise_db`` dBFS RMS."""

    period = 60.0 / bpm
    n = int(round(n_beats * period * sr))
    starts = np.round(np.arange(n_beats) * period * sr).astype(int)
    k = int(click_seconds * sr)
    burst = np.exp(-np.linspace(0.0, 6.0, k)).astype(np.float32)

    y = np.zeros(n + k, dtype=np.float32)
    cols = (starts[:, None] + np.arange(k)[None, :]).reshape(-1)
    np.add.at(y, cols, np.tile(burst, n_beats))
    y = y[:n]
    if noise_db is not None:
        rng = np.random.default_rng(seed)
        y = y + rng.normal(scale=10.0 ** (noise_db / 20.0), size=n).astype(np.float32)
    return y.astype(np.float32), starts / sr


def triad(root_midi: int, quality: str, seconds: float, sr: int) -> np.ndarray:
    """Three-note chord under a Hann envelope, peak-normalised later by
    the caller (keeps concatenated progressions headroom-safe)."""

    intervals = {"maj": (0, 4, 7), "min": (0, 3, 7)}[quality]
    t = time_axis(seconds, sr)
    freqs = 440.0 * 2.0 ** ((root_midi + np.asarray(intervals) - 69) / 12.0)
    chord = np.sin(2.0 * np.pi * freqs[:, None] * t[None, :]).sum(axis=0)
    return (chord * np.hanning(t.size)).astype(np.float32)


def progression(
    steps: Sequence[Tuple[int, str]], seconds_each: float, sr: int
) -> np.ndarray:
    """Concatenated triads, peak-normalised to 1.0."""

    y = np.concatenate([triad(m, q, seconds_each, sr) for m, q in steps])
    return (y / np.max(np.abs(y))).astype(np.float32)


def drone_with_muted_drums(
    seconds: float,
    sr: int,
    *,
    mute_span: Tuple[float, float] = (12.0, 20.0),
    hit_period: float = 0.5,
) -> np.ndarray:
    """Constant 110 Hz drone plus periodic drum hits that vanish inside
    ``mute_span`` — the canonical structural-boundary fixture."""

    y = 0.3 * np.sin(2.0 * np.pi * 110.0 * time_axis(seconds, sr))
    k = int(0.05 * sr)
    hit = np.linspace(1.0, 0.0, k)
    for start_t in np.arange(0.0, seconds, hit_period):
        if mute_span[0] <= start_t < mute_span[1]:
            continue
        s = int(start_t * sr)
        e = min(y.size, s + k)
        y[s:e] += hit[: e - s]
    return y.astype(np.float32)


def write_pcm16_wav(path: Path, y: np.ndarray, sr: int) -> Path:
    """Write a mono PCM16 WAV through this project's own writer."""

    from track_analyser_tpu.io import write_wav

    path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(path, np.asarray(y, dtype=np.float32), sr, subtype="PCM_16")
    return path


def beat_analysis_for(bpm: float, beat_times: np.ndarray, sr: int, hop: int = 512):
    """A hand-built BeatAnalysis for suites that inject the beat grid."""

    from track_analyser_tpu.analysis.beats import BeatAnalysis

    beat_times = np.asarray(beat_times, dtype=float)
    return BeatAnalysis(
        bpm=float(bpm),
        beat_times=beat_times.tolist(),
        beat_frames=(beat_times * sr / hop).astype(int).tolist(),
        confidence=1.0,
    )
