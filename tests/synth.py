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


def realistic_song(
    sr: int = 22_050,
    seed: int = 11,
    bars: int = 40,
    bpm0: float = 124.0,
    drift_per_min: float = 0.015,
):
    """A produced-sounding synthetic song for end-to-end realism gates:
    drifting tempo (bpm0 growing ``drift_per_min`` per minute), swung
    off-beat hats, accented downbeats, Am-F-C-G harmony, four sections
    (intro: chords+pad / groove: full kit / breakdown: wide pad only /
    groove2) and stereo production (chords left-biased, hats right,
    decorrelated pad, centred kick/bass).

    Returns (stereo (2, n) f32, beat_times, bar_starts, marks) where
    ``marks`` holds the groove/breakdown/groove2 section-start times.
    """

    rng = np.random.default_rng(seed)
    beats = [0.25]  # pickup offset
    while len(beats) < bars * 4:
        t = beats[-1]
        bpm_t = bpm0 * (1.0 + drift_per_min * t / 60.0)
        beats.append(t + 60.0 / bpm_t)
    beats = np.array(beats)
    bar_starts = beats[::4]
    seconds = float(beats[-1] + 2.0)
    n = int(seconds * sr)
    left = np.zeros(n)
    right = np.zeros(n)

    def sec_of_bar(b: int) -> str:
        if b < 8:
            return "intro"
        if b < 24:
            return "groove"
        if b < 32:
            return "breakdown"
        return "groove2"

    prog = [(57, "min"), (53, "maj"), (48, "maj"), (55, "maj")]  # Am F C G

    def chord_wave(root: int, quality: str, t0: float, t1: float) -> None:
        iv = (0, 3, 7) if quality == "min" else (0, 4, 7)
        s0, s1 = int(t0 * sr), min(n, int(t1 * sr))
        if s1 <= s0:
            return
        seg = np.arange(s1 - s0) / sr
        env = np.minimum(1.0, seg / 0.02) * np.exp(-seg / ((t1 - t0) * 0.9))
        w = np.zeros(s1 - s0)
        for note in iv:
            f = 440.0 * 2 ** ((root + note - 69) / 12.0)
            for h in (1, 2, 3, 4):
                if f * h < sr / 2 - 200:
                    w += np.sin(2 * np.pi * f * h * (t0 + seg)) / h
        w *= env * 0.12
        left[s0:s1] += w * 1.15
        right[s0:s1] += w * 0.85

    def pad_wave(root: int, t0: float, t1: float, gain: float) -> None:
        s0, s1 = int(t0 * sr), min(n, int(t1 * sr))
        if s1 <= s0:
            return
        seg = np.arange(s1 - s0) / sr
        f = 440.0 * 2 ** ((root - 69) / 12.0)
        env = np.minimum(1.0, seg / 0.4)
        wl = sum(
            np.sin(2 * np.pi * f * h * 1.003 * (t0 + seg) + 0.7 * h) / h
            for h in (1, 2, 3)
        )
        wr = sum(
            np.sin(2 * np.pi * f * h * 0.997 * (t0 + seg) + 1.9 * h) / h
            for h in (1, 2, 3)
        )
        left[s0:s1] += gain * env * wl
        right[s0:s1] += gain * env * wr

    for b in range(bars):
        t0 = bar_starts[b]
        t1 = bar_starts[b + 1] if b + 1 < bars else seconds
        root, q = prog[b % 4]
        sec = sec_of_bar(b)
        if sec != "breakdown":
            chord_wave(root, q, t0, t1)
        if sec in ("intro", "breakdown"):
            pad_wave(root - 12, t0, t1, gain=0.08 if sec == "breakdown" else 0.04)

    def add_hit(center_t: float, kind: str, amp: float) -> None:
        s = int(center_t * sr)
        if s >= n or amp <= 0:
            return
        if kind == "kick":
            k = int(0.09 * sr)
            seg = np.arange(min(k, n - s)) / sr
            w = amp * np.sin(2 * np.pi * (55 + 45 * np.exp(-seg * 55)) * seg)
            w *= np.exp(-seg * 28)
            left[s : s + seg.size] += w
            right[s : s + seg.size] += w
        elif kind == "snare":
            k = int(0.07 * sr)
            seg = np.arange(min(k, n - s)) / sr
            w = amp * (
                0.6 * rng.standard_normal(seg.size)
                + 0.4 * np.sin(2 * np.pi * 190 * seg)
            ) * np.exp(-seg * 35)
            left[s : s + seg.size] += w
            right[s : s + seg.size] += w
        else:  # hat
            k = int(0.025 * sr)
            seg = np.arange(min(k, n - s)) / sr
            w = amp * rng.standard_normal(seg.size) * np.exp(-seg * 140)
            hp = np.diff(w, prepend=0.0)
            left[s : s + seg.size] += 0.5 * hp
            right[s : s + seg.size] += 1.0 * hp

    for b in range(bars):
        if "groove" not in sec_of_bar(b):
            continue
        root, _q = prog[b % 4]
        f_bass = 440.0 * 2 ** ((root - 24 - 69) / 12.0) * 4
        for i in range(4):
            bi = 4 * b + i
            tb = beats[bi]
            nxt = beats[bi + 1] if bi + 1 < beats.size else tb + 0.5
            # beat-1 accent: the dynamics cue real drummers give bar starts
            add_hit(tb, "kick", 1.0 if i == 0 else (0.5 if i == 2 else 0.0))
            if i in (1, 3):
                add_hit(tb, "snare", 0.5)
            add_hit(tb + 0.62 * (nxt - tb), "hat", 0.35)  # swung off-beat
            s = int(tb * sr)
            seg = np.arange(min(int(0.4 * sr), n - s)) / sr
            w = 0.22 * np.sin(2 * np.pi * f_bass * seg) * np.exp(-seg * 6)
            left[s : s + seg.size] += w
            right[s : s + seg.size] += w

    stereo = np.stack([left, right]).astype(np.float32)
    stereo *= 0.85 / max(1e-9, np.abs(stereo).max())
    marks = {
        "groove_start": float(bar_starts[8]),
        "breakdown_start": float(bar_starts[24]),
        "groove2_start": float(bar_starts[32]),
    }
    return stereo, beats, bar_starts, marks
