"""Beat and downbeat estimation.

Parity surface with the reference (analysis/beats.py:26-155): the
``BeatAnalysis`` / ``DownbeatAnalysis`` dataclasses, the inter-beat-interval
confidence formula, and the graceful downbeat ladder. The reference's
optional madmom RNN+DBN path (beats.py:124-141) is replaced by this
framework's JAX downbeat model (models/downbeat.py — a jitted activation
network + Viterbi DBN decoded with lax.scan); when unavailable it falls
back to the same every-4th-beat heuristic with source="heuristic".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from ..utils import AudioInput, seed_everything

__all__ = [
    "BeatAnalysis",
    "DownbeatAnalysis",
    "analyse_beats",
    "build_beat_analysis",
    "analyse_downbeats",
]


@dataclass(slots=True)
class BeatAnalysis:
    """Summary of the beat grid.

    ``beat_times`` is the reference-parity constant-tempo grid (the
    gated surface: ±0.1 BPM, 5 ms alignment). ``tracked_times`` is the
    drift-FOLLOWING beat sequence from the DP tracker
    (tempo.track_beats) — the capability the reference's optional madmom
    DBN path provides (reference analysis/beats.py:128-133); on
    drifting material its per-beat error is ~10-40 ms where the constant
    grid's grows to ~175 ms (tests/test_realism.py). None when the
    envelope is degenerate."""

    bpm: float
    beat_times: List[float]
    beat_frames: List[int]
    confidence: float
    grid: Optional[pd.DataFrame] = None
    tracked_times: Optional[List[float]] = None


@dataclass(slots=True)
class DownbeatAnalysis:
    """Downbeat estimates (model-based when available, heuristic otherwise)."""

    downbeat_times: List[float]
    beat_positions: List[int]
    source: str


def _compute_confidence(beat_times: np.ndarray) -> float:
    """Grid-regularity score: 1 - std/mean of inter-beat intervals,
    clipped to [0, 1] (the reference's formula, beats.py:46-54)."""

    intervals = np.diff(np.asarray(beat_times, dtype=float))
    if intervals.size == 0:
        return 0.0
    if np.allclose(intervals, intervals[0]):
        return 1.0
    spread = np.std(intervals) / (np.mean(intervals) + 1e-9)
    return float(np.clip(1.0 - spread, 0.0, 1.0))


def tracked_times_for(
    audio: AudioInput,
    env: np.ndarray,
    bpm: float,
    *,
    hop_length: int = 512,
) -> "Optional[np.ndarray]":
    """Drift-following tracked beats (madmom-DBN-class capability) for
    the per-module paths. The low-band accent curve comes from the same
    device graph the downbeat decoder uses, so the fused path (which
    reads the curve back from its own graph) agrees. Returns None on any
    failure — tracked beats are an additive capability, never a blocker."""

    try:
        import jax.numpy as jnp

        from .. import tempo
        from ..models.downbeat import _accent_graph
        from ..substrate import pad_to_bucket

        padded, f_valid = pad_to_bucket(
            np.asarray(audio.samples, dtype=np.float32), hop=hop_length
        )
        _, low, _ = _accent_graph(jnp.asarray(padded), sr=audio.sample_rate)
        return tempo.track_beats(
            env,
            audio.sample_rate,
            hop_length=hop_length,
            bpm=bpm,
            low_energy=np.asarray(low, dtype=np.float64)[:f_valid],
        )
    except Exception:
        return None


def analyse_beats(
    audio: "AudioInput | str",
    *,
    hop_length: int = 512,
    seed: int,
) -> Tuple[BeatAnalysis, Optional[DownbeatAnalysis]]:
    """Estimate the beat grid and optional downbeats from ``audio``."""

    seed_everything(seed)
    if not isinstance(audio, AudioInput):
        raise TypeError("analyse_beats expects an AudioInput instance")

    # One envelope pass feeds both the grid and the BPM refinement (the
    # reference computes the envelope separately per call, tempo.py:16-24).
    from .. import tempo

    env, ac = tempo._envelope_and_autocorr(
        np.asarray(audio.samples, dtype=np.float32), audio.sample_rate, hop_length
    )
    grid, bpm = tempo.grid_and_bpm_from_env(
        env, ac, len(audio.samples) / float(audio.sample_rate),
        audio.sample_rate, hop_length=hop_length,
    )
    tracked_times = tracked_times_for(audio, env, bpm, hop_length=hop_length)
    beat_result = build_beat_analysis(
        bpm, grid["time"].to_numpy(), audio.sample_rate,
        hop_length=hop_length, grid=grid, tracked_times=tracked_times,
    )
    downbeat_result = analyse_downbeats(
        audio, beat_result, hop_length=hop_length, seed=seed
    )
    return beat_result, downbeat_result


def build_beat_analysis(
    bpm: float,
    beat_times: np.ndarray,
    sr: int,
    *,
    hop_length: int = 512,
    grid: Optional[pd.DataFrame] = None,
    tracked_times: Optional[np.ndarray] = None,
) -> BeatAnalysis:
    beat_times = np.asarray(beat_times, dtype=float)
    beat_frames = np.floor(beat_times * sr / hop_length).astype(int)
    confidence = _compute_confidence(beat_times)
    return BeatAnalysis(
        bpm=float(bpm),
        beat_times=beat_times.astype(float).tolist(),
        beat_frames=beat_frames.astype(int).tolist(),
        confidence=confidence,
        grid=grid.copy() if grid is not None else None,
        tracked_times=(
            None
            if tracked_times is None or not len(tracked_times)
            else [float(t) for t in tracked_times]
        ),
    )


def analyse_downbeats(
    audio: "AudioInput | str",
    beat_result: BeatAnalysis,
    *,
    hop_length: int = 512,
    seed: int,
) -> Optional[DownbeatAnalysis]:
    if not isinstance(audio, AudioInput):
        raise TypeError("analyse_downbeats expects an AudioInput instance")
    seed_everything(seed)

    try:
        from ..models import downbeat as downbeat_model

        if downbeat_model.available():
            # Tracked (drift-following) beats as the downbeat time base
            # when available — the reference's madmom path does the same
            # (its DBN emits the beat sequence itself); constant grid
            # otherwise.
            base = (
                beat_result.tracked_times
                if beat_result.tracked_times is not None
                and len(beat_result.tracked_times) >= 8
                else beat_result.beat_times
            )
            tracked = downbeat_model.track_downbeats(
                audio.samples,
                audio.sample_rate,
                np.asarray(base, dtype=float),
                seed=seed,
            )
            if tracked is not None and len(tracked.downbeat_times):
                return DownbeatAnalysis(
                    downbeat_times=[float(t) for t in tracked.downbeat_times],
                    beat_positions=[int(p) for p in tracked.beat_positions],
                    source=tracked.source,
                )
    except Exception:
        pass  # model tier is optional — fall through to the heuristic

    return _fallback_downbeats(beat_result)


def _fallback_downbeats(beat_result: BeatAnalysis) -> DownbeatAnalysis:
    """Every-4th-beat assumption — the ladder's last rung (reference
    beats.py:144-155)."""

    times = np.asarray(beat_result.beat_times, dtype=float)
    positions = np.arange(times.size) % 4 + 1
    return DownbeatAnalysis(
        downbeat_times=times[positions == 1].tolist(),
        beat_positions=positions.tolist(),
        source="heuristic",
    )
