"""Loudness and dynamics analysis (EBU R128, fully on device).

Public surface parity with the reference (analysis/loudness.py:20-128):
``LoudnessAnalysis``, ``measure_loudness``, ``true_peak_dbtp``,
``analyse_loudness``. The pyloudnorm meter is replaced by this framework's
jitted BS.1770 implementation (ops/loudness.py): FIR-expressed K-weighting
cascade + masked gated-block reductions; true peak is the x8 polyphase
upsampler as a single MXU matmul (ops/resample.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG
from ..ops.loudness import integrated_lufs, rms_db_curve
from ..ops.resample import oversampled_peak
from ..utils import AudioInput, seed_everything

__all__ = ["LoudnessAnalysis", "measure_loudness", "true_peak_dbtp", "analyse_loudness"]


@dataclass(slots=True)
class LoudnessAnalysis:
    integrated_lufs: float
    short_term_lufs: List[float]
    momentary_lufs: List[float]
    loudness_range: float
    true_peak_dbfs: float
    rms_dbfs: float


def _window_params(sample_rate: int, meter_block_size: float) -> Tuple[int, int]:
    frame_length = max(1024, int(round(sample_rate * meter_block_size)))
    if frame_length % 2:
        frame_length += 1
    hop_length = max(1, frame_length // 2)
    return frame_length, hop_length


def _bucket_pad(samples: np.ndarray) -> tuple[np.ndarray, int]:
    """Zero-pad to the substrate's geometric buckets so repeated calls
    share one compiled executable per bucket (axon compiles cost minutes
    per distinct shape); every graph below masks or trims the padding."""

    from ..substrate import bucket_length

    n = samples.size
    padded = np.zeros(bucket_length(n), dtype=np.float32)
    padded[:n] = samples
    return padded, n


@partial(jax.jit, static_argnames=("sample_rate", "frame_length", "hop_length"))
def _rms_curve_graph(y, *, sample_rate, frame_length, hop_length):
    return rms_db_curve(y, frame_length, hop_length)


def _windowed_loudness(
    samples: np.ndarray, sample_rate: int, meter_block_size: float
) -> np.ndarray:
    """Sliding-window RMS loudness in dB (reference: loudness.py:30-42)."""

    frame_length, hop_length = _window_params(sample_rate, meter_block_size)
    padded, n = _bucket_pad(samples)
    out = _rms_curve_graph(
        jnp.asarray(padded),
        sample_rate=sample_rate,
        frame_length=frame_length,
        hop_length=hop_length,
    )
    return np.asarray(out, dtype=np.float64)[: 1 + n // hop_length]


@partial(jax.jit, static_argnames=("sample_rate", "block"))
def _integrated_graph(y, n_valid, *, sample_rate, block):
    return integrated_lufs(
        y,
        sample_rate,
        block_seconds=block,
        absolute_gate=DEFAULT_CONFIG.gate_absolute_lufs,
        relative_gate_lu=DEFAULT_CONFIG.gate_relative_lu,
        n_valid=n_valid,
    )


def measure_loudness(
    samples: np.ndarray,
    sample_rate: int,
    meter_block_size: float = 0.400,
) -> Tuple[float, List[float], List[float], float]:
    """Measure LUFS and loudness-range metrics for mono ``samples``."""

    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim != 1:
        raise ValueError("measure_loudness expects mono audio samples")

    short_term = _windowed_loudness(samples, sample_rate, meter_block_size=3.0)
    momentary = _windowed_loudness(samples, sample_rate, meter_block_size=meter_block_size)

    padded, n = _bucket_pad(samples)
    integrated = float(
        _integrated_graph(
            jnp.asarray(padded), jnp.asarray(n),
            sample_rate=sample_rate, block=float(meter_block_size),
        )
    )
    # Loudness range via the momentary distribution spread — the behaviour
    # the reference ships with its pinned pyloudnorm (loudness.py:66-71).
    lra = float(np.percentile(momentary, 95) - np.percentile(momentary, 5))

    return (
        integrated,
        np.asarray(short_term, dtype=float).tolist(),
        np.asarray(momentary, dtype=float).tolist(),
        lra,
    )


@partial(jax.jit, static_argnames=("oversample",))
def _true_peak_graph(y, *, oversample):
    return oversampled_peak(y, oversample)


def true_peak_dbtp(
    samples: np.ndarray, sample_rate: int, *, oversample: int = 8
) -> float:
    """dB true peak via polyphase oversampling (reference: loudness.py:81-97)."""

    if oversample < 1:
        raise ValueError("oversample must be >= 1")
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim != 1:
        raise ValueError("true_peak_dbtp expects mono audio samples")

    if oversample == 1:
        peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    else:
        # bucket padding is transparent here: zeros cannot raise the peak
        padded, _n = _bucket_pad(samples)
        peak = float(_true_peak_graph(jnp.asarray(padded), oversample=oversample))
    return float(20.0 * np.log10(peak + 1e-12))


def analyse_loudness(
    audio: "AudioInput | str",
    *,
    seed: int,
    meter_block_size: float = 0.400,
) -> LoudnessAnalysis:
    """Compute LUFS, loudness range and peak information."""

    if not isinstance(audio, AudioInput):
        raise TypeError("analyse_loudness expects an AudioInput instance")
    seed_everything(seed)

    samples = audio.samples.astype(np.float32)

    integrated, short_term, momentary, loudness_range = measure_loudness(
        samples, audio.sample_rate, meter_block_size
    )
    true_peak_dbfs = true_peak_dbtp(samples, audio.sample_rate)
    rms_val = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    rms_dbfs = float(20.0 * np.log10(rms_val + 1e-12))

    return LoudnessAnalysis(
        integrated_lufs=integrated,
        short_term_lufs=short_term,
        momentary_lufs=momentary,
        loudness_range=loudness_range,
        true_peak_dbfs=true_peak_dbfs,
        rms_dbfs=rms_dbfs,
    )
