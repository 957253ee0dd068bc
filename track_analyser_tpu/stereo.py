"""Stereo image analysis (mid/side, correlation, frequency-dependent width).

Public surface parity with the reference (stereo.py:20-153); the two
channel STFTs and every band reduction fuse into one jitted graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.stft import fft_frequencies, stft
from .utils import AudioInput

_EPS = 1e-12

__all__ = [
    "StereoWidthBands",
    "StereoAnalysis",
    "mid_side_rms",
    "mono_compatibility_correlation",
    "frequency_dependent_width",
    "analyse_stereo",
]


@dataclass(slots=True)
class StereoWidthBands:
    """Frequency dependent stereo width estimates."""

    low: float
    mid: float
    high: float

    def as_dict(self) -> dict[str, float]:
        return {"low": self.low, "mid": self.mid, "high": self.high}


@dataclass(slots=True)
class StereoAnalysis:
    """Aggregate container for stereo image metrics."""

    mid_rms: float
    side_rms: float
    correlation: float
    width: StereoWidthBands


def _ensure_stereo_array(audio: AudioInput) -> np.ndarray:
    if audio.stereo_samples is None:
        mono = np.asarray(audio.samples, dtype=np.float32)
        if mono.ndim == 1:
            return np.vstack([mono, mono])
        return mono[:2]

    stereo = np.asarray(audio.stereo_samples, dtype=np.float32)
    if stereo.ndim == 1:
        return np.vstack([stereo, stereo])
    if stereo.shape[0] == 2:
        return stereo
    if stereo.shape[1] == 2:
        return np.transpose(stereo)
    if stereo.shape[0] < 2:
        first = stereo[0]
        return np.vstack([first, first])
    return stereo[:2]


def mid_side_rms(stereo: np.ndarray) -> tuple[float, float]:
    left, right = np.asarray(stereo, dtype=np.float32)
    mid = 0.5 * (left + right)
    side = 0.5 * (left - right)
    if mid.size == 0:
        return 0.0, 0.0
    mid_rms = float(np.sqrt(np.mean(np.square(mid, dtype=np.float64))))
    side_rms = float(np.sqrt(np.mean(np.square(side, dtype=np.float64))))
    return mid_rms, side_rms


def mono_compatibility_correlation(stereo: np.ndarray) -> float:
    left, right = np.asarray(stereo, dtype=np.float64)
    if left.size == 0 or right.size == 0:
        return 1.0
    left = left - np.mean(left)
    right = right - np.mean(right)
    denom = float(np.linalg.norm(left) * np.linalg.norm(right))
    if denom <= _EPS:
        return 1.0
    corr = float(np.dot(left, right) / denom)
    return float(np.clip(corr, -1.0, 1.0))


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "band_edges"))
def _width_graph(stereo, *, sr, n_fft, hop_length, band_edges):
    left = stft(stereo[0], n_fft, hop_length)
    right = stft(stereo[1], n_fft, hop_length)
    mid = 0.5 * (left + right)
    side = 0.5 * (left - right)
    mid_energy = jnp.abs(mid) ** 2
    side_energy = jnp.abs(side) ** 2
    freqs = fft_frequencies(sr, n_fft)

    widths = []
    for low, high in band_edges:
        mask = jnp.asarray((freqs >= low) & (freqs <= high))
        count = jnp.maximum(jnp.sum(mask), 1)
        m = jnp.sum(jnp.where(mask[:, None], mid_energy, 0.0)) / (count * mid_energy.shape[1])
        s = jnp.sum(jnp.where(mask[:, None], side_energy, 0.0)) / (count * side_energy.shape[1])
        widths.append(jnp.where(m <= _EPS, 0.0, jnp.sqrt(s / jnp.where(m <= _EPS, 1.0, m))))
    return jnp.stack(widths)


def frequency_dependent_width(
    stereo: np.ndarray,
    sample_rate: int,
    *,
    bands: Sequence[tuple[str, float, float]] | None = None,
    n_fft: int = 2_048,
    hop_length: int = 512,
) -> StereoWidthBands:
    """Per-band sqrt(side-energy / mid-energy) from M/S spectrograms."""

    stereo = np.asarray(stereo, dtype=np.float32)
    nyquist = sample_rate / 2.0
    if bands is None:
        bands = (
            ("low", 0.0, min(200.0, nyquist)),
            ("mid", 200.0, min(2_000.0, nyquist)),
            ("high", 2_000.0, nyquist),
        )
    names = [name for name, _, _ in bands]
    edges = tuple((float(low), float(high)) for _, low, high in bands)

    # Bands with no FFT bin report width 0 (reference: stereo.py:114-116).
    freqs = fft_frequencies(sample_rate, n_fft)
    nonempty = [np.any((freqs >= lo) & (freqs <= hi)) for lo, hi in edges]

    widths = np.asarray(
        _width_graph(
            jnp.asarray(stereo), sr=sample_rate, n_fft=n_fft, hop_length=hop_length, band_edges=edges
        ),
        dtype=np.float64,
    )
    width_map = {"low": 0.0, "mid": 0.0, "high": 0.0}
    for name, value, ok in zip(names, widths, nonempty):
        width_map[name] = float(value) if ok else 0.0
    return StereoWidthBands(
        low=width_map.get("low", 0.0),
        mid=width_map.get("mid", 0.0),
        high=width_map.get("high", 0.0),
    )


def analyse_stereo(
    audio: AudioInput,
    *,
    n_fft: int = 2_048,
    hop_length: int = 512,
    bands: Sequence[tuple[str, float, float]] | None = None,
) -> StereoAnalysis:
    stereo = _ensure_stereo_array(audio)
    mid_rms_value, side_rms_value = mid_side_rms(stereo)
    correlation = mono_compatibility_correlation(stereo)
    width = frequency_dependent_width(
        stereo,
        audio.sample_rate,
        bands=bands,
        n_fft=n_fft,
        hop_length=hop_length,
    )
    return StereoAnalysis(
        mid_rms=mid_rms_value,
        side_rms=side_rms_value,
        correlation=correlation,
        width=width,
    )
