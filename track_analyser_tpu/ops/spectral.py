"""Frame-wise spectral summary features (jittable).

Replaces librosa.feature.{spectral_centroid, spectral_rolloff} and the LTAS
mean (reference: features.py:66-123) with fused reductions over one shared
magnitude spectrogram.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ltas", "spectral_centroid", "spectral_rolloff", "balance_band_weights"]


from functools import lru_cache


@lru_cache(maxsize=8)
def balance_band_weights(
    sr: int, n_fft: int, edges: tuple = (200.0, 2000.0)
) -> np.ndarray:
    """(3, 1+n_fft/2) fractional band weights for the spectral-balance
    low/mid/high split (reference harmony.py:253-267 uses hard bin masks
    on a 4096-point STFT; at 2048 the bins are ~2x coarser, so the bin
    straddling each 200/2000 Hz edge is split FRACTIONALLY between its
    neighbouring bands — the band sums then match the finer transform's
    within the estimator difference, and the whole balance measurement
    rides the existing shared 2048 family instead of its own STFT).
    Weights partition: each bin's three weights sum to 1."""

    res = sr / n_fft
    freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    lo_edge = freqs - res / 2.0
    hi_edge = freqs + res / 2.0
    bands = [(0.0, edges[0]), (edges[0], edges[1]), (edges[1], sr / 2.0 + res)]
    w = np.zeros((3, freqs.size), dtype=np.float64)
    for i, (lo, hi) in enumerate(bands):
        overlap = np.minimum(hi, hi_edge) - np.maximum(lo, lo_edge)
        w[i] = np.clip(overlap, 0.0, None)
    w /= np.maximum(w.sum(axis=0, keepdims=True), 1e-12)
    return w.astype(np.float32)


def ltas(mag: jnp.ndarray) -> jnp.ndarray:
    """Long-term average spectrum: mean |STFT| per bin. Input (freq, time)."""

    return jnp.mean(mag, axis=-1)


def spectral_centroid(mag: jnp.ndarray, freqs: np.ndarray) -> jnp.ndarray:
    """Magnitude-weighted mean frequency per frame. Input (freq, time)."""

    f = jnp.asarray(freqs, dtype=jnp.float32)[:, None]
    total = jnp.sum(mag, axis=-2, keepdims=True)
    norm = mag / jnp.where(total > 0, total, 1.0)
    return jnp.sum(f * norm, axis=-2)


def spectral_rolloff(
    mag: jnp.ndarray, freqs: np.ndarray, roll_percent: float = 0.85
) -> jnp.ndarray:
    """Frequency below which ``roll_percent`` of the energy sits, per frame."""

    f = jnp.asarray(freqs, dtype=jnp.float32)[:, None]
    total = jnp.cumsum(mag, axis=-2)
    threshold = roll_percent * total[-1:, :]
    passed = total >= threshold
    candidate = jnp.where(passed, f, jnp.inf)
    out = jnp.min(candidate, axis=-2)
    return jnp.where(jnp.isfinite(out), out, 0.0)
