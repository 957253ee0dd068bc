"""Frame-wise spectral summary features (jittable).

Replaces librosa.feature.{spectral_centroid, spectral_rolloff} and the LTAS
mean (reference: features.py:66-123) with fused reductions over one shared
magnitude spectrogram.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ltas", "spectral_centroid", "spectral_rolloff"]


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
