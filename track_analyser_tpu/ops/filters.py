"""Smoothing / median filtering primitives (jittable).

``gaussian_filter1d`` reproduces the scipy.ndimage semantics the reference
leans on (structure.py:200, 216, 223): truncate=4.0, reflect boundary.

``median_filter_1d`` powers HPSS (structure.py:52). A sliding-window median
is the one op XLA has no fused primitive for; it is implemented as a
windowed sort over bounded chunks to cap the materialised window tensor,
with a Pallas kernel planned for the VMEM-resident version.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_kernel", "gaussian_filter1d", "median_filter_1d", "softmask", "hpss"]


@lru_cache(maxsize=32)
def gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter1d(x: jnp.ndarray, sigma: float, axis: int = -1) -> jnp.ndarray:
    """Gaussian smoothing along ``axis`` with reflect boundaries."""

    kernel = jnp.asarray(gaussian_kernel(float(sigma)))
    radius = kernel.shape[0] // 2
    x = jnp.moveaxis(x, axis, -1)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(radius, radius)], mode="reflect")
    # correlate: y[i] = sum_j xp[i + j] * k[j]
    n = x.shape[-1]
    idx = jnp.arange(n)[:, None] + jnp.arange(kernel.shape[0])[None, :]
    y = jnp.dot(xp[..., idx], kernel, preferred_element_type=jnp.float32)
    return jnp.moveaxis(y, -1, axis)


def _median_windows(xp: jnp.ndarray, n: int, size: int, chunk: int) -> jnp.ndarray:
    """Median over sliding windows along the last axis, chunked to bound memory."""

    n_chunks = -(-n // chunk)
    total = n_chunks * chunk
    xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, total + size - 1 - xp.shape[-1])])

    offsets = jnp.arange(n_chunks) * chunk

    def one_chunk(start):
        idx = start + jnp.arange(chunk)[:, None] + jnp.arange(size)[None, :]
        win = xp[..., idx]  # (..., chunk, size)
        return jnp.median(win, axis=-1)

    out = jax.lax.map(one_chunk, offsets)  # (n_chunks, ..., chunk)
    out = jnp.moveaxis(out, 0, -2)  # (..., n_chunks, chunk)
    out = out.reshape(out.shape[:-2] + (total,))
    return out[..., :n]


def median_filter_1d(x: jnp.ndarray, size: int, axis: int = -1, *, chunk: int = 512) -> jnp.ndarray:
    """Sliding median along ``axis`` with reflect boundaries (scipy-style).

    scipy.ndimage.median_filter with an even/odd ``size`` places the origin
    at size//2 with `reflect` mode; only odd sizes are used here (HPSS 31).
    """

    x = jnp.moveaxis(x, axis, -1)
    left = size // 2
    right = size - 1 - left
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)], mode="reflect")
    y = _median_windows(xp, x.shape[-1], size, chunk)
    return jnp.moveaxis(y, -1, axis)


def softmask(x: jnp.ndarray, x_ref: jnp.ndarray, *, power: float = 2.0, split_zeros: bool = True) -> jnp.ndarray:
    """librosa-style soft mask: (X/Z)^p / ((X/Z)^p + (Xref/Z)^p)."""

    z = jnp.maximum(jnp.maximum(x, x_ref), jnp.finfo(x.dtype).tiny)
    ref_p = (x_ref / z) ** power
    x_p = (x / z) ** power
    mask = x_p / (x_p + ref_p)
    bad = jnp.maximum(x, x_ref) < jnp.finfo(x.dtype).tiny
    fill = 0.5 if split_zeros else 0.0
    return jnp.where(bad, fill, mask)


def hpss(s: jnp.ndarray, *, kernel_size: int = 31, power: float = 2.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Harmonic/percussive separation of a magnitude spectrogram (freq, time).

    Median-filter along time for the harmonic reference, along frequency for
    the percussive reference, then split via soft masks (reference semantics:
    structure.py:52 -> librosa.decompose.hpss defaults, margin=1).
    """

    harm_ref = median_filter_1d(s, kernel_size, axis=-1)
    perc_ref = median_filter_1d(s, kernel_size, axis=-2)
    mask_h = softmask(harm_ref, perc_ref, power=power, split_zeros=True)
    mask_p = softmask(perc_ref, harm_ref, power=power, split_zeros=True)
    return s * mask_h, s * mask_p
