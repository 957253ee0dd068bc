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
    """Gaussian smoothing along ``axis`` with reflect boundaries.

    Narrow kernels correlate via shifted-slice FMAs; wide kernels (the
    0.5 s percussive-ratio smoother, K=345) go through one FFT
    convolution — both avoid TPU-hostile gathers.
    """

    kernel_np = gaussian_kernel(float(sigma))
    ksize = kernel_np.shape[0]
    radius = ksize // 2
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(radius, radius)], mode="reflect")

    if ksize <= 48:
        kernel = jnp.asarray(kernel_np)
        y = jnp.zeros_like(x)
        for j in range(ksize):
            y = y + kernel[j] * xp[..., j : j + n]
    else:
        n_fft = int(2 ** np.ceil(np.log2(xp.shape[-1] + ksize)))
        spec = jnp.fft.rfft(xp, n=n_fft, axis=-1) * jnp.fft.rfft(
            jnp.asarray(kernel_np), n=n_fft
        )
        # FFT computes convolution; for the symmetric kernel correlation
        # equals convolution shifted by ksize-1 relative to the padded
        # input: y[t] = conv[t + ksize - 1].
        y = jnp.fft.irfft(spec, n=n_fft, axis=-1)[..., ksize - 1 : ksize - 1 + n]
    return jnp.moveaxis(y, -1, axis)


def _median_windows(xp: jnp.ndarray, n: int, size: int, chunk: int) -> jnp.ndarray:
    """Median over sliding windows along the last axis, chunked to bound
    memory. Windows come from ``size`` contiguous dynamic slices per chunk
    (no gather — TPU-friendly)."""

    n_chunks = -(-n // chunk)
    total = n_chunks * chunk
    xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, total + size - 1 - xp.shape[-1])])
    axis = xp.ndim - 1

    offsets = jnp.arange(n_chunks) * chunk

    def one_chunk(start):
        win = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(xp, start + j, chunk, axis=axis)
                for j in range(size)
            ],
            axis=-1,
        )  # (..., chunk, size)
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

    On TPU backends with the default kernel size the sliding median runs
    as a Pallas VMEM kernel (ops/pallas_median.py); the chunked XLA path
    is the CPU/reference implementation.
    """

    from .pallas_median import (
        median31_first_axis,
        median31_last_axis,
        supported as _pallas_ok,
    )

    if kernel_size == 31 and s.ndim == 2 and _pallas_ok():
        harm_ref = median31_last_axis(s)
        perc_ref = median31_first_axis(s)  # no transpose round trip
    else:
        harm_ref = median_filter_1d(s, kernel_size, axis=-1)
        perc_ref = median_filter_1d(s, kernel_size, axis=-2)
    mask_h = softmask(harm_ref, perc_ref, power=power, split_zeros=True)
    mask_p = softmask(perc_ref, harm_ref, power=power, split_zeros=True)
    return s * mask_h, s * mask_p
