"""Chroma projections (STFT chroma and constant-Q chroma) as matmuls.

The reference's key/chord path runs librosa's recursive multirate CQT
(harmony.py:107, 148) — a poor fit for XLA (data-dependent resampling
cascade, many small FFTs). Here both chroma variants are single filterbank
matmuls over one STFT family, which is the natural MXU mapping:

* ``chroma_stft_filterbank`` reproduces librosa.filters.chroma (Gaussian
  log-frequency windows folded to 12 pitch classes, tuning fixed to 0).
* ``cq_chroma_filterbank`` is this framework's constant-Q replacement: a
  log-spaced bank of raised-cosine bandpass windows (Q from
  bins_per_octave), folded to pitch classes — evaluated on a long-window
  STFT (cq_n_fft=8192) so low octaves are resolved.

Behavioural parity is asserted at the decision level (key exactness,
chord-change recall — see tests/test_harmony.py), not at filter-tap level.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "chroma_stft_filterbank",
    "cq_chroma_filterbank",
    "chroma_from_power",
    "normalize_inf",
]


@lru_cache(maxsize=16)
def chroma_stft_filterbank(
    sr: int,
    n_fft: int,
    n_chroma: int = 12,
    *,
    ctroct: float = 5.0,
    octwidth: float = 2.0,
    base_c: bool = True,
) -> np.ndarray:
    """Gaussian-windowed chroma projection of FFT bins, shape (12, 1+n_fft/2)."""

    a440 = 440.0
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * np.log2(frequencies / (a440 / 16.0))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))

    d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    n_chroma2 = np.round(n_chroma / 2.0)
    d = np.remainder(d + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2

    wts = np.exp(-0.5 * (2.0 * d / binwidthbins[None, :]) ** 2)
    # L2 normalise each FFT bin's chroma distribution
    norms = np.sqrt(np.sum(wts**2, axis=0, keepdims=True))
    wts = wts / np.where(norms > 0, norms, 1.0)

    wts *= np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2))[None, :]
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : 1 + n_fft // 2].astype(np.float32)


@lru_cache(maxsize=16)
def cq_chroma_filterbank(
    sr: int,
    n_fft: int,
    *,
    bins_per_octave: int = 36,
    n_octaves: int = 7,
    fmin: float = 32.703195662574764,  # C1
    n_chroma: int = 12,
) -> np.ndarray:
    """Constant-Q chroma filterbank on FFT bins, shape (12, 1+n_fft/2).

    Each constant-Q channel is a raised-cosine window centred at
    fmin * 2**(k / bins_per_octave) with bandwidth f_k / Q,
    Q = 1 / (2**(1/B) - 1); channels fold into pitch classes.
    """

    n_bins = bins_per_octave * n_octaves
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)

    fb = np.zeros((n_chroma, fft_freqs.size), dtype=np.float64)
    bins_per_semitone = bins_per_octave // n_chroma
    for k in range(n_bins):
        fc = fmin * 2.0 ** (k / bins_per_octave)
        if fc >= sr / 2.0:
            break
        bw = max(fc / q, sr / n_fft)  # at least one FFT bin wide
        rel = (fft_freqs - fc) / bw
        window = 0.5 * (1.0 + np.cos(np.pi * np.clip(rel, -1.0, 1.0)))
        window[np.abs(rel) >= 1.0] = 0.0
        ssum = window.sum()
        if ssum <= 0:
            continue
        # Offset so that fractional CQ bins between semitones split their
        # energy; CQ bin k sits (k % bins_per_semitone) / bps above a
        # semitone boundary. Assign to the nearest pitch class.
        pc = int(np.round(k / bins_per_semitone)) % n_chroma
        fb[pc] += window / ssum
    # Octave-count normalisation per pitch class
    row_norm = np.sqrt(np.sum(fb**2, axis=1, keepdims=True))
    fb = fb / np.where(row_norm > 0, row_norm, 1.0)
    return fb.astype(np.float32)


def chroma_from_power(power_spec: jnp.ndarray, fb: np.ndarray) -> jnp.ndarray:
    """Project a power spectrogram through a chroma filterbank and
    inf-normalise each frame (librosa chroma convention)."""

    raw = jnp.dot(jnp.asarray(fb), power_spec, preferred_element_type=jnp.float32)
    return normalize_inf(raw, axis=0)


def normalize_inf(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    scale = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    return x / jnp.where(scale > 0, scale, 1.0)
