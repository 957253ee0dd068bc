"""Framing and short-time Fourier transforms (jittable).

Semantics follow the conventions the reference inherits from librosa 0.10
(hann window, centred frames, zero pad): stft(y, n_fft, hop)[k, t] analyses
samples around t*hop. Everything here is shape-static and jit/vmap/pjit
friendly; framing assembles from contiguous shifted reshapes (no XLA
gather — slow on TPU) and the transform lowers to an MXU DFT matmul
(<= 4096 points on accelerators) or the TPU FFT custom call.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "n_frames", "frame_signal", "stft", "magnitude", "fft_frequencies"]


@lru_cache(maxsize=32)
def hann_window(n: int) -> np.ndarray:
    """Periodic (DFT-even) hann window, the librosa/scipy default."""

    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def n_frames(n_samples: int, hop_length: int) -> int:
    """Frame count for a centred framing of ``n_samples``."""

    return 1 + n_samples // hop_length


def frame_signal(
    y: jnp.ndarray,
    frame_length: int,
    hop_length: int,
    *,
    center: bool = True,
) -> jnp.ndarray:
    """Return frames of shape (n_frames, frame_length) (time-major).

    With ``center=True`` the signal is zero-padded by frame_length//2 on
    both sides so frame t is centred at sample t*hop_length.

    TPU note: XLA gathers are slow on TPU, so when frame_length is a
    multiple of hop_length (every framing in this codebase) frames are
    assembled from k = frame_length // hop_length contiguous shifted
    reshapes — pure slices, no gather.
    """

    n = y.shape[-1]
    if center:
        pad = frame_length // 2
        total = 1 + n // hop_length
    else:
        pad = 0
        total = 1 + (n - frame_length) // hop_length

    if frame_length % hop_length == 0 and pad % hop_length == 0:
        k = frame_length // hop_length
        # Frame t covers padded samples [t*hop, t*hop + frame): exactly
        # chunk rows t .. t+k-1 of the hop-chunked padded signal.
        need_chunks = total - 1 + k
        tail = need_chunks * hop_length - (pad + n)
        yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, max(tail, 0))])
        chunks = yp[..., : need_chunks * hop_length].reshape(
            y.shape[:-1] + (need_chunks, hop_length)
        )
        parts = [chunks[..., j : j + total, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)

    # General case (unused by the built-in configs): gather framing.
    starts = jnp.arange(total) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    if center:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)])
    return y[..., idx]


# On TPU the batched real-input frame DFT runs ~3-10x faster as two MXU
# matmuls against an on-device cos/sin basis than through the FFT custom
# call (measured 11.8 -> ~1.2 ms for the 2048-point family over a 181 s
# track). The basis is built per call from iota + cos/sin — TPU
# transcendentals are cheap, and an embedded 16+ MB literal would bloat
# every executable shipped to the relay compile server. CPU keeps rfft:
# a dense DFT matmul is catastrophically slower there, and tests force
# the CPU backend.
_MATMUL_DFT_MAX_NFFT = 4_096


def _on_accelerator() -> bool:
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _dft_rfft_matmul(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """rfft(frames, axis=-1) as two real matmuls on the MXU.

    The basis angle is reduced with an exact integer mod (i*j stays well
    inside int32 for n_fft <= 4096), so cos/sin arguments live in
    [0, 2*pi) and the f32 basis is accurate to rounding.
    """

    i = jnp.arange(n_fft, dtype=jnp.int32)
    j = jnp.arange(1 + n_fft // 2, dtype=jnp.int32)
    ang = (2.0 * np.pi / n_fft) * ((i[:, None] * j[None, :]) % n_fft).astype(
        jnp.float32
    )
    # Precision.HIGH = 3-pass bf16 on the MXU: ~1e-5 relative error
    # (vs 2e-3 at DEFAULT single-pass bf16, which shifts gated results)
    # at ~3x the cost of one pass — still ~3x faster than the FFT call.
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGH)
    re = dot(frames, jnp.cos(ang))
    im = dot(frames, jnp.sin(ang))
    return jax.lax.complex(re, -im)


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    *,
    window: np.ndarray | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of shape (..., 1 + n_fft // 2, n_frames)."""

    win = jnp.asarray(hann_window(n_fft) if window is None else window)
    frames = frame_signal(y, n_fft, hop_length, center=center) * win
    if n_fft <= _MATMUL_DFT_MAX_NFFT and _on_accelerator():
        spec = _dft_rfft_matmul(frames, n_fft)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def magnitude(y: jnp.ndarray, n_fft: int, hop_length: int, power: float = 1.0) -> jnp.ndarray:
    """|STFT|**power without materialising the complex intermediate twice."""

    s = jnp.abs(stft(y, n_fft, hop_length))
    if power == 1.0:
        return s
    if power == 2.0:
        return s * s
    return s**power


def fft_frequencies(sr: int, n_fft: int) -> np.ndarray:
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float64)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    n_samples: int,
    *,
    window: np.ndarray | None = None,
    f_valid: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with squared-window norm.

    Inverts :func:`stft` (centred, hann) back to ``n_samples`` samples.
    The scatter-add lowers to one XLA scatter.

    ``f_valid`` (optional, dynamic): number of valid frames. Frames at or
    beyond it are excluded from BOTH the overlap-add and the window-sum
    normalisation, so a bucket-padded spectrogram inverts to exactly the
    samples an exact-shape spectrogram would (the padding frames'
    windows would otherwise inflate the normaliser near the tail).
    """

    win = jnp.asarray(hann_window(n_fft) if window is None else window)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1) * win
    total_frames = frames.shape[-2]
    pad = n_fft // 2
    out_len = total_frames * hop_length + n_fft

    wsq = jnp.broadcast_to(win * win, (total_frames, n_fft))
    if f_valid is not None:
        fmask = jnp.arange(total_frames) < f_valid
        frames = jnp.where(fmask[:, None], frames, 0.0)
        wsq = jnp.where(fmask[:, None], wsq, 0.0)

    starts = jnp.arange(total_frames) * hop_length
    idx = (starts[:, None] + jnp.arange(n_fft)[None, :]).reshape(-1)
    signal = jnp.zeros(out_len, dtype=frames.dtype).at[idx].add(frames.reshape(-1))
    wss = jnp.zeros(out_len, dtype=frames.dtype).at[idx].add(wsq.reshape(-1))
    signal = signal / jnp.maximum(wss, 1e-8)
    return signal[pad : pad + n_samples]
