"""Pallas TPU kernel: fused frame -> window -> DFT -> |.| magnitude STFT.

The XLA path (ops/stft.py) materialises three HBM-sized intermediates per
spectrogram: the framed tensor ((frames, n_fft) — hop-overlap makes it
n_fft/hop x the signal's bytes), the complex DFT output (re + im planes),
and a (frames, bins) -> (bins, frames) relayout for the time-major
consumers. This kernel streams hop-chunked signal slabs HBM -> VMEM,
assembles the overlapping frames as VMEM slices (the same
shifted-reshape trick as ops/stft.frame_signal, but on-chip), folds the
hann window into the DFT basis (one basis scale instead of a per-frame
multiply), runs the two real-basis MXU dots per tile, and writes the
magnitude directly in (channel, bins, frames) layout — one HBM write of
the final array and no framed/complex/transposed intermediates.

Numerics: the windowed-basis dot at ``jax.lax.Precision.HIGHEST``
matches the rfft reference to ~1e-6 relative — tighter than the shipped
XLA matmul path's Precision.HIGH (~1e-5), because the f32 operands are
not split into bf16 passes. Grid order puts the frequency tile OUTERMOST
so each 1 MB basis tile is fetched once per sweep of all frame tiles
(Mosaic skips re-fetch of blocks whose index map does not change).

Used by substrate.full_track_graph for the shared 2048-point M/S family
when TA_PALLAS_STFT=1 (measured A/B switch; see RUNBOOK ablation table).
The chunked XLA implementation remains the reference semantics and the
CPU path. Reference behaviour being matched: the per-analyser
librosa.stft magnitude spectrograms of the CPU reference
(/root/reference/src/track_analyser/analysis/structure.py:186-200).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import hann_window

__all__ = ["stft_magnitude", "supported"]

_BF = 256  # frames per tile (dot LHS sublanes)
_BK = 128  # frequency bins per tile (dot RHS lanes)


def supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _kernel(k: int, slab_rows: int, y_hbm, wcos_ref, wsin_ref, out_ref, slab, sem):
    """Grid (channels, frame tiles, bin tiles); bin tiles INNERMOST so the
    manual slab DMA fires once per frame tile (j == 0) and stays resident
    across the bin sweep, while the 1 MB basis tiles change every step —
    the pattern Mosaic's automatic block pipeline double-buffers. (The
    first cut put bin tiles outermost to keep the basis resident and paid
    a blocking 0.5 MB DMA start+wait on EVERY step: ~3 ms slower over the
    1,170-step grid — the measured gap vs the XLA path.)"""

    c, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _load_slab():
        src = y_hbm.at[c, pl.ds(i * _BF, slab_rows), :]
        copy = pltpu.make_async_copy(src, slab, sem)
        copy.start()
        copy.wait()

    # Frame t of this tile covers chunk rows t .. t+k-1. Assembling the
    # (BF, n_fft) frame matrix with a concat of k sublane-shifted slices
    # is NOT Mosaic-compilable ("result/input offset mismatch on
    # non-concat dimension"), but the dot distributes over the concat:
    #   frames @ W == sum_t slab[t:t+BF] @ W[t*hop:(t+1)*hop]
    # so accumulate k partial MXU dots against the basis row-blocks
    # instead — same FLOPs, no concat, no layout shuffle.
    dot = partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    hop = slab.shape[1]
    re = dot(slab[0:_BF, :], wcos_ref[0:hop, :])
    im = dot(slab[0:_BF, :], wsin_ref[0:hop, :])
    for t in range(1, k):
        re += dot(slab[t : t + _BF, :], wcos_ref[t * hop : (t + 1) * hop, :])
        im += dot(slab[t : t + _BF, :], wsin_ref[t * hop : (t + 1) * hop, :])
    out_ref[0, :, :] = jnp.sqrt(re * re + im * im).T


def _windowed_basis(n_fft: int, bins_p: int, window: np.ndarray) -> tuple:
    """(n_fft, bins_p) cos/sin DFT basis with the analysis window folded
    into the rows and zero columns past the real-spectrum bins (padded
    tiles must write exact zeros). Built on device per call — TPU
    transcendentals are cheap and an embedded literal would bloat every
    relay-compiled executable (same rationale as stft._dft_rfft_matmul)."""

    bins = 1 + n_fft // 2
    i = jnp.arange(n_fft, dtype=jnp.int32)
    j = jnp.arange(bins_p, dtype=jnp.int32)
    ang = (2.0 * np.pi / n_fft) * ((i[:, None] * j[None, :]) % n_fft).astype(
        jnp.float32
    )
    valid = (j < bins)[None, :]
    win = jnp.asarray(window)[:, None]
    wcos = jnp.where(valid, win * jnp.cos(ang), 0.0)
    wsin = jnp.where(valid, win * jnp.sin(ang), 0.0)
    return wcos, wsin


@partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "interpret")
)
def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    *,
    center: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """|STFT| of shape (channels, 1 + n_fft//2, 1 + n//hop), fused.

    Requires n_fft % hop_length == 0 and (with ``center``) the n_fft//2
    pad to be a hop multiple — true for every framing in this codebase.
    Matches ops.stft.magnitude(...) (hann, centred) to ~1e-6 relative.
    """

    if y.ndim == 1:
        y = y[None, :]
    channels, n = y.shape
    assert n_fft % hop_length == 0, "fused kernel needs hop-aligned frames"
    k = n_fft // hop_length
    pad = n_fft // 2 if center else 0
    assert pad % hop_length == 0, "centre pad must be a hop multiple"
    total = 1 + n // hop_length if center else 1 + (n - n_fft) // hop_length

    f_tiles = -(-total // _BF)
    # Rows needed by the last tile's last frame, rounded to the sublane
    # tile so the per-step DMA slab keeps an 8-row-aligned shape.
    slab_rows = -(-(_BF + k - 1) // 8) * 8
    n_chunks = f_tiles * _BF + slab_rows
    yp = jnp.pad(y, ((0, 0), (pad, n_chunks * hop_length - pad - n)))
    y3 = yp.reshape(channels, n_chunks, hop_length)

    bins = 1 + n_fft // 2
    b_tiles = -(-bins // _BK)
    wcos, wsin = _windowed_basis(n_fft, b_tiles * _BK, hann_window(n_fft))

    out = pl.pallas_call(
        partial(_kernel, k, slab_rows),
        grid=(channels, f_tiles, b_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_fft, _BK), lambda c, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _BK), lambda c, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BK, _BF), lambda c, i, j: (c, j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (channels, b_tiles * _BK, f_tiles * _BF), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y3, wcos, wsin)
    return out[:, :bins, :total]
