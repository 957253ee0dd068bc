"""Pallas TPU kernel: sliding median-of-31 along the last axis.

HPSS (filters.hpss) is the one op XLA cannot fuse: the generic lowering
materialises a 31x windows tensor (~2 GB for a 3-minute spectrogram) and
runs a generic sort. This kernel streams (BF, BT+32) slabs HBM->VMEM,
forms the 31 shifted windows as VMEM slices, and computes the median with
a Batcher bitonic min/max network entirely on the VPU — one read and one
write of the spectrogram instead of ~30.

Used on TPU backends; the chunked XLA implementation (filters.py) remains
the reference semantics and the CPU path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["median31_last_axis", "median31_first_axis", "supported"]

_SIZE = 31
_BF = 32  # sublane tile (rows)
_BT = 512  # lane tile (cols)
_HALO = 128  # >= _SIZE - 1; Mosaic requires 128-lane-aligned DMA slices


def supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@lru_cache(maxsize=1)
def _bitonic_pairs(n: int = 32):
    """Comparator schedule of Batcher's bitonic sorting network."""

    pairs = []
    k = 2
    while k <= n:
        j = k // 2
        while j > 0:
            for i in range(n):
                partner = i ^ j
                if partner > i:
                    ascending = (i & k) == 0
                    pairs.append((i, partner, ascending))
            j //= 2
        k *= 2
    return tuple(pairs)


@lru_cache(maxsize=1)
def _median_ops(n: int = 32, target: int = 15):
    """Bitonic network pruned to the single sorted output ``target``.

    Backward liveness over the comparator schedule: a comparator whose
    two outputs are both dead is dropped, and one with a single live
    output emits one min/max instead of two. For median-of-31 inside a
    32-network this cuts 480 vector min/max ops to 351 (-27%).
    Each entry is (a, b, ascending, a_live, b_live).
    """

    live = {target}
    ops = []
    for a, b, ascending in reversed(_bitonic_pairs(n)):
        a_live, b_live = a in live, b in live
        if not (a_live or b_live):
            continue
        ops.append((a, b, ascending, a_live, b_live))
        live.add(a)
        live.add(b)
    ops.reverse()
    return tuple(ops)


def _median31_kernel(x_hbm, out_ref, slab, sem):
    if len(x_hbm.shape) == 3:  # batched grid: (batch, row tiles, col tiles)
        b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        src = x_hbm.at[b, pl.ds(i * _BF, _BF), pl.ds(j * _BT, _BT + _HALO)]
    else:
        i, j = pl.program_id(0), pl.program_id(1)
        src = x_hbm.at[pl.ds(i * _BF, _BF), pl.ds(j * _BT, _BT + _HALO)]
    copy = pltpu.make_async_copy(src, slab, sem)
    copy.start()
    copy.wait()

    vals = [slab[:, k : k + _BT] for k in range(_SIZE)]
    vals.append(jnp.full((_BF, _BT), jnp.inf, dtype=slab.dtype))

    for a, b, ascending, a_live, b_live in _median_ops(32, 15):
        va, vb = vals[a], vals[b]
        if a_live and b_live:
            lo = jnp.minimum(va, vb)
            hi = jnp.maximum(va, vb)
            vals[a], vals[b] = (lo, hi) if ascending else (hi, lo)
        elif a_live:
            vals[a] = jnp.minimum(va, vb) if ascending else jnp.maximum(va, vb)
        else:
            vals[b] = jnp.maximum(va, vb) if ascending else jnp.minimum(va, vb)

    # Median of 31 values = ascending-sorted index 15 (the +inf pad sits
    # at index 31 and never reaches 15).
    if len(out_ref.shape) == 3:
        out_ref[0, :, :] = vals[15]
    else:
        out_ref[:, :] = vals[15]


def _median31_rows_kernel(x_hbm, out_ref, slab, sem):
    if len(x_hbm.shape) == 3:  # batched grid: (batch, row tiles, col tiles)
        b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        src = x_hbm.at[b, pl.ds(i * _BF, _BF + _ROW_HALO), pl.ds(j * _BT, _BT)]
    else:
        i, j = pl.program_id(0), pl.program_id(1)
        src = x_hbm.at[pl.ds(i * _BF, _BF + _ROW_HALO), pl.ds(j * _BT, _BT)]
    copy = pltpu.make_async_copy(src, slab, sem)
    copy.start()
    copy.wait()

    vals = [slab[k : k + _BF, :] for k in range(_SIZE)]
    vals.append(jnp.full((_BF, _BT), jnp.inf, dtype=slab.dtype))

    for a, b, ascending, a_live, b_live in _median_ops(32, 15):
        va, vb = vals[a], vals[b]
        if a_live and b_live:
            lo = jnp.minimum(va, vb)
            hi = jnp.maximum(va, vb)
            vals[a], vals[b] = (lo, hi) if ascending else (hi, lo)
        elif a_live:
            vals[a] = jnp.minimum(va, vb) if ascending else jnp.maximum(va, vb)
        else:
            vals[b] = jnp.maximum(va, vb) if ascending else jnp.minimum(va, vb)

    if len(out_ref.shape) == 3:
        out_ref[0, :, :] = vals[15]
    else:
        out_ref[:, :] = vals[15]


_ROW_HALO = 32  # >= _SIZE - 1, multiple of the 32-row DMA tile


def _pallas_median_call(kernel, slab_shape, xp, tp_out: int, interpret: bool):
    """Invoke ``kernel`` over a 2-D padded array (grid: row x col tiles)
    or a 3-D batched one (grid: batch x row x col tiles)."""

    if xp.ndim == 2:
        fp = xp.shape[0]
        grid = (fp // _BF, tp_out // _BT)
        out_shape = (fp, tp_out)
        out_spec = pl.BlockSpec((_BF, _BT), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    else:
        b, fp = xp.shape[0], xp.shape[1]
        grid = (b, fp // _BF, tp_out // _BT)
        out_shape = (b, fp, tp_out)
        out_spec = pl.BlockSpec(
            (1, _BF, _BT), lambda bb, i, j: (bb, i, j), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM(slab_shape, xp.dtype), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp)


@lru_cache(maxsize=None)
def _median_call(axis: str, tp_out: int, interpret: bool):
    """custom_vmap wrapper around the pallas call: a vmapped median maps
    onto the kernels' native batched (3-D) grid instead of Pallas's
    generic auto-batching (which rejects memory-space-ANY inputs with a
    squeezed batch block)."""

    if axis == "cols":
        kernel, slab_shape = _median31_kernel, (_BF, _BT + _HALO)
    else:
        kernel, slab_shape = _median31_rows_kernel, (_BF + _ROW_HALO, _BT)

    @jax.custom_batching.custom_vmap
    def call(xp):
        return _pallas_median_call(kernel, slab_shape, xp, tp_out, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, xp):  # noqa: ANN001 - custom_vmap API
        if not in_batched[0]:  # broadcast operand: one kernel run serves all
            out = _pallas_median_call(kernel, slab_shape, xp, tp_out, interpret)
            return jnp.broadcast_to(out, (axis_size, *out.shape)), True
        return _pallas_median_call(kernel, slab_shape, xp, tp_out, interpret), True

    return call


@partial(jax.jit, static_argnames=("interpret",))
def median31_first_axis(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Sliding median (size 31, reflect boundaries) along the FIRST axis
    of a 2-D array — the window runs across sublanes, so the percussive
    (frequency-direction) HPSS median needs no transpose round trip
    through HBM. Numerically identical to
    filters.median_filter_1d(x, 31, axis=-2)."""

    f, t = x.shape
    radius = _SIZE // 2
    fp = -(-f // _BF) * _BF
    tp = -(-t // _BT) * _BT
    # [reflect(15) above | signal | reflect(15) below, zero to tile+halo]
    xp = jnp.pad(x, ((radius, radius), (0, tp - t)), mode="reflect")
    xp = jnp.pad(xp, ((0, fp + _ROW_HALO - (f + 2 * radius)), (0, 0)))

    out = _median_call("rows", tp, interpret)(xp)
    return out[:f, :t]


@partial(jax.jit, static_argnames=("interpret",))
def median31_last_axis(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Sliding median (size 31, reflect boundaries) along the last axis of
    a 2-D array. TPU-only (``interpret=True`` for CPU testing); numerically
    identical to filters.median_filter_1d(x, 31, axis=-1)."""

    f, t = x.shape
    radius = _SIZE // 2
    fp = -(-f // _BF) * _BF
    tp = -(-t // _BT) * _BT
    # [reflect(15) | signal | zeros to tile + halo]
    xp = jnp.pad(x, ((0, fp - f), (radius, radius)), mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (0, tp - t + _HALO - 2 * radius)))

    out = _median_call("cols", tp, interpret)(xp)
    return out[:f, :t]
