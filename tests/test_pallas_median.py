"""Pallas median kernel parity (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from track_analyser_tpu.ops.filters import median_filter_1d
from track_analyser_tpu.ops.pallas_median import median31_last_axis


def test_pallas_median_matches_xla_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 700)).astype(np.float32)

    ref = np.asarray(median_filter_1d(jnp.asarray(x), 31, axis=-1))
    out = np.asarray(median31_last_axis(jnp.asarray(x), interpret=True))

    np.testing.assert_allclose(out, ref, atol=0.0)


def test_pallas_median_handles_tile_remainders():
    rng = np.random.default_rng(1)
    # Not multiples of the (32, 512) tile on purpose.
    x = rng.normal(size=(33, 513)).astype(np.float32)

    ref = np.asarray(median_filter_1d(jnp.asarray(x), 31, axis=-1))
    out = np.asarray(median31_last_axis(jnp.asarray(x), interpret=True))

    np.testing.assert_allclose(out, ref, atol=0.0)


def test_pallas_first_axis_median_matches_xla_reference():
    from track_analyser_tpu.ops.pallas_median import median31_first_axis

    rng = np.random.default_rng(2)
    # Includes tile remainders on both axes.
    for shape in ((40, 700), (33, 513), (100, 512)):
        x = rng.normal(size=shape).astype(np.float32)
        ref = np.asarray(median_filter_1d(jnp.asarray(x), 31, axis=-2))
        out = np.asarray(median31_first_axis(jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.0)


def test_pallas_median_vmap_batches_on_native_grid():
    """vmapped medians route through the custom_vmap rule onto the
    kernels' 3-D batched grid (Pallas auto-batching rejects the
    memory-space-ANY input) — parity per lane, both axes, under jit."""

    import jax

    from track_analyser_tpu.ops.pallas_median import (
        median31_first_axis,
        median31_last_axis,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 40, 700)).astype(np.float32)

    cols = jax.jit(jax.vmap(lambda z: median31_last_axis(z, interpret=True)))
    rows = jax.jit(jax.vmap(lambda z: median31_first_axis(z, interpret=True)))
    out_c = np.asarray(cols(jnp.asarray(x)))
    out_r = np.asarray(rows(jnp.asarray(x)))
    for i in range(x.shape[0]):
        np.testing.assert_allclose(
            out_c[i], np.asarray(median_filter_1d(jnp.asarray(x[i]), 31, axis=-1)), atol=0.0
        )
        np.testing.assert_allclose(
            out_r[i], np.asarray(median_filter_1d(jnp.asarray(x[i]), 31, axis=-2)), atol=0.0
        )
