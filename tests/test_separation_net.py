"""Neural separation model: forward shapes, training convergence,
checkpoint round-trip into the stems ladder."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from track_analyser_tpu.models import separation_net, training


def test_forward_shapes_and_reconstruction_path():
    key = jax.random.PRNGKey(0)
    params = separation_net.init_params(key)
    n = 44_100 // 2
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 0.1, n).astype(np.float32))

    out = separation_net.separate_signal(params, y, n_samples=n)
    assert out.shape == (4, n)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_infers_depth_and_width_from_checkpoint():
    """One forward pass serves every bundled checkpoint generation: the
    block count (and implicitly d_model) comes from the params dict, so a
    v4-shaped net (2 blocks, D=96) and a larger v5-shaped net (3 blocks,
    D=128) run through the SAME code without touching module constants."""

    n = 16_384
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0, 0.1, n).astype(np.float32))
    for d_model, n_blocks in ((96, 2), (128, 3)):
        params = separation_net.init_params(
            jax.random.PRNGKey(1), d_model=d_model, n_blocks=n_blocks
        )
        assert separation_net._n_blocks(params) == n_blocks
        out = separation_net.separate_signal(params, y, n_samples=n)
        assert out.shape == (4, n)
        assert np.all(np.isfinite(np.asarray(out)))


def test_dilated_forward_and_checkpoint_metadata(tmp_path):
    """v5 plumbing: (a) dilations=None matches the explicit all-1s
    schedule bit-for-bit (the v4 serving path must be unchanged by the
    new argument); (b) a dilated schedule runs finite at the same
    shapes; (c) save/load round-trips the schedule under "_dilations"
    and checkpoint_dilations reads it without mutating params."""

    n = 16_384
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(0, 0.1, n).astype(np.float32))
    params = separation_net.init_params(
        jax.random.PRNGKey(2), d_model=64, n_blocks=4
    )

    base = np.asarray(separation_net.separate_signal(params, y, n_samples=n))
    ones = np.asarray(
        separation_net.separate_signal(params, y, n_samples=n, dilations=(1, 1, 1, 1))
    )
    np.testing.assert_array_equal(base, ones)

    dil = (1, 3, 9, 27)
    out = np.asarray(
        separation_net.separate_signal(params, y, n_samples=n, dilations=dil)
    )
    assert out.shape == (4, n) and np.all(np.isfinite(out))
    # dilation must actually change the function (RF grows)
    assert not np.array_equal(out, base)

    ckpt = tmp_path / "sep_v5.npz"
    separation_net.save_checkpoint(params, ckpt, dilations=dil)
    loaded = separation_net.load_checkpoint(ckpt)
    assert separation_net.checkpoint_dilations(loaded) == dil
    loaded.pop("_dilations")
    assert set(loaded) == set(params)
    # a v4-era checkpoint (no metadata) reads None -> all-1s behaviour
    assert separation_net.checkpoint_dilations(params) is None


def test_training_reduces_loss():
    _params, losses = training.train_separation(
        steps=8, batch=2, seconds=0.5, seed=0, log_every=0
    )
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip_enables_neural_stems(tmp_path, monkeypatch):
    params, _ = training.train_separation(steps=2, batch=1, seconds=0.25, log_every=0)
    ckpt = tmp_path / "sep.npz"
    separation_net.save_checkpoint(params, ckpt)

    loaded = separation_net.load_checkpoint(ckpt)
    assert set(loaded) == set(params)

    from track_analyser_tpu.models import separation

    monkeypatch.setenv("TRACK_ANALYSER_TPU_SEPARATION_CKPT", str(ckpt))
    assert separation.available()
    rng = np.random.default_rng(1)
    stems = separation.separate(rng.normal(0, 0.1, 8192).astype(np.float32), 44_100)
    assert stems is not None
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    assert all(v.shape == (8192,) for v in stems.values())
