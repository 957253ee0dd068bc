"""Multi-device tests on the virtual 8-device CPU mesh: the TPU-native
equivalent of a distributed test rig (SURVEY.md section 4)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from track_analyser_tpu.parallel.mesh import make_mesh
from track_analyser_tpu.parallel.sharded import sharded_onset_envelope
from track_analyser_tpu.tempo import onset_envelope


@pytest.fixture(scope="module")
def click_signal():
    sr = 22_050
    n = sr * 8
    rng = np.random.default_rng(0)
    y = rng.normal(0, 0.01, n).astype(np.float32)
    for b in np.arange(0.0, 8.0, 0.5):
        s = int(b * sr)
        e = min(n, s + 220)
        y[s:e] += np.exp(-np.linspace(0, 6, e - s)).astype(np.float32)
    return y, sr


def test_virtual_mesh_has_eight_devices():
    assert len(jax.devices()) >= 8


def test_sharded_onset_envelope_matches_single_device(click_signal):
    y, sr = click_signal
    mesh = make_mesh((8,), ("seq",))

    env_sharded = sharded_onset_envelope(y, sr, mesh)
    env_ref = onset_envelope(y, sr)

    assert env_sharded.shape == env_ref.shape
    # Identical up to f32 reduction order.
    np.testing.assert_allclose(env_sharded, env_ref, atol=1e-4, rtol=1e-4)


def test_batched_analysis_sharded_over_data_axis(click_signal):
    """The analyse_library dispatch path: vmapped fused graph, dp-sharded."""

    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from track_analyser_tpu.substrate import full_track_graph

    y, sr = click_signal
    n = 512 * 128
    batch = 8
    stereos = np.stack([np.stack([y[:n], y[:n]])] * batch)
    valids = np.full((batch,), n, dtype=np.int32)

    mesh = make_mesh((8,), ("data",))
    batched = jax.jit(
        jax.vmap(partial(full_track_graph, sr=sr)),
        in_shardings=(
            NamedSharding(mesh, P("data", None, None)),
            NamedSharding(mesh, P("data")),
        ),
    )
    with mesh:
        out = batched(stereos, valids)
        jax.block_until_ready(out)

    envs = np.asarray(out["onset_env"])
    assert envs.shape[0] == batch
    # All tracks identical -> all outputs identical across shards.
    np.testing.assert_allclose(envs, np.broadcast_to(envs[0], envs.shape), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert "onset_env" in out

    graft.dryrun_multichip(8)
