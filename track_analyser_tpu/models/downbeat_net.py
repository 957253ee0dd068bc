"""Trainable downbeat activation network (pure JAX, TPU-shaped).

The madmom path this replaces (reference analysis/beats.py:124-141) is an
RNN producing per-frame beat/downbeat activations decoded by a DBN. Here:

* features: log-mel frames (n_mels,) per hop — computed by the shared ops
  tier;
* model: input projection -> two GRU layers (lax.scan over frames, hidden
  state in registers, weights in bf16 on the MXU) -> 3-way softmax per
  frame (none / beat / downbeat);
* training: class-weighted cross entropy, SGD/momentum, data-parallel over
  the ``data`` mesh axis with tensor-parallel hidden sharding over
  ``model`` when a 2-D mesh is supplied.

Trained checkpoints plug into models/downbeat.py's decoder; without one,
the accent decoder remains the default. The training step is also the
multi-chip dry-run workload (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_params", "forward", "loss_fn", "train_step", "N_CLASSES"]

N_CLASSES = 3  # none / beat / downbeat


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    scale = jnp.sqrt(2.0 / (fan_in + fan_out))
    return scale * jax.random.normal(key, shape, dtype=jnp.float32)


def init_params(
    key: jax.Array, *, n_mels: int = 128, hidden: int = 256
) -> Dict[str, jnp.ndarray]:
    keys = jax.random.split(key, 8)
    params = {
        "in_w": _glorot(keys[0], (n_mels, hidden)),
        "in_b": jnp.zeros(hidden),
        "out_w": _glorot(keys[1], (hidden, N_CLASSES)),
        "out_b": jnp.zeros(N_CLASSES),
    }
    for layer in (0, 1):
        params[f"gru{layer}_wx"] = _glorot(keys[2 + 2 * layer], (hidden, 3 * hidden))
        params[f"gru{layer}_wh"] = _glorot(keys[3 + 2 * layer], (hidden, 3 * hidden))
        params[f"gru{layer}_b"] = jnp.zeros(3 * hidden)
    return params


def _gru_layer(x, wx, wh, b):
    """GRU over the time axis via lax.scan. x: (T, hidden)."""

    hidden = wh.shape[0]
    # One big input matmul for all timesteps (MXU-friendly), scan only the
    # recurrent part.
    xproj = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b

    def step(h, xp):
        hproj = jnp.dot(h, wh, preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xp[:hidden] + hproj[:hidden])
        z = jax.nn.sigmoid(xp[hidden : 2 * hidden] + hproj[hidden : 2 * hidden])
        n = jnp.tanh(xp[2 * hidden :] + r * hproj[2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros(hidden, dtype=x.dtype)
    _, hs = jax.lax.scan(step, h0, xproj)
    return hs


def forward(params: Dict[str, jnp.ndarray], feats: jnp.ndarray) -> jnp.ndarray:
    """Per-frame class logits. feats: (T, n_mels) -> (T, 3)."""

    x = jnp.tanh(jnp.dot(feats, params["in_w"], preferred_element_type=jnp.float32) + params["in_b"])
    x = _gru_layer(x, params["gru0_wx"], params["gru0_wh"], params["gru0_b"])
    x = _gru_layer(x, params["gru1_wx"], params["gru1_wh"], params["gru1_b"])
    return jnp.dot(x, params["out_w"], preferred_element_type=jnp.float32) + params["out_b"]


def loss_fn(params, feats_batch, labels_batch) -> jnp.ndarray:
    """Class-weighted softmax CE over a batch of (T, n_mels) examples."""

    logits = jax.vmap(lambda f: forward(params, f))(feats_batch)  # (B, T, 3)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels_batch, N_CLASSES)
    # Beats/downbeats are rare; upweight them.
    class_w = jnp.asarray([1.0, 10.0, 20.0])
    w = class_w[labels_batch]
    ce = -jnp.sum(onehot * logp, axis=-1)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


@partial(jax.jit, donate_argnums=(0, 1))
def train_step(
    params: Dict[str, jnp.ndarray],
    momentum: Dict[str, jnp.ndarray],
    feats_batch: jnp.ndarray,
    labels_batch: jnp.ndarray,
    lr: float = 1e-3,
    beta: float = 0.9,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], jnp.ndarray]:
    """One SGD-with-momentum step. Data-parallelism comes from sharding
    the batch axis of ``feats_batch`` over the mesh; XLA inserts the
    gradient all-reduce over ICI automatically."""

    loss, grads = jax.value_and_grad(loss_fn)(params, feats_batch, labels_batch)
    new_m = jax.tree.map(lambda m, g: beta * m + g, momentum, grads)
    new_p = jax.tree.map(lambda p, m: p - lr * m, params, new_m)
    return new_p, new_m, loss


def synthetic_batch(
    rng: np.random.Generator, *, batch: int = 8, frames: int = 256, n_mels: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural click-pattern batch for training/smoke (no dataset in
    this environment; real training sweeps synthesise varied tempi,
    meters and timbres the same way)."""

    feats = rng.normal(0.0, 0.1, size=(batch, frames, n_mels)).astype(np.float32)
    labels = np.zeros((batch, frames), dtype=np.int32)
    for b in range(batch):
        period = int(rng.integers(28, 48))
        phase = int(rng.integers(0, period))
        meter = int(rng.choice([3, 4]))
        for i, f in enumerate(range(phase, frames, period)):
            is_down = (i % meter) == 0
            labels[b, f] = 2 if is_down else 1
            amp = 3.0 if is_down else 2.0
            feats[b, f, :] += amp * np.exp(-np.arange(n_mels) / 40.0)
            if f + 1 < frames:
                feats[b, f + 1, :] += 0.5 * amp * np.exp(-np.arange(n_mels) / 40.0)
    return feats, labels
