"""Training scaffolds for the model tier (separation + downbeats).

No datasets ship with this environment, so both models train on
procedurally synthesised audio: four-stem mixtures (kick/snare patterns,
sub-bass lines, harmonic pads, formant-like "vocals") for the separator,
and click/accent grids for the downbeat network. The synthesis covers the
structural statistics the analysers care about (tempo range, meter,
spectral balance) — the same strategy as the accuracy tests.

Data-parallel multi-chip training: shard the batch axis over the mesh's
``data`` axis (see __graft_entry__.dryrun_multichip for the wiring).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import separation_net

__all__ = ["synth_stems", "separation_loss", "separation_train_step", "train_separation"]

SR = 44_100


def synth_stems(rng: np.random.Generator, seconds: float = 2.0) -> np.ndarray:
    """Procedural (4, n) stems: drums / bass / other / vocals."""

    n = int(seconds * SR)
    t = np.arange(n) / SR
    bpm = rng.uniform(90, 135)
    beat = 60.0 / bpm

    drums = np.zeros(n)
    for b in np.arange(0, seconds, beat / 2):
        s = int(b * SR)
        e = min(n, s + int(0.03 * SR))
        drums[s:e] += rng.normal(0, 0.6, e - s) * np.exp(-np.arange(e - s) / (0.004 * SR))
    for b in np.arange(0, seconds, beat):
        s = int(b * SR)
        e = min(n, s + int(0.09 * SR))
        seg = np.arange(e - s) / SR
        drums[s:e] += np.sin(2 * np.pi * (55 + 45 * np.exp(-seg * 70)) * seg) * np.exp(-seg * 35)

    f_bass = rng.uniform(40, 90)
    bass = 0.5 * np.sin(2 * np.pi * f_bass * t) * (np.sin(2 * np.pi * t / 2) > -0.5)

    root = rng.uniform(200, 400)
    other = 0.25 * sum(np.sin(2 * np.pi * root * r * t) for r in (1.0, 1.25, 1.5))

    f0 = rng.uniform(150, 300)
    vib = f0 * (1 + 0.01 * np.sin(2 * np.pi * 5.5 * t))
    phase = 2 * np.pi * np.cumsum(vib) / SR
    vocals = 0.3 * (np.sin(phase) + 0.5 * np.sin(2 * phase) + 0.25 * np.sin(3 * phase))
    vocals *= np.clip(np.sin(2 * np.pi * t / 1.5), 0, 1)

    stems = np.stack([drums, bass, other, vocals]).astype(np.float32)
    peak = np.abs(stems.sum(axis=0)).max() + 1e-6
    return stems / peak * 0.9


def separation_loss(params, mix: jnp.ndarray, stems: jnp.ndarray) -> jnp.ndarray:
    """L1 waveform + magnitude-STFT loss over a batch (B, n) / (B, 4, n)."""

    n = mix.shape[-1]

    def one(mix_i, stems_i):
        pred = separation_net.separate_signal(params, mix_i, n_samples=n)
        wav_l1 = jnp.mean(jnp.abs(pred - stems_i))
        from ..ops.stft import stft

        sp_p = jnp.abs(stft(pred, 1024, 256))
        sp_t = jnp.abs(stft(stems_i, 1024, 256))
        spec_l1 = jnp.mean(jnp.abs(sp_p - sp_t))
        return wav_l1 + 0.5 * spec_l1

    return jnp.mean(jax.vmap(one)(mix, stems))


@partial(jax.jit, donate_argnums=(0, 1))
def separation_train_step(params, opt_state, mix, stems, lr: float = 3e-4):
    """Adam step; batch axis shards over ``data`` for multi-chip runs."""

    loss, grads = jax.value_and_grad(separation_loss)(params, mix, stems)
    m, v, step = opt_state
    step = step + 1
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = jax.tree.map(lambda mi, g: b1 * mi + (1 - b1) * g, m, grads)
    v = jax.tree.map(lambda vi, g: b2 * vi + (1 - b2) * g * g, v, grads)
    mhat = jax.tree.map(lambda mi: mi / (1 - b1**step), m)
    vhat = jax.tree.map(lambda vi: vi / (1 - b2**step), v)
    params = jax.tree.map(
        lambda p, mh, vh: p - lr * mh / (jnp.sqrt(vh) + eps), params, mhat, vhat
    )
    return params, (m, v, step), loss


def init_opt_state(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return (zeros, jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))


def train_separation(
    steps: int = 200,
    *,
    batch: int = 4,
    seconds: float = 1.0,
    seed: int = 0,
    checkpoint_path: "str | Path | None" = None,
    log_every: int = 20,
) -> Tuple[Dict[str, jnp.ndarray], list]:
    """Train the band-split separator on procedural mixtures."""

    rng = np.random.default_rng(seed)
    params = separation_net.init_params(jax.random.PRNGKey(seed))
    opt_state = init_opt_state(params)
    losses = []
    for step in range(steps):
        stems = np.stack([synth_stems(rng, seconds) for _ in range(batch)])
        mix = stems.sum(axis=1)
        params, opt_state, loss = separation_train_step(
            params, opt_state, jnp.asarray(mix), jnp.asarray(stems)
        )
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            print(f"[train_separation] step {step} loss {losses[-1]:.4f}")
    if checkpoint_path is not None:
        separation_net.save_checkpoint(params, checkpoint_path)
    return params, losses


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--out", type=str, default="separation_ckpt.npz")
    args = ap.parse_args()
    train_separation(
        args.steps, batch=args.batch, seconds=args.seconds, checkpoint_path=args.out
    )
