"""Train the time-parallel TCN downbeat activation net and bundle it.

Replaces the GRU checkpoint in the serving path: the TCN has no serial
scan, so the fused whole-track graph can run it per track in milliseconds
(madmom-equivalent capability, reference analysis/beats.py:124-141).

Runs on the CPU backend (training is small; keeps the TPU free). After
training, a held-out evaluation decodes downbeats on unseen synthetic
meters {3,4} at both frame rates, with and without the net's evidence,
and prints the F1 comparison that gates bundling.

Usage: python scripts/train_downbeat_tcn.py [--steps 1500] [--out PATH]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from track_analyser_tpu.models import downbeat as downbeat_decoder  # noqa: E402
from track_analyser_tpu.models import downbeat_net as net  # noqa: E402

DEFAULT_OUT = (
    Path(__file__).resolve().parents[1]
    / "track_analyser_tpu"
    / "models"
    / "checkpoints"
    / "downbeat_tcn_v1.npz"
)


def build_dataset(n_examples: int, frames: int, seed: int):
    """Pre-generate (feats, labels) examples at both serving frame rates."""

    rng = np.random.default_rng(seed)
    feats, labels = [], []
    for _ in range(n_examples):
        sr = int(rng.choice([22_050, 44_100]))
        secs = (frames + 8) * net._HOP / sr
        f, l = net.synthetic_audio_example(rng, seconds=secs, sr=sr)
        feats.append(f[:frames])
        labels.append(l[:frames])
    return np.stack(feats), np.stack(labels)


def train(steps: int, batch: int, frames: int, channels: int, seed: int):
    feats_all, labels_all = build_dataset(
        n_examples=max(4 * batch, 192), frames=frames, seed=seed
    )
    print(f"[train] dataset: {feats_all.shape}", flush=True)

    params = net.init_tcn_params(jax.random.PRNGKey(seed), channels=channels)
    momentum = jax.tree.map(jnp.zeros_like, params)
    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for step in range(steps):
        pick = rng.integers(0, feats_all.shape[0], size=batch)
        lr = 2e-3 * (0.3 if step > steps * 0.7 else 1.0)
        params, momentum, loss = net.train_step(
            params, momentum, feats_all[pick], labels_all[pick], lr
        )
        if step % 100 == 0:
            print(
                f"[train] step {step} loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    return params


def _downbeat_f1(pred, truth: np.ndarray, tol: float = 0.07) -> float:
    if pred is None or not pred.downbeat_times:
        return 0.0
    p = np.asarray(pred.downbeat_times)
    hits = np.abs(p[:, None] - truth[None, :]) <= tol
    tp = min(int(hits.any(axis=0).sum()), int(hits.any(axis=1).sum()))
    precision = tp / p.size if p.size else 0.0
    recall = tp / truth.size if truth.size else 0.0
    return 2 * precision * recall / (precision + recall) if precision + recall else 0.0


def evaluate(params, n_examples: int, seed: int):
    """Held-out decoder comparison: accent evidence vs accent+net.

    Evaluated per (style, rhythm):
    - style "accent" (downbeat loudest — amplitude alone solves it, the
      net must not regress it) vs "backbeat" (loud snare on the
      off-beats — amplitude points at the WRONG beat; only the kick's
      low-frequency timbre marks the downbeat; accent-only scores ~0.27
      F1). The madmom capability bar: reference analysis/beats.py:124-141.
    - rhythm "straight" (constant grid) vs "complex" (±2%/min tempo
      drift + swung off-beat hats + pickup phase — the round-2 VERDICT's
      untested realism stressors).
    """

    out = {}
    for style in ("accent", "backbeat"):
        for rhythm in ("straight", "complex"):
            scores_accent, scores_net = [], []
            for k in range(n_examples):
                rng = np.random.default_rng(seed + k)
                sr = int(rng.choice([22_050, 44_100]))
                y, beat_times, meter, downs = net.synth_percussion(
                    rng, seconds=12.0, sr=sr, style=style, rhythm=rhythm,
                    return_downbeat_mask=True,
                )
                truth = beat_times[downs]

                e, lo, fx = downbeat_decoder._accent_graph(
                    jnp.asarray(y, dtype=jnp.float32), sr=sr
                )
                e, lo, fx = (np.asarray(a, dtype=np.float64) for a in (e, lo, fx))
                accent_only = downbeat_decoder.decode_from_accent(
                    e, lo, beat_times, sr, flux=fx
                )
                prob = net.downbeat_activation(params, y, sr)
                with_net = downbeat_decoder.decode_from_accent(
                    e, lo, beat_times, sr, flux=fx, net_prob=prob
                )
                scores_accent.append(_downbeat_f1(accent_only, truth))
                scores_net.append(_downbeat_f1(with_net, truth))
            out[f"{style}/{rhythm}"] = (
                float(np.mean(scores_accent)),
                float(np.mean(scores_net)),
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--eval-examples", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=str(DEFAULT_OUT))
    args = ap.parse_args()

    params = train(args.steps, args.batch, args.frames, args.channels, args.seed)
    results = evaluate(params, args.eval_examples, seed=10_000)
    for key, (f1_accent, f1_net) in results.items():
        print(f"[eval:{key}] held-out downbeat F1: accent-only {f1_accent:.3f} | "
              f"accent+TCN {f1_net:.3f}", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    # Gate: must not regress the amplitude-solvable style (straight OR
    # complex rhythm), and must clearly beat the accent decoder where
    # amplitude misleads — on both rhythm variants.
    ok = (
        results["accent/straight"][1] + 0.02 >= results["accent/straight"][0]
        and results["accent/complex"][1] + 0.02 >= results["accent/complex"][0]
        and results["backbeat/straight"][1] >= results["backbeat/straight"][0] + 0.1
        and results["backbeat/complex"][1] >= results["backbeat/complex"][0] + 0.1
    )
    if ok:
        net.save_checkpoint(params, out)
        print(f"[save] checkpoint -> {out}")
    else:
        print("[save] SKIPPED: net does not beat the accent decoder "
              "(accent styles must hold within 0.02; backbeat must win "
              "by >=0.1 F1 on straight AND complex rhythms)")
        sys.exit(1)


if __name__ == "__main__":
    main()
