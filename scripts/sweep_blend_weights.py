"""Per-stem neural/DSP blend-weight sweep for the serving path.

analysis/stems.py serves `w*neural + (1-w)*dsp` per stem
(_BLEND_NEURAL_WEIGHT). This script measures mean SI-SDR for every
w ∈ {0, .25, .5, .75, 1} on the three eval synthesis families
(held-out / OOD / OOD3 — scripts/train_separation_v2.py) so the bundled
weights are a measured choice, not a guess. Prints one table per stem
plus the argmax of (a) mean across families and (b) worst family.

Usage: python scripts/sweep_blend_weights.py [--init CKPT] [--examples 16]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402

from track_analyser_tpu.models import separation_net as net  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from train_separation_v2 import (  # noqa: E402
    SR,
    si_sdr,
    synth_stems_ood,
    synth_stems_ood3,
    synth_stems_ood4,
    synth_stems_v2,
)

WEIGHTS = (0.0, 0.25, 0.5, 0.75, 1.0)
FAMILIES = (
    ("held-out", synth_stems_v2, 50_000),
    ("OOD", synth_stems_ood, 90_000),
    ("OOD3", synth_stems_ood3, 130_000),
    ("OOD4", synth_stems_ood4, 170_000),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", type=str, default=None)
    ap.add_argument("--examples", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from track_analyser_tpu.analysis.stems import separate_stems_arrays
    from track_analyser_tpu.models.separation import _checkpoint_path

    ckpt = args.init or _checkpoint_path()
    if ckpt is None:
        raise SystemExit("no bundled separation checkpoint found — pass --init CKPT")
    print(f"checkpoint: {ckpt}", flush=True)
    loaded = net.load_checkpoint(ckpt)
    dilations = net.checkpoint_dilations(loaded)
    loaded.pop("_dilations", None)
    params = {k: jnp.asarray(v) for k, v in loaded.items()}

    # per family, per stem, per weight: list of SI-SDRs
    table = {f: {s: {w: [] for w in WEIGHTS} for s in net.STEMS} for f, _, _ in FAMILIES}
    for fam, synth, seed in FAMILIES:
        for k in range(args.examples):
            rng = np.random.default_rng(seed + k)
            stems = synth(rng, 2.0)
            mix = stems.sum(axis=0)
            pred = np.asarray(
                net.separate_signal(
                    params, jnp.asarray(mix), n_samples=mix.size, dilations=dilations
                )
            )
            dsp = separate_stems_arrays(mix, SR)
            for i, s in enumerate(net.STEMS):
                for w in WEIGHTS:
                    est = w * pred[i] + (1 - w) * np.asarray(dsp[s])
                    table[fam][s][w].append(si_sdr(est, stems[i]))
        print(f"[{fam}] done", flush=True)

    print(f"\nmean SI-SDR dB by stem x weight (w=0 is pure DSP):")
    for s in net.STEMS:
        rows = {
            fam: [float(np.mean(table[fam][s][w])) for w in WEIGHTS]
            for fam, _, _ in FAMILIES
        }
        print(f"\n  {s}:  w = " + "  ".join(f"{w:>6.2f}" for w in WEIGHTS))
        for fam, vals in rows.items():
            print(f"    {fam:>8s}: " + "  ".join(f"{v:6.2f}" for v in vals))
        means = [float(np.mean([rows[f][j] for f in rows])) for j in range(len(WEIGHTS))]
        worsts = [float(np.min([rows[f][j] for f in rows])) for j in range(len(WEIGHTS))]
        print(
            f"    best mean w={WEIGHTS[int(np.argmax(means))]:.2f} "
            f"({max(means):.2f} dB); best worst-family "
            f"w={WEIGHTS[int(np.argmax(worsts))]:.2f} ({max(worsts):.2f} dB)"
        )


if __name__ == "__main__":
    main()
