"""Distribution eval on RANDOMISED independent-engine songs.

VERDICT r4 #4: one tuned-on song is regression insurance, not
generalisation evidence. This script renders N songs through
scripts/independent_engine.render_random_song — key / tempo / METER
(3 and 4) / arrangement drawn per seed, decoder weights frozen — and
reports per-song tracked-beat F1, downbeat F1 and per-stem ΔSI-SDR,
plus the distribution medians the test gates pin
(tests/test_independent_eval.py).

Usage: python scripts/eval_independent_dist.py [--n 12] [--no-sep]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

from independent_engine import render_random_song  # noqa: E402


def f1(pred: np.ndarray, truth: np.ndarray, tol: float = 0.070) -> float:
    if pred.size == 0 or truth.size == 0:
        return 0.0
    p = (np.abs(pred[:, None] - truth[None, :]).min(axis=1) <= tol).mean()
    r = (np.abs(pred[:, None] - truth[None, :]).min(axis=0) <= tol).mean()
    return 0.0 if p + r == 0 else float(2 * p * r / (p + r))


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    denom = float(np.dot(ref, ref)) + 1e-12
    proj = (float(np.dot(est, ref)) / denom) * ref
    noise = est - proj
    return float(10.0 * np.log10((np.dot(proj, proj) + 1e-12) / (np.dot(noise, noise) + 1e-12)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--no-sep", action="store_true")
    args = ap.parse_args()

    from track_analyser_tpu.parallel.batch import analyse_track_fused
    from track_analyser_tpu.utils import AudioInput

    SR = 22_050
    # Fixed seed list; every 4th song forced to 3/4 (the {3,4} Viterbi is
    # end-to-end tested nowhere else at meter 3).
    rows = []
    for k in range(args.n):
        meter = 3 if k % 4 == 3 else None
        stems, mix, beats, bars, meta = render_random_song(1000 + k, sr=SR, meter=meter)
        t0 = time.time()
        result = analyse_track_fused(AudioInput(samples=mix, sample_rate=SR))
        tracked = np.asarray(result.beat.tracked_times or [])
        tf1 = f1(tracked, beats)
        db = np.asarray(result.downbeat.downbeat_times if result.downbeat else [])
        df1 = f1(db, bars)
        deltas = {}
        if not args.no_sep:
            from track_analyser_tpu.analysis.stems import separate_stems_arrays

            est = separate_stems_arrays(mix, SR)
            for name in ("drums", "bass", "other", "vocals"):
                ref = stems[name].astype(np.float64)
                if float(np.dot(ref, ref)) < 1e-9:  # silent stem (no vocals draw)
                    continue
                deltas[name] = si_sdr(np.asarray(est[name], np.float64), ref) - si_sdr(
                    mix.astype(np.float64), ref
                )
        rows.append((meta, tf1, df1, deltas))
        print(
            f"seed {1000+k}: bpm={meta['bpm']:.1f} meter={meta['meter']} "
            f"trans={meta['transpose']:+d} comp={meta['comp']} voc={meta['vocals']} | "
            f"tracked_f1={tf1:.3f} downbeat_f1={df1:.3f} | "
            + " ".join(f"{n}:{d:+.1f}" for n, d in deltas.items())
            + f" ({time.time()-t0:.0f}s)",
            flush=True,
        )

    tf = np.array([r[1] for r in rows])
    df = np.array([r[2] for r in rows])
    print(f"\ntracked F1: median {np.median(tf):.3f} min {tf.min():.3f}")
    print(f"downbeat F1: median {np.median(df):.3f} min {df.min():.3f}")
    m3 = [r[2] for r in rows if r[0]["meter"] == 3]
    m4 = [r[2] for r in rows if r[0]["meter"] == 4]
    print(f"downbeat F1 by meter: 3/4 {sorted(np.round(m3,3))} | 4/4 {sorted(np.round(m4,3))}")
    for name in ("drums", "bass", "other", "vocals"):
        d = [r[3][name] for r in rows if name in r[3]]
        if d:
            print(f"ΔSI-SDR {name}: median {np.median(d):+.1f} min {min(d):+.1f} (n={len(d)})")


if __name__ == "__main__":
    main()
