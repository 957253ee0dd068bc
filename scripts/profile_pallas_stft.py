"""A/B the fused Pallas STFT-magnitude kernel against the XLA path.

Three measurements on the 181 s bucket (timing rule for the axon relay:
block_until_ready is a no-op, so every variant reduces to ONE scalar that
is device_get'd — the ~30 ms sync floor cancels in the deltas):

1. standalone: |STFT| of the (2, n) M/S pair, XLA matmul-DFT path vs
   the fused Pallas kernel (ops/pallas_stft.py);
2. in-graph: substrate.full_track_graph with TA_PALLAS_STFT=0 vs 1
   (the env var is read at trace time, so each variant traces fresh);
3. numerics: max |Δ| between the two graphs' onset_env / key_scores /
   integrated_lufs on the same input.

Run: python scripts/profile_pallas_stft.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from track_analyser_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from track_analyser_tpu import substrate
    from track_analyser_tpu.ops.pallas_stft import stft_magnitude
    from track_analyser_tpu.ops.stft import magnitude

    sr = 44_100
    n = 8_388_608  # 181 s bucket
    rng = np.random.default_rng(0)
    stereo_h = np.stack(
        [rng.normal(0, 0.1, n), rng.normal(0, 0.1, n)]
    ).astype(np.float32)
    dev = jax.devices()[0]
    stereo = jax.device_put(stereo_h, dev)
    nv = jax.device_put(np.int32(n - 12_345), dev)
    print(f"device: {dev}, n={n}")

    def timeit(label, fn, *args, reps=6):
        jax.device_get(fn(*args))  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best * 1e3:.1f} ms", flush=True)
        return best

    # ---- 1. standalone ---------------------------------------------------
    xla = jax.jit(lambda s: jnp.sum(magnitude(s, 2048, 512)))
    pal = jax.jit(lambda s: jnp.sum(stft_magnitude(s, 2048, 512)))
    t_x = timeit("standalone |STFT| XLA matmul-DFT", xla, stereo)
    t_p = timeit("standalone |STFT| Pallas fused  ", pal, stereo)
    print(f"    -> standalone delta {(t_x - t_p) * 1e3:+.1f} ms")

    # ---- 2 + 3. in-graph -------------------------------------------------
    outs = {}
    times = {}
    for flag in ("0", "1"):
        os.environ["TA_PALLAS_STFT"] = flag

        def graph(s, v):
            out = substrate.full_track_graph(s, v, sr=sr)
            return out

        jitted = jax.jit(lambda s, v: sum(
            jnp.sum(x) for k, x in sorted(substrate.full_track_graph(s, v, sr=sr).items())
        ))
        label = "Pallas" if flag == "1" else "XLA   "
        times[flag] = timeit(f"full graph ({label})", jitted, stereo, nv)
        got = jax.jit(graph)(stereo, nv)
        outs[flag] = {
            k: np.asarray(jax.device_get(got[k]))
            for k in ("onset_env", "key_scores", "integrated_lufs", "novelty")
        }
    os.environ.pop("TA_PALLAS_STFT", None)
    print(f"    -> in-graph delta {(times['0'] - times['1']) * 1e3:+.1f} ms")
    for k in outs["0"]:
        d = float(np.max(np.abs(outs["0"][k] - outs["1"][k])))
        print(f"  numerics max |Δ {k}|: {d:.3e}")


if __name__ == "__main__":
    main()
