"""Micro-attribution of cq_chroma_multires on the real TPU.

Times each component (decimation, low-rate STFT, full-rate 8192 STFT,
filterbank matmuls) the same way profile_fused_ablation.py does — one
device_get'd scalar per variant, best-of-4 — so the ~30 ms relay sync
floor cancels in comparisons between rows.

Run: python scripts/profile_chroma_parts.py
"""

from __future__ import annotations

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

    from track_analyser_tpu.config import DEFAULT_CONFIG as cfg
    from track_analyser_tpu.ops.chroma import (
        cq_chroma_multires,
        multires_cq_filterbanks,
        normalize_inf,
    )
    from track_analyser_tpu.ops.resample import decimate_fir
    from track_analyser_tpu.ops.stft import magnitude

    sr = 44_100
    n = 8_388_608
    rng = np.random.default_rng(0)
    y_h = rng.normal(0, 0.1, n).astype(np.float32)
    dev = jax.devices()[0]
    y = jax.device_put(y_h, dev)
    print(f"device: {dev}, n={n}")

    keep_hz = 260.0

    def timeit(label, fn):
        jitted = jax.jit(fn)
        jax.device_get(jitted(y))  # compile
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(jitted(y))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best * 1e3:.1f} ms", flush=True)
        return best

    floor = timeit("sync floor", lambda x: x[0] * 0.0)

    def t(label, fn):
        v = timeit(label, fn)
        print(f"    -> floor-corrected: {(v - floor) * 1e3:.1f} ms", flush=True)

    t("decimate only", lambda x: jnp.sum(decimate_fir(x, cfg.cq_decim, sr=sr, keep_hz=keep_hz)))
    t(
        "decimate + low STFT (4096, hop 128)",
        lambda x: jnp.sum(
            magnitude(
                decimate_fir(x, cfg.cq_decim, sr=sr, keep_hz=keep_hz),
                cfg.cq_low_n_fft,
                cfg.cq_hop // cfg.cq_decim,
                power=1.0,
            )
        ),
    )
    t(
        "high STFT only (8192, hop 2048)",
        lambda x: jnp.sum(magnitude(x, cfg.cq_n_fft, cfg.cq_hop, power=1.0)),
    )

    fb_low, fb_high = multires_cq_filterbanks(
        sr, cfg.cq_n_fft, cfg.cq_low_n_fft, cfg.cq_decim, low_octaves=cfg.cq_low_octaves
    )

    def full(x):
        return jnp.sum(
            cq_chroma_multires(
                x,
                sr=sr,
                n_fft=cfg.cq_n_fft,
                hop=cfg.cq_hop,
                n_fft_low=cfg.cq_low_n_fft,
                decim=cfg.cq_decim,
                low_octaves=cfg.cq_low_octaves,
            )
        )

    t("FULL cq_chroma_multires", full)

    def high_bank_only(x):
        mag_high = magnitude(x, cfg.cq_n_fft, cfg.cq_hop, power=1.0)
        raw = jnp.dot(jnp.asarray(fb_high), mag_high, preferred_element_type=jnp.float32)
        return jnp.sum(normalize_inf(raw, axis=0))

    t("high STFT + high bank matmul", high_bank_only)


if __name__ == "__main__":
    main()
