"""Per-stage device timing of the fused graph's components.

Each stage is jitted separately and timed with resident inputs, so the
whole-graph cost (scripts/profile_library.py) can be attributed.
Timing rule for the axon relay: block_until_ready is a no-op, so each
stage returns a scalar that is device_get'd (~30 ms sync floor — compare
deltas, not absolutes).

Run: python scripts/profile_device_stages.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
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
        chroma_from_power,
        chroma_stft_filterbank,
        cq_chroma_tribank,
    )
    from track_analyser_tpu.ops.filters import hpss
    from track_analyser_tpu.ops.loudness import k_weighted, rms_db_curve
    from track_analyser_tpu.ops.mel import mel_filterbank, melspectrogram_from_power
    from track_analyser_tpu.ops.resample import oversampled_peak
    from track_analyser_tpu.ops.stft import magnitude, stft

    sr = 44_100
    n = 8_388_608  # 181 s bucket
    rng = np.random.default_rng(0)
    y_h = rng.normal(0, 0.1, n).astype(np.float32)
    dev = jax.devices()[0]
    y = jax.device_put(y_h, dev)
    stereo = jax.device_put(np.stack([y_h, 0.9 * y_h]), dev)
    print(f"device: {dev}, n={n}")

    def timeit(label, fn, *args):
        jitted = jax.jit(fn)
        out = jitted(*args)  # compile
        jax.device_get(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(jitted(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best*1e3:.1f} ms")

    timeit("sync floor (noop scalar)", lambda a: jnp.float32(0.0) + a[0], y)
    timeit("stft 2048/512 mono |.|", lambda a: jnp.sum(magnitude(a, 2048, 512)), y)
    timeit(
        "stft pair L/R (widths)",
        lambda s: jnp.sum(jnp.abs(stft(s[0], 2048, 512))) + jnp.sum(jnp.abs(stft(s[1], 2048, 512))),
        stereo,
    )
    # Spectral balance rides the shared 2048 family since round 3 (no
    # separate transform), and the chroma is the three-bank CQ: one
    # decimation + two matmul-DFT STFTs of the decimated signal + three
    # filterbank projections (the family magnitude it reuses is charged
    # to the family STFT row above, so pass a resident one here).
    def _tribank_sum(a, fam):
        ch = cq_chroma_tribank(
            a,
            fam,
            sr=sr,
            hop=cfg.cq_hop,
            family_n_fft=2048,
            family_hop=512,
            low_n_fft=cfg.cq_low_n_fft,
            mid_n_fft=cfg.cq_mid_n_fft,
            decim=cfg.cq_decim,
            low_octaves=cfg.cq_low_octaves,
            family_octave=cfg.cq_family_octave,
            keep_hz=cfg.cq_keep_hz,
        )
        return jnp.sum(ch)

    fam_mag = jax.jit(lambda a: magnitude(a, 2048, 512))(y)
    jax.device_get(fam_mag[:1, :1])
    timeit("tribank CQ chroma (decimate + 2 STFTs + projections)", _tribank_sum, y, fam_mag)

    def _hpss_sum(a):
        mag = magnitude(a, 2048, 512)
        h, p = hpss(mag, kernel_size=cfg.hpss_kernel, power=cfg.hpss_power)
        return jnp.sum(h) + jnp.sum(p)

    timeit("stft + HPSS (Pallas median)", _hpss_sum, y)

    def _mel_chroma(a):
        power = magnitude(a, 2048, 512, power=2.0)
        mel = melspectrogram_from_power(power, mel_filterbank(sr, 2048, cfg.n_mels))
        cst = chroma_from_power(power, chroma_stft_filterbank(sr, 2048))
        return jnp.sum(mel) + jnp.sum(cst)

    timeit("stft + mel + chroma matmuls", _mel_chroma, y)
    timeit("k_weighted (Toeplitz matmul on accel, FFT conv on CPU)", lambda a: jnp.sum(k_weighted(a, sr)), y)
    timeit("true peak x8 polyphase", lambda a: oversampled_peak(a, 8), y)
    timeit(
        "rms curves (short+momentary)",
        lambda a: jnp.sum(rms_db_curve(a, 132300, 66150)) + jnp.sum(rms_db_curve(a, 17640, 8820)),
        y,
    )

    # Whole fused graph for reference.
    from track_analyser_tpu.substrate import full_track_graph, pack_outputs

    @partial(jax.jit, static_argnames=("sr_",))
    def whole(s, nv, sr_):
        return pack_outputs(full_track_graph(s, nv, sr=sr_))

    nv = jax.device_put(np.int32(n - 1000), dev)
    out = whole(stereo, nv, sr_=sr)
    jax.device_get(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(whole(stereo, nv, sr_=sr))
        best = min(best, time.perf_counter() - t0)
    print(f"  WHOLE fused graph (incl. 1.6 MB readback): {best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
