"""Stage-attributed profile of the library sweep on the live device.

Answers, with numbers (written to stdout; paste into RUNBOOK.md):
  1. host->device bandwidth for the int8 payload, at 1/2/4 concurrent
     device_put streams (does the relay aggregate across connections?)
  2. fused-graph device compute time with inputs already resident
  3. readback cost of the packed outputs
  4. host finishing cost (result assembly, no rendering)
  5. end-to-end analyse_library ms/track for comparison

Run: python scripts/profile_library.py [n_tracks]
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _track(seconds: float, sr: int = 44_100, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    y = 0.3 * np.sin(2 * np.pi * 220.0 * t) + 0.05 * rng.normal(size=n)
    for b in np.arange(0.0, seconds, 60.0 / 126.0):
        s = int(b * sr)
        e = min(n, s + 2000)
        y[s:e] += np.exp(-np.linspace(0, 8, e - s))
    st = np.stack([y, 0.9 * y]).astype(np.float32)
    from track_analyser_tpu.utils import AudioInput

    return AudioInput(samples=st.mean(0), sample_rate=sr, stereo_samples=st)


def main() -> None:
    from track_analyser_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax

    from track_analyser_tpu.parallel import batch as B
    from track_analyser_tpu.parallel.mesh import data_sharding, make_mesh
    from track_analyser_tpu.substrate import bucket_length

    try:
        from track_analyser_tpu.native.build import build as build_native

        build_native(verbose=False)
    except Exception:
        pass

    dev = jax.devices()[0]
    mesh = make_mesh()
    print(f"device: {dev}")
    seconds = 180.0
    sr = 44_100
    audio = _track(seconds)
    n_bucket = bucket_length(len(audio.samples))

    # --- 0. decode-pool work: pad + quantise + host widths (ms) ------------
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        payload, host_exact, nv = B._stage_payload_ms(audio, n_bucket)
    print(
        f"host stage (ms): {(time.perf_counter()-t0)/reps*1e3:.0f} ms/track "
        f"(native quantise + host-exact widths)"
    )
    payload_mb = sum(p.nbytes for p in payload) / 1e6
    print(f"bucket={n_bucket} payload={payload_mb:.1f} MB (mid-only int8)")

    # --- 1. upload bandwidth, 1/2/4 streams --------------------------------
    def upload_once(i):
        staged = []
        for part in payload:
            stacked = np.stack([part])  # batch of 1, as the sweep stages it
            staged.append(jax.device_put(stacked, data_sharding(mesh, rank=stacked.ndim)))
        _ = jax.device_get(staged[-1][:1, :1])  # force materialisation
        return tuple(staged)

    upload_once(0)  # warm path
    for streams in (1, 2, 4):
        t0 = time.perf_counter()
        reps = 3
        with ThreadPoolExecutor(max_workers=streams) as pool:
            list(pool.map(upload_once, range(streams * reps)))
        dt = time.perf_counter() - t0
        total = payload_mb * streams * reps
        print(
            f"upload x{streams} streams: {total/dt:.1f} MB/s aggregate "
            f"({dt/(streams*reps)*1e3:.0f} ms/track amortised)"
        )

    # --- 2/3. device compute + readback ------------------------------------
    from functools import partial

    staged = upload_once(0)
    vb = jax.device_put(np.asarray([nv]), data_sharding(mesh))
    graph = partial(B._batched_graph_ms, sr=sr)
    with mesh:
        out = graph(staged, vb)  # compile
        _ = jax.device_get(jax.tree.leaves(out)[0][:1])
        for _ in range(2):
            t0 = time.perf_counter()
            out = graph(staged, vb)
            # time to ready: fetch a sliver of the first output
            _ = jax.device_get(jax.tree.leaves(out)[0][:1, :1])
            t1 = time.perf_counter()
            fetched = jax.device_get(out)
            t2 = time.perf_counter()
            print(
                f"device compute (resident inputs): {(t1-t0)*1e3:.0f} ms; "
                f"full readback: {(t2-t1)*1e3:.0f} ms "
                f"({sum(np.asarray(o).nbytes for o in jax.tree.leaves(fetched))/1e6:.1f} MB out)"
            )

    # --- 4. host finishing ---------------------------------------------------
    with mesh:
        fetched = jax.device_get(graph(staged, vb))
    curves, chroma, vec = fetched[:3]
    net = fetched[3] if len(fetched) > 3 else None
    out_dict = None
    from track_analyser_tpu.substrate import unpack_outputs

    t0 = time.perf_counter()
    for _ in range(3):
        out_dict = unpack_outputs(curves[0], chroma[0], vec[0])
        if net is not None:
            out_dict["net_prob"] = np.asarray(net[0])
        if host_exact is not None:
            B._apply_host_stereo_stats(out_dict, *host_exact)
        B.result_from_graph_outputs(audio, out_dict)
    print(f"host finish: {(time.perf_counter()-t0)/3*1e3:.0f} ms/track")

    # --- 4a. host finish, piecewise ----------------------------------------
    from track_analyser_tpu import harmony as H
    from track_analyser_tpu import tempo as T
    from track_analyser_tpu.analysis import beats as BE
    from track_analyser_tpu.analysis import structure as ST
    from track_analyser_tpu.config import DEFAULT_CONFIG
    from track_analyser_tpu.models import downbeat as DM
    from track_analyser_tpu.utils import deterministic_rng

    hop = DEFAULT_CONFIG.hop_length
    nn = len(audio.samples)
    f_valid = 1 + nn // hop
    env = np.asarray(out_dict["onset_env"], dtype=np.float64)[:f_valid]

    def _t(label, fn, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            result = fn()
        print(f"  finish::{label}: {(time.perf_counter()-t0)/reps*1e3:.0f} ms")
        return result

    grid, bpm = _t("grid+bpm", lambda: T.grid_and_bpm_from_env(env, None, nn / sr, sr, hop_length=hop))
    beat_result = BE.build_beat_analysis(bpm, grid["time"].to_numpy(), sr, hop_length=hop, grid=grid)
    _t(
        "downbeat decode",
        lambda: DM.decode_from_accent(
            np.asarray(out_dict["beat_energy"], dtype=np.float64)[:f_valid],
            np.asarray(out_dict["low_energy"], dtype=np.float64)[:f_valid],
            np.asarray(beat_result.beat_times, dtype=float),
            sr,
            flux=env,
        ),
    )
    _t(
        "structure segments",
        lambda: ST.segments_from_curves(
            np.asarray(out_dict["novelty"], dtype=np.float64)[:f_valid],
            np.asarray(out_dict["energy_novelty"], dtype=np.float64)[:f_valid],
            np.asarray(out_dict["perc_col"], dtype=np.float64)[:f_valid],
            np.asarray(out_dict["harm_col"], dtype=np.float64)[:f_valid],
            beat_result,
            sample_rate=sr,
            hop_length=hop,
            duration=nn / sr,
        ),
    )
    chroma_cq = np.asarray(out_dict["chroma_cq"], dtype=np.float64)[:, :f_valid]
    rng_h = deterministic_rng(0)
    hints = _t("chords", lambda: H._estimate_chords(chroma_cq, beat_result, rng_h))
    _t("chord changes", lambda: H._detect_chord_changes(chroma_cq, beat_result, hints))
    _t(
        "loudness curves",
        lambda: (
            np.asarray(out_dict["short_term_db"], dtype=float).tolist(),
            np.asarray(out_dict["momentary_db"], dtype=float).tolist(),
        ),
    )

    # --- 4b. host quantise/pad ----------------------------------------------
    t0 = time.perf_counter()
    for _ in range(3):
        st2, _ = B._pad_track(audio, n_bucket)
        B._quantise_i8(st2)
    print(f"host pad+quantise: {(time.perf_counter()-t0)/3*1e3:.0f} ms/track")

    # --- 5. end-to-end sweep --------------------------------------------------
    n_tracks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    tracks = [_track(seconds, seed=i) for i in range(n_tracks)]
    B.analyse_library(tracks[:2])
    for rep in range(2):
        t0 = time.perf_counter()
        res = B.analyse_library(tracks)
        dt = time.perf_counter() - t0
        print(f"analyse_library: {dt/n_tracks*1e3:.0f} ms/track ({n_tracks} tracks)")
        assert len(res) == n_tracks


if __name__ == "__main__":
    main()
