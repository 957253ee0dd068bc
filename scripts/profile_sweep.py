"""Stage-attributed sweep profile on the real chip.

Runs the bench's six-track library sweep with TA_SWEEP_DEBUG=1 after a
warmup pass, so the stderr trace shows where non-overlapped time lives
(load/stage/dispatch/finish per chunk). Usage:

    python scripts/profile_sweep.py 2> /tmp/sweep_trace.log
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from track_analyser_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    try:
        from track_analyser_tpu.native.build import build as build_native

        build_native(verbose=False)
    except Exception:
        pass

    import jax

    print(f"[profile] device: {jax.devices()[0]}", file=sys.stderr)

    import bench

    # Mirror the shipped bench config exactly (bench.py: 8 tracks of four
    # durations, transport=ms5, device_batch=4) so the trace attributes
    # the same sweep the headline times.
    durations = [181.0, 181.0, 136.0, 136.0, 96.0, 96.0, 166.0, 116.0]
    bpms = [118.0, 125.0, 97.0, 132.0, 110.0, 141.0, 104.0, 122.0]
    tracks = [
        bench._make_track(secs, bpm=bpms[i], seed=i)
        for i, secs in enumerate(durations)
    ]

    from track_analyser_tpu.parallel.batch import analyse_library

    t0 = time.perf_counter()
    analyse_library(tracks, device_batch=4, transport="ms5")  # warmup (compiles)
    print(f"[profile] warmup {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    os.environ["TA_SWEEP_DEBUG"] = "1"
    for run in range(3):
        t0 = time.perf_counter()
        out = analyse_library(tracks, device_batch=4, transport="ms5")
        dt = time.perf_counter() - t0
        assert all(hasattr(r, "beat") for r in out)
        print(f"[profile] sweep {run}: {dt:.3f} s", file=sys.stderr)


if __name__ == "__main__":
    main()
