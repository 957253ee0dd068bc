"""Worked example: production library sweep with every serving feature.

Synthesises a tiny mixed-format library (WAV + FLAC), sweeps it through
the streaming batched pipeline with a resumable manifest, renders full
artefact sets per track, and prints the summary — the end-to-end shape a
production deployment uses.

Run: python examples/library_sweep.py [out_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from track_analyser_tpu.io import write_wav
from track_analyser_tpu.io.flac import encode_flac
from track_analyser_tpu.parallel.batch import analyse_library
from track_analyser_tpu.utils import enable_persistent_compilation_cache


def synth_track(seconds: float, bpm: float, root_hz: float, seed: int) -> np.ndarray:
    sr = 44_100
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    y = 0.25 * np.sin(2 * np.pi * root_hz * t)
    y += 0.12 * np.sin(2 * np.pi * root_hz * 1.5 * t)
    for i, b in enumerate(np.arange(0.0, seconds, 60.0 / bpm)):
        s = int(b * sr)
        e = min(n, s + int(0.06 * sr))
        seg = np.arange(e - s) / sr
        amp = 0.9 if i % 4 == 0 else 0.5
        y[s:e] += amp * np.sin(2 * np.pi * (55 + 45 * np.exp(-seg * 60)) * seg) * np.exp(-seg * 35)
    y += 0.01 * rng.normal(size=n)
    return (0.9 * y / np.abs(y).max()).astype(np.float32)


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/library_sweep_demo")
    out.mkdir(parents=True, exist_ok=True)
    enable_persistent_compilation_cache()

    # A small mixed-format, mixed-duration library.
    lib = out / "library"
    lib.mkdir(exist_ok=True)
    paths = [
        write_wav(lib / "club_124.wav", synth_track(12.0, 124.0, 220.0, 0), 44_100) or lib / "club_124.wav",
        encode_flac(lib / "rolling_101.flac", synth_track(9.0, 101.0, 196.0, 1), 44_100),
        write_wav(lib / "fast_140.wav", synth_track(7.0, 140.0, 247.0, 2), 44_100) or lib / "fast_140.wav",
    ]

    manifest = out / "manifest.jsonl"
    t0 = time.perf_counter()
    results = analyse_library(
        [str(p) for p in paths],
        output_dir=out / "reports",          # full artefact set per track
        manifest_path=manifest,              # resumable + error-isolating
        progress_callback=lambda src, done, total: print(f"  [{done}/{total}] {Path(src).name}"),
    )
    elapsed = time.perf_counter() - t0

    # analyse_library returns one outcome per source (result | TrackFailure
    # | SkippedTrack); this fresh sweep of decodable files yields results.
    results = [r for r in results if hasattr(r, "beat")]
    print(f"\nswept {len(results)} tracks in {elapsed:.1f}s")
    for r in results:
        print(
            f"  {Path(r.audio.path).name:18s} bpm={r.beat.bpm:7.2f} "
            f"key={r.harmonic.primary_key.key:9s} "
            f"lufs={r.loudness.integrated_lufs:6.1f} "
            f"downbeats={len(r.downbeat.downbeat_times)} ({r.downbeat.source})"
        )
    print(f"artefacts under {out/'reports'}/<track>/ ; manifest at {manifest}")
    print("rerunning skips completed tracks (resume semantics).")


if __name__ == "__main__":
    main()
