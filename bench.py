"""Benchmark: full analysis of a mixed-duration stereo track library.

North-star target (BASELINE.md): < 50 ms per 3-minute track on one TPU
chip for the complete analysis (beats, downbeats, structure, loudness,
harmony, features, stereo) producing a full TrackAnalysisResult.

The headline sweeps SIX tracks of THREE distinct durations (two bucket-
distinct lengths would hide a retrace bug; identical copies would hide
everything), then normalises to 180 s of audio per track so the number
stays comparable to the north star. Prints ONE JSON line:
  {"metric": ..., "value": ms_per_180s_track, "unit": "ms", "vs_baseline": 50/ms}
(vs_baseline > 1 means faster than the target).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _make_track(seconds: float, sr: int = 44_100, bpm: float = 126.0, seed: int = 7):
    """Synthesise a club-style stereo track: kick grid + bass + chords + hats."""

    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float64) / sr
    rng = np.random.default_rng(seed)

    beat = 60.0 / bpm
    kick = np.zeros(n)
    hat = np.zeros(n)
    for i, b in enumerate(np.arange(0.0, seconds, beat)):
        s = int(b * sr)
        e = min(n, s + int(0.08 * sr))
        seg = np.arange(e - s) / sr
        kick[s:e] += np.sin(2 * np.pi * (60 + 40 * np.exp(-seg * 60)) * seg) * np.exp(-seg * 30)
        hs = int((b + beat / 2) * sr)
        he = min(n, hs + int(0.02 * sr))
        if he > hs:
            hat[hs:he] += rng.normal(0, 0.15, he - hs) * np.exp(-np.arange(he - hs) / (0.004 * sr))
    bass = 0.2 * np.sin(2 * np.pi * 55.0 * t) * (np.sin(2 * np.pi * t / 8.0) > 0)
    chords = 0.1 * (
        np.sin(2 * np.pi * 220.0 * t) + np.sin(2 * np.pi * 277.18 * t) + np.sin(2 * np.pi * 329.63 * t)
    )
    left = 0.8 * kick + bass + chords + 0.6 * hat
    right = 0.8 * kick + bass + 0.9 * chords + 0.5 * hat
    peak = max(np.abs(left).max(), np.abs(right).max())
    left, right = left / peak * 0.9, right / peak * 0.9
    stereo = np.stack([left, right]).astype(np.float32)

    from track_analyser_tpu.utils import AudioInput

    return AudioInput(samples=stereo.mean(axis=0), sample_rate=sr, stereo_samples=stereo)


def _make_sparse_minor(seconds: float = 96.0, sr: int = 44_100, bpm: float = 96.0):
    """Second warmup-assert fixture: A-minor pads with SPARSE percussion
    (soft kick every other beat) — the near-tie class the round-3 key
    sawtooth hid in (bass-heavy minor content, weak onsets). Ground
    truth pinned on the gate-green CPU path."""

    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float64) / sr
    beat = 60.0 / bpm

    def _triad(root_hz: float, third: float, fifth: float):
        return (
            np.sin(2 * np.pi * root_hz * t)
            + 0.8 * np.sin(2 * np.pi * root_hz * third * t)
            + 0.7 * np.sin(2 * np.pi * root_hz * fifth * t)
        )

    minor3, p5 = 2 ** (3 / 12), 2 ** (7 / 12)
    bar = 8 * beat
    phase = (t % (4 * bar)) / bar  # Am -> Dm -> Em -> Am, two bars each
    pads = np.where(
        phase < 1.0,
        _triad(110.0, minor3, p5),  # A minor
        np.where(
            phase < 2.0,
            _triad(146.83, minor3, p5),  # D minor
            np.where(phase < 3.0, _triad(164.81, minor3, p5), _triad(110.0, minor3, p5)),
        ),
    )
    kick = np.zeros(n)
    for i, b in enumerate(np.arange(0.0, seconds, beat)):
        if i % 2:
            continue
        s = int(b * sr)
        e = min(n, s + int(0.04 * sr))
        seg = np.arange(e - s) / sr
        kick[s:e] += 0.5 * np.sin(2 * np.pi * (55 + 45 * np.exp(-seg * 70)) * seg) * np.exp(-seg * 45)
    left = 0.35 * pads + kick
    right = 0.3 * pads + kick
    peak = max(np.abs(left).max(), np.abs(right).max())
    stereo = np.stack([left / peak * 0.9, right / peak * 0.9]).astype(np.float32)

    from track_analyser_tpu.utils import AudioInput

    return AudioInput(samples=stereo.mean(axis=0), sample_rate=sr, stereo_samples=stereo)


def _retry(label: str, fn, *, attempts: int = 3, delay_s: float = 10.0):
    """Run ``fn`` with retries on transient relay faults.

    The tunnelled TPU occasionally throws one-off runtime errors (observed:
    ``UNIMPLEMENTED: TPU backend error`` from a device_get that succeeds on
    the next attempt). The bench runs unattended once per round — a single
    transient must not zero the round's number. Real failures still raise
    after ``attempts`` tries.
    """

    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — relay faults surface many types
            if attempt == attempts:
                raise
            print(
                f"[bench] {label}: transient failure (attempt {attempt}/{attempts}): "
                f"{type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
            time.sleep(delay_s)


def main() -> None:
    from track_analyser_tpu.utils import enable_persistent_compilation_cache
    from track_analyser_tpu.parallel.batch import (
        analyse_library,
        analyse_track_fused,
        reset_upload_bytes,
        upload_bytes,
    )

    enable_persistent_compilation_cache()

    # Per-executable backend compile times: the relay compiles server-side
    # and its compile cache is day-scoped, so the SAME bench reads 20 s or
    # 400 s of warmup depending on cache state. Record every backend
    # compile so the JSON line can say whether the warmup was a cold
    # compile or a server-cache hit (VERDICT r4 #3: the number must never
    # be mistaken for cold-start).
    compile_log: list = []

    import jax.monitoring as _mon

    def _compile_listener(name: str, duration: float, **kw) -> None:
        if name == "/jax/core/compile/backend_compile_duration":
            compile_log.append(duration)

    _mon.register_event_duration_secs_listener(_compile_listener)

    # Build the native host kernels (fused pad+quantise + codec fast
    # paths) once up front — seconds of g++, then host quantise costs one
    # memory pass instead of several numpy passes per track.
    try:
        from track_analyser_tpu.native.build import build as build_native

        build_native(verbose=False)
    except Exception:
        pass

    import jax

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)
    best_bw = float("inf")  # overwritten by the link probe on accelerators

    # On-device DFT-basis probe: the MXU matmul DFT (ops/stft.py) claims
    # ~1e-5 relative error at Precision.HIGH; CPU tests can't see bf16
    # MXU behaviour, so verify it here on the real accelerator.
    if dev.platform != "cpu":
        import jax.numpy as jnp
        from track_analyser_tpu.ops.stft import _dft_rfft_matmul

        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.standard_normal((64, 2048)).astype(np.float32))

        @jax.jit
        def _probe(fr):  # stack re/im: the relay cannot fetch complex64
            spec = _dft_rfft_matmul(fr, 2048)
            return jnp.stack([spec.real, spec.imag])

        got_ri = _retry("matmul-DFT probe", lambda: jax.device_get(_probe(frames)))
        got = got_ri[0] + 1j * got_ri[1]
        want = np.fft.rfft(np.asarray(frames), axis=-1)
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        print(f"[bench] matmul-DFT max rel err vs rfft: {rel:.2e}", file=sys.stderr)
        assert rel < 5e-4, f"matmul DFT drifted: rel err {rel:.2e}"

        # Link-state probe: the sweep is upload-bound, and the relay's
        # bandwidth varies ~4x day to day (measured 14-60 MB/s). Record
        # it so cross-run bench deltas can be attributed to the link.
        probe_buf = np.zeros(8 * 1024 * 1024, dtype=np.int8)

        def _bw_probe() -> float:
            jax.device_get(jax.device_put(probe_buf[: 1 << 20], dev)[:8])  # warm the path
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                jax.device_get(jax.device_put(probe_buf, dev)[:8])
                best = max(best, 8.0 / (time.perf_counter() - t0))
            return best

        best_bw = _retry("link probe", _bw_probe)
        print(f"[bench] relay upload bandwidth ~{best_bw:.1f} MB/s", file=sys.stderr)

    # Four distinct durations (the honest shape mix — identical copies
    # would hide retrace/aliasing bugs); all share ONE tier executable,
    # and 8 tracks fill two complete device_batch=4 groups (a partial
    # group's padding lanes are device-side zeros on one-device meshes,
    # but full groups keep the headline free of even that machinery).
    durations = [181.0, 181.0, 136.0, 136.0, 96.0, 96.0, 166.0, 116.0]
    bpms = [118.0, 125.0, 111.0, 132.0, 96.0, 104.0, 122.0, 99.0]  # in-range tempos
    tracks = [
        _make_track(secs, bpm=bpms[i], seed=i) for i, secs in enumerate(durations)
    ]
    total_audio_s = sum(durations)

    # Warm up = ONE relay compile: every bench duration (96-181 s) pads
    # to the SAME tier bucket (ms_bucket_length tier grid), and the
    # single-track path dispatches through the sweep's device_batch
    # executable (device-side zero lanes, sliced off before readback) —
    # so the sweep compile covers everything. Round-3 warmup was ~4 cold
    # compiles (three geometric buckets x batch sizes) at 940 s.
    # The bench runs the least-bytes gate-clean transport: "ms5" (noise-
    # shaped 5-bit mid codes, 0.63 B per stereo sample pair — every
    # accuracy gate holds incl. the +-0.1 dense-mix BPM bound since the
    # round-5 noise-shaped delta encoder; -16% bytes vs round-4's ms6;
    # RUNBOOK has the measurement ladder). The sweep is upload-bound on
    # this relay, so bytes are the headline lever.
    bench_transport = "ms5"
    # device_batch=4: measured 55 ms/track vs 61 at batch 2 (RUNBOOK
    # round-3 per-device batching table); zero lanes are free (_ZeroChunk)
    # and the tier grid means batch-4 is still ONE executable.
    bench_batch = 4

    def _warmup():
        # sweep first (the one big compile), then the single-track path
        # (shares the executable; compiles only the tiny pad/slice jits)
        analyse_library(tracks, device_batch=bench_batch, transport=bench_transport)
        return analyse_track_fused(
            tracks[0], transport=bench_transport, device_batch=bench_batch
        )

    t0 = time.perf_counter()
    result = _retry("warmup", _warmup, delay_s=30.0)
    warm = time.perf_counter() - t0
    # Compile accounting. backend_compile events UNDER-report on the
    # axon relay: the big server-side compile is deferred and billed to
    # the first EXECUTION (measured: a traced warmup spent 221 s inside
    # the first device_get while the compile listener logged 31 s), so
    # cache state is classified by warmup WALL TIME — the quantity the
    # round comparison actually cares about. A fully warm process
    # re-runs this warmup in <30 s (it is two sweeps plus small jits);
    # the relay's same-day server cache lands ~2-4 min; a cold day
    # ~4-10 min.
    big_compiles = [d for d in compile_log if d >= 5.0]
    cache_state = (
        "cpu"
        if dev.platform == "cpu"
        else (
            "cold"
            if warm >= 300.0
            else ("server-warm" if warm >= 30.0 else "process-warm")
        )
    )
    print(
        f"[bench] warmup (one shared tier executable) {warm:.1f} s "
        f"— bpm={result.beat.bpm:.2f} "
        f"key={result.harmonic.primary_key.key} "
        f"lufs={result.loudness.integrated_lufs:.2f} "
        f"segments={len(result.structure.segments)}",
        file=sys.stderr,
    )
    print(
        f"[bench] backend compiles >=5s: "
        f"{[round(d, 1) for d in sorted(big_compiles, reverse=True)]} "
        f"(total {sum(compile_log):.1f} s over {len(compile_log)} compiles) "
        f"-> cache={cache_state}",
        file=sys.stderr,
    )

    # Accuracy gates on the warmup result — a TPU-side regression must
    # never ship under a green perf number (round-3 shipped a key flip
    # the bench printed but did not assert). Fixture ground truth:
    # 118 BPM kick grid, A-major triad chords over an A bass
    # (_make_track), ~-19.3 LUFS measured on the gate-green CPU path.
    assert abs(result.beat.bpm - 118.0) <= 0.2, f"bpm={result.beat.bpm}"
    assert result.harmonic.primary_key.key == "A major", (
        f"key={result.harmonic.primary_key.key}"
    )
    assert abs(result.loudness.integrated_lufs - (-19.34)) <= 0.5, (
        f"lufs={result.loudness.integrated_lufs}"
    )
    # CPU ground truth for this 181 s fixture: 15 segments (8 s min
    # spacing bounds the count at ~22); a collapse to one segment or a
    # runaway pick would both trip this.
    assert 3 <= len(result.structure.segments) <= 22, (
        f"segments={len(result.structure.segments)}"
    )

    # Second asserted fixture (VERDICT r4 #8): A-minor pads with SPARSE
    # percussion — the near-tie class the round-3 filterbank sawtooth
    # hid in (bass-heavy minor content, weak onsets). A filterbank or
    # transport change that flips decisions this fixture class is
    # sensitive to must fail the bench even when the A-major fixture
    # happens to be robust. Shares the tier executable (96 s pads to the
    # same 4-chunk tier), so this costs one dispatch, zero compiles.
    result2 = _retry(
        "warmup-minor",
        lambda: analyse_track_fused(
            _make_sparse_minor(), transport=bench_transport, device_batch=bench_batch
        ),
        delay_s=30.0,
    )
    print(
        f"[bench] minor-sparse fixture — bpm={result2.beat.bpm:.2f} "
        f"key={result2.harmonic.primary_key.key} "
        f"lufs={result2.loudness.integrated_lufs:.2f}",
        file=sys.stderr,
    )
    # CPU ground truth (float32 path): key "A minor", LUFS -13.61, and
    # bpm 97.50 — the true grid is 96.0 but sparse every-other-beat
    # percussion under pads sits outside the regression's envelope at
    # FLOAT too (+1.5 bias), so the pin is against the CPU path's own
    # estimate (the transport/graph must not move it), not truth.
    assert result2.harmonic.primary_key.key == "A minor", (
        f"key={result2.harmonic.primary_key.key}"
    )
    assert abs(result2.beat.bpm - 97.50) <= 0.3, f"bpm={result2.beat.bpm}"
    assert abs(result2.loudness.integrated_lufs - (-13.61)) <= 0.5, (
        f"lufs={result2.loudness.integrated_lufs}"
    )

    # Single-track latency (includes host quantise+upload). (The
    # ms/int8/int16 transports share the accuracy gates in tests but are
    # not warmed here — fewer relay compiles.)
    def _timed_single() -> float:
        t0 = time.perf_counter()
        analyse_track_fused(
            tracks[0], transport=bench_transport, device_batch=bench_batch
        )
        return time.perf_counter() - t0

    # Timing happens inside the retried callable so a transient fault's
    # failed attempt + backoff sleep never inflates the reported sample.
    lat = [_retry("single-track", _timed_single) for _ in range(4)]
    print(
        f"[bench] single-track ({bench_transport}) latency ms: "
        f"{[round(x*1e3,1) for x in lat]}",
        file=sys.stderr,
    )

    # Headline: pipelined sweep over the mixed-duration library, best-of-5
    # (relay throughput varies ~2x run to run), normalised to 180 s/track.
    sweeps = []
    sweep_bytes = []
    failures = 0
    for _ in range(5):
        reset_upload_bytes()
        t0 = time.perf_counter()
        try:
            out = analyse_library(
                tracks, device_batch=bench_batch, transport=bench_transport
            )
        except Exception as exc:  # noqa: BLE001 — tolerate isolated relay faults
            failures += 1
            print(
                f"[bench] sweep failed ({type(exc).__name__}: {exc}) — continuing",
                file=sys.stderr,
            )
            if failures >= 4:  # a persistent fault is a real failure
                raise
            time.sleep(10.0)
            continue
        sweeps.append(time.perf_counter() - t0)
        sweep_bytes.append(upload_bytes())
        assert len(out) == len(tracks)
        assert all(hasattr(r, "beat") for r in out), "sweep produced failures"
    assert len(sweeps) >= 2, "too few successful sweeps for a best-of headline"
    elapsed = min(sweeps)
    payload_bytes = sweep_bytes[int(np.argmin(sweeps))]
    ms = elapsed / (total_audio_s / 180.0) * 1e3
    # Floor math: at the probed link bandwidth, the payload alone costs
    # this many ms per 180 s of audio — the sweep's structural bound on
    # an upload-bound relay. The headline's distance above it is what
    # overlap/device/readback engineering controls.
    probe = best_bw if dev.platform != "cpu" else float("inf")
    floor_ms = (payload_bytes / (probe * 1024 * 1024)) / (total_audio_s / 180.0) * 1e3
    print(
        f"[bench] library sweeps s: {[round(s, 2) for s in sweeps]} -> "
        f"{ms:.0f} ms per 180 s of audio pipelined "
        f"({elapsed/len(tracks)*1e3:.0f} ms/track raw)",
        file=sys.stderr,
    )
    print(
        f"[bench] payload {payload_bytes/1e6:.1f} MB at ~{probe:.1f} MB/s probe "
        f"-> upload floor {floor_ms:.0f} ms per 180 s; headline sits "
        f"{ms - floor_ms:+.0f} ms above it",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "full_track_analysis_ms_per_180s_stereo_mixed_durations_pipelined",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(50.0 / ms, 3),
                # attribution fields (VERDICT r4 #1/#3): cross-round
                # deltas on a relay whose bandwidth swings 14-78 MB/s
                # are meaningless without these next to the headline.
                "probe_mb_s": round(probe, 1) if probe != float("inf") else None,
                "payload_bytes": int(payload_bytes),
                "floor_ms_per_180s": round(floor_ms, 1),
                "transport": bench_transport,
                "device_batch": bench_batch,
                "warmup_s": round(warm, 1),
                "compile_count": len(compile_log),
                "compile_s": round(sum(compile_log), 1),
                "cache": cache_state,
                "single_track_ms_best": round(min(lat) * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
