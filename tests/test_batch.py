"""Batched library analysis + batch CLI + stage-timer observability."""

from __future__ import annotations

import math
import wave
from pathlib import Path

import numpy as np
from click.testing import CliRunner

from track_analyser_tpu.cli import cli


def _write_tone(path: Path, freq: float = 220.0, sr: int = 22_050, duration: float = 0.5) -> None:
    n = int(sr * duration)
    t = np.linspace(0.0, duration, n, endpoint=False)
    pcm = (0.25 * np.sin(2 * math.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(sr)
        handle.writeframes(pcm.tobytes())


def test_analyze_batch_cli(tmp_path) -> None:
    paths = []
    for i, f in enumerate((220.0, 440.0)):
        p = tmp_path / f"tone{i}.wav"
        _write_tone(p, f)
        paths.append(str(p))
    out = tmp_path / "lib"
    manifest = tmp_path / "manifest.jsonl"

    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["analyze-batch", *paths, "--out", str(out), "--manifest", str(manifest)],
    )
    assert result.exit_code == 0, result.output
    for i in range(2):
        track_dir = out / f"tone{i}"
        assert (track_dir / "report.json").exists()
        assert (track_dir / "hook.mid").exists()
    assert len(manifest.read_text().splitlines()) == 2

    # Resume: nothing left to do, exits cleanly.
    result2 = runner.invoke(
        cli,
        ["analyze-batch", *paths, "--out", str(out), "--manifest", str(manifest)],
    )
    assert result2.exit_code == 0, result2.output
    assert len(manifest.read_text().splitlines()) == 2


def test_stage_timer_wraps_progress_callback(tmp_path) -> None:
    from track_analyser_tpu.pipeline import analyse_track
    from track_analyser_tpu.profiling import StageTimer
    from track_analyser_tpu.utils import AudioInput

    sr = 22_050
    t = np.linspace(0, 1.0, sr, endpoint=False)
    audio = AudioInput(
        samples=(0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sample_rate=sr
    )

    timer = StageTimer()
    seen = []
    analyse_track(audio, progress_callback=timer.callback(seen.append))
    assert seen[: 2] == ["audio", "beats"]
    assert set(timer.durations) >= {"audio", "beats", "structure", "loudness"}
    assert timer.total > 0
    assert "total" in timer.report()
