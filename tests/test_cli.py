"""CLI end-to-end: flag surface, artefact routing, skip sentinels — the
reference's CLI contract (/root/reference/tests/test_cli.py behaviours)
driven through this project's click entry point on a synthesised WAV."""

from __future__ import annotations

from pathlib import Path

import pytest
from click.testing import CliRunner

from synth import sine, write_pcm16_wav
from track_analyser_tpu.cli import cli


@pytest.fixture()
def tone_wav(tmp_path) -> Path:
    return write_pcm16_wav(tmp_path / "tone.wav", 0.25 * sine(220.0, 0.5, 22_050), 22_050)


def _run(args: list[str]):
    result = CliRunner().invoke(cli, args)
    assert result.exit_code == 0, result.output
    return result


def test_help_advertises_artefact_flags() -> None:
    out = _run(["analyze", "--help"]).output
    for flag in ("--out", "--plots", "--json", "--csv"):
        assert flag in out


def test_artefacts_land_at_custom_paths(tone_wav, tmp_path) -> None:
    out_dir = tmp_path / "report"
    plots_dir = tmp_path / "plots"
    csv_dir = tmp_path / "tables"
    json_path = tmp_path / "custom" / "custom_report.json"

    _run(
        [
            "analyze", str(tone_wav),
            "--out", str(out_dir),
            "--plots", str(plots_dir),
            "--json", str(json_path),
            "--csv", str(csv_dir),
        ]
    )

    assert json_path.exists()
    for table in ("beats.csv", "sections.csv"):
        assert (csv_dir / table).exists()
    for plot in (
        "waveform_beats.png",
        "tempogram.png",
        "novelty_boundaries.png",
        "ltas.png",
        "stereo_width.png",
    ):
        assert (plots_dir / plot).exists()
    for artefact in ("report.html", "hook.mid", "bass.mid"):
        assert (out_dir / artefact).exists()


def test_skip_sentinels_suppress_artefact_families(tone_wav, tmp_path) -> None:
    out_dir = tmp_path / "out"
    _run(["analyze", str(tone_wav), "--out", str(out_dir), "--plots", "skip", "--csv", "off"])
    assert (out_dir / "report.json").exists()
    assert not (out_dir / "beats.csv").exists()
    assert not (out_dir / "tempogram.png").exists()
