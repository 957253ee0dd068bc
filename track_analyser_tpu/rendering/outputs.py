"""Rendering helpers: HTML report + MIDI suggestions + report artefacts.

Parity surface with the reference (rendering/outputs.py:20-77): render_all
produces report.json / CSVs / plots (via report.py), report.html, hook.mid
and bass.mid.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from .. import report as report_module
from ..pipeline import TrackAnalysisResult
from .midi import write_midi

__all__ = ["render_all"]


def render_all(
    result: TrackAnalysisResult,
    output_dir: Path,
    *,
    report_request: "report_module.ReportRequest | None" = None,
) -> report_module.ReportOutputs:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    report_outputs = report_module.generate_report(result, output_dir, report_request)
    _write_html_report(result, output_dir / "report.html")
    _write_midi(result.harmonic.hook_suggestion, output_dir / "hook.mid")
    _write_midi(result.harmonic.bass_suggestion, output_dir / "bass.mid")
    return report_outputs


def _write_html_report(result: TrackAnalysisResult, path: Path) -> None:
    rows = "".join(
        f"<tr><td>{seg.label}</td><td>{seg.start:.2f}</td><td>{seg.end:.2f}</td><td>{seg.confidence:.2f}</td></tr>"
        for seg in result.structure.segments
    )
    html = f"""
    <html>
    <head>
        <meta charset='utf-8'/>
        <title>Track Analysis Report</title>
        <style>
            body {{ font-family: Arial, sans-serif; margin: 2rem; }}
            table {{ border-collapse: collapse; width: 100%; }}
            th, td {{ border: 1px solid #ccc; padding: 0.5rem; text-align: left; }}
        </style>
    </head>
    <body>
        <h1>Track Analysis Report</h1>
        <p><strong>Audio:</strong> {result.audio.path or "In-memory"} ({result.audio.duration:.2f}s)</p>
        <p><strong>BPM:</strong> {result.beat.bpm:.2f} (confidence {result.beat.confidence:.2f})</p>
        <p><strong>Key:</strong> {result.harmonic.primary_key.key} (confidence {result.harmonic.primary_key.confidence:.2f})</p>
        <p><strong>Second choice:</strong> {result.harmonic.secondary_key.key} (confidence {result.harmonic.secondary_key.confidence:.2f})</p>
        <h2>Spectral features</h2>
        <p><strong>Mean spectral centroid:</strong> {result.features.spectral_centroid.mean:.2f} Hz</p>
        <p><strong>Mean spectral roll-off:</strong> {result.features.spectral_rolloff.mean:.2f} Hz</p>
        <h2>Stereo image</h2>
        <p><strong>Mid RMS:</strong> {result.stereo.mid_rms:.4f}</p>
        <p><strong>Side RMS:</strong> {result.stereo.side_rms:.4f}</p>
        <p><strong>Correlation:</strong> {result.stereo.correlation:.2f}</p>
        <table>
            <tr><th>Band</th><th>Width</th></tr>
            <tr><td>Low</td><td>{result.stereo.width.low:.3f}</td></tr>
            <tr><td>Mid</td><td>{result.stereo.width.mid:.3f}</td></tr>
            <tr><td>High</td><td>{result.stereo.width.high:.3f}</td></tr>
        </table>
        <h2>Structure</h2>
        <table>
            <tr><th>Label</th><th>Start</th><th>End</th><th>Confidence</th></tr>
            {rows}
        </table>
    </body>
    </html>
    """
    path.write_text(html, encoding="utf-8")


def _write_midi(suggestion: Optional[object], path: Path) -> None:
    if suggestion is None:
        return
    if suggestion.notes.empty:
        return
    write_midi(suggestion.notes, path)
