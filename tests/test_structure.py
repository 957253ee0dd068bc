"""Structure accuracy gate: when the drums mute at 12 s the segmenter must
place a boundary within ±0.5 s — the reference project's published
tolerance (/root/reference/tests/test_structure.py:41-43) — enforced
against the fused novelty graph (cumsum self-similarity + Pallas HPSS)."""

from __future__ import annotations

import numpy as np

from synth import beat_analysis_for, drone_with_muted_drums
from track_analyser_tpu.analysis.structure import analyse_structure
from track_analyser_tpu.utils import AudioInput

SR = 22_050


def test_drum_mute_boundary_and_segment_invariants() -> None:
    duration = 32.0
    y = drone_with_muted_drums(duration, SR, mute_span=(12.0, 20.0))
    audio = AudioInput(samples=y, sample_rate=SR)
    beat = beat_analysis_for(120.0, np.arange(0.0, duration, 0.5), SR)

    analysis = analyse_structure(audio, beat, seed=123)
    segments = analysis.segments

    # The ±0.5 s gate on the 12 s mute point.
    internal_starts = np.array([s.start for s in segments[1:]])
    assert np.any(np.abs(internal_starts - 12.0) <= 0.5)

    # Invariants: alphabetic labels, contiguous cover, intro/outro book-ends,
    # confidences in range, novelty curve present.
    assert segments[0].label == "A"
    assert segments[0].category == "intro"
    assert segments[-1].category == "outro"
    ends = np.array([s.end for s in segments[:-1]])
    starts = np.array([s.start for s in segments[1:]])
    np.testing.assert_array_equal(ends, starts)
    assert all(0.0 <= s.confidence <= 1.0 for s in segments)
    assert len(analysis.novelty_curve) > 0
