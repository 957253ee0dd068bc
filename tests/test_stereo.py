"""Stereo-image property gates (reference behaviours:
/root/reference/tests/test_stereo.py — mono duplication collapses
side/width, constant channels correlate at 1.0), enforced against the
jitted M/S width graph."""

from __future__ import annotations

import numpy as np
import pytest

from synth import sine
from track_analyser_tpu.stereo import (
    analyse_stereo,
    frequency_dependent_width,
    mid_side_rms,
    mono_compatibility_correlation,
)
from track_analyser_tpu.utils import AudioInput

SR = 22_050


def test_duplicated_mono_has_no_side_image() -> None:
    analysis = analyse_stereo(AudioInput(samples=sine(440.0, 1.0, SR), sample_rate=SR))
    assert analysis.side_rms == pytest.approx(0.0, abs=1e-6)
    assert analysis.correlation == pytest.approx(1.0, abs=1e-6)
    for band in (analysis.width.low, analysis.width.mid, analysis.width.high):
        assert band == pytest.approx(0.0, abs=1e-6)


def test_level_imbalance_creates_side_energy_below_mid() -> None:
    left = sine(440.0, 1.0, SR)
    mid, side = mid_side_rms(np.vstack([left, 0.5 * left]))
    assert mid > side > 0.0


def test_quadrature_phase_widens_some_band() -> None:
    t = np.arange(SR) / SR
    left = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    right = np.sin(2 * np.pi * 440.0 * t + np.pi / 2).astype(np.float32)
    width = frequency_dependent_width(np.vstack([left, right]), SR)
    assert min(width.low, width.mid, width.high) >= 0.0
    assert max(width.low, width.mid, width.high) > 0.0


def test_constant_channels_report_unity_correlation() -> None:
    flat = np.ones(10, dtype=np.float32)
    assert mono_compatibility_correlation(np.vstack([flat, flat])) == pytest.approx(1.0)
