"""Loudness regression tests (tolerances from the reference suite:
tests/test_loudness.py — integrated LUFS +-0.3, true peak +-0.2 dB)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from track_analyser_tpu.analysis.loudness import (
    analyse_loudness,
    measure_loudness,
    true_peak_dbtp,
)
from track_analyser_tpu.utils import AudioInput


def _generate_minus_18_dbfs_sine(
    sample_rate: int = 44_100,
    duration: float = 1.0,
    frequency: float = 1000.0,
) -> np.ndarray:
    time = np.linspace(0.0, duration, int(sample_rate * duration), endpoint=False)
    rms_amplitude = 10 ** (-18.0 / 20.0)
    peak_amplitude = rms_amplitude * math.sqrt(2.0)
    return (peak_amplitude * np.sin(2.0 * np.pi * frequency * time)).astype(np.float32)


def test_measure_loudness_matches_expected_values() -> None:
    sample_rate = 48_000
    samples = _generate_minus_18_dbfs_sine(sample_rate=sample_rate)

    integrated, short_term, momentary, lra = measure_loudness(samples, sample_rate)

    assert integrated == pytest.approx(-18.0, abs=0.3)
    assert short_term
    assert momentary


def test_true_peak_dbtp_polyphase_oversampling() -> None:
    sample_rate = 44_100
    samples = _generate_minus_18_dbfs_sine(sample_rate=sample_rate)
    expected = 20.0 * math.log10(float(np.max(np.abs(samples))))

    true_peak = true_peak_dbtp(samples, sample_rate, oversample=8)

    assert true_peak == pytest.approx(expected, abs=0.2)


def test_analyse_loudness_uses_helpers() -> None:
    sample_rate = 48_000
    samples = _generate_minus_18_dbfs_sine(sample_rate=sample_rate)
    audio = AudioInput(samples=samples, sample_rate=sample_rate)

    result = analyse_loudness(audio, seed=0)
    expected_integrated, expected_short, expected_momentary, expected_lra = (
        measure_loudness(samples, sample_rate)
    )
    expected_true_peak = true_peak_dbtp(samples, sample_rate)

    assert result.integrated_lufs == pytest.approx(expected_integrated, abs=1e-6)
    assert result.short_term_lufs == expected_short
    assert result.momentary_lufs == expected_momentary
    assert result.loudness_range == pytest.approx(expected_lra, abs=1e-6)
    assert result.true_peak_dbfs == pytest.approx(expected_true_peak, abs=1e-6)


def test_integrated_lufs_gates_out_silence() -> None:
    """Gating must ignore silent passages (BS.1770 absolute gate)."""

    sample_rate = 48_000
    tone = _generate_minus_18_dbfs_sine(sample_rate=sample_rate, duration=2.0)
    padded = np.concatenate([tone, np.zeros(sample_rate * 2, dtype=np.float32)])
    integrated, _, _, _ = measure_loudness(padded, sample_rate)
    assert integrated == pytest.approx(-18.0, abs=0.4)
