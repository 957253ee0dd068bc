"""Spectral feature gates: LTAS peak within ±5 Hz of a pure tone,
centroid within ±20 Hz, broadband rolloff above 5 kHz — the reference
project's published tolerances (/root/reference/tests/test_features.py:15-58)
— enforced against the shared-spectrogram features graph."""

from __future__ import annotations

import numpy as np
import pytest

from synth import sine
from track_analyser_tpu.features import (
    analyse_features,
    compute_ltas,
    spectral_centroid_series,
    spectral_rolloff_series,
)
from track_analyser_tpu.utils import AudioInput

SR = 22_050


@pytest.mark.parametrize("freq", [440.0, 1000.0])
def test_ltas_peaks_at_tone_frequency(freq: float) -> None:
    ltas = compute_ltas(sine(freq, 1.0, SR), SR)
    peak = float(ltas.frequencies[np.argmax(ltas.magnitude)])
    assert peak == pytest.approx(freq, abs=5.0)


def test_centroid_sits_on_pure_tone() -> None:
    series = spectral_centroid_series(sine(1000.0, 1.0, SR), SR)
    assert series.mean == pytest.approx(1000.0, abs=20.0)


def test_rolloff_exceeds_five_khz_on_white_noise() -> None:
    noise = np.random.default_rng(1337).normal(size=SR).astype(np.float32)
    series = spectral_rolloff_series(noise, SR)
    assert np.all(series.values > 5000.0)


def test_aggregate_shapes_are_consistent() -> None:
    analysis = analyse_features(AudioInput(samples=sine(440.0, 1.0, SR), sample_rate=SR))
    assert analysis.ltas.frequencies.shape == analysis.ltas.magnitude.shape
    assert analysis.spectral_centroid.values.ndim == 1
    assert analysis.spectral_rolloff.values.ndim == 1
    # all three series ride one spectrogram, so frame counts agree
    assert analysis.spectral_centroid.values.size == analysis.spectral_rolloff.values.size
