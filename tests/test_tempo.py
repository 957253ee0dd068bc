"""Tempo accuracy gates: BPM within ±0.1 and beat grid within 5 ms of a
noisy click track — the reference project's published tolerances
(/root/reference/tests/test_tempo.py:39-53), enforced here against the
jitted onset/autocorrelation path."""

from __future__ import annotations

import numpy as np
import pytest

from synth import click_grid
from track_analyser_tpu.tempo import beat_grid, estimate_bpm

SR = 48_000
BPM = 120.0
N_BEATS = 64 * 4  # 64 bars of 4/4


@pytest.fixture(scope="module")
def noisy_click():
    y, truth = click_grid(BPM, N_BEATS, SR, noise_db=-34.0, seed=1234)
    return y, truth


def test_bpm_within_a_tenth(noisy_click) -> None:
    y, _ = noisy_click
    assert estimate_bpm(y, SR) == pytest.approx(BPM, abs=0.1)


def test_grid_alignment_under_five_ms(noisy_click) -> None:
    y, truth = noisy_click
    grid = beat_grid(y, SR)
    assert grid.shape[0] >= truth.size
    fitted = grid["time"].to_numpy()[: truth.size]
    assert float(np.max(np.abs(fitted - truth))) <= 0.005


def test_grid_schema_and_bar_numbering() -> None:
    y, _ = click_grid(BPM, 8 * 4, SR, noise_db=-34.0)
    grid = beat_grid(y, SR)
    assert list(grid.columns) == ["time", "frame", "bar", "beat", "is_downbeat"]
    # 4/4 numbering: beats cycle 1..4, downbeats open each bar.
    beats = grid["beat"].to_numpy()
    assert beats[0] == 1
    np.testing.assert_array_equal(beats[:8], [1, 2, 3, 4, 1, 2, 3, 4])
    np.testing.assert_array_equal(
        grid["is_downbeat"].to_numpy()[:8], beats[:8] == 1
    )
    assert grid["bar"].to_numpy()[4] == 2
