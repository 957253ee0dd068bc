"""Degenerate-input robustness: the graceful-degradation ladder must hold
end-to-end (reference behaviour: every module has a fallback path)."""

from __future__ import annotations

import numpy as np
import pytest

from track_analyser_tpu.pipeline import analyse_track
from track_analyser_tpu.utils import AudioInput


def _run(samples: np.ndarray, sr: int = 22_050):
    audio = AudioInput(samples=samples.astype(np.float32), sample_rate=sr)
    return analyse_track(audio)


def test_silence_analyses_without_crashing():
    result = _run(np.zeros(22_050))
    assert result.beat.bpm >= 90.0  # bpm_min fallback
    assert result.harmonic.primary_key.key  # fallback key exists
    assert result.loudness.integrated_lufs < -70.0
    assert len(result.structure.segments) >= 1
    assert np.isfinite(result.loudness.true_peak_dbfs) or result.loudness.true_peak_dbfs < 0


def test_dc_offset_signal():
    result = _run(0.5 * np.ones(22_050))
    assert np.isfinite(result.loudness.rms_dbfs)
    assert result.stereo.correlation == pytest.approx(1.0)


def test_very_short_audio():
    result = _run(0.1 * np.random.default_rng(0).normal(size=2_048))
    assert len(result.beat.beat_times) >= 1
    assert result.features.spectral_centroid.values.size >= 1


def test_stereo_audio_input_end_to_end():
    sr = 22_050
    t = np.linspace(0, 2.0, 2 * sr, endpoint=False)
    left = 0.4 * np.sin(2 * np.pi * 440 * t)
    right = 0.2 * np.sin(2 * np.pi * 330 * t)
    audio = AudioInput(
        samples=((left + right) / 2).astype(np.float32),
        sample_rate=sr,
        stereo_samples=np.stack([left, right]).astype(np.float32),
    )
    result = analyse_track(audio)
    assert result.stereo.side_rms > 0.0
    assert -1.0 <= result.stereo.correlation <= 1.0
    assert result.harmonic.stereo_image.balance != 0.0


def test_fused_and_module_paths_agree():
    sr = 22_050
    t = np.linspace(0, 4.0, 4 * sr, endpoint=False)
    y = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for b in np.arange(0, 4.0, 0.5):
        s = int(b * sr)
        e = min(y.size, s + 220)
        y[s:e] += np.exp(-np.linspace(0, 6, e - s)).astype(np.float32)
    audio = AudioInput(samples=y, sample_rate=sr)

    # float32 transport isolates ALGORITHMIC agreement; the default
    # quantised transport's noise budget has its own gate tests
    # (test_agreement.py, test_batch.py)
    fused = analyse_track(audio, fused=True, transport="float32")
    module = analyse_track(audio, fused=False)

    assert fused.beat.bpm == pytest.approx(module.beat.bpm, abs=1e-6)
    assert fused.loudness.integrated_lufs == pytest.approx(
        module.loudness.integrated_lufs, abs=2e-3
    )
    assert fused.harmonic.primary_key.key == module.harmonic.primary_key.key
    assert len(fused.structure.segments) == len(module.structure.segments)
