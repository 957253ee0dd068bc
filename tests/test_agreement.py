"""Fused-vs-per-module agreement across EVERY TrackAnalysisResult field.

The fused single-dispatch substrate and the per-module graphs are two
implementations of the same contract; any field where they drift is a
bug in one of them. The fused path runs with float32 transport here so
the comparison isolates algorithmic agreement; the quantised-transport
noise budget has its own test at the bottom (and int8 has gate tests in
test_batch.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from synth import progression
from track_analyser_tpu.parallel.batch import analyse_track_fused
from track_analyser_tpu.pipeline import analyse_track
from track_analyser_tpu.utils import AudioInput

SR = 22_050


def _rich_track() -> AudioInput:
    """20 s: kick grid at 120 BPM + I-IV-V-I chords + stereo imbalance —
    enough structure that every analyzer has real decisions to make."""

    seconds = 20.0
    n = int(seconds * SR)
    t = np.arange(n) / SR

    chords = np.tile(progression([(60, "maj"), (65, "maj"), (67, "maj"), (60, "maj")], 2.5, SR), 2)[:n]
    kick = np.zeros(n, dtype=np.float32)
    for i, b in enumerate(np.arange(0.0, seconds, 0.5)):
        s = int(b * SR)
        e = min(n, s + int(0.05 * SR))
        seg = np.arange(e - s) / SR
        amp = 1.0 if i % 4 == 0 else 0.45
        kick[s:e] += amp * np.sin(2 * np.pi * (60 + 50 * np.exp(-seg * 60)) * seg) * np.exp(-seg * 40)

    left = 0.5 * chords + 0.8 * kick
    right = 0.35 * chords + 0.8 * kick + 0.05 * np.sin(2 * np.pi * 3000.0 * t)
    stereo = np.stack([left, right]).astype(np.float32)
    peak = np.abs(stereo).max()
    stereo *= 0.9 / peak
    return AudioInput(
        samples=stereo.mean(axis=0), sample_rate=SR, stereo_samples=stereo
    )


@pytest.fixture(scope="module")
def both_paths():
    audio = _rich_track()
    return (
        analyse_track_fused(audio, transport="float32"),
        analyse_track(audio, fused=False),
    )


def test_beat_fields_agree(both_paths) -> None:
    fused, module = both_paths
    # bucket padding changes FFT sizes in the autocorrelation, so the
    # parabolic/regression refinement sees ~1e-7-relative input noise
    assert fused.beat.bpm == pytest.approx(module.beat.bpm, abs=1e-3)
    assert fused.beat.confidence == pytest.approx(module.beat.confidence, abs=1e-3)
    assert len(fused.beat.beat_times) == len(module.beat.beat_times)
    np.testing.assert_allclose(fused.beat.beat_times, module.beat.beat_times, atol=1e-4)
    # DP-tracked beats: the fused path decodes from read-back f32 curves,
    # the module path from its own device pass — one half-frame snap
    # tolerance covers the float noise between them
    assert fused.beat.tracked_times is not None
    assert module.beat.tracked_times is not None
    assert len(fused.beat.tracked_times) == len(module.beat.tracked_times)
    np.testing.assert_allclose(
        fused.beat.tracked_times, module.beat.tracked_times, atol=0.012
    )


def test_downbeat_fields_agree(both_paths) -> None:
    fused, module = both_paths
    assert fused.downbeat.source == module.downbeat.source
    np.testing.assert_allclose(
        fused.downbeat.downbeat_times, module.downbeat.downbeat_times, atol=1e-4
    )
    assert fused.downbeat.beat_positions == module.downbeat.beat_positions


def test_structure_fields_agree(both_paths) -> None:
    fused, module = both_paths
    assert [s.label for s in fused.structure.segments] == [
        s.label for s in module.structure.segments
    ]
    assert [s.category for s in fused.structure.segments] == [
        s.category for s in module.structure.segments
    ]
    np.testing.assert_allclose(
        [s.start for s in fused.structure.segments],
        [s.start for s in module.structure.segments],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        [s.end for s in fused.structure.segments],
        [s.end for s in module.structure.segments],
        atol=1e-3,
    )


def test_loudness_fields_agree(both_paths) -> None:
    fused, module = both_paths
    assert fused.loudness.integrated_lufs == pytest.approx(
        module.loudness.integrated_lufs, abs=5e-3
    )
    assert fused.loudness.loudness_range == pytest.approx(
        module.loudness.loudness_range, abs=5e-3
    )
    assert fused.loudness.true_peak_dbfs == pytest.approx(
        module.loudness.true_peak_dbfs, abs=5e-3
    )
    assert fused.loudness.rms_dbfs == pytest.approx(module.loudness.rms_dbfs, abs=5e-3)
    np.testing.assert_allclose(
        fused.loudness.momentary_lufs, module.loudness.momentary_lufs, atol=2e-2
    )
    np.testing.assert_allclose(
        fused.loudness.short_term_lufs, module.loudness.short_term_lufs, atol=2e-2
    )


def test_harmony_fields_agree(both_paths) -> None:
    fused, module = both_paths
    assert fused.harmonic.primary_key.key == module.harmonic.primary_key.key
    assert fused.harmonic.secondary_key.key == module.harmonic.secondary_key.key
    assert fused.harmonic.primary_key.confidence == pytest.approx(
        module.harmonic.primary_key.confidence, abs=1e-3
    )

    assert [h.chord for h in fused.harmonic.chord_hints] == [
        h.chord for h in module.harmonic.chord_hints
    ]
    f_times = np.array([p.time for p in fused.harmonic.chord_change_points])
    m_times = np.array([p.time for p in module.harmonic.chord_change_points])
    assert f_times.size == m_times.size
    np.testing.assert_allclose(f_times, m_times, atol=1e-4)
    np.testing.assert_allclose(
        [p.strength for p in fused.harmonic.chord_change_points],
        [p.strength for p in module.harmonic.chord_change_points],
        atol=1e-2,
    )

    assert fused.harmonic.spectral_balance.low_band == pytest.approx(
        module.harmonic.spectral_balance.low_band, abs=1e-3
    )
    assert fused.harmonic.stereo_image.correlation == pytest.approx(
        module.harmonic.stereo_image.correlation, abs=1e-3
    )
    assert fused.harmonic.stereo_image.balance == pytest.approx(
        module.harmonic.stereo_image.balance, abs=1e-3
    )

    # deterministic rng + same key + same grid => identical MIDI sketches
    for attr in ("hook_suggestion", "bass_suggestion"):
        f_notes = getattr(fused.harmonic, attr).notes
        m_notes = getattr(module.harmonic, attr).notes
        assert f_notes["pitch"].tolist() == m_notes["pitch"].tolist()
        assert f_notes["velocity"].tolist() == m_notes["velocity"].tolist()


def test_features_fields_agree(both_paths) -> None:
    fused, module = both_paths
    np.testing.assert_allclose(
        fused.features.ltas.frequencies, module.features.ltas.frequencies, atol=1e-6
    )
    np.testing.assert_allclose(
        fused.features.ltas.magnitude, module.features.ltas.magnitude,
        rtol=1e-3, atol=1e-3,
    )
    assert fused.features.spectral_centroid.mean == pytest.approx(
        module.features.spectral_centroid.mean, rel=1e-3
    )
    assert fused.features.spectral_rolloff.mean == pytest.approx(
        module.features.spectral_rolloff.mean, rel=1e-3
    )


@pytest.mark.parametrize(
    "transport,bpm_tol,loud_tol,peak_tol",
    [
        ("int16", 0.1, 0.01, 0.01),
        ("int8", 0.1, 0.03, 0.05),
        ("ms", 0.1, 0.05, 0.08),
        # ms6's per-block best-of {raw, delta-error-feedback} coding
        # keeps dense-mix BPM at the float estimate (delta wins there,
        # ~46 dB SNR), so the full +-0.1 gate holds; LUFS/peak keep the
        # small extra 6-bit margins.
        ("ms6", 0.1, 0.15, 0.1),
        # ms5's 1 024-sample scale blocks keep the PUBLISHED click-grid
        # gates (worst BPM err 0.008, added grid error <=0.6 ms — vs
        # ms6's accepted 3.5 ms), and the round-5 NOISE-SHAPED delta
        # coding (quantiser target x[i] - 0.5*e[i-1], pushing the error
        # spectrum toward Nyquist and out of the mel-flux bands) holds
        # the full +-0.1 dense-mix bound this row previously pinned at
        # +-0.3: measured 0.011 here, and the lowest p90/max
        # perturbation of the float BPM estimate over a 24-draw random
        # dense ensemble (scripts/sweep_ms5_shaping.py).
        ("ms5", 0.1, 0.15, 0.1),
    ],
)
def test_quantised_transport_stays_inside_decision_margins(
    transport, bpm_tol, loud_tol, peak_tol
) -> None:
    """Quantised transports (int16 -96 dBFS; blockwise int8 ~-45 dB SNR)
    must keep measurements inside the accuracy gates and decisions
    unchanged.

    BPM is asserted against the fixture's TRUE tempo at the published
    ±0.1 gate rather than against the float estimate: the beat regression
    makes discrete onset-membership choices, so transport noise moves the
    estimate around within the gate (sometimes toward truth), and a
    delta-vs-float bound would measure that wobble, not a real error.
    """

    audio = _rich_track()
    exact = analyse_track_fused(audio, transport="float32")
    quantised = analyse_track_fused(audio, transport=transport)

    assert exact.beat.bpm == pytest.approx(120.0, abs=0.1)
    assert quantised.beat.bpm == pytest.approx(120.0, abs=bpm_tol)
    assert quantised.loudness.integrated_lufs == pytest.approx(
        exact.loudness.integrated_lufs, abs=loud_tol
    )
    assert quantised.loudness.true_peak_dbfs == pytest.approx(
        exact.loudness.true_peak_dbfs, abs=peak_tol
    )
    assert quantised.harmonic.primary_key.key == exact.harmonic.primary_key.key
    assert quantised.downbeat.source == exact.downbeat.source
    # Segment COUNT on this fixture is a near-threshold novelty decision,
    # not a robust one: the track is a uniform chord+kick loop with no
    # real structure, and adding -50 dB white noise to the FLOAT path
    # already flips 2 segments to 3 (measured; so does the default int8
    # "ms" on other fixtures). Exact equality is therefore only a
    # contract for the near-lossless transport; lossy transports must
    # stay within one segment. Decisive boundaries have their own +-0.5 s
    # gate in test_structure.
    n_exact = len(exact.structure.segments)
    n_quant = len(quantised.structure.segments)
    if transport == "int16":
        assert n_quant == n_exact
    else:
        assert abs(n_quant - n_exact) <= 1


def test_ms_transport_stereo_fields_match_float32() -> None:
    """The "ms" transport ships no side channel at all. The time-domain
    stereo scalars must be EXACT (host-computed from f64 sums of the
    source), and the host strided-frame width estimates must stay within
    a few percent of the float32 path's full-frame device estimator."""

    audio = _rich_track()
    exact = analyse_track_fused(audio, transport="float32")
    ms = analyse_track_fused(audio, transport="ms")

    # host-exact scalars: tolerance is f32->f64 accumulation, not int4
    assert ms.stereo.correlation == pytest.approx(exact.stereo.correlation, abs=1e-4)
    assert ms.stereo.mid_rms == pytest.approx(exact.stereo.mid_rms, abs=1e-5)
    assert ms.stereo.side_rms == pytest.approx(exact.stereo.side_rms, abs=1e-5)
    assert ms.harmonic.stereo_image.balance == pytest.approx(
        exact.harmonic.stereo_image.balance, abs=1e-5
    )
    for band in ("low", "mid", "high"):
        e = getattr(exact.stereo.width, band)
        m = getattr(ms.stereo.width, band)
        assert m == pytest.approx(e, rel=0.05, abs=5e-3), band


def test_stereo_fields_agree(both_paths) -> None:
    fused, module = both_paths
    assert fused.stereo.mid_rms == pytest.approx(module.stereo.mid_rms, abs=1e-4)
    assert fused.stereo.side_rms == pytest.approx(module.stereo.side_rms, abs=1e-4)
    assert fused.stereo.correlation == pytest.approx(module.stereo.correlation, abs=1e-3)
    for band in ("low", "mid", "high"):
        assert getattr(fused.stereo.width, band) == pytest.approx(
            getattr(module.stereo.width, band), abs=1e-2
        )
