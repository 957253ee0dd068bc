"""End-to-end realism gates on a produced-sounding synthetic song.

The reference's model paths (madmom, demucs) are real-music-trained;
this build's are procedurally trained, so the realism bar is tested at
the PIPELINE level instead: one fixture combining the stressors real
material has — tempo drift (+1.5 %/min), swing, accent dynamics,
harmonic ambiguity (Am-F-C-G is the classic vi-IV-I-V / i-VI-III-VII
relative pair), sectioned arrangement and stereo production — with
gates pinned at measured-capability margins.

Documented envelope (not a bug): the beat grid is a CONSTANT-TEMPO
regression fit, exactly like the reference's (reference
src/track_analyser/tempo.py:67-93) — on drifting material both report
the best average grid, whose per-beat alignment error grows with the
drift (median ~175 ms here), while downbeat PHASE and section
boundaries stay locked. The drift-FOLLOWING capability (the
reference's optional madmom DBN path) is BeatAnalysis.tracked_times —
the DP tracker — gated separately below at ≤100 ms median.
"""

from __future__ import annotations

import numpy as np
import pytest

from synth import realistic_song
from track_analyser_tpu.parallel.batch import analyse_track_fused
from track_analyser_tpu.utils import AudioInput

SR = 22_050


@pytest.fixture(scope="module")
def song_analysis():
    stereo, beats, bar_starts, marks = realistic_song(sr=SR)
    audio = AudioInput(
        samples=stereo.mean(axis=0), sample_rate=SR, stereo_samples=stereo
    )
    return analyse_track_fused(audio), beats, bar_starts, marks


def test_song_bpm_inside_drift_envelope(song_analysis) -> None:
    result, beats, _bars, _marks = song_analysis
    dur_min = beats[-1] / 60.0
    lo, hi = 124.0, 124.0 * (1.0 + 0.015 * dur_min)
    assert lo - 0.3 <= result.beat.bpm <= hi + 0.3
    # and the constant-grid fit stays inside its documented envelope
    bt = np.asarray(result.beat.beat_times)
    d = np.abs(bt[:, None] - beats[None, :]).min(axis=1)
    assert float(np.median(d)) <= 0.300


def test_song_tracked_beats_follow_the_drift(song_analysis) -> None:
    """The DP beat tracker (BeatAnalysis.tracked_times — the madmom-DBN
    capability the constant grid lacks) must FOLLOW the +1.5 %/min tempo
    drift: median per-beat error ≤ 100 ms (measured ~11 ms vs the
    grid's ~175 ms on this fixture), with ≥ 90 % of true beats matched
    within 70 ms."""

    result, beats, _bars, _marks = song_analysis
    tracked = np.asarray(result.beat.tracked_times or [])
    assert tracked.size >= 0.9 * beats.size
    d = np.abs(tracked[:, None] - beats[None, :]).min(axis=1)
    assert float(np.median(d)) <= 0.100
    # coverage: true beats found, not just a sparse accurate subset
    d_truth = np.abs(tracked[:, None] - beats[None, :]).min(axis=0)
    assert float(np.mean(d_truth <= 0.070)) >= 0.90


def test_song_key_is_the_relative_pair(song_analysis) -> None:
    # Am-F-C-G contains exactly the C-major/A-minor pitch-class set;
    # both readings are musically defensible (and humans disagree too)
    result, *_ = song_analysis
    assert result.harmonic.primary_key.key in ("A minor", "C major")


def test_song_downbeats_lock_bar_phase(song_analysis) -> None:
    """Downbeat decisions must survive drift+swing+accents: map each
    predicted downbeat to its nearest TRUE beat; the dominant bar phase
    must be beat 1 with >= 70 % of predictions (measured 75 %; the
    constant grid's drift error is ~0.4 beat at the track edges, so
    perfect phase attribution is not reachable from grid-locked
    downbeat times)."""

    result, beats, _bars, _marks = song_analysis
    assert result.downbeat.source == "rnn"
    db = np.asarray(result.downbeat.downbeat_times)
    assert db.size >= 30
    idx = np.abs(db[:, None] - beats[None, :]).argmin(axis=1)
    counts = np.bincount(idx % 4, minlength=4)
    assert counts.argmax() == 0
    assert counts.max() / db.size >= 0.70


def test_song_sections_recovered(song_analysis) -> None:
    result, _beats, _bars, marks = song_analysis
    starts = np.array([s.start for s in result.structure.segments])
    for mark in ("groove_start", "breakdown_start", "groove2_start"):
        err = float(np.abs(starts - marks[mark]).min())
        assert err <= 0.75, f"{mark}: nearest boundary {err:.2f} s away"
    categories = {s.category for s in result.structure.segments}
    assert "groove" in categories
    assert "breakdown" in categories


def test_song_production_measurements_sane(song_analysis) -> None:
    result, *_ = song_analysis
    assert -35.0 < result.loudness.integrated_lufs < -10.0
    assert result.loudness.true_peak_dbfs < 0.0
    # stereo production: correlated but not mono, with real width
    assert 0.80 < result.stereo.correlation < 0.99
    assert result.stereo.width.mid > 0.05


def test_song_stems_track_the_arrangement() -> None:
    """Stereo-native DSP separation on the produced song: the stem set
    must be mask-complete (stems sum back to the mixture) and musically
    coherent — the drums stem's energy collapses in the drum-free
    breakdown (measured ratio ~550x; gate 50x)."""

    from synth import realistic_song
    from track_analyser_tpu.analysis.stems import separate_stems_arrays

    stereo, _beats, _bars, marks = realistic_song(sr=SR)
    stems = separate_stems_arrays(stereo, SR)
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    for v in stems.values():
        assert v.shape == stereo.shape  # stereo in -> stereo out

    recon = sum(stems.values())
    rel = float(
        np.sqrt(((recon - stereo) ** 2).mean()) / np.sqrt((stereo**2).mean())
    )
    assert rel < 1e-5

    s = lambda t: int(t * SR)  # noqa: E731
    drums = stems["drums"]
    e_groove = float(
        (drums[:, s(marks["groove_start"]) : s(marks["breakdown_start"])] ** 2).mean()
    )
    e_break = float(
        (drums[:, s(marks["breakdown_start"]) : s(marks["groove2_start"])] ** 2).mean()
    )
    assert e_groove > 50.0 * max(e_break, 1e-12)
