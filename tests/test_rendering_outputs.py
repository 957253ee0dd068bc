"""Schema contract test: render a hand-built TrackAnalysisResult with no
DSP and assert the artefact schemas (mirrors reference
tests/test_rendering_outputs.py — the de-facto report contract)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from track_analyser_tpu.analysis.beats import BeatAnalysis, DownbeatAnalysis
from track_analyser_tpu.analysis.loudness import LoudnessAnalysis
from track_analyser_tpu.analysis.structure import StructuralSegment, StructureAnalysis
from track_analyser_tpu.features import (
    FeatureAnalysis,
    FeatureSeries,
    LongTermAverageSpectrum,
)
from track_analyser_tpu.harmony import (
    ChordChangePoint,
    ChordHint,
    HarmonyAnalysis,
    KeyEstimate,
    MidiSuggestion,
    SpectralBalance,
    StereoImage,
)
from track_analyser_tpu.pipeline import TrackAnalysisResult
from track_analyser_tpu.rendering import outputs
from track_analyser_tpu.stereo import StereoAnalysis, StereoWidthBands
from track_analyser_tpu.utils import AudioInput


def _fake_result() -> TrackAnalysisResult:
    sr = 22_050
    t = np.linspace(0.0, 2.0, 2 * sr, endpoint=False)
    samples = (0.1 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    audio = AudioInput(samples=samples, sample_rate=sr, path="fake.wav")

    beat = BeatAnalysis(
        bpm=120.0,
        beat_times=[0.0, 0.5, 1.0, 1.5],
        beat_frames=[0, 21, 43, 64],
        confidence=0.9,
        grid=None,
        tracked_times=[0.0, 0.51, 1.02, 1.52],
    )
    downbeat = DownbeatAnalysis(
        downbeat_times=[0.0], beat_positions=[1, 2, 3, 4], source="heuristic"
    )
    segments = [
        StructuralSegment("A", "intro", 0.0, 1.0, 0.5, 1.0, 2.0, 0.33),
        StructuralSegment("B", "outro", 1.0, 2.0, 0.7, 2.0, 1.0, 0.66),
    ]
    structure = StructureAnalysis(segments=segments, novelty_curve=[0.0, 0.5, 1.0])
    loudness = LoudnessAnalysis(
        integrated_lufs=-18.0,
        short_term_lufs=[-18.0],
        momentary_lufs=[-18.0, -17.5],
        loudness_range=1.0,
        true_peak_dbfs=-15.0,
        rms_dbfs=-18.0,
    )
    notes = pd.DataFrame(
        [
            {"start": 0.0, "duration": 0.5, "pitch": 60, "velocity": 100, "channel": 0},
            {"start": 0.5, "duration": 0.5, "pitch": 64, "velocity": 90, "channel": 0},
        ]
    )
    harmonic = HarmonyAnalysis(
        spectral_balance=SpectralBalance(0.3, 0.5, 0.2),
        stereo_image=StereoImage(correlation=1.0, balance=0.0),
        primary_key=KeyEstimate("C major", 0.8),
        secondary_key=KeyEstimate("G major", 0.1),
        chord_hints=[ChordHint(0.0, "Cmaj", 1.0)],
        chord_change_points=[ChordChangePoint(1.0, 1.0)],
        hook_suggestion=MidiSuggestion(name="hook", notes=notes),
        bass_suggestion=MidiSuggestion(name="bass", notes=notes),
    )
    features = FeatureAnalysis(
        ltas=LongTermAverageSpectrum(
            frequencies=np.array([0.0, 100.0]), magnitude=np.array([0.1, 0.2])
        ),
        spectral_centroid=FeatureSeries(values=np.array([1000.0, 1010.0])),
        spectral_rolloff=FeatureSeries(values=np.array([5000.0, 5100.0])),
    )
    stereo = StereoAnalysis(
        mid_rms=0.1,
        side_rms=0.0,
        correlation=1.0,
        width=StereoWidthBands(low=0.0, mid=0.0, high=0.0),
    )
    return TrackAnalysisResult(
        audio=audio,
        beat=beat,
        downbeat=downbeat,
        structure=structure,
        loudness=loudness,
        harmonic=harmonic,
        features=features,
        stereo=stereo,
    )


def test_render_all_produces_contract_artefacts(tmp_path) -> None:
    result = _fake_result()
    report_outputs = outputs.render_all(result, tmp_path)

    # JSON schema
    assert report_outputs.json is not None
    payload = json.loads(report_outputs.json.read_text())
    assert set(payload) == {
        "audio",
        "beat",
        "downbeat",
        "structure",
        "loudness",
        "harmonic",
        "features",
        "stereo",
    }
    assert payload["beat"]["bpm"] == 120.0
    # additive tracked-beat block (drift-following DP beats)
    assert payload["beat"]["tracked"]["count"] == 4
    assert payload["beat"]["tracked"]["times"] == [0.0, 0.51, 1.02, 1.52]
    assert payload["downbeat"]["source"] == "heuristic"
    assert payload["harmonic"]["key"] == "C major"
    assert payload["structure"][0]["label"] == "A"
    assert payload["stereo"]["width"] == {"low": 0.0, "mid": 0.0, "high": 0.0}

    # CSV columns
    beats_df = pd.read_csv(report_outputs.csv["beats"])
    assert list(beats_df.columns) == ["index", "time", "frame", "is_downbeat"]
    assert beats_df["index"].tolist() == [1, 2, 3, 4]
    assert bool(beats_df["is_downbeat"].iloc[0]) is True

    sections_df = pd.read_csv(report_outputs.csv["sections"])
    assert list(sections_df.columns) == [
        "label",
        "category",
        "start",
        "end",
        "confidence",
        "percussive_energy",
        "harmonic_energy",
        "percussive_ratio",
    ]

    tracked_df = pd.read_csv(report_outputs.csv["tracked_beats"])
    assert list(tracked_df.columns) == ["index", "time"]
    assert tracked_df["time"].tolist() == [0.0, 0.51, 1.02, 1.52]

    # Plots
    for name in ("waveform_beats", "tempogram", "novelty", "ltas", "stereo_width"):
        assert report_outputs.plots[name].exists()

    # HTML + MIDI
    assert (tmp_path / "report.html").exists()
    assert "tracked beats" in (tmp_path / "report.html").read_text()
    hook = (tmp_path / "hook.mid").read_bytes()
    assert hook[:4] == b"MThd"
    assert b"MTrk" in hook


def test_midi_var_len_encoding() -> None:
    from track_analyser_tpu.rendering.midi import encode_var_len

    assert encode_var_len(0) == b"\x00"
    assert encode_var_len(0x7F) == b"\x7f"
    assert encode_var_len(0x80) == b"\x81\x00"
    assert encode_var_len(0x2000) == b"\xc0\x00"
    assert encode_var_len(0x0FFFFFFF) == b"\xff\xff\xff\x7f"


def test_padded_tempogram_matches_exact_shape() -> None:
    """The bucket-padded tempogram graph must reproduce the exact-shape
    tempogram on the valid columns in BOTH padding regimes: bucket pad
    >= win//2 frames (the ramp completes inside the bucket) and bucket
    pad < win//2 (the hand-built ramp extends into the tempogram's own
    pad region — the case a bucket-edge track length hits)."""

    import jax.numpy as jnp

    from track_analyser_tpu.ops.mel import mel_filterbank, melspectrogram_from_power
    from track_analyser_tpu.ops.onset import onset_strength_from_mel, tempogram
    from track_analyser_tpu.ops.stft import magnitude
    from track_analyser_tpu.report import _tempogram_graph
    from track_analyser_tpu.substrate import bucket_length, pad_to_bucket

    sr, hop = 8_000, 512
    rng = np.random.default_rng(3)

    # find one length per regime: padding below/above win//2 = 192 frames
    lengths = {}
    n = 70_000
    while len(lengths) < 2 and n < 3_000_000:
        pad_frames = (bucket_length(n) - n) // hop
        key = "small" if pad_frames < 192 else "large"
        lengths.setdefault(key, n)
        n += 37_001
    assert set(lengths) == {"small", "large"}, lengths

    for n in lengths.values():
        y = (rng.standard_normal(n) * 0.2).astype(np.float32)
        # strong onsets near the end make the boundary ramp matter
        y[-4 * hop :] += np.sign(rng.standard_normal(4 * hop)).astype(np.float32)

        power = magnitude(jnp.asarray(y), 2048, hop, power=2.0)
        fb = mel_filterbank(sr, 2048, 128)
        env = onset_strength_from_mel(
            melspectrogram_from_power(power, fb), n_fft=2048, hop_length=hop
        )
        want = np.asarray(tempogram(env))

        padded, f_valid = pad_to_bucket(y, hop=hop)
        got = np.asarray(
            _tempogram_graph(
                jnp.asarray(padded), jnp.asarray(y.size), sr=sr, hop_length=hop
            )
        )[:, :f_valid]
        assert want.shape[-1] == f_valid
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
