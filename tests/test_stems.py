"""Stem separation tests: the DSP separator must actually separate."""

from __future__ import annotations

import numpy as np

from track_analyser_tpu.analysis.stems import separate_stems, separate_stems_arrays
from track_analyser_tpu.io import decode_wav, write_wav


def _mix(sr: int = 22_050, seconds: float = 4.0):
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    bass = 0.4 * np.sin(2 * np.pi * 80.0 * t)
    tone = 0.3 * np.sin(2 * np.pi * 880.0 * t)
    drums = np.zeros_like(t)
    for b in np.arange(0, seconds, 0.5):
        s = int(b * sr)
        e = min(t.size, s + int(0.03 * sr))
        rng = np.random.default_rng(int(b * 1000))
        drums[s:e] += rng.normal(0, 0.5, e - s) * np.exp(-np.arange(e - s) / (0.005 * sr))
    return (bass + tone + drums).astype(np.float32), bass, tone, drums, sr


def _band_energy(x: np.ndarray, sr: int, lo: float, hi: float) -> float:
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    freqs = np.fft.rfftfreq(x.size, 1.0 / sr)
    return float(spec[(freqs >= lo) & (freqs < hi)].sum())


def test_dsp_separation_splits_bands_and_transients():
    mix, bass, tone, drums, sr = _mix()
    stems = separate_stems_arrays(mix, sr)

    assert set(stems) == {"drums", "bass", "other", "vocals"}
    n = mix.size
    for s in stems.values():
        assert s.shape == (n,)

    # Bass stem holds most of the sub-250 Hz energy of the harmonic part.
    bass_low = _band_energy(stems["bass"], sr, 40, 150)
    vocals_low = _band_energy(stems["vocals"], sr, 40, 150)
    assert bass_low > 5 * vocals_low

    # The STEADY 880 Hz tone is pad-like (no temporal modulation): the
    # modulation split routes it to the "other" stem, away from bass.
    other_tone = _band_energy(stems["other"], sr, 800, 960)
    bass_tone = _band_energy(stems["bass"], sr, 800, 960)
    assert other_tone > 5 * bass_tone

    # Reconstruction: stems sum approximately back to the mix.
    recon = sum(stems.values())
    err = np.mean((recon - mix) ** 2) / (np.mean(mix**2) + 1e-12)
    assert err < 0.35


def test_separate_stems_writes_files(tmp_path):
    mix, *_rest, sr = _mix(seconds=1.0)
    src = tmp_path / "mix.wav"
    write_wav(src, mix, sr)

    bundle = separate_stems(str(src), tmp_path / "stems", seed=0)
    assert bundle is not None
    assert set(bundle.stems) == {"drums", "bass", "other", "vocals"}
    for name, path in bundle.stems.items():
        assert path.exists(), name
        data, rate, _ = decode_wav(path)
        assert rate == sr
        assert data.shape[-1] == mix.size
    # Neural path when the bundled checkpoint is present, DSP otherwise.
    assert bundle.model_name in (
        "bandsplit-masknet-v5",
        "bandsplit-masknet-v4",
        "bandsplit-masknet-v3",
        "bandsplit-masknet-v2",
        "bandsplit-masknet-v1",
        "hpss-dsp-v1",
    )


def test_separate_stems_stereo_in_stereo_out(tmp_path):
    """Stereo sources must produce 2-channel stem files whose channels
    match separating each source channel independently — the demucs
    stereo-in/stereo-out contract (reference analysis/stems.py:46-57)."""

    mix, *_rest, sr = _mix(seconds=1.0)
    rng = np.random.default_rng(7)
    left = mix
    right = (0.6 * mix + 0.05 * rng.standard_normal(mix.size)).astype(np.float32)
    stereo = np.stack([left, right])
    src = tmp_path / "mix_stereo.wav"
    write_wav(src, stereo, sr)

    bundle = separate_stems(str(src), tmp_path / "stems", seed=0)
    assert bundle is not None
    for name, path in bundle.stems.items():
        data, rate, _ = decode_wav(path)
        assert rate == sr
        assert data.shape == (2, mix.size), name

    # channel independence: stereo separation == per-channel separation
    st = separate_stems_arrays(stereo, sr)
    lt = separate_stems_arrays(left, sr)
    rt = separate_stems_arrays(right, sr)
    for name in st:
        assert st[name].shape == (2, mix.size)
        np.testing.assert_allclose(st[name][0], lt[name], atol=1e-5, err_msg=name)
        np.testing.assert_allclose(st[name][1], rt[name], atol=1e-5, err_msg=name)

    # SI-SDR parity: the stereo path's per-channel quality equals the
    # mono path's on the same channel (identical weights), so stereo
    # output is a strict capability superset.


def test_separate_stems_none_without_path(tmp_path):
    assert separate_stems(None, tmp_path) is None


def test_blend_weights_combine_neural_and_dsp():
    """Stems blend neural+DSP by the grid-searched per-stem weights;
    weight-1.0 stems pass through untouched."""

    import numpy as np

    from track_analyser_tpu.analysis.stems import (
        _BLEND_NEURAL_WEIGHT,
        _blend_with_dsp,
        separate_stems_arrays,
    )

    sr = 22_050
    t = np.arange(sr) / sr
    mix = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    neural = {name: np.full(mix.size, i + 1.0, dtype=np.float32)
              for i, name in enumerate(("drums", "bass", "other", "vocals"))}
    dsp = separate_stems_arrays(mix, sr)

    blended = _blend_with_dsp(dict(neural), mix, sr)
    for name, w in _BLEND_NEURAL_WEIGHT.items():
        if w >= 1.0:
            np.testing.assert_array_equal(blended[name], neural[name])
        else:
            np.testing.assert_allclose(
                blended[name], w * neural[name] + (1 - w) * dsp[name], atol=1e-6
            )


def test_dsp_modulation_split_routes_voice_vs_pad():
    """The harmonic mid band splits on temporal modulation: a syllabically
    amplitude-modulated tone (voice-like) lands in vocals, a steady tone
    at a different pitch (pad-like) lands in other."""

    sr = 22_050
    seconds = 4.0
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    pad = 0.3 * np.sin(2 * np.pi * 523.25 * t)  # steady C5
    am = np.clip(np.sin(2 * np.pi * 3.0 * t), 0.0, 1.0)  # 3 Hz syllables
    voice = (0.4 * am * np.sin(2 * np.pi * 987.77 * t))  # modulated B5
    mix = (pad + voice).astype(np.float32)

    stems = separate_stems_arrays(mix, sr)
    pad_in_other = _band_energy(stems["other"], sr, 480, 570)
    pad_in_vocals = _band_energy(stems["vocals"], sr, 480, 570)
    voice_in_vocals = _band_energy(stems["vocals"], sr, 940, 1040)
    voice_in_other = _band_energy(stems["other"], sr, 940, 1040)
    assert pad_in_other > 10 * pad_in_vocals
    # the soft sigmoid leaves some modulated energy in other; dominance
    # (not exclusivity) is the contract
    assert voice_in_vocals > 2 * voice_in_other
