"""Codec and loader tests.

Mirrors the reference's IO test strategy (tests/test_io.py): PCM round
trips verified against an independent ground truth (the stdlib ``wave``
writer), resampling behaviour, metadata parity, and failure injection for
undecodable inputs.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np
import pytest

from track_analyser_tpu.io import decode_wav, load_audio, write_wav


def _tone(sr: int, duration: float = 0.25, freq: float = 440.0, channels: int = 1) -> np.ndarray:
    t = np.linspace(0.0, duration, int(sr * duration), endpoint=False)
    base = 0.5 * np.sin(2 * np.pi * freq * t)
    if channels == 1:
        return base.astype(np.float32)
    return np.stack([base, 0.25 * base]).astype(np.float32)


def _write_stdlib_wav(path: Path, data: np.ndarray, sr: int) -> None:
    """Independent PCM16 ground-truth writer."""

    if data.ndim == 1:
        data = data[None, :]
    pcm = np.clip(np.round(data.T * 32767.0), -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(data.shape[0])
        handle.setsampwidth(2)
        handle.setframerate(sr)
        handle.writeframes(pcm.tobytes())


def test_pcm16_roundtrip_matches_stdlib_wave(tmp_path) -> None:
    sr = 22_050
    tone = _tone(sr)
    ref_path = tmp_path / "ref.wav"
    _write_stdlib_wav(ref_path, tone, sr)

    data, rate, meta = decode_wav(ref_path)
    assert rate == sr
    assert meta["channels"] == 1
    assert meta["subtype"] == "PCM_16"
    expected = np.round(np.clip(tone, -1, 1) * 32767.0) / 32768.0
    np.testing.assert_allclose(data[0], expected, atol=1e-6)


@pytest.mark.parametrize("subtype,atol", [("PCM_16", 1 / 32767), ("PCM_24", 1 / 8388607), ("PCM_32", 1e-6), ("FLOAT", 1e-7)])
def test_wav_roundtrip_all_subtypes(tmp_path, subtype, atol) -> None:
    sr = 44_100
    tone = _tone(sr, channels=2)
    path = tmp_path / f"tone_{subtype}.wav"
    write_wav(path, tone, sr, subtype=subtype)

    data, rate, meta = decode_wav(path)
    assert rate == sr
    assert meta["channels"] == 2
    assert meta["subtype"] == subtype
    np.testing.assert_allclose(data, tone, atol=atol * 1.01)


def test_load_audio_mono_downmix_and_metadata(tmp_path) -> None:
    sr = 32_000
    tone = _tone(sr, channels=2)
    path = tmp_path / "stereo.wav"
    write_wav(path, tone, sr, subtype="FLOAT")

    mono, rate, meta = load_audio(path, mono=True)
    assert mono.ndim == 1
    assert rate == sr
    assert meta["channels"] == 2
    assert meta["file_type"] == "WAV"
    np.testing.assert_allclose(mono, tone.mean(axis=0), atol=1e-6)

    both, rate2, meta2 = load_audio(path, mono=False)
    assert both.shape[0] == 2
    assert meta2["duration"] == pytest.approx(tone.shape[1] / sr)


def test_load_audio_resamples_to_target(tmp_path) -> None:
    sr = 48_000
    tone = _tone(sr, duration=0.5)
    path = tmp_path / "tone48k.wav"
    write_wav(path, tone, sr, subtype="FLOAT")

    data, rate, meta = load_audio(path, target_sr=44_100)
    assert rate == 44_100
    assert abs(data.shape[-1] - int(0.5 * 44_100)) <= 1
    # Resampled sine keeps its RMS
    assert float(np.sqrt(np.mean(data**2))) == pytest.approx(
        float(np.sqrt(np.mean(tone**2))), rel=0.01
    )


def test_undecodable_file_raises_descriptive_error(tmp_path) -> None:
    bogus = tmp_path / "not_audio.mp3"
    bogus.write_bytes(b"\x00\x01\x02\x03 this is not audio")
    with pytest.raises(RuntimeError, match="Could not decode audio file"):
        load_audio(bogus)


def test_truncated_wav_raises(tmp_path) -> None:
    path = tmp_path / "trunc.wav"
    path.write_bytes(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(RuntimeError, match="Could not decode audio file"):
        load_audio(path)


def test_fuzzed_codec_inputs_never_escape_the_ladder(tmp_path) -> None:
    """Truncated and byte-flipped WAV/FLAC inputs must either decode
    (a partially-valid file is a valid outcome, matching the reference's
    audioread fallthrough) or raise the descriptive RuntimeError — never
    a raw struct.error/IndexError/ValueError from a parser, and never a
    native-tier crash."""

    from track_analyser_tpu.io import flac as flacmod
    from track_analyser_tpu.io.codecs import decode_file

    sr = 22_050
    t = np.arange(int(0.25 * sr)) / sr
    y = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav = tmp_path / "a.wav"
    write_wav(wav, y, sr)
    fl = tmp_path / "a.flac"
    flacmod.encode_flac(
        str(fl), (np.clip(y, -1, 1) * 32767).astype(np.int16)[None, :], sr
    )

    rng = np.random.default_rng(7)
    for src in (wav, fl):
        raw = src.read_bytes()
        cases = [raw[: int(len(raw) * f)] for f in (0.05, 0.4, 0.9)]
        for _ in range(12):
            b = bytearray(raw)
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            cases.append(bytes(b))
        for i, c in enumerate(cases):
            p = tmp_path / f"m_{src.suffix[1:]}_{i}{src.suffix}"
            p.write_bytes(c)
            try:
                data, rate, _meta = decode_file(str(p))
            except RuntimeError:
                continue  # the documented failure mode
            assert rate > 0 and data.ndim == 2  # or a genuine decode


def _write_aiff(path, samples_f32, sr, *, form=b"AIFF", comp=None, bits=16):
    """Minimal AIFF/AIFF-C writer for decoder tests."""

    import struct

    n = samples_f32.shape[-1]
    ch = 1 if samples_f32.ndim == 1 else samples_f32.shape[0]
    inter = samples_f32.reshape(ch, n).T.reshape(-1)
    if comp in (b"fl32",):
        sound = inter.astype(">f4").tobytes()
    elif comp == b"sowt":
        sound = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        sound = (np.clip(inter, -1, 1) * 32767).astype(">i2").tobytes()
    # 80-bit extended float sample rate
    import math

    e = math.floor(math.log2(sr))
    mantissa = int(sr / 2.0 ** (e - 63))
    ext = struct.pack(">HQ", 16383 + e, mantissa)
    comm = struct.pack(">hIh", ch, n, 32 if comp == b"fl32" else bits) + ext
    if comp is not None:
        comm += comp + b"\x00"  # pascal-string name omitted past padding
    ssnd = struct.pack(">II", 0, 0) + sound
    chunks = b""
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) % 2:
            chunks += b"\x00"
    form_body = form + chunks
    Path(path).write_bytes(b"FORM" + struct.pack(">I", len(form_body)) + form_body)
    return path


def test_aifc_sowt_and_float_decode_correctly(tmp_path) -> None:
    """AIFF-C compressionType must be honoured: 'sowt' (little-endian PCM,
    the macOS default) and 'fl32' are NOT big-endian integers — reading
    them as such decodes byte-swapped noise with no error. Unknown codecs
    must raise so the ladder can try the ffmpeg tier."""

    from track_analyser_tpu.io.codecs import decode_file

    sr = 22_050
    t = np.arange(int(0.2 * sr)) / sr
    y = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)

    ref, sr_be, _ = decode_file(_write_aiff(tmp_path / "be.aiff", y, sr))
    assert sr_be == sr
    np.testing.assert_allclose(ref[0], y, atol=1e-4)

    sowt, _, _ = decode_file(
        _write_aiff(tmp_path / "le.aifc", y, sr, form=b"AIFC", comp=b"sowt")
    )
    np.testing.assert_allclose(sowt[0], y, atol=1e-4)

    fl, _, meta = decode_file(
        _write_aiff(tmp_path / "f.aifc", y, sr, form=b"AIFC", comp=b"fl32")
    )
    np.testing.assert_allclose(fl[0], y, atol=1e-6)
    assert meta["subtype"] == "FLOAT"

    # unsupported codec: raises (ffmpeg tier may pick it up in decode_file's
    # caller ladder; absent that, the descriptive RuntimeError)
    bad = _write_aiff(tmp_path / "ima.aifc", y, sr, form=b"AIFC", comp=b"ima4")
    with pytest.raises(RuntimeError):
        decode_file(bad)


def test_wav_codec_cross_validates_against_scipy_fixtures() -> None:
    """Decode scipy's own exotic WAV fixtures (RIFX big-endian containers,
    EXTENSIBLE doubles, unsigned 8-bit) and compare against
    scipy.io.wavfile — independent ground truth for container/endianness
    handling. RIFX matters: at least one libavformat build silently
    misparses RIFX samples as little-endian, so the first-party codec
    must handle it before the ladder ever reaches that tier."""

    import os

    import scipy.io.tests as scipy_tests
    from scipy.io import wavfile

    from track_analyser_tpu.io.codecs import decode_file

    data_dir = Path(os.path.dirname(scipy_tests.__file__)) / "data"
    cases = [
        "test-8000Hz-be-3ch-5S-24bit.wav",  # RIFX, 24-bit packed
        "test-44100Hz-be-1ch-4bytes.wav",  # RIFX, int32
        "test-44100Hz-2ch-32bit-float-be.wav",  # RIFX, float32
        "test-48000Hz-2ch-64bit-float-le-wavex.wav",  # EXTENSIBLE double
        "test-8000Hz-le-2ch-1byteu.wav",  # unsigned 8-bit
        "test-8000Hz-le-3ch-5S-24bit.wav",  # little-endian 24-bit
    ]
    ran = 0
    for name in cases:
        p = data_dir / name
        if not p.exists():
            continue
        sr_ref, ref = wavfile.read(str(p))
        r = np.asarray(ref, dtype=np.float64)
        if ref.dtype.kind == "i":  # dtype may be big-endian ('>i4')
            r /= float(2 ** (8 * ref.dtype.itemsize - 1))
        elif ref.dtype.kind == "u":
            r = (r - 128.0) / 128.0
        r = r[None, :] if r.ndim == 1 else r.T

        data, sr, _meta = decode_file(str(p))
        assert sr == sr_ref, name
        np.testing.assert_allclose(np.asarray(data, np.float64), r, atol=2e-7, err_msg=name)
        ran += 1
    assert ran >= 4, "scipy fixture corpus unexpectedly missing"


def _cpython_audiodata() -> "Path | None":
    """Locate CPython's test/audiodata fixtures (any interpreter on the
    machine — the running one first, then other installs)."""

    import glob
    import sysconfig

    candidates = [Path(sysconfig.get_path("stdlib")) / "test" / "audiodata"]
    for pattern in (
        "/usr/local/lib/python3.*/test/audiodata",
        "/usr/lib/python3.*/test/audiodata",
        "/mnt/*/model_tools_env/*/python/install/lib/python3.*/test/audiodata",
    ):
        candidates.extend(Path(p) for p in glob.glob(pattern))
    for c in candidates:
        if (c / "pluck-pcm16.wav").exists():
            return c
    return None


_CPYTHON_AUDIO = _cpython_audiodata() or Path("/nonexistent")


@pytest.mark.skipif(not _CPYTHON_AUDIO.exists(), reason="CPython audio fixtures absent")
def test_decoder_cross_format_consistency_on_cpython_fixtures() -> None:
    """The same recording shipped as WAV/AIFF/AU at 16/24/32 bit must
    decode to the same audio across containers (within one 16-bit LSB of
    dither): first-party WAV+AIFF vs the ffmpeg tier's AU decode give a
    three-way independent cross-check of sample layout and endianness."""

    from track_analyser_tpu.io.codecs import decode_file

    decoded = {}
    for depth in ("16", "24", "32"):
        for ext in ("wav", "aiff", "au"):
            p = _CPYTHON_AUDIO / f"pluck-pcm{depth}.{ext}"
            if not p.exists():
                continue
            try:
                data, sr, _ = decode_file(str(p))
            except RuntimeError:
                continue  # e.g. no ffmpeg tier for .au in this environment
            assert sr == 11_025
            decoded[(depth, ext)] = np.asarray(data)
    assert ("16", "wav") in decoded and ("16", "aiff") in decoded
    for depth in ("16", "24", "32"):
        group = [v for (d, _), v in decoded.items() if d == depth]
        for other in group[1:]:
            m = min(group[0].shape[1], other.shape[1])
            np.testing.assert_allclose(
                group[0][:, :m], other[:, :m], atol=6e-4, err_msg=f"pcm{depth}"
            )
