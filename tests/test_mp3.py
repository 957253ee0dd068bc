"""MP3 decode path: lossy round-trip through system lame (encode) and
mpg123 (decode) — the parity strategy the reference applies with its
embedded MP3 fixture (reference tests/test_io.py:679-726)."""

from __future__ import annotations

import ctypes
import ctypes.util
from pathlib import Path

import numpy as np
import pytest

from track_analyser_tpu.io import load_audio
from track_analyser_tpu.io import mpg123


def _encode_mp3(path: Path, pcm: np.ndarray, sr: int) -> bool:
    """Encode mono float PCM to MP3 via the system libmp3lame."""

    name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
    try:
        lame = ctypes.CDLL(name)
    except OSError:
        return False
    lame.lame_init.restype = ctypes.c_void_p
    gfp = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(gfp), sr)
    lame.lame_set_num_channels(ctypes.c_void_p(gfp), 1)
    lame.lame_set_mode(ctypes.c_void_p(gfp), 3)  # mono
    lame.lame_set_brate(ctypes.c_void_p(gfp), 128)
    if lame.lame_init_params(ctypes.c_void_p(gfp)) < 0:
        return False

    int_pcm = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
    out = ctypes.create_string_buffer(int(1.25 * int_pcm.size + 7200))
    n = lame.lame_encode_buffer(
        ctypes.c_void_p(gfp),
        int_pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        None,
        int_pcm.size,
        out,
        len(out),
    )
    if n < 0:
        return False
    data = out.raw[:n]
    n2 = lame.lame_encode_flush(ctypes.c_void_p(gfp), out, len(out))
    data += out.raw[: max(n2, 0)]
    lame.lame_close(ctypes.c_void_p(gfp))
    path.write_bytes(data)
    return True


@pytest.fixture(scope="module")
def mp3_fixture(tmp_path_factory):
    if not mpg123.available():
        pytest.skip("libmpg123 not present")
    sr = 44_100
    t = np.linspace(0, 1.0, sr, endpoint=False)
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = tmp_path_factory.mktemp("mp3") / "tone.mp3"
    if not _encode_mp3(path, tone, sr):
        pytest.skip("libmp3lame not present")
    return path, tone, sr


def test_mp3_decode_metadata_and_fidelity(mp3_fixture):
    path, tone, sr = mp3_fixture
    data, rate, meta = load_audio(path, mono=True)

    assert rate == sr
    assert meta["file_type"] == "MP3"
    assert meta["channels"] == 1
    # Within codec delay tolerance the decoded tone matches: check the
    # dominant frequency and RMS rather than sample alignment.
    spec = np.abs(np.fft.rfft(data[: sr // 2]))
    freq = np.fft.rfftfreq(sr // 2, 1 / sr)[np.argmax(spec)]
    assert abs(freq - 440.0) < 5.0
    rms = float(np.sqrt(np.mean(data**2)))
    expected_rms = float(np.sqrt(np.mean(tone**2)))
    assert rms == pytest.approx(expected_rms, rel=0.1)


def test_full_pipeline_on_mp3(mp3_fixture, tmp_path):
    path, _tone, _sr = mp3_fixture
    from track_analyser_tpu import analyse_track

    result = analyse_track(str(path), output_dir=tmp_path)
    assert result.audio.sample_rate == 44_100
    assert (tmp_path / "report.json").exists()


def test_golden_mp3_decode(tmp_path) -> None:
    """A committed byte-exact MP3 stream must decode to its committed
    waveform — guards against system-decoder behaviour drift (the
    reference embeds an MP3 fixture for the same reason)."""

    import json
    import zlib

    if not mpg123.available():
        pytest.skip("libmpg123 not present")
    golden = Path(__file__).parent / "golden" / "mp3_tiny.json"
    blob = json.loads(golden.read_text())
    f = tmp_path / "golden.mp3"
    f.write_bytes(zlib.decompress(bytes.fromhex(blob["mp3_hex_zlib"])))

    data, sr, meta = mpg123.decode_mp3(f)
    assert sr == blob["sample_rate"]
    assert meta["file_type"] == "MP3"
    expected = np.frombuffer(bytes.fromhex(blob["decoded_ch0_f32_hex"]), dtype=np.float32)
    got = data[0][:: blob["decoded_stride"]][: expected.size]
    np.testing.assert_allclose(got, expected, atol=1e-4)
