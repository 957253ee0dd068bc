"""Catch-all FFmpeg decode tier (io/ffmpeg.py + native/src/ffmpeg.cpp).

The reference's ladder ends in audioread, which in practice delegates to
FFmpeg — decoding M4A/AAC/anything (reference io.py:91-116). These tests
validate the equivalent rung end-to-end by decoding an MP3 through BOTH
the libmpg123 tier and the FFmpeg tier and comparing (same probing,
decode loop, sample-format conversion and interleave machinery serves
every libavformat container), and by forcing the ladder to fall through
to the FFmpeg rung.
"""

from __future__ import annotations

import numpy as np
import pytest

from track_analyser_tpu.io import codecs, ffmpeg, mpg123


@pytest.fixture(scope="module")
def ffmpeg_lib():
    if not ffmpeg.available():
        from track_analyser_tpu.native.build import build

        if not build(verbose=False):
            pytest.skip("no C++ toolchain for the FFmpeg tier")
        ffmpeg._lib = None
    if not ffmpeg.available():
        pytest.skip("FFmpeg development libraries not present")
    return ffmpeg


@pytest.fixture(scope="module")
def mp3_path(tmp_path_factory):
    from test_mp3 import _encode_mp3

    sr = 44_100
    t = np.linspace(0, 1.0, sr, endpoint=False)
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = tmp_path_factory.mktemp("ffm") / "tone.mp3"
    if not _encode_mp3(path, tone, sr):
        pytest.skip("libmp3lame not present")
    return path, tone, sr


def test_ffmpeg_tier_decodes_and_matches_mpg123(ffmpeg_lib, mp3_path):
    path, tone, sr = mp3_path
    got = ffmpeg_lib.decode(str(path))
    assert got is not None
    data, rate, meta = got
    assert rate == sr
    assert meta["channels"] == 1
    assert data.shape[0] == 1

    # fidelity vs the source tone (lossy codec: correlate, don't equate)
    dec = data[0]
    n = min(dec.size, tone.size)
    # mp3 adds encoder delay; align by cross-correlation peak
    lag = int(np.argmax(np.correlate(dec[: sr // 2], tone[: sr // 4], "valid")))
    a = dec[lag : lag + n - lag]
    b = tone[: a.size]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert corr > 0.95

    if mpg123.available():
        data2, rate2, _ = mpg123.decode_mp3(str(path))
        assert rate2 == sr
        # both FFmpeg and mpg123 decode the same stream; allow small
        # decoder-implementation differences and delay-handling offsets
        m = min(data.shape[-1], data2.shape[-1])
        x, y = data[0, :m], np.atleast_2d(data2)[0, :m]
        denom = float(np.linalg.norm(x) * np.linalg.norm(y)) + 1e-12
        best = max(
            abs(float(np.dot(x[s : m - 2000 + s], y[: m - 2000]))) / denom
            for s in range(0, 2000, 250)
        )
        assert best > 0.9


def test_ladder_falls_through_to_ffmpeg(ffmpeg_lib, mp3_path, monkeypatch):
    """With the mpg123 tier disabled, decode_file must still succeed via
    the catch-all FFmpeg rung — the audioread-parity behaviour."""

    path, _tone, sr = mp3_path
    monkeypatch.setattr(mpg123, "available", lambda: False)
    data, rate, meta = codecs.decode_file(str(path))
    assert rate == sr and data.shape[0] == 1 and data.shape[-1] > sr // 2


def test_ladder_still_raises_on_garbage(tmp_path):
    bad = tmp_path / "noise.bin"
    bad.write_bytes(b"\x00\x01garbage-not-audio" * 10)
    with pytest.raises(RuntimeError, match="Could not decode audio file"):
        codecs.decode_file(str(bad))
