"""FLAC codec tests: lossless round-trips through the first-party
encoder/decoder (io/flac.py), ladder integration, and golden vectors.

Capability parity target: the reference decodes FLAC via soundfile
(/root/reference/src/track_analyser/io.py:72-89); this suite pins the
same behaviour onto the in-repo implementation.
"""

from __future__ import annotations

import numpy as np
import pytest

from track_analyser_tpu.io.codecs import decode_file
from track_analyser_tpu.io.flac import decode_flac, encode_flac
from track_analyser_tpu.io.loader import load_audio


def _int_samples(data: np.ndarray, bps: int) -> np.ndarray:
    full = float(1 << (bps - 1))
    return np.round(np.asarray(data, dtype=np.float64) * full).astype(np.int64)


def _musical(seconds: float, sr: int, channels: int, seed: int = 5) -> np.ndarray:
    """Tonal + noise mixture: exercises FIXED prediction and Rice coding."""

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    rows = []
    for c in range(channels):
        y = 0.5 * np.sin(2 * np.pi * (220.0 + 110.0 * c) * t)
        y += 0.05 * rng.normal(size=t.size)
        rows.append(y)
    out = np.stack(rows)
    return (out / np.max(np.abs(out)) * 0.8).astype(np.float32)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("bps", [16, 24])
def test_round_trip_is_lossless(tmp_path, channels: int, bps: int) -> None:
    sr = 44_100
    audio = _musical(0.7, sr, channels)
    path = encode_flac(tmp_path / f"rt_{channels}ch_{bps}.flac", audio, sr, bits_per_sample=bps)

    decoded, got_sr, meta = decode_flac(path)

    assert got_sr == sr
    assert meta["file_type"] == "FLAC"
    assert meta["subtype"] == f"PCM_{bps}"
    assert decoded.shape == (channels, audio.shape[1])
    # Lossless: integer samples match the quantised input exactly.
    np.testing.assert_array_equal(
        _int_samples(decoded, bps), np.clip(_int_samples(audio, bps), -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    )


def test_constant_and_silence_subframes(tmp_path) -> None:
    sr = 22_050
    flat = np.full(10_000, 0.25, dtype=np.float32)
    path = encode_flac(tmp_path / "const.flac", flat, sr)
    decoded, got_sr, _ = decode_flac(path)
    np.testing.assert_array_equal(_int_samples(decoded[0], 16), _int_samples(flat, 16))

    silent = np.zeros(5_000, dtype=np.float32)
    path = encode_flac(tmp_path / "silence.flac", silent, sr)
    decoded, _, _ = decode_flac(path)
    assert np.all(decoded == 0.0)


def test_noise_forces_high_rice_params_or_verbatim(tmp_path) -> None:
    sr = 48_000
    noise = (np.random.default_rng(0).uniform(-0.99, 0.99, size=20_000)).astype(np.float32)
    path = encode_flac(tmp_path / "noise.flac", noise, sr)
    decoded, got_sr, _ = decode_flac(path)
    assert got_sr == sr
    np.testing.assert_array_equal(_int_samples(decoded[0], 16), _int_samples(noise, 16))


def test_lpc_subframes_round_trip_losslessly(tmp_path) -> None:
    """Strongly tonal material makes the encoder pick quantised-LPC
    subframes — exercising the decoder's LPC restore path."""

    from track_analyser_tpu.io.flac import _lpc_candidate

    sr = 44_100
    t = np.arange(int(0.6 * sr)) / sr
    tone = (0.6 * np.sin(2 * np.pi * 220.0 * t) + 0.2 * np.sin(2 * np.pi * 331.0 * t)).astype(
        np.float32
    )
    ints = _int_samples(tone, 16)
    # the LPC candidate must exist and beat fixed orders on this signal
    assert _lpc_candidate(ints[:4096], 8) is not None

    path = encode_flac(tmp_path / "lpc.flac", tone, sr)
    decoded, _, _ = decode_flac(path)
    np.testing.assert_array_equal(_int_samples(decoded[0], 16), ints)


def test_mid_side_stereo_round_trips_losslessly(tmp_path) -> None:
    """Channel-assignment-10 streams exercise the mid/side reconstruction
    (including the odd-sum low bit carried by the side channel)."""

    sr = 44_100
    stereo = _musical(0.5, sr, 2)
    # force odd L+R sums so the (mid<<1)|(side&1) carry path matters
    ints = _int_samples(stereo, 16)
    ints[0, ::3] += 1
    as_float = (ints / 32768.0).astype(np.float32)

    path = encode_flac(tmp_path / "ms.flac", ints, sr, stereo_mode="mid-side")
    decoded, _, meta = decode_flac(path)
    assert meta["channels"] == 2
    np.testing.assert_array_equal(_int_samples(decoded, 16), ints)

    # and the same content via independent channels decodes identically
    path2 = encode_flac(tmp_path / "ind.flac", as_float, sr)
    decoded2, _, _ = decode_flac(path2)
    np.testing.assert_array_equal(_int_samples(decoded2, 16), ints)


def test_non_streaminfo_rates_use_explicit_field(tmp_path) -> None:
    sr = 11_025  # not in the frame-header rate table -> 16-bit field
    tone = _musical(0.3, sr, 1)
    path = encode_flac(tmp_path / "rate.flac", tone, sr)
    _, got_sr, _ = decode_flac(path)
    assert got_sr == sr


def test_codec_ladder_and_loader_integration(tmp_path) -> None:
    sr = 44_100
    stereo = _musical(0.5, sr, 2)
    path = encode_flac(tmp_path / "track.flac", stereo, sr)

    data, got_sr, meta = decode_file(path)
    assert got_sr == sr and data.shape[0] == 2

    mono, got_sr, meta = load_audio(path)
    assert mono.ndim == 1
    assert meta["channels"] == 2
    assert meta["file_type"] == "FLAC"
    np.testing.assert_allclose(mono, data.mean(axis=0), atol=1e-7)


def test_corrupt_file_raises_decode_ladder_error(tmp_path) -> None:
    bad = tmp_path / "bad.flac"
    bad.write_bytes(b"fLaC" + b"\x00" * 64)
    with pytest.raises(RuntimeError, match="Could not decode audio file"):
        decode_file(bad)


def test_truncated_stream_raises(tmp_path) -> None:
    sr = 44_100
    path = encode_flac(tmp_path / "trunc.flac", _musical(0.5, sr, 1), sr)
    blob = path.read_bytes()
    path.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(Exception):
        decode_flac(path)


def test_golden_vector_decode(tmp_path) -> None:
    """A committed byte-exact FLAC stream must decode to its committed
    samples — guards against decoder drift independent of the encoder."""

    import json
    import zlib
    from pathlib import Path

    golden = Path(__file__).parent / "golden" / "flac_tiny.json"
    blob = json.loads(golden.read_text())
    flac_bytes = zlib.decompress(bytes.fromhex(blob["flac_hex_zlib"]))
    f = tmp_path / "golden.flac"
    f.write_bytes(flac_bytes)

    decoded, sr, _ = decode_flac(f)
    assert sr == blob["sample_rate"]
    expected = np.asarray(blob["samples_int16"], dtype=np.int64)
    np.testing.assert_array_equal(_int_samples(decoded[0], 16)[: expected.size], expected)
