"""Native decoder tier: build it, then assert bit-parity with the numpy
codec on every supported WAV subtype."""

from __future__ import annotations

import numpy as np
import pytest

from track_analyser_tpu.io import decode_wav, write_wav
from track_analyser_tpu.native import binding
from track_analyser_tpu.native.build import build


@pytest.fixture(scope="module")
def native_lib():
    if not binding.available():
        if not build(verbose=False):
            pytest.skip("no C++ toolchain available")
        binding._lib = None  # force reload after fresh build
    if not binding.available():
        pytest.skip("native library failed to load")
    return binding


@pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "PCM_32", "FLOAT"])
def test_native_decode_matches_numpy_codec(tmp_path, native_lib, subtype):
    sr = 44_100
    t = np.linspace(0, 0.25, int(sr * 0.25), endpoint=False)
    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 220 * t)]
    ).astype(np.float32)
    path = tmp_path / f"tone_{subtype}.wav"
    write_wav(path, stereo, sr, subtype=subtype)

    np_data, np_sr, np_meta = decode_wav(path)
    result = native_lib.decode(str(path))
    assert result is not None
    na_data, na_sr, na_meta = result

    assert na_sr == np_sr
    assert na_meta["channels"] == np_meta["channels"]
    assert na_meta["subtype"] == np_meta["subtype"]
    np.testing.assert_allclose(na_data, np_data, atol=1e-7)


def test_native_declines_garbage(tmp_path, native_lib):
    bogus = tmp_path / "bogus.wav"
    bogus.write_bytes(b"not a wav at all")
    assert native_lib.decode(str(bogus)) is None


def test_native_quantisers_match_numpy_bitwise(native_lib) -> None:
    """The transport quantisers must be drop-in: bit-identical payloads
    to the numpy path in parallel/batch.py (same truncation, same
    blockwise scales, same padding)."""

    if not binding.has_transport():
        if not build(verbose=False):
            pytest.skip("no C++ toolchain available")
        binding._lib = None
    if not binding.has_transport():
        pytest.skip("native transport kernels unavailable")

    from track_analyser_tpu.parallel import batch as B
    from track_analyser_tpu.utils import AudioInput

    rng = np.random.default_rng(11)
    n, n_bucket = 200_000, 262_144
    stereo = rng.normal(0, 0.4, (2, n)).astype(np.float32)
    audio = AudioInput(samples=stereo.mean(0), sample_rate=44_100, stereo_samples=stereo)

    padded, _ = B._pad_track(audio, n_bucket)
    ref_vals, ref_scales = B._quantise_i8(padded.copy())
    nat_vals, nat_scales = binding.quantise_i8(stereo, n_bucket, B._I8_BLOCK)
    np.testing.assert_array_equal(nat_vals, ref_vals)
    np.testing.assert_array_equal(nat_scales, ref_scales)

    padded, _ = B._pad_track(audio, n_bucket)
    ref16 = B._quantise_i16(padded.copy())
    np.testing.assert_array_equal(binding.quantise_i16_stereo(stereo, n_bucket), ref16)

    # mono duplication path
    mono = stereo[0]
    mono_audio = AudioInput(samples=mono, sample_rate=44_100)
    padded, _ = B._pad_track(mono_audio, n_bucket)
    ref_vals, ref_scales = B._quantise_i8(padded.copy())
    nat_vals, nat_scales = binding.quantise_i8(mono, n_bucket, B._I8_BLOCK)
    np.testing.assert_array_equal(nat_vals, ref_vals)
    np.testing.assert_array_equal(nat_scales, ref_scales)


def test_native_ms_quantiser_matches_numpy(native_lib) -> None:
    """The fused mid/side kernel must be a drop-in for the numpy path:
    same int8 mid, same packed int4 side codes, same scales, same noise
    estimate, and exact (f64) stereo statistics.

    Codes may differ by 1 where a scaled sample lands exactly on a .5
    step (rint order-of-operations wobble); anything more is a real
    divergence."""

    if not binding.has_transport() or not getattr(binding._load(), "ta_has_ms", False):
        if not build(verbose=False):
            pytest.skip("no C++ toolchain available")
        binding._lib = None
    if not getattr(binding._load(), "ta_has_ms", False):
        pytest.skip("native ms kernel unavailable")

    from track_analyser_tpu.parallel import batch as B

    rng = np.random.default_rng(5)
    block = B._I8_BLOCK
    for n_ch, n in [(2, 3 * block + 12_345), (1, block // 2)]:
        n_bucket = ((n + block - 1) // block) * block
        x = (rng.normal(0, 0.2, (n_ch, n)) * np.linspace(0.2, 1.0, n)).astype(np.float32)
        padded = np.zeros((2, n_bucket), dtype=np.float32)
        padded[0, :n] = x[0]
        padded[1, :n] = x[-1]
        ref = B._quantise_ms(padded, n)
        nat = binding.quantise_ms(x, n_bucket, block)
        assert nat is not None
        for name, a, b in zip(
            ("mid", "mid_scales", "side", "side_scales", "noise", "stats"), nat, ref
        ):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype in (np.int8, np.uint8):
                deltas = np.abs(a.astype(np.int32) - b.astype(np.int32))
                assert deltas.max() <= 1 and np.mean(a != b) < 1e-3, name
            else:
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-12, err_msg=name)


def test_native_quantise_mid_matches_ms_and_numpy(native_lib) -> None:
    """ta_quantise_mid (the production ms staging kernel) must be
    bitwise identical to the mid/scales/stats of ta_quantise_ms and
    match the numpy _quantise_mid_range fallback."""

    if not getattr(binding._load(), "ta_has_mid", False):
        if not build(verbose=False):
            pytest.skip("no C++ toolchain available")
        binding._lib = None
    if not getattr(binding._load(), "ta_has_mid", False):
        pytest.skip("native mid kernel unavailable")

    from track_analyser_tpu.parallel import batch as B

    rng = np.random.default_rng(11)
    block = B._I8_BLOCK
    for n_ch, n in [(2, 2 * block + 54_321), (1, block + 7)]:
        n_bucket = ((n + block - 1) // block) * block
        x = (rng.normal(0, 0.3, (n_ch, n)) * np.linspace(1.0, 0.1, n)).astype(np.float32)
        mid = binding.quantise_mid(x, n_bucket, block)
        full = binding.quantise_ms(x, n_bucket, block)
        assert mid is not None and full is not None
        np.testing.assert_array_equal(mid[0], full[0], err_msg="mid codes")
        np.testing.assert_array_equal(mid[1], full[1], err_msg="mid scales")
        np.testing.assert_array_equal(mid[2], full[5], err_msg="stats")

        ref_mid, ref_scales, ref_stats = B._quantise_mid_range(x, n, 0, n_bucket)
        deltas = np.abs(mid[0].astype(np.int32) - ref_mid.astype(np.int32))
        assert deltas.max() <= 1 and np.mean(mid[0] != ref_mid) < 1e-3
        np.testing.assert_allclose(mid[1], ref_scales, rtol=1e-6, atol=0)
        np.testing.assert_allclose(mid[2], ref_stats, rtol=1e-9, atol=1e-12)


def test_native_flac_matches_python_bitwise(native_lib, tmp_path) -> None:
    """The native FLAC fast path must decode byte-identically to the
    numpy reference decoder across subframe types and stereo modes."""

    if not getattr(binding._load(), "ta_has_flac", False):
        if not build(verbose=False):
            pytest.skip("no C++ toolchain available")
        binding._lib = None
    if not getattr(binding._load(), "ta_has_flac", False):
        pytest.skip("native FLAC unavailable")

    from track_analyser_tpu.io.flac import decode_flac, encode_flac

    rng = np.random.default_rng(3)
    sr = 44_100
    t = np.arange(int(0.8 * sr)) / sr
    tone = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.04 * rng.normal(size=t.size)
    stereo = np.stack([tone, 0.8 * tone + 0.02 * rng.normal(size=t.size)]).astype(np.float32)

    for name, data, kwargs in (
        ("mono16", tone.astype(np.float32), {}),
        ("stereo16", stereo, {}),
        ("stereo_ms", stereo, {"stereo_mode": "mid-side"}),
        ("mono24", tone.astype(np.float32), {"bits_per_sample": 24}),
    ):
        path = encode_flac(tmp_path / f"{name}.flac", data, sr, **kwargs)
        py_data, py_sr, py_meta = decode_flac(path)
        nat = binding.decode_flac(str(path))
        assert nat is not None, name
        nat_data, nat_sr, nat_meta = nat
        assert nat_sr == py_sr
        assert nat_meta["channels"] == py_meta["channels"]
        assert nat_meta["subtype"] == py_meta["subtype"]
        np.testing.assert_array_equal(nat_data, py_data, err_msg=name)
