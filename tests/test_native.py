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
