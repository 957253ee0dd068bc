"""ctypes binding to the native decoder library (optional fast path).

The shared library is built from native/src via ``python -m
track_analyser_tpu.native.build``; when absent, the pure-numpy codecs in
io/codecs.py are authoritative.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_LIB_NAME = "libta_native.so"
_lib: "ctypes.CDLL | None | bool" = None  # None = not tried, False = unavailable


def _load() -> "ctypes.CDLL | None":
    global _lib
    if _lib is None:
        path = Path(__file__).parent / _LIB_NAME
        if not path.exists():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(str(path))
            lib.ta_decode_wav.restype = ctypes.c_int
            lib.ta_decode_wav.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_longlong),  # frames
                ctypes.POINTER(ctypes.c_int),  # channels
                ctypes.POINTER(ctypes.c_int),  # sample rate
                ctypes.POINTER(ctypes.c_int),  # subtype code
            ]
            lib.ta_free.restype = None
            lib.ta_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            try:
                lib.ta_decode_flac.restype = ctypes.c_int
                lib.ta_decode_flac.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.c_longlong),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.ta_has_flac = True
            except AttributeError:
                lib.ta_has_flac = False
            # Transport quantisers are present in libraries built after
            # round 2; older builds simply don't expose them.
            try:
                lib.ta_quantise_i8.restype = None
                lib.ta_quantise_i8.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.ta_quantise_i16_stereo.restype = None
                lib.ta_quantise_i16_stereo.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_int16),
                ]
                lib.ta_has_transport = True
            except AttributeError:
                lib.ta_has_transport = False
            try:
                lib.ta_quantise_ms.restype = None
                lib.ta_quantise_ms.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_double),
                ]
                lib.ta_has_ms = True
            except AttributeError:
                lib.ta_has_ms = False
            try:
                lib.ta_quantise_mid.restype = None
                lib.ta_quantise_mid.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_double),
                ]
                lib.ta_has_mid = True
            except AttributeError:
                lib.ta_has_mid = False
            try:
                lib.ta_quantise_mid6.restype = None
                lib.ta_quantise_mid6.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_float,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.ta_has_mid6 = True
            except AttributeError:
                lib.ta_has_mid6 = False
            try:
                lib.ta_quantise_mid5.restype = None
                lib.ta_quantise_mid5.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.c_float,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.ta_has_mid5 = True
            except AttributeError:
                lib.ta_has_mid5 = False
            _lib = lib
        except OSError:
            _lib = False
            return None
    return _lib if _lib else None


def available() -> bool:
    return _load() is not None


_SUBTYPES = {1: "PCM_16", 2: "PCM_24", 3: "PCM_32", 4: "FLOAT", 5: "DOUBLE", 6: "PCM_U8"}


def decode(path: str) -> Optional[Tuple[np.ndarray, int, Dict[str, object]]]:
    """Decode via the native library; None if it declines the file."""

    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_longlong(0)
    channels = ctypes.c_int(0)
    sr = ctypes.c_int(0)
    subtype = ctypes.c_int(0)
    rc = lib.ta_decode_wav(
        path.encode(),
        ctypes.byref(buf),
        ctypes.byref(frames),
        ctypes.byref(channels),
        ctypes.byref(sr),
        ctypes.byref(subtype),
    )
    if rc != 0:
        return None
    try:
        n = frames.value * channels.value
        flat = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.ta_free(buf)
    data = flat.reshape(frames.value, channels.value).T.copy()
    meta: Dict[str, object] = {
        "channels": channels.value,
        "duration": frames.value / float(sr.value) if sr.value else 0.0,
        "file_type": "WAV",
        "subtype": _SUBTYPES.get(subtype.value, "UNKNOWN"),
    }
    return data, sr.value, meta


def has_transport() -> bool:
    lib = _load()
    return bool(lib is not None and getattr(lib, "ta_has_transport", False))


def _as_c_float(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def quantise_i8(
    channels: np.ndarray, n_bucket: int, block: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused pad+blockwise-int8 quantise of a (1|2, n) float32 signal.

    Returns (vals (2, n_bucket) int8, scales (2, n_bucket/block) f32), or
    None when the native library lacks the transport kernels. Output
    matches the numpy path in parallel/batch.py.
    """

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_transport", False):
        return None
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    vals = np.empty((2, n_bucket), dtype=np.int8)
    scales = np.empty((2, n_bucket // block), dtype=np.float32)
    lib.ta_quantise_i8(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        ctypes.c_longlong(block),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return vals, scales


def quantise_i16_stereo(channels: np.ndarray, n_bucket: int) -> Optional[np.ndarray]:
    """Fused pad+int16 quantise of a (1|2, n) float32 signal -> (2, n_bucket)."""

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_transport", False):
        return None
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    out = np.empty((2, n_bucket), dtype=np.int16)
    lib.ta_quantise_i16_stereo(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out


def quantise_ms(
    channels: np.ndarray, n_bucket: int, block: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.float32, np.ndarray]]:
    """Fused pad + mid/side quantise + exact stereo stats in ONE pass.

    Returns (mid_i8 (n_bucket,), mid_scales (n_bucket/block,) f32,
    side_u4 (n_bucket/2,) uint8, side_scales f32, noise_power f32,
    stats (8,) f64), or None when the library lacks the kernel. Output
    matches the numpy path (_quantise_ms) in parallel/batch.py.
    """

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_ms", False):
        return None
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    mid = np.empty(n_bucket, dtype=np.int8)
    mid_scales = np.empty(n_bucket // block, dtype=np.float32)
    side = np.empty(n_bucket // 2, dtype=np.uint8)
    side_scales = np.empty(n_bucket // block, dtype=np.float32)
    noise = np.empty(1, dtype=np.float32)
    stats = np.empty(8, dtype=np.float64)
    lib.ta_quantise_ms(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        ctypes.c_longlong(block),
        mid.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        mid_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        side.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        side_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        noise.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return mid, mid_scales, side, side_scales, np.float32(noise[0]), stats


def quantise_mid(
    channels: np.ndarray, n_bucket: int, block: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Mid-only fused pad + quantise + exact stereo stats in ONE pass.

    The production "ms" transport ships only the mid channel, so this
    skips ta_quantise_ms's retired int4 side passes. Returns
    (mid_i8 (n_bucket,), mid_scales (n_bucket/block,) f32, stats (8,)
    f64) — bitwise identical to the corresponding ta_quantise_ms
    outputs — or None when the library lacks the kernel.
    """

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_mid", False):
        return None
    if n_bucket % block:
        raise ValueError(f"n_bucket {n_bucket} must be a multiple of block {block}")
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    mid = np.empty(n_bucket, dtype=np.int8)
    mid_scales = np.empty(n_bucket // block, dtype=np.float32)
    stats = np.empty(8, dtype=np.float64)
    lib.ta_quantise_mid(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        ctypes.c_longlong(block),
        mid.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        mid_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return mid, mid_scales, stats


def quantise_mid6(
    channels: np.ndarray, n_bucket: int, block: int, carry: float = 0.0
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]]:
    """int6 variant of :func:`quantise_mid`: per block, the better of
    raw and delta-with-error-feedback 6-bit codes (mode in the scale's
    sign; see transport.cpp), four samples packed into three bytes
    (0.75 B per stereo sample pair). ``carry`` is the reconstruction
    value entering the first block (threads across chunked calls).
    Returns (packed (3*n_bucket/4,) uint8, mid_scales (n_bucket/block,)
    f32, bases (n_bucket/block,) f32, stats (8,) f64, carry_out) or
    None when unavailable."""

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_mid6", False):
        return None
    if n_bucket % block or block % 4:
        raise ValueError(
            f"n_bucket {n_bucket} must be a multiple of block {block}, "
            "and block a multiple of 4 (pack groups must not straddle blocks)"
        )
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    packed = np.empty(3 * n_bucket // 4, dtype=np.uint8)
    mid_scales = np.empty(n_bucket // block, dtype=np.float32)
    bases = np.empty(n_bucket // block, dtype=np.float32)
    stats = np.empty(8, dtype=np.float64)
    carry_out = ctypes.c_float(0.0)
    lib.ta_quantise_mid6(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        ctypes.c_longlong(block),
        ctypes.c_float(carry),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mid_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(carry_out),
    )
    return packed, mid_scales, bases, stats, float(carry_out.value)


def quantise_mid5(
    channels: np.ndarray, n_bucket: int, block: int, carry: float = 0.0
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]]:
    """int5 variant of :func:`quantise_mid6`: 5-bit best-of raw/delta
    codes, eight samples packed into five bytes (0.625 B per stereo
    sample pair), per-block scales on a FINER grid (block is 1024 in
    production — the finer scale adaptation is what keeps quiet clicks
    inside the beat-grid gate at 5 bits). Returns (packed
    (5*n_bucket/8,) uint8, mid_scales (n_bucket/block,) f32, bases
    (n_bucket/block,) f32, stats (8,) f64, carry_out) or None when
    unavailable."""

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_mid5", False):
        return None
    if n_bucket % block or block % 8:
        raise ValueError(
            f"n_bucket {n_bucket} must be a multiple of block {block}, "
            "and block a multiple of 8 (pack groups must not straddle blocks)"
        )
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    if channels.ndim == 1:
        channels = channels[None, :]
    n_ch, n_in = channels.shape
    packed = np.empty(5 * n_bucket // 8, dtype=np.uint8)
    mid_scales = np.empty(n_bucket // block, dtype=np.float32)
    bases = np.empty(n_bucket // block, dtype=np.float32)
    stats = np.empty(8, dtype=np.float64)
    carry_out = ctypes.c_float(0.0)
    lib.ta_quantise_mid5(
        _as_c_float(channels),
        ctypes.c_longlong(n_ch),
        ctypes.c_longlong(n_in),
        ctypes.c_longlong(n_bucket),
        ctypes.c_longlong(block),
        ctypes.c_float(carry),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mid_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(carry_out),
    )
    return packed, mid_scales, bases, stats, float(carry_out.value)


def decode_flac(path: str) -> Optional[Tuple[np.ndarray, int, Dict[str, object]]]:
    """Decode FLAC via the native library; None if unavailable/declined.

    Bit-parity with io/flac.py's decoder is pinned by the test suite.
    """

    lib = _load()
    if lib is None or not getattr(lib, "ta_has_flac", False):
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_longlong(0)
    channels = ctypes.c_int(0)
    sr = ctypes.c_int(0)
    bps = ctypes.c_int(0)
    rc = lib.ta_decode_flac(
        path.encode(),
        ctypes.byref(buf),
        ctypes.byref(frames),
        ctypes.byref(channels),
        ctypes.byref(sr),
        ctypes.byref(bps),
    )
    if rc != 0:
        return None
    try:
        flat = np.ctypeslib.as_array(buf, shape=(frames.value * channels.value,)).copy()
    finally:
        lib.ta_free(buf)
    data = flat.reshape(frames.value, channels.value).T.copy()
    meta: Dict[str, object] = {
        "channels": channels.value,
        "duration": frames.value / float(sr.value) if sr.value else 0.0,
        "file_type": "FLAC",
        "subtype": f"PCM_{bps.value}",
    }
    return data, sr.value, meta
