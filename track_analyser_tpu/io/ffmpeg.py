"""Catch-all decode via the native FFmpeg tier (libta_ffmpeg.so).

The reference's decode ladder ends in audioread, which in practice
delegates to FFmpeg and therefore decodes M4A/AAC/WMA/anything the system
can (reference io.py:91-116). This binding is the equivalent last rung of
this framework's ladder: a thin ctypes wrapper over
native/src/ffmpeg.cpp (built by ``python -m track_analyser_tpu.native.build``
when the FFmpeg development libraries are present). Absent the library,
``available()`` is False and the ladder raises the standard RuntimeError.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["available", "decode"]

_LIB_NAME = "libta_ffmpeg.so"
_lib: "ctypes.CDLL | None | bool" = None


def _load() -> "ctypes.CDLL | None":
    global _lib
    if _lib is None:
        path = Path(__file__).parent.parent / "native" / _LIB_NAME
        if not path.exists():
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(str(path))
            lib.ta_ffmpeg_decode.restype = ctypes.c_int
            lib.ta_ffmpeg_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.ta_ffmpeg_free.restype = None
            lib.ta_ffmpeg_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except OSError:
            _lib = False
            return None
    return _lib if _lib else None


def available() -> bool:
    return _load() is not None


def decode(path: str) -> Optional[Tuple[np.ndarray, int, Dict[str, object]]]:
    """Decode any FFmpeg-supported audio file; None when it declines.

    Returns channel-major float32 ``(channels, frames)`` at the stream's
    native sample rate, plus the usual metadata keys.
    """

    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_longlong(0)
    channels = ctypes.c_int(0)
    sr = ctypes.c_int(0)
    codec = ctypes.create_string_buffer(32)
    rc = lib.ta_ffmpeg_decode(
        str(path).encode(),
        ctypes.byref(buf),
        ctypes.byref(frames),
        ctypes.byref(channels),
        ctypes.byref(sr),
        codec,
        ctypes.c_int(len(codec)),
    )
    if rc != 0:
        return None
    try:
        # One copy straight to channel-major: the transpose view of the
        # ctypes buffer materialises during .copy(), so no full-size flat
        # intermediate is allocated (this tier feeds concurrent decode
        # workers where allocator churn is measurable).
        interleaved = np.ctypeslib.as_array(buf, shape=(frames.value, channels.value))
        data = interleaved.T.copy()
    finally:
        lib.ta_ffmpeg_free(buf)
    codec_name = codec.value.decode(errors="replace").upper()
    meta: Dict[str, object] = {
        "channels": channels.value,
        "duration": frames.value / float(sr.value) if sr.value else 0.0,
        "file_type": codec_name or Path(str(path)).suffix.lstrip(".").upper(),
        "subtype": "FLOAT",
    }
    return data, sr.value, meta
