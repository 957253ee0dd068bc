"""MP3 decode via the system libmpg123 (ctypes, no installation).

The reference decodes MP3 through audioread's system-decoder ladder
(io.py:91-116); the equivalent here is a direct ctypes binding to
libmpg123 when the shared library is present on the machine. Absent the
library, the codec ladder reports the same descriptive RuntimeError.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

__all__ = ["available", "decode_mp3"]

_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_ENC_FLOAT_32 = 0x200

_lib: "ctypes.CDLL | None | bool" = None


def _load() -> "ctypes.CDLL | None":
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            _lib = False
            return None
        lib.mpg123_init.restype = ctypes.c_int
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_open.restype = ctypes.c_int
        lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mpg123_getformat.restype = ctypes.c_int
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mpg123_format_none.restype = ctypes.c_int
        lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
        lib.mpg123_format.restype = ctypes.c_int
        lib.mpg123_format.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mpg123_read.restype = ctypes.c_int
        lib.mpg123_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_init()
        _lib = lib
    return _lib if _lib else None


def available() -> bool:
    return _load() is not None


def decode_mp3(path: "str | Path") -> Tuple[np.ndarray, int, Dict[str, object]]:
    """Decode an MPEG audio file to channel-major float32.

    Raises RuntimeError when libmpg123 is unavailable or declines the file.
    """

    lib = _load()
    if lib is None:
        raise RuntimeError("libmpg123 not available")

    err = ctypes.c_int(0)
    handle = lib.mpg123_new(None, ctypes.byref(err))
    if not handle:
        raise RuntimeError(f"mpg123_new failed ({err.value})")
    try:
        if lib.mpg123_open(handle, str(path).encode()) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not open {path}")

        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        encoding = ctypes.c_int(0)
        if lib.mpg123_getformat(
            handle, ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(encoding)
        ) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not read format of {path}")

        # Lock output to float32 at the stream's native rate/channels.
        lib.mpg123_format_none(handle)
        lib.mpg123_format(handle, rate.value, channels.value, _ENC_FLOAT_32)
        # Re-open so the forced format applies from the first frame.
        lib.mpg123_close(handle)
        if lib.mpg123_open(handle, str(path).encode()) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not reopen {path}")

        buf_size = 1 << 18
        buf = ctypes.create_string_buffer(buf_size)
        done = ctypes.c_size_t(0)
        chunks = []
        while True:
            rc = lib.mpg123_read(handle, buf, buf_size, ctypes.byref(done))
            if done.value:
                chunks.append(np.frombuffer(buf.raw[: done.value], dtype=np.float32).copy())
            if rc == _MPG123_DONE:
                break
            if rc == _MPG123_NEW_FORMAT:
                # Mid-stream format change: deinterleave below assumes one
                # fixed rate/channel layout — re-query and bail if it moved
                # (we locked float32 at the initial rate, so this is rare).
                new_rate = ctypes.c_long(0)
                new_ch = ctypes.c_int(0)
                new_enc = ctypes.c_int(0)
                lib.mpg123_getformat(
                    handle,
                    ctypes.byref(new_rate),
                    ctypes.byref(new_ch),
                    ctypes.byref(new_enc),
                )
                if new_rate.value != rate.value or new_ch.value != channels.value:
                    raise RuntimeError(
                        f"mpg123 stream changes format mid-file: {path}"
                    )
                continue
            if rc != _MPG123_OK:
                if chunks:
                    break  # salvage what decoded (truncated file)
                raise RuntimeError(f"mpg123 read error {rc} for {path}")

        ch = max(1, channels.value)
        if chunks:
            flat = np.concatenate(chunks)
        else:
            flat = np.zeros(0, dtype=np.float32)
        frames = flat.size // ch
        data = np.ascontiguousarray(flat[: frames * ch].reshape(frames, ch).T)
        meta: Dict[str, object] = {
            "channels": ch,
            "duration": frames / float(rate.value) if rate.value else 0.0,
            "file_type": "MP3",
            "subtype": "MPEG_LAYER_III",
        }
        return data, int(rate.value), meta
    finally:
        lib.mpg123_close(handle)
        lib.mpg123_delete(handle)
