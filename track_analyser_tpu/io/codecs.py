"""Self-contained audio codecs.

The runtime environment ships no audio decoding library (no soundfile /
audioread / ffmpeg), so the framework carries its own decoders. Decode is
inherently host work (reference: io.py:72-116 keeps it on CPU too); the
hot path is a zero-copy numpy parse of RIFF/WAVE with an optional native
C++ fast path (see track_analyser_tpu/native).

Supported today: WAV (PCM 8/16/24/32, IEEE float32/64,
WAVE_FORMAT_EXTENSIBLE, both RIFF and big-endian RIFX containers),
AIFF/AIFF-C (PCM 16/24/32 big-endian, 'sowt' little-endian, fl32/fl64
floats), and FLAC (first-party decoder, io/flac.py). Other formats fall
through to the system-decoder ladder (MP3/Ogg, then the ffmpeg catch-all
tier) and finally raise the same descriptive ``RuntimeError`` the
reference raises when every backend fails (io.py:115-116).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

__all__ = ["decode_file", "decode_wav", "write_wav", "AudioDecodeError"]

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class AudioDecodeError(RuntimeError):
    """Raised when no codec can decode the given file."""


def _pcm24_to_float32(raw: bytes) -> np.ndarray:
    """Decode packed little-endian 24-bit PCM to float32 in [-1, 1)."""

    buf = np.frombuffer(raw, dtype=np.uint8)
    usable = (buf.size // 3) * 3
    buf = buf[:usable].reshape(-1, 3)
    # Sign-extend into int32: place the 3 bytes in the top of a 32-bit word
    # then arithmetic-shift down 8.
    as_int = (
        buf[:, 0].astype(np.int32)
        | (buf[:, 1].astype(np.int32) << 8)
        | (buf[:, 2].astype(np.int32) << 16)
    )
    as_int = (as_int << 8) >> 8  # sign extension
    return (as_int.astype(np.float32)) / 8388608.0  # 2**23


def decode_wav(path: str | Path) -> Tuple[np.ndarray, int, Dict[str, object]]:
    """Decode a RIFF/WAVE file.

    Returns ``(data, sr, meta)`` with ``data`` channel-major float32 of
    shape ``(channels, frames)`` and ``meta`` carrying the same keys the
    reference loader reports (io.py:80-85): channels, duration, file_type,
    subtype.
    """

    raw = Path(path).read_bytes()
    # 'RIFX' is the big-endian RIFF variant (scipy/matlab write it for
    # be data): same structure with big-endian chunk sizes, fmt fields
    # and samples. First-party support matters because at least one
    # libavformat build misparses RIFX sample data as little-endian —
    # silent byte-swapped garbage, not an error.
    if len(raw) < 12 or raw[0:4] not in (b"RIFF", b"RIFX") or raw[8:12] != b"WAVE":
        raise AudioDecodeError(f"Not a RIFF/WAVE file: {path}")
    e = ">" if raw[0:4] == b"RIFX" else "<"

    fmt = None
    data_bytes = None
    pos = 12
    n = len(raw)
    while pos + 8 <= n:
        chunk_id = raw[pos : pos + 4]
        (chunk_size,) = struct.unpack_from(f"{e}I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            if chunk_size < 16:
                raise AudioDecodeError(f"Malformed fmt chunk in {path}")
            audio_format, channels, sr, _byte_rate, block_align, bits = (
                struct.unpack_from(f"{e}HHIIHH", body, 0)
            )
            if audio_format == _WAVE_FORMAT_EXTENSIBLE and chunk_size >= 40:
                # SubFormat GUID: Data1 carries the real format tag, and
                # follows the container's endianness (RIFX stores it
                # big-endian).
                (audio_format,) = struct.unpack_from(f"{e}I", body, 24)
                audio_format &= 0xFFFF
            fmt = (audio_format, channels, sr, block_align, bits)
        elif chunk_id == b"data":
            data_bytes = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned

    if fmt is None or data_bytes is None:
        raise AudioDecodeError(f"Missing fmt/data chunk in {path}")

    audio_format, channels, sr, _block_align, bits = fmt
    if channels <= 0 or sr <= 0:
        raise AudioDecodeError(f"Invalid WAV header in {path}")

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 16:
            flat = np.frombuffer(data_bytes, dtype=f"{e}i2").astype(np.float32) / 32768.0
            subtype = "PCM_16"
        elif bits == 24:
            buf = data_bytes
            if e == ">":  # swap each packed triplet to little-endian
                b24 = np.frombuffer(buf, dtype=np.uint8)
                usable = (b24.size // 3) * 3
                buf = b24[:usable].reshape(-1, 3)[:, ::-1].reshape(-1).tobytes()
            flat = _pcm24_to_float32(buf)
            subtype = "PCM_24"
        elif bits == 32:
            flat = (
                np.frombuffer(data_bytes, dtype=f"{e}i4").astype(np.float32) / 2147483648.0
            )
            subtype = "PCM_32"
        elif bits == 8:
            flat = (
                np.frombuffer(data_bytes, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
            subtype = "PCM_U8"
        else:
            raise AudioDecodeError(f"Unsupported PCM bit depth {bits} in {path}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            flat = np.frombuffer(data_bytes, dtype=f"{e}f4").astype(np.float32)
            subtype = "FLOAT"
        elif bits == 64:
            flat = np.frombuffer(data_bytes, dtype=f"{e}f8").astype(np.float32)
            subtype = "DOUBLE"
        else:
            raise AudioDecodeError(f"Unsupported float bit depth {bits} in {path}")
    else:
        raise AudioDecodeError(
            f"Unsupported WAV format tag 0x{audio_format:04x} in {path}"
        )

    frames = flat.size // channels
    data = flat[: frames * channels].reshape(frames, channels).T
    data = np.ascontiguousarray(data, dtype=np.float32)
    meta: Dict[str, object] = {
        "channels": int(channels),
        "duration": frames / float(sr),
        "file_type": "WAV",
        "subtype": subtype,
    }
    return data, int(sr), meta


def _decode_aiff(path: str | Path) -> Tuple[np.ndarray, int, Dict[str, object]]:
    raw = Path(path).read_bytes()
    if len(raw) < 12 or raw[0:4] != b"FORM" or raw[8:12] not in (b"AIFF", b"AIFC"):
        raise AudioDecodeError(f"Not an AIFF file: {path}")
    is_aifc = raw[8:12] == b"AIFC"
    channels = sr = bits = None
    comp = b"NONE"
    sound = None
    pos = 12
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        (chunk_size,) = struct.unpack_from(">I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"COMM":
            channels, _frames, bits = struct.unpack_from(">hIh", body, 0)
            # 80-bit extended float sample rate
            exponent = struct.unpack_from(">H", body, 8)[0] & 0x7FFF
            mantissa = struct.unpack_from(">Q", body, 10)[0]
            sr = int(mantissa * 2.0 ** (exponent - 16383 - 63))
            if is_aifc and chunk_size >= 22:
                comp = body[18:22]  # AIFF-C compressionType
        elif chunk_id == b"SSND":
            (offset, _blocksize) = struct.unpack_from(">II", body, 0)
            sound = body[8 + offset :]
        pos += 8 + chunk_size + (chunk_size & 1)
    if channels is None or sr is None or sound is None:
        raise AudioDecodeError(f"Malformed AIFF file: {path}")
    # AIFF-C compressionType decides the sample encoding. 'sowt'
    # (little-endian PCM, the macOS/iTunes default) and float types MUST
    # NOT be read as big-endian integers — that silently decodes
    # byte-swapped noise. Unknown codecs raise so decode_file's ladder
    # routes the file to the ffmpeg tier.
    comp_s = comp.decode("ascii", errors="replace").strip().lower()
    if comp_s in ("none", "twos", ""):
        endian = ">"
        is_float = False
    elif comp_s == "sowt":
        endian = "<"
        is_float = False
    elif comp_s in ("fl32", "fl64"):
        endian = ">"
        is_float = True
    else:
        raise AudioDecodeError(f"Unsupported AIFF-C codec {comp!r} in {path}")
    if is_float and bits == 32:
        flat = np.frombuffer(sound, dtype=">f4").astype(np.float32)
    elif is_float and bits == 64:
        flat = np.frombuffer(sound, dtype=">f8").astype(np.float32)
    elif not is_float and bits == 16:
        flat = np.frombuffer(sound, dtype=f"{endian}i2").astype(np.float32) / 32768.0
    elif not is_float and bits == 24:
        buf = np.frombuffer(sound, dtype=np.uint8)
        usable = (buf.size // 3) * 3
        if endian == ">":  # big-endian packed: swap each triplet
            buf = buf[:usable].reshape(-1, 3)[:, ::-1].reshape(-1)
        else:
            buf = buf[:usable]
        flat = _pcm24_to_float32(buf.tobytes())
    elif not is_float and bits == 32:
        flat = np.frombuffer(sound, dtype=f"{endian}i4").astype(np.float32) / 2147483648.0
    else:
        raise AudioDecodeError(f"Unsupported AIFF bit depth {bits} in {path}")
    frames = flat.size // channels
    data = np.ascontiguousarray(
        flat[: frames * channels].reshape(frames, channels).T, dtype=np.float32
    )
    meta: Dict[str, object] = {
        "channels": int(channels),
        "duration": frames / float(sr),
        "file_type": "AIFF",
        "subtype": "FLOAT" if is_float else f"PCM_{bits}",
    }
    return data, int(sr), meta


def decode_file(path: str | Path) -> Tuple[np.ndarray, int, Dict[str, object]]:
    """Decode ``path`` by sniffing its container, trying every codec.

    Mirrors the reference's decode ladder (soundfile -> audioread ->
    RuntimeError, io.py:72-116): try the native fast path first, then the
    pure-numpy codecs, then fail with a descriptive error.
    """

    file_path = str(path)
    try:
        with open(file_path, "rb") as fh:  # sniff only — decoders re-read
            head = fh.read(12)
    except OSError as exc:
        raise RuntimeError(f"Could not decode audio file: {file_path}") from exc

    # Native C++ fast path (optional, see track_analyser_tpu/native).
    try:
        from ..native import binding as native_binding

        if native_binding.available():
            result = native_binding.decode(file_path)
            if result is not None:
                return result
    except Exception:
        pass  # native tier is optional; numpy codecs are authoritative

    sniff_error: "Exception | None" = None
    try:
        if head[0:4] in (b"RIFF", b"RIFX"):
            return decode_wav(file_path)
        if head[0:4] == b"FORM":
            return _decode_aiff(file_path)
        if head[0:4] == b"fLaC":
            try:
                from ..native import binding as native_binding

                native = native_binding.decode_flac(file_path)
                if native is not None:
                    return native
            except Exception:
                pass  # numpy decoder below is authoritative
            from . import flac

            return flac.decode_flac(file_path)
    except Exception as exc:
        # Not just AudioDecodeError: a truncated/fuzzed header can crash
        # a parser with struct.error/IndexError/ValueError before it
        # reaches a validity check. Don't raise yet — a valid container
        # the first-party codec doesn't cover (e.g. ADPCM-in-WAV) may
        # still decode through the ffmpeg tier below, exactly like the
        # reference's soundfile -> audioread fallthrough (io.py:91-116).
        sniff_error = exc

    # Ogg Vorbis via the system libvorbisfile.
    if head[0:4] == b"OggS":
        try:
            from . import vorbis

            if vorbis.available():
                return vorbis.decode_ogg(file_path)
        except Exception:
            pass  # fall through to the ffmpeg tier / final RuntimeError

    # MPEG audio (ID3 tag or frame sync) via the system libmpg123.
    looks_mpeg = head[0:3] == b"ID3" or (
        len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0
    )
    suffix = Path(file_path).suffix.lower()
    if looks_mpeg or suffix in (".mp3", ".mp2", ".mpga"):
        try:
            from . import mpg123

            if mpg123.available():
                return mpg123.decode_mp3(file_path)
        except Exception:
            pass  # fall through to the ffmpeg tier / final RuntimeError

    # Catch-all: the native FFmpeg tier decodes anything the system's
    # libavformat/libavcodec handle (M4A/AAC/WMA/...) — the equivalent of
    # the reference's audioread last rung (io.py:91-116).
    try:
        from . import ffmpeg

        if ffmpeg.available():
            result = ffmpeg.decode(file_path)
            if result is not None:
                return result
    except Exception:
        pass

    # Every tier declined or failed; surface the reference's descriptive
    # RuntimeError, with the first-party codec's failure (when the
    # container matched one) attached as __cause__ for diagnosis.
    raise RuntimeError(f"Could not decode audio file: {file_path}") from sniff_error


def write_wav(
    path: str | Path,
    data: np.ndarray,
    sample_rate: int,
    *,
    subtype: str = "PCM_16",
) -> None:
    """Write ``data`` (``(frames,)`` or ``(frames, channels)`` or
    ``(channels, frames)`` float in [-1, 1]) to a WAV file."""

    arr = np.asarray(data, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    elif arr.shape[0] <= 8 and arr.shape[0] < arr.shape[1]:
        arr = arr.T  # channel-major input
    frames, channels = arr.shape

    if subtype == "PCM_16":
        payload = (
            np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2").tobytes()
        )
        bits, tag = 16, _WAVE_FORMAT_PCM
    elif subtype == "PCM_24":
        ints = np.clip(np.round(arr * 8388607.0), -8388608, 8388607).astype(np.int32)
        b = np.empty((frames * channels, 3), dtype=np.uint8)
        flat = ints.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
        bits, tag = 24, _WAVE_FORMAT_PCM
    elif subtype == "PCM_32":
        payload = (
            np.clip(np.round(arr * 2147483647.0), -2147483648, 2147483647)
            .astype("<i4")
            .tobytes()
        )
        bits, tag = 32, _WAVE_FORMAT_PCM
    elif subtype == "FLOAT":
        payload = arr.astype("<f4").tobytes()
        bits, tag = 32, _WAVE_FORMAT_IEEE_FLOAT
    else:
        raise ValueError(f"Unsupported WAV subtype: {subtype}")

    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, byte_rate, block_align, bits
    )
    data_chunk = b"data" + struct.pack("<I", len(payload)) + payload
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff_body = b"WAVE" + fmt_chunk + data_chunk
    out = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    Path(path).write_bytes(out)
