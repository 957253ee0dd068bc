"""Host-side audio loading (decode + resample).

Decode can never be TPU work; this layer mirrors the reference loader's
contract (io.py:56-139): channel-major float32 samples, sample rate, and a
metadata dict with channels / duration / file_type (/ subtype).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from .codecs import decode_file
from ..ops.resample import resample_poly_host

__all__ = ["load_audio"]


def load_audio(
    path: "str | Path",
    target_sr: Optional[int] = None,
    mono: bool = True,
) -> Tuple[np.ndarray, int, Dict[str, object]]:
    """Load ``path`` into memory and return samples, sample rate, metadata.

    Behavioural parity with the reference loader (io.py:56-139): decode via
    the codec ladder, optionally resample, optionally downmix to mono, and
    report the *original* channel count plus post-processing duration in
    the metadata.
    """

    file_path = str(path)
    data, sr, meta = decode_file(file_path)

    if data.ndim == 1:
        data = data[np.newaxis, :]

    original_channels = int(data.shape[0])

    if target_sr is not None and sr != target_sr:
        data = resample_poly_host(data, sr, target_sr)
        sr = target_sr

    if mono and data.shape[0] > 1:
        data = np.mean(data, axis=0, keepdims=True)

    meta["channels"] = original_channels
    meta["duration"] = data.shape[-1] / float(sr)
    meta["file_type"] = (
        meta.get("file_type") or Path(file_path).suffix.lstrip(".").upper() or "UNKNOWN"
    )

    if mono:
        return data.squeeze(axis=0), sr, meta
    return data, sr, meta
