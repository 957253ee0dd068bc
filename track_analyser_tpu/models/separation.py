"""Neural stem separation (checkpoint resolution for the band-split net).

Interface used by analysis/stems.py: ``available()`` reports whether a
trained checkpoint is present; ``separate(samples, sr, seed)`` returns a
dict of named stems. Without a checkpoint the DSP separator
(analysis/stems.py) is authoritative — the same graceful ladder the
reference applies to demucs (analysis/stems.py:26-61 in the reference).

The architecture (models/separation_net.py, pure-JAX parameter dicts) is
TPU-shaped: STFT front-end, band-split linear encoders, mixing blocks
(depthwise time conv + band-mixing MLP), and per-stem complex mask
decoders — all static shapes. Training utilities live in
models/training.py.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

MODEL_NAME = "bandsplit-masknet-v4"
_CKPT_ENV = "TRACK_ANALYSER_TPU_SEPARATION_CKPT"
_CKPT_DIR = Path(__file__).parent / "checkpoints"
# Newest bundled checkpoint wins: v4 (v3 warm-started on further-widened
# timbre families — chirp percussion, plucked sub-bass, mixed
# voiced/unvoiced vocals; beats the DSP separator on every stem held-out
# and is far more robust on the second unseen validation family, e.g.
# OOD3 vocals SI-SDR-vs-mixture -30.5 -> +2.5 dB) over v3/v2/v1.
_BUNDLED = (
    _CKPT_DIR / "separation_v4.npz",
    _CKPT_DIR / "separation_v3.npz",
    _CKPT_DIR / "separation_v2.npz",
    _CKPT_DIR / "separation_v1.npz",
)

__all__ = ["available", "separate", "MODEL_NAME"]


def _checkpoint_path() -> Optional[Path]:
    path = os.environ.get(_CKPT_ENV)
    if path and Path(path).exists():
        return Path(path)
    return next((p for p in _BUNDLED if p.exists()), None)


def available() -> bool:
    return _checkpoint_path() is not None


def model_name() -> str:
    """Name derived from the RESOLVED checkpoint (env overrides and older
    bundled files report their own version, not the newest's)."""

    path = _checkpoint_path()
    if path is None:
        return MODEL_NAME
    stem = path.stem  # e.g. "separation_v4"
    if stem.startswith("separation_"):
        return f"bandsplit-masknet-{stem.split('_', 1)[1]}"
    return f"bandsplit-masknet-{stem}"


def separate(
    samples: np.ndarray, sample_rate: int, *, seed: int = 0
) -> Optional[Dict[str, np.ndarray]]:
    """Run the neural separator if a checkpoint is available."""

    ckpt = _checkpoint_path()
    if ckpt is None:
        return None
    from . import separation_net

    return separation_net.run_from_checkpoint(ckpt, samples, sample_rate, seed=seed)
