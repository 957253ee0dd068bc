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

MODEL_NAME = "bandsplit-masknet-v3"
_CKPT_ENV = "TRACK_ANALYSER_TPU_SEPARATION_CKPT"
_CKPT_DIR = Path(__file__).parent / "checkpoints"
# Newest bundled checkpoint wins: v3 (trained on the widened multi-family
# timbre synthesis; beats the DSP separator on every stem held-out and,
# blended, on the out-of-distribution recipe too) over v2/v1.
_BUNDLED = (
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


def separate(
    samples: np.ndarray, sample_rate: int, *, seed: int = 0
) -> Optional[Dict[str, np.ndarray]]:
    """Run the neural separator if a checkpoint is available."""

    ckpt = _checkpoint_path()
    if ckpt is None:
        return None
    from . import separation_net

    return separation_net.run_from_checkpoint(ckpt, samples, sample_rate, seed=seed)
