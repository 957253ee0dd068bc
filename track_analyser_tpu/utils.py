"""Core types and deterministic seeding helpers.

Mirrors the reference's public surface (reference: src/track_analyser/
utils.py:24-146) — ``AudioInput``, ``coerce_audio``, ``deterministic_rng``,
``seed_everything`` — while representing audio as arrays that drop straight
onto a TPU (mono ``f32[n]`` plus optional channel-major stereo ``f32[2, n]``).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Optional, Sequence

import numpy as np

from .config import DEFAULT_SEED, DEFAULT_SR
from .io.loader import load_audio
from .ops.resample import resample_poly_host

__all__ = [
    "AudioInput",
    "coerce_audio",
    "deterministic_rng",
    "seed_everything",
    "DEFAULT_SR",
    "DEFAULT_SEED",
]


@dataclass(slots=True)
class AudioInput:
    """Audio payload: mono float32 samples plus optional stereo channels."""

    samples: np.ndarray
    sample_rate: int
    path: Optional[str] = None
    stereo_samples: Optional[np.ndarray] = None

    @property
    def duration(self) -> float:
        return float(len(self.samples)) / float(self.sample_rate)


def enable_persistent_compilation_cache(cache_dir: "str | None" = None) -> None:
    """Enable JAX's on-disk compilation cache so repeated CLI invocations
    skip XLA recompiles (cold compile on a TPU costs ~minutes).

    Also honours TRACK_ANALYSER_TPU_DEBUG_NANS=1 — the numerical-sanitizer
    mode (jax_debug_nans) for debugging device graphs (SURVEY.md section 5:
    the TPU-idiomatic replacement for the reference's absent sanitizers).
    """

    import os

    import jax

    path = cache_dir or os.path.expanduser("~/.cache/track_analyser_tpu/xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimisation, never a requirement
    if os.environ.get("TRACK_ANALYSER_TPU_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)


def deterministic_rng(seed: int = DEFAULT_SEED) -> np.random.Generator:
    """Return a numpy Generator seeded deterministically."""

    return np.random.default_rng(seed)


def seed_everything(seed: int = DEFAULT_SEED) -> None:
    """Seed the global host RNGs for deterministic behaviour.

    On-device randomness in this framework is always threaded explicitly via
    ``jax.random.PRNGKey(seed)``; this helper only pins the host RNGs for
    parity with the reference seed contract (utils.py:48-52).
    """

    np.random.seed(seed)
    random.seed(seed)


def _resample(samples: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return samples
    return resample_poly_host(samples, orig_sr, target_sr)


def coerce_audio(
    source: "str | Path | Sequence[float] | np.ndarray | AudioInput | tuple[Iterable[float], int]",
    *,
    target_sr: int = DEFAULT_SR,
    mono: bool = True,
) -> AudioInput:
    """Normalise ``source`` into an :class:`AudioInput` at ``target_sr``.

    Accepts a path, a numpy array, an ``(iterable, sr)`` tuple, or an
    existing :class:`AudioInput` (reference behaviour: utils.py:73-146).
    """

    if isinstance(source, AudioInput):
        samples = np.asarray(source.samples, dtype=np.float32)
        if source.sample_rate != target_sr:
            samples = _resample(samples, source.sample_rate, target_sr)
        stereo = None
        if source.stereo_samples is not None:
            stereo = np.asarray(source.stereo_samples, dtype=np.float32)
            if source.sample_rate != target_sr:
                stereo = _resample(stereo, source.sample_rate, target_sr)
        return AudioInput(
            samples=np.asarray(samples, dtype=np.float32),
            sample_rate=target_sr,
            path=source.path,
            stereo_samples=stereo,
        )

    if isinstance(source, (str, Path)):
        path = str(source)
        samples, sr, _meta = load_audio(path, mono=False)
        stereo: Optional[np.ndarray]
        if samples.ndim > 1:
            stereo = np.asarray(samples, dtype=np.float32)
            mono_samples = np.mean(stereo, axis=0)
        else:
            stereo = None
            mono_samples = np.asarray(samples, dtype=np.float32)
        mono_samples = _resample(mono_samples, sr, target_sr)
        if stereo is not None:
            stereo = _resample(stereo, sr, target_sr)
            if mono:
                mono_samples = np.mean(stereo, axis=0)
        return AudioInput(
            samples=np.asarray(mono_samples, dtype=np.float32),
            sample_rate=target_sr,
            path=path,
            stereo_samples=stereo,
        )

    if isinstance(source, np.ndarray):
        samples = np.asarray(source, dtype=np.float32)
        stereo = None
        if samples.ndim > 1:
            stereo = samples
            if mono:
                samples = np.mean(samples, axis=0)
        return AudioInput(samples=samples, sample_rate=target_sr, stereo_samples=stereo)

    if isinstance(source, tuple) and len(source) == 2:
        data, sr = source
        samples = np.asarray(list(data), dtype=np.float32)
        stereo = None
        if samples.ndim > 1:
            stereo = samples
            if mono:
                samples = np.mean(samples, axis=0)
        samples = _resample(samples, int(sr), target_sr)
        if stereo is not None:
            stereo = _resample(stereo, int(sr), target_sr)
        return AudioInput(samples=samples, sample_rate=target_sr, stereo_samples=stereo)

    raise TypeError(f"Unsupported audio source type: {type(source)!r}")
