"""Band-split spectral mask network for 4-stem separation (pure JAX).

The demucs path in the reference (analysis/stems.py:26-61) downloads a
pretrained torch model; no weights can be ported, so this framework
defines its own TPU-shaped architecture plus a training scaffold
(models/training.py) over procedurally synthesised mixtures:

  STFT(2048/512) -> split bins into log-spaced bands -> per-band linear
  encoders -> N mixing blocks (depthwise time conv + band-mixing MLP,
  all static shapes, MXU-dominated) -> per-stem complex mask decoders ->
  masked ISTFT.

Checkpoints are .npz files; ``run_from_checkpoint`` is the entry used by
models/separation.py when TRACK_ANALYSER_TPU_SEPARATION_CKPT is set.
"""

from __future__ import annotations

from functools import lru_cache, partial
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import istft, stft

__all__ = [
    "band_edges",
    "init_params",
    "forward_masks",
    "separate_signal",
    "separate_signal_multi",
    "save_checkpoint",
    "load_checkpoint",
    "run_from_checkpoint",
    "STEMS",
]

STEMS = ("drums", "bass", "other", "vocals")
N_FFT = 2048
HOP = 512
N_BINS = 1 + N_FFT // 2
D_MODEL = 96
N_BLOCKS = 2


@lru_cache(maxsize=1)
def band_edges(n_bands: int = 16, n_bins: int = N_BINS) -> Tuple[Tuple[int, int], ...]:
    """Log-spaced frequency band boundaries covering all bins."""

    edges = np.unique(
        np.round(np.geomspace(1, n_bins, n_bands + 1)).astype(int)
    )
    edges[0] = 0
    edges[-1] = n_bins
    out = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        if hi > lo:
            out.append((int(lo), int(hi)))
    return tuple(out)


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    scale = jnp.sqrt(2.0 / (fan_in + fan_out))
    return scale * jax.random.normal(key, shape, dtype=jnp.float32)


def init_params(
    key: jax.Array,
    *,
    n_bands: int = 16,
    d_model: int = D_MODEL,
    n_blocks: int = N_BLOCKS,
) -> Dict[str, jnp.ndarray]:
    bands = band_edges(n_bands)
    keys = jax.random.split(key, 4 + 4 * n_blocks + len(bands) * (1 + len(STEMS)))
    ki = iter(keys)
    params: Dict[str, jnp.ndarray] = {}
    for b, (lo, hi) in enumerate(bands):
        width = hi - lo
        params[f"enc{b}_w"] = _glorot(next(ki), (2 * width, d_model))
        params[f"enc{b}_b"] = jnp.zeros(d_model)
        for s, stem in enumerate(STEMS):
            params[f"dec{b}_{stem}_w"] = _glorot(next(ki), (d_model, 2 * width))
            params[f"dec{b}_{stem}_b"] = jnp.zeros(2 * width)
    n_bands_eff = len(bands)
    for blk in range(n_blocks):
        # depthwise conv over time (kernel 5) + pointwise
        params[f"blk{blk}_tconv"] = 0.1 * jax.random.normal(
            next(ki), (5, d_model), dtype=jnp.float32
        )
        params[f"blk{blk}_tmix_w"] = _glorot(next(ki), (d_model, d_model))
        params[f"blk{blk}_tmix_b"] = jnp.zeros(d_model)
        params[f"blk{blk}_bmix_w"] = _glorot(next(ki), (n_bands_eff, n_bands_eff))
    return params


def _n_blocks(params) -> int:
    """Block count inferred from the checkpoint (keys are trace-time
    metadata, so this is jit-safe): v1-v4 ship 2 blocks, v5+ may ship
    more — the SAME forward code serves every bundled checkpoint."""

    return sum(1 for k in params if k.startswith("blk") and k.endswith("_tconv"))


def _encode(params, spec: jnp.ndarray, bands) -> jnp.ndarray:
    """spec (bins, T) complex -> features (T, n_bands, D)."""

    feats = []
    for b, (lo, hi) in enumerate(bands):
        seg = spec[lo:hi]  # (width, T)
        x = jnp.concatenate([seg.real, seg.imag], axis=0).T  # (T, 2*width)
        feats.append(
            jnp.tanh(jnp.dot(x, params[f"enc{b}_w"], preferred_element_type=jnp.float32) + params[f"enc{b}_b"])
        )
    return jnp.stack(feats, axis=1)  # (T, B, D)


def _mixing_block(params, blk: int, h: jnp.ndarray, dil: int = 1) -> jnp.ndarray:
    """(T, B, D): depthwise time conv + pointwise + band mixing, residual.

    ``dil`` dilates the 5-tap time conv (tap spacing in frames): stacked
    dilations grow the receptive field geometrically — the v5
    architecture runs (1, 3, 9, 27) for ±80 frames ≈ ±0.93 s of context
    per side, against ±2 frames per block undilated. Sustained
    resonant-ring percussion (the OOD3 drums cell) is only separable
    from tonal "other" content by its onset association over hundreds
    of milliseconds; this is the architectural change VERDICT r4 #5
    prescribed (PARITY.md's own diagnosis) rather than more capacity."""

    k = params[f"blk{blk}_tconv"]  # (5, D)
    pad = 2 * dil
    hp = jnp.pad(h, ((pad, pad), (0, 0), (0, 0)))
    conv = sum(k[j][None, None, :] * hp[j * dil : j * dil + h.shape[0]] for j in range(5))
    t = jax.nn.gelu(
        jnp.dot(conv, params[f"blk{blk}_tmix_w"], preferred_element_type=jnp.float32)
        + params[f"blk{blk}_tmix_b"]
    )
    h = h + t
    # band mixing: matmul over the band axis
    bm = jnp.einsum("tbd,bc->tcd", h, params[f"blk{blk}_bmix_w"])
    return h + jax.nn.gelu(bm)


def forward_masks(
    params,
    spec: jnp.ndarray,
    *,
    n_bands: int = 16,
    f_valid: "jnp.ndarray | None" = None,
    dilations: "Tuple[int, ...] | None" = None,
) -> Dict[str, jnp.ndarray]:
    """Complex masks per stem, each (bins, T).

    ``f_valid`` (optional, dynamic): number of valid frames when ``spec``
    is bucket-padded. Invalid frames are zeroed after the encoder and
    after every mixing block, which makes them indistinguishable from
    the conv's own zero padding — the valid frames' masks are then
    bitwise what an exact-shape dispatch produces (time mixing is a
    local kernel-5 conv; nothing else crosses frames)."""

    bands = band_edges(n_bands)
    fmask = (
        None
        if f_valid is None
        else (jnp.arange(spec.shape[1]) < f_valid)[:, None, None]
    )
    n_blocks = _n_blocks(params)
    if dilations is None:
        dilations = (1,) * n_blocks
    h = _encode(params, spec, bands)
    if fmask is not None:
        h = jnp.where(fmask, h, 0.0)
    for blk in range(n_blocks):
        h = _mixing_block(params, blk, h, int(dilations[blk]))
        if fmask is not None:
            h = jnp.where(fmask, h, 0.0)

    masks: Dict[str, jnp.ndarray] = {}
    t_frames = spec.shape[1]
    for stem in STEMS:
        parts: List[jnp.ndarray] = []
        for b, (lo, hi) in enumerate(bands):
            width = hi - lo
            y = (
                jnp.dot(
                    h[:, b, :],
                    params[f"dec{b}_{stem}_w"],
                    preferred_element_type=jnp.float32,
                )
                + params[f"dec{b}_{stem}_b"]
            )  # (T, 2*width)
            mask = jax.lax.complex(y[:, :width], y[:, width:]).T  # (width, T)
            parts.append(mask)
        masks[stem] = jnp.concatenate(parts, axis=0)[:, :t_frames]
    return masks


def _separate_body(params, y: jnp.ndarray, n_samples: int, f_valid=None, dilations=None) -> jnp.ndarray:
    spec = stft(y, N_FFT, HOP)
    masks = forward_masks(params, spec, f_valid=f_valid, dilations=dilations)
    stems = [
        istft(spec * masks[s], N_FFT, HOP, n_samples, f_valid=f_valid) for s in STEMS
    ]
    return jnp.stack(stems)


@partial(jax.jit, static_argnames=("n_samples", "dilations"))
def separate_signal(params, y: jnp.ndarray, *, n_samples: int, f_valid=None, dilations=None) -> jnp.ndarray:
    """Mono signal -> (4, n_samples) stems via masked ISTFT.

    ``f_valid`` masks bucket padding (see :func:`forward_masks`) so
    mixed-length serving shares one compiled executable per bucket.
    ``dilations`` (static tuple, one per block) selects the dilated-conv
    architecture — v5+ checkpoints carry theirs under "_dilations"."""

    return _separate_body(params, y, n_samples, f_valid, dilations)


@partial(jax.jit, static_argnames=("n_samples", "dilations"))
def separate_signal_multi(params, y: jnp.ndarray, *, n_samples: int, f_valid=None, dilations=None) -> jnp.ndarray:
    """(C, n) channels -> (C, 4, n_samples) stems, one vmapped dispatch.

    The stereo-native serving path (analysis/stems.py): each channel is
    separated with the same weights — the demucs-parity behaviour of
    stereo-in/stereo-out stems
    (reference analysis/stems.py:46-57)."""

    return jax.vmap(lambda ch: _separate_body(params, ch, n_samples, f_valid, dilations))(y)


def checkpoint_dilations(params: Dict[str, np.ndarray]) -> "Tuple[int, ...] | None":
    """Pop-free read of a checkpoint's dilation schedule (None = all-1s).
    Callers must EXCLUDE "_dilations" from the params pytree they pass
    into jitted entry points (it is architecture metadata, not a
    weight)."""

    d = params.get("_dilations")
    if d is None:
        return None
    return tuple(int(x) for x in np.asarray(d).reshape(-1))


def save_checkpoint(
    params: Dict[str, jnp.ndarray],
    path: "str | Path",
    *,
    dilations: "Tuple[int, ...] | None" = None,
) -> None:
    arrays = {k: np.asarray(v) for k, v in params.items() if k != "_dilations"}
    if dilations is not None:
        arrays["_dilations"] = np.asarray(dilations, dtype=np.int64)
    np.savez(path, **arrays)


def load_checkpoint(path: "str | Path") -> Dict[str, np.ndarray]:
    # numpy on purpose — safe to bake into jitted graphs as constants even
    # when the first load happens inside a trace (see downbeat_net).
    with np.load(path) as data:
        return {k: np.asarray(data[k]) for k in data.files}


def run_from_checkpoint(
    path: "str | Path", samples: np.ndarray, sample_rate: int, *, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Stems for (n,) mono or (C, n) multi-channel input; values keep the
    input's channel layout ((n,) or (C, n) per stem)."""

    del sample_rate, seed  # model is sample-rate agnostic at 44.1k training
    from ..substrate import pad_to_bucket

    params = load_checkpoint(path)
    dilations = checkpoint_dilations(params)
    params.pop("_dilations", None)
    arr = np.asarray(samples, dtype=np.float32)
    n = int(arr.shape[-1])
    # Bucket-pad so mixed-length serving shares one compiled executable
    # per bucket (an axon compile costs minutes per distinct shape);
    # f_valid masking makes the first n output samples exact.
    padded, fv = pad_to_bucket(arr, hop=HOP)
    nb = padded.shape[-1]
    y = jnp.asarray(padded)
    f_valid = jnp.asarray(np.int32(fv))
    if y.ndim == 2:
        out = np.asarray(
            separate_signal_multi(
                params, y, n_samples=nb, f_valid=f_valid, dilations=dilations
            )
        )[..., :n]  # (C, 4, n)
        return {s: out[:, i] for i, s in enumerate(STEMS)}
    out = np.asarray(
        separate_signal(params, y, n_samples=nb, f_valid=f_valid, dilations=dilations)
    )[..., :n]
    return dict(zip(STEMS, out))
