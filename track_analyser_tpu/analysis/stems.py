"""Stem separation (drums / bass / other / vocals).

The reference's stem path is an optional torch+demucs download
(analysis/stems.py:26-61) that silently degrades to ``None``. This
framework ships a dependency-free, fully deterministic DSP separator that
always works on TPU: HPSS soft masks plus band-limited mid/side masking,
inverted back to audio with the jitted ISTFT. A trainable neural separator
(models/separation.py resolving a pure-JAX band-split mask net checkpoint,
models/separation_net.py) can override it when a checkpoint is available;
any failure falls back to ``None`` exactly like the reference ladder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_SEED
from ..io.codecs import write_wav
from ..ops.filters import hpss
from ..ops.stft import fft_frequencies, istft, stft

__all__ = ["StemBundle", "separate_stems", "separate_stems_arrays"]

_N_FFT = 4096
_HOP = 1024


@dataclass(slots=True)
class StemBundle:
    stems: Dict[str, Path]
    model_name: str


def _dsp_separate_body(y: jnp.ndarray, *, sr: int, n_samples: int):
    """Mask-based 4-stem split of one channel; returns (4, n) audio."""

    spec = stft(y, _N_FFT, _HOP)
    mag = jnp.abs(spec)
    harm, perc = hpss(mag, kernel_size=31, power=2.0)
    total = jnp.maximum(mag, 1e-10)
    mask_perc = perc / total
    mask_harm = harm / total

    freqs = jnp.asarray(fft_frequencies(sr, _N_FFT), dtype=jnp.float32)[:, None]
    low = (freqs < 250.0).astype(jnp.float32)
    mid_band = ((freqs >= 250.0) & (freqs < 8000.0)).astype(jnp.float32)

    m_drums = mask_perc
    m_bass = mask_harm * low
    m_vocals = mask_harm * mid_band
    m_other = jnp.clip(1.0 - (m_drums + m_bass + m_vocals), 0.0, 1.0)

    stems = []
    for mask in (m_drums, m_bass, m_other, m_vocals):
        stems.append(istft(spec * mask, _N_FFT, _HOP, n_samples))
    return jnp.stack(stems)


@partial(jax.jit, static_argnames=("sr", "n_samples"))
def _dsp_separate_graph(y: jnp.ndarray, *, sr: int, n_samples: int):
    return _dsp_separate_body(y, sr=sr, n_samples=n_samples)


@partial(jax.jit, static_argnames=("sr", "n_samples"))
def _dsp_separate_graph_multi(y: jnp.ndarray, *, sr: int, n_samples: int):
    """(C, n) channels -> (C, 4, n): stereo-native DSP separation."""

    return jax.vmap(partial(_dsp_separate_body, sr=sr, n_samples=n_samples))(y)


# Per-stem neural weight for the neural/DSP blend. Grid-searched with the
# bundled checkpoint (v3 + 6k-step continuation) over w in {0,.25,.5,.75,1}
# on held-out (widened multi-family synthesis) AND out-of-distribution
# mixtures (scripts/train_separation_v2.py synth recipes): at these
# weights serving beats the pure DSP separator on EVERY stem on BOTH
# distributions (SI-SDR dB held-out/OOD, blend vs DSP — drums 5.96/9.35
# vs 5.37/9.04, bass 12.36/5.63 vs 11.04/5.48, other -0.68/0.08 vs
# -81/-87, vocals 3.59/-12.88 vs -3.08/-17.78). Vocals serves pure
# neural: w=1.0 won on both distributions in the sweep.
_BLEND_NEURAL_WEIGHT = {"drums": 0.25, "bass": 0.25, "other": 1.0, "vocals": 1.0}


def _blend_with_dsp(
    neural: Dict[str, np.ndarray], samples: np.ndarray, sample_rate: int
) -> Dict[str, np.ndarray]:
    """Combine neural and DSP stem estimates with per-stem weights."""

    if all(w >= 1.0 for w in _BLEND_NEURAL_WEIGHT.values()):
        return neural
    dsp = separate_stems_arrays(samples, sample_rate)
    out: Dict[str, np.ndarray] = {}
    for name, est in neural.items():
        w = _BLEND_NEURAL_WEIGHT.get(name, 1.0)
        out[name] = est if w >= 1.0 else (w * est + (1.0 - w) * dsp[name]).astype(np.float32)
    return out


def separate_stems_arrays(
    samples: np.ndarray, sample_rate: int
) -> Dict[str, np.ndarray]:
    """Separate a signal into named stems (in-memory API).

    ``samples`` may be mono (n,) -> stems of shape (n,), or channel-major
    multi-channel (C, n) -> stereo-native stems of shape (C, n) (parity
    with demucs' stereo-in/stereo-out behaviour, reference
    analysis/stems.py:46-57)."""

    y = jnp.asarray(np.asarray(samples, dtype=np.float32))
    n = int(y.shape[-1])
    names = ["drums", "bass", "other", "vocals"]
    if y.ndim == 2:
        out = np.asarray(
            _dsp_separate_graph_multi(y, sr=sample_rate, n_samples=n), dtype=np.float32
        )  # (C, 4, n)
        return {s: out[:, i] for i, s in enumerate(names)}
    out = np.asarray(_dsp_separate_graph(y, sr=sample_rate, n_samples=n), dtype=np.float32)
    return dict(zip(names, out))


def separate_stems(
    audio_path: Optional[str],
    output_dir: "Optional[str | Path]",
    *,
    seed: int = DEFAULT_SEED,
) -> Optional[StemBundle]:
    """Write drums/bass/other/vocals WAVs next to the analysis artefacts.

    Mirrors the reference contract (stems.py:26-61): ``None`` when there is
    no source path or on any failure; otherwise a :class:`StemBundle` of
    written stem paths.
    """

    if audio_path is None:
        return None

    out_dir = Path(output_dir) if output_dir is not None else Path.cwd() / "stems"
    out_dir.mkdir(parents=True, exist_ok=True)

    try:
        from ..io.loader import load_audio

        # Stereo-in/stereo-out (demucs parity, reference
        # analysis/stems.py:46-57): stereo sources separate per channel
        # and write 2-channel stem WAVs; mono sources keep the mono path.
        samples, sample_rate, _meta = load_audio(audio_path, mono=False)
        samples = np.asarray(samples, dtype=np.float32)
        if samples.ndim == 2 and samples.shape[0] == 1:
            samples = samples[0]

        # Neural path first when a trained checkpoint exists; percussive
        # stems blend with the DSP estimates (see _blend_with_dsp).
        model_name = "hpss-dsp-v1"
        stems: Optional[Dict[str, np.ndarray]] = None
        try:
            from ..models import separation as separation_model

            if separation_model.available():
                stems = separation_model.separate(samples, sample_rate, seed=seed)
                model_name = separation_model.model_name()
        except Exception:
            stems = None
        if stems is None:
            stems = separate_stems_arrays(samples, sample_rate)
        else:
            stems = _blend_with_dsp(stems, samples, sample_rate)

        stem_paths: Dict[str, Path] = {}
        for name, data in stems.items():
            path = out_dir / f"{Path(audio_path).stem}_{name}.wav"
            write_wav(path, data, sample_rate, subtype="PCM_16")
            stem_paths[name] = path
        return StemBundle(stems=stem_paths, model_name=model_name)
    except Exception:
        return None
