"""Fused Pallas STFT-magnitude kernel parity (interpret mode on CPU).

The kernel must match ops.stft.magnitude (hann, centred) at the same
error scale as the shipped DFT-matmul path: error is measured relative
to the per-frame spectral norm (absolute bin error against a tiny bin of
a loud frame is the f32 summation floor, not a defect).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from track_analyser_tpu.ops.pallas_stft import stft_magnitude
from track_analyser_tpu.ops.stft import magnitude


def _frame_norm_err(out: np.ndarray, ref: np.ndarray) -> float:
    norm = np.linalg.norm(ref, axis=-2, keepdims=True)
    return float((np.abs(out - ref) / (norm + 1e-9)).max())


@pytest.mark.parametrize("n", [44_100, 44_100 * 3 + 1_234, 1 << 15])
def test_matches_reference_magnitude_stereo(n):
    rng = np.random.default_rng(7)
    y = rng.normal(0.0, 0.3, (2, n)).astype(np.float32)
    ref = np.asarray(magnitude(jnp.asarray(y), 2048, 512))
    out = np.asarray(stft_magnitude(jnp.asarray(y), 2048, 512, interpret=True))
    assert out.shape == ref.shape
    assert _frame_norm_err(out, ref) < 2e-6


def test_mono_input_promotes_to_one_channel():
    rng = np.random.default_rng(3)
    y = rng.normal(0.0, 0.2, 44_100).astype(np.float32)
    ref = np.asarray(magnitude(jnp.asarray(y), 2048, 512))
    out = np.asarray(stft_magnitude(jnp.asarray(y), 2048, 512, interpret=True))
    assert out.shape == (1,) + ref.shape
    assert _frame_norm_err(out[0], ref) < 2e-6


def test_tone_peak_bin_and_padding_region():
    """A sine must concentrate in its bin, and the zero tail beyond the
    signal must produce near-silent frames (the padded chunks the sweep's
    bucket contract relies on)."""

    sr = 44_100
    t = np.arange(sr * 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    pad = np.zeros(sr // 2, dtype=np.float32)
    out = np.asarray(
        stft_magnitude(jnp.asarray(np.concatenate([y, pad])), 2048, 512, interpret=True)
    )[0]
    bin_440 = int(round(440.0 * 2048 / sr))
    mid = out[:, out.shape[1] // 3]
    assert mid.argmax() in (bin_440, bin_440 + 1)
    tail = out[:, -3:]  # frames centred in the zero tail
    assert tail.max() < 1e-3 * out.max()
