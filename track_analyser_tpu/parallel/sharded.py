"""Sequence parallelism: shard one long track's frame axis across chips.

The reference materialises whole tracks in RAM and runs every transform
serially (SURVEY.md section 5 "long-context: none"). Here a track's STFT
frame axis is sharded over the mesh's ``seq`` axis with ``shard_map``:

* per-frame ops (window, FFT, filterbank matmuls, flux) are local;
* the sample gather needs a one-hop halo of ``n_fft - hop`` samples from
  the right neighbour — exchanged with ``ppermute`` over ICI;
* global reductions (min/max normalisation, gated loudness means) use
  ``psum``/``pmax``/``pmin``;
* Gaussian smoothing exchanges a radius-sized halo in both directions.

This module implements the sharded onset-envelope pipeline (the tempo
substrate) as the reference pattern; the same halo/psum recipe extends to
the other analysers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_CONFIG
from ..ops.mel import mel_filterbank, power_to_db
from ..ops.stft import hann_window

__all__ = ["sharded_onset_envelope", "shard_halo_exchange"]


def shard_halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Append the first ``halo`` elements of the right neighbour's shard.

    Last shard receives zeros (matches the zero padding at the track end).
    """

    n_shards = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    head = x[..., :halo]
    # send my head to my LEFT neighbour: perm maps source -> destination
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_right = jax.lax.ppermute(head, axis_name, perm)
    from_right = jnp.where(idx == n_shards - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([x, from_right], axis=-1)


def _local_envelope(
    y_local: jnp.ndarray,
    *,
    sr: int,
    n_fft: int,
    hop: int,
    frames_per_shard: int,
    axis_name: str,
) -> jnp.ndarray:
    """Compute this shard's onset-envelope frames.

    Shard s owns frames [s*F, (s+1)*F). Frame t needs samples
    [t*hop - n_fft/2, t*hop + n_fft/2) of the (conceptually centred-padded)
    signal — i.e. a left overlap of n_fft/2 and right halo of n_fft/2 plus
    one extra frame (hop) for the flux difference.
    """

    shard_id = jax.lax.axis_index(axis_name)
    pad = n_fft // 2

    # Halo: pull enough samples from the right neighbour to complete the
    # last owned frame AND the lag-1 flux reference frame.
    halo = pad + hop
    y_ext = shard_halo_exchange(y_local, halo, axis_name)
    # Left context: first `pad` samples of shard 0 read zeros (centre pad);
    # other shards pull from the left neighbour.
    tail = y_local[..., -pad:]
    n_shards = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(tail, axis_name, perm)
    from_left = jnp.where(shard_id == 0, jnp.zeros_like(from_left), from_left)
    y_full = jnp.concatenate([from_left, y_ext], axis=-1)

    # Local frames: +1 extra frame for the flux lag.
    win = jnp.asarray(hann_window(n_fft))
    starts = jnp.arange(frames_per_shard + 1) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = y_full[idx] * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(sr, n_fft, DEFAULT_CONFIG.n_mels))
    mel_power = jnp.dot(power, fb.T, preferred_element_type=jnp.float32)  # (F+1, mels)

    # power_to_db with the GLOBAL max (top_db floor is a global property).
    amin = 1e-10
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, mel_power))
    global_max = jax.lax.pmax(jnp.max(log_spec), axis_name)
    log_spec = jnp.maximum(log_spec, global_max - 80.0)

    flux = jnp.maximum(0.0, log_spec[1:] - log_spec[:-1])  # frame t vs t-1? see below
    env_local = jnp.mean(flux, axis=-1)
    return env_local


def sharded_onset_envelope(
    y: np.ndarray,
    sr: int,
    mesh: Mesh,
    *,
    axis: str = "seq",
    hop: int = 512,
    n_fft: int = 2048,
) -> np.ndarray:
    """Onset envelope of one long track, frame-sharded over ``axis``.

    Pads the signal so each shard owns an equal frame count, runs the
    halo-exchanged local computation, and reassembles + aligns the result
    to match ops.onset.onset_strength_from_mel (same left shift).
    """

    n_shards = mesh.shape[axis]
    n = y.shape[-1]
    total_frames = 1 + n // hop
    frames_per_shard = -(-total_frames // n_shards)
    # Must split into equal per-shard sample chunks: exactly F*hop each.
    # The extra samples the final frame/flux needs come from the halo
    # exchange (zeros on the last shard — the track is zero beyond n).
    padded_samples = frames_per_shard * n_shards * hop
    yp = np.zeros(padded_samples, dtype=np.float32)
    yp[:n] = y

    fn = shard_map(
        partial(
            _local_envelope,
            sr=sr,
            n_fft=n_fft,
            hop=hop,
            frames_per_shard=frames_per_shard,
            axis_name=axis,
        ),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    # Each shard computes flux for frames [s*F+1, (s+1)*F+1) relative to
    # its own first frame; assembling shards yields flux at 1..total. The
    # envelope convention shifts right by lag + n_fft // (2*hop).
    env_flux = np.asarray(jax.jit(fn)(jnp.asarray(yp)))
    shift = 1 + n_fft // (2 * hop)
    env = np.zeros(total_frames, dtype=np.float64)
    src = env_flux[: max(0, total_frames - shift)]
    env[shift : shift + src.size] = src
    return env
