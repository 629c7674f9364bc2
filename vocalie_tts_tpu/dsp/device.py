"""Device-side (JAX) audio DSP — jit-compatible twins of dsp.host.

Used when audio is already resident on the TPU (engine output
post-processing, batched stitching): polyphase resampling as a strided
conv on the MXU, masked fades, peak normalization, zero-cross snap and
batched gap stitching with static shapes. Parity with the numpy host
implementations is enforced by tests/test_dsp_device.py (the dBFS
budget from the north star: within 0.1 dB).
"""

from __future__ import annotations

import functools
from math import gcd
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


@functools.lru_cache(maxsize=32)
def _polyphase_filter(up: int, down: int) -> np.ndarray:
    """FIR lowpass for rational resampling (kaiser window), numpy-cached."""
    max_rate = max(up, down)
    half_len = 10 * max_rate
    cutoff = 1.0 / max_rate
    taps = firwin(2 * half_len + 1, cutoff, window=("kaiser", 5.0))
    return (taps * up).astype(np.float32)


def resample_device(audio: jax.Array, orig_sr: int, target_sr: int) -> jax.Array:
    """Polyphase resample on device: [batch, T] → [batch, T*up//down]."""
    if orig_sr == target_sr:
        return audio
    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    taps = jnp.asarray(_polyphase_filter(up, down))
    n_taps = taps.shape[0]
    half = n_taps // 2

    x = audio
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    b, t = x.shape
    # upsample by zero-stuffing via conv lhs_dilation, then keep every
    # `down`-th sample: one conv_general_dilated does both
    y = jax.lax.conv_general_dilated(
        x[:, :, None],                     # NHC
        taps[:, None, None],               # HIO
        window_strides=(down,),
        padding=[(half, half)],
        lhs_dilation=(up,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[:, :, 0]
    out_len = int(np.ceil(t * up / down))
    y = y[:, :out_len]
    return y[0] if squeeze else y


@functools.partial(jax.jit, static_argnames=("fade_frames",))
def fade_edges_device(audio: jax.Array, fade_frames: int) -> jax.Array:
    """Linear fade-in and fade-out over the edges: [..., T]."""
    t = audio.shape[-1]
    fade = min(int(fade_frames), t)
    if fade <= 0:
        return audio
    ramp_in = jnp.minimum(jnp.arange(t, dtype=jnp.float32) / max(fade - 1, 1), 1.0)
    ramp_out = ramp_in[::-1]
    return audio * ramp_in * ramp_out


@jax.jit
def peak_normalize_device(audio: jax.Array, target_dbfs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scale so the peak hits target dBFS. Returns (audio, gain)."""
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    target = 10.0 ** (jnp.asarray(target_dbfs, jnp.float32) / 20.0)
    gain = jnp.where(peak > 0, target / jnp.maximum(peak, 1e-12), 1.0)
    return audio * gain, gain[..., 0]


@functools.partial(jax.jit, static_argnames=("radius",))
def snap_zero_crossing_device(audio: jax.Array, idx: jax.Array, radius: int) -> jax.Array:
    """Nearest zero crossing to idx within radius (1-D audio)."""
    n = audio.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    offsets = jnp.arange(-radius, radius + 1)
    pos = jnp.clip(idx + offsets, 1, n - 1)
    prev = audio[pos - 1]
    curr = audio[pos]
    crossing = (
        (prev == 0.0) | (curr == 0.0)
        | ((prev < 0.0) & (curr >= 0.0))
        | ((prev > 0.0) & (curr <= 0.0))
    )
    # also require the position to be within the legal scan range
    legal = (pos >= 1) & (pos <= n - 1)
    dist = jnp.where(crossing & legal, jnp.abs(pos - idx), n + radius)
    best = jnp.argmin(dist)  # first minimum = earlier position on ties
    return jnp.where(dist[best] > radius, idx, pos[best])


@functools.partial(jax.jit, static_argnames=("gap_frames", "fade_frames"))
def stitch_with_gaps_device(
    chunks: jax.Array,        # [n_chunks, max_len]
    chunk_lengths: jax.Array, # [n_chunks]
    gap_frames: int,
    fade_frames: int,
) -> Tuple[jax.Array, jax.Array]:
    """Batched gap stitching with crossfaded edges, static output size.

    Returns (audio [n*(max_len+gap)], total_samples). Chunks are laid
    out at static offsets; validity masks handle ragged lengths, so one
    compilation serves any chunk-length combination in the bucket.
    """
    n, max_len = chunks.shape
    t = jnp.arange(max_len, dtype=jnp.float32)[None, :]
    lengths_f = chunk_lengths.astype(jnp.float32)[:, None]
    valid = t < lengths_f
    if fade_frames > 0:
        denom = float(max(fade_frames - 1, 1))
        fade_in = jnp.minimum(t / denom, 1.0)
        # fade-out anchored at each chunk's true end
        from_end = lengths_f - 1.0 - t
        fade_out = jnp.clip(from_end / denom, 0.0, 1.0)
        first_row = jnp.arange(n)[:, None] == 0
        last_row = jnp.arange(n)[:, None] == (n - 1)
        env = jnp.where(first_row, 1.0, fade_in) * jnp.where(last_row, 1.0, fade_out)
    else:
        env = 1.0
    faded = chunks * env * valid

    slot = max_len + gap_frames
    out = jnp.zeros((n * slot,), chunks.dtype)
    # compact placement: chunk i starts at sum(lengths[:i]) + i*gap
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunk_lengths)[:-1]]
    ) + jnp.arange(n) * gap_frames

    def place(i, out):
        shifted = jnp.zeros_like(out)
        shifted = jax.lax.dynamic_update_slice(shifted, faded[i], (0,))
        rolled = jnp.roll(shifted, starts[i])
        return out + rolled

    out = jax.lax.fori_loop(0, n, place, out)
    total = jnp.sum(chunk_lengths) + (n - 1) * gap_frames
    return out, total


__all__ = [
    "resample_device",
    "fade_edges_device",
    "peak_normalize_device",
    "snap_zero_crossing_device",
    "stitch_with_gaps_device",
]
