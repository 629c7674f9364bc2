"""Spectral audio utilities in JAX: STFT, mel filterbank, framing.

All functions are jit-compatible with static shapes, float32 compute
(spectral precision matters for vocoder conditioning).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> jnp.ndarray:
    n = np.arange(win_length)
    return jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * n / win_length), jnp.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int, *, center: bool = True) -> jax.Array:
    """[..., T] → [..., frames, frame_length] with reflect pad when centered."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    *,
    center: bool = True,
) -> jax.Array:
    """Magnitude-complex STFT: [..., T] → [..., frames, n_fft//2+1] complex64."""
    win_length = win_length or n_fft
    frames = frame_signal(x, win_length, hop, center=center)
    window = hann_window(win_length)
    frames = frames * window
    if win_length < n_fft:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_length)])
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def _hz_to_mel(f, scale: str = "htk"):
    if scale == "slaney":
        # librosa default (htk=False): linear below 1 kHz, log above
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m, scale: str = "htk"):
    if scale == "slaney":
        m = np.asarray(m, np.float64)
        hz = m * (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None,
    *, scale: str = "htk",
) -> jnp.ndarray:
    """Triangular mel filterbank [n_fft//2+1, n_mels].

    ``scale``: "htk" (2595·log10 break points — torchaudio default) or
    "slaney" (librosa default: linear <1 kHz, log above — what the
    published AudioSR/Tacotron-family front-ends build via
    librosa.filters.mel). Both are area-("slaney"-)normalized unless
    the numpy variant is called with normalize=False."""
    # NB: cache numpy, not jnp — a jnp constant created inside a jit
    # trace is a tracer and must not outlive the trace.
    return jnp.asarray(_mel_filterbank_np(sr, n_fft, n_mels, fmin, fmax, scale=scale))


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None,
    normalize: bool = True, scale: str = "htk",
) -> np.ndarray:
    fmax = fmax or sr / 2
    mel_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((len(bins), n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bins - lo) / max(ctr - lo, 1e-10)
        down = (hi - bins) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    if normalize:
        # Slaney normalization: constant energy per band (torchaudio
        # norm=None callers — e.g. the XTTS speaker encoder — skip it)
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[None, :]
    return fb


def log_mel_spectrogram(
    x: jax.Array,
    *,
    sr: int,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    eps: float = 1e-5,
    scale: str = "htk",
) -> jax.Array:
    """[..., T] → [..., frames, n_mels] natural-log mel spectrogram."""
    spec = jnp.abs(stft(x, n_fft, hop))
    mel = jnp.einsum("...fb,bm->...fm", spec,
                     mel_filterbank(sr, n_fft, n_mels, fmin, fmax, scale=scale))
    return jnp.log(jnp.maximum(mel, eps))


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[..., num_frames, frame_len] → [..., T] overlap-add."""
    *lead, num_frames, frame_len = frames.shape
    t = (num_frames - 1) * hop + frame_len
    out = jnp.zeros((*lead, t), frames.dtype)
    def body(i, acc):
        return jax.lax.dynamic_update_slice_in_dim(
            acc,
            jax.lax.dynamic_slice_in_dim(acc, i * hop, frame_len, axis=-1)
            + frames[..., i, :],
            i * hop,
            axis=-1,
        )
    return jax.lax.fori_loop(0, num_frames, body, out)


def db_to_amplitude(db: float) -> float:
    return float(10.0 ** (db / 20.0))


def amplitude_to_db(amp: float) -> float:
    return float(20.0 * math.log10(max(amp, 1e-12)))


__all__ = [
    "hann_window",
    "frame_signal",
    "stft",
    "mel_filterbank",
    "log_mel_spectrogram",
    "overlap_add",
    "db_to_amplitude",
    "amplitude_to_db",
]
