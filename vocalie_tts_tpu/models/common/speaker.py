"""Speaker (x-vector-class) encoder: reference audio → voice embedding.

Conv stack over log-mels with statistics pooling — the conditioning
path behind every voice-clone mode (Chatterbox ref audio, Qwen3
x_vector_only clone, CosyVoice zero-shot, XTTS speaker latents).
Runs on device as part of the engine's jitted program; replaces the
reference's in-runner torch speaker encoders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.audio import log_mel_spectrogram
from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    leaky_relu,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SpeakerEncoderConfig:
    n_mels: int = 80
    channels: int = 256
    n_layers: int = 4
    embed_dim: int = 256
    sr: int = 24000
    n_fft: int = 1024
    hop: int = 256
    dtype: Any = jnp.float32


def init_speaker_encoder(key: jax.Array, cfg: SpeakerEncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.n_layers + 1)
    layers = []
    c_in = cfg.n_mels
    for i in range(cfg.n_layers):
        layers.append({"conv": conv1d_init(keys[i], 3, c_in, cfg.channels, cfg.dtype)})
        c_in = cfg.channels
    return {
        "layers": layers,
        # stats pooling doubles the channel dim (mean ‖ std)
        "proj": conv1d_init(keys[-1], 1, 2 * cfg.channels, cfg.embed_dim, cfg.dtype),
    }


def apply_speaker_encoder(
    params: Params, cfg: SpeakerEncoderConfig, mel: jax.Array
) -> jax.Array:
    """mel [batch, frames, n_mels] → embedding [batch, embed_dim], L2-normed."""
    x = mel.astype(cfg.dtype)
    for i, layer in enumerate(params["layers"]):
        x = leaky_relu(conv1d(layer["conv"], x, dilation=2**i))
    mean = jnp.mean(x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.var(x, axis=1), 1e-6))
    stats = jnp.concatenate([mean, std], axis=-1)[:, None, :]
    emb = conv1d(params["proj"], stats)[:, 0, :]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)


def embed_reference_audio(
    params: Params, cfg: SpeakerEncoderConfig, audio: jax.Array
) -> jax.Array:
    """audio [batch, T] (at cfg.sr) → embedding [batch, embed_dim]."""
    mel = log_mel_spectrogram(
        audio, sr=cfg.sr, n_fft=cfg.n_fft, hop=cfg.hop, n_mels=cfg.n_mels
    )
    return apply_speaker_encoder(params, cfg, mel)


__all__ = [
    "SpeakerEncoderConfig",
    "init_speaker_encoder",
    "apply_speaker_encoder",
    "embed_reference_audio",
]
