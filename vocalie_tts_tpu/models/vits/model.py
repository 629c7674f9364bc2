"""VITS-class model graph: phones → latent → waveform, one jitted pass.

Inference path (ref behavior: the Piper fr_FR VITS engine named by
BASELINE config #1): phone embeddings → bidirectional transformer
encoder → duration predictor → length regulation → affine-coupling
flow (inverse) → HiFi-GAN decoder at 22.05 kHz.

Everything is static-shape: phone length and frame length are padded
to buckets and masked, so one compilation serves a bucket. The whole
graph is a single jit — no Python between encoder and vocoder.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    layer_norm,
    leaky_relu,
)
from vocalie_tts_tpu.models.common.vocoder import (
    VocoderConfig,
    apply_vocoder,
    init_vocoder,
)
from vocalie_tts_tpu.ops.flash_attention import flash_attention
from vocalie_tts_tpu.text.phonemes import N_PHONES

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VITSConfig:
    n_phones: int = N_PHONES
    d_model: int = 192
    n_layers: int = 6
    n_heads: int = 2
    d_ff: int = 768
    latent_dim: int = 192
    n_flows: int = 4
    n_speakers: int = 4
    speaker_dim: int = 64
    sample_rate: int = 22050
    max_phones: int = 512
    max_frames: int = 1200  # ~14 s at 86 fps
    vocoder_channels: int = 512
    dtype: Any = jnp.float32

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(
            n_mels=self.latent_dim,
            base_channels=self.vocoder_channels,
            upsample_rates=(8, 8, 2, 2),
            upsample_kernels=(16, 16, 4, 4),
            dtype=self.dtype,
        )


# ── init ────────────────────────────────────────────────────────────────


def _dense(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_vits(key: jax.Array, cfg: VITSConfig) -> Params:
    keys = jax.random.split(key, 10 + cfg.n_layers + cfg.n_flows)
    params: Params = {
        "phone_emb": (
            jax.random.normal(keys[0], (cfg.n_phones, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "speaker_emb": (
            jax.random.normal(keys[1], (cfg.n_speakers, cfg.speaker_dim), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "spk_proj": _dense(keys[2], cfg.speaker_dim, cfg.d_model, cfg.dtype),
        "enc_layers": [],
        "stats_proj": _dense(keys[3], cfg.d_model, 2 * cfg.latent_dim, cfg.dtype),
        "dp": {
            "conv1": conv1d_init(keys[4], 3, cfg.d_model, 256, cfg.dtype),
            "norm1": {"g": jnp.ones((256,), jnp.float32), "b": jnp.zeros((256,), jnp.float32)},
            "conv2": conv1d_init(keys[5], 3, 256, 256, cfg.dtype),
            "norm2": {"g": jnp.ones((256,), jnp.float32), "b": jnp.zeros((256,), jnp.float32)},
            "out": conv1d_init(keys[6], 1, 256, 1, cfg.dtype),
        },
        "flows": [],
        "vocoder": init_vocoder(keys[7], cfg.vocoder),
    }
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[8 + i], 6)
        params["enc_layers"].append(
            {
                "norm1": {"g": jnp.ones((cfg.d_model,), jnp.float32), "b": jnp.zeros((cfg.d_model,), jnp.float32)},
                "wq": _dense(lk[0], cfg.d_model, cfg.d_model, cfg.dtype),
                "wk": _dense(lk[1], cfg.d_model, cfg.d_model, cfg.dtype),
                "wv": _dense(lk[2], cfg.d_model, cfg.d_model, cfg.dtype),
                "wo": _dense(lk[3], cfg.d_model, cfg.d_model, cfg.dtype),
                "norm2": {"g": jnp.ones((cfg.d_model,), jnp.float32), "b": jnp.zeros((cfg.d_model,), jnp.float32)},
                "ff1": _dense(lk[4], cfg.d_model, cfg.d_ff, cfg.dtype),
                "ff2": _dense(lk[5], cfg.d_ff, cfg.d_model, cfg.dtype),
            }
        )
    half = cfg.latent_dim // 2
    for i in range(cfg.n_flows):
        fk = jax.random.split(keys[8 + cfg.n_layers + i], 3)
        params["flows"].append(
            {
                "conv1": conv1d_init(fk[0], 5, half, 256, cfg.dtype),
                "conv2": conv1d_init(fk[1], 5, 256, 256, cfg.dtype),
                # zero-init last layer → identity flow at init (standard)
                "out": {
                    "w": jnp.zeros((1, 256, 2 * half), cfg.dtype),
                    "b": jnp.zeros((2 * half,), cfg.dtype),
                },
            }
        )
    return params


# ── encoder ─────────────────────────────────────────────────────────────


def _encoder(
    params: Params, cfg: VITSConfig, phones: jax.Array, mask: jax.Array, spk: jax.Array
) -> jax.Array:
    x = params["phone_emb"][phones]
    x = x + jnp.dot(spk, params["spk_proj"])[:, None, :]
    x = x * mask[..., None]
    d_head = cfg.d_model // cfg.n_heads
    for layer in params["enc_layers"]:
        h = layer_norm(x, layer["norm1"]["g"], layer["norm1"]["b"])
        b, s, _ = h.shape
        q = jnp.dot(h, layer["wq"]).reshape(b, s, cfg.n_heads, d_head).transpose(0, 2, 1, 3)
        k = jnp.dot(h, layer["wk"]).reshape(b, s, cfg.n_heads, d_head).transpose(0, 2, 1, 3)
        v = jnp.dot(h, layer["wv"]).reshape(b, s, cfg.n_heads, d_head).transpose(0, 2, 1, 3)
        # padded phones masked by zeroing K/V contribution via large-neg bias:
        # cheaper: zero inputs + rely on mask multiply after
        attn = flash_attention(q, k, v, causal=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        x = x + jnp.dot(attn, layer["wo"])
        h2 = layer_norm(x, layer["norm2"]["g"], layer["norm2"]["b"])
        x = x + jnp.dot(jax.nn.gelu(jnp.dot(h2, layer["ff1"])), layer["ff2"])
        x = x * mask[..., None]
    return x


def _duration_predictor(params: Params, x: jax.Array, mask: jax.Array) -> jax.Array:
    dp = params["dp"]
    h = leaky_relu(conv1d(dp["conv1"], x))
    h = layer_norm(h, dp["norm1"]["g"], dp["norm1"]["b"])
    h = leaky_relu(conv1d(dp["conv2"], h))
    h = layer_norm(h, dp["norm2"]["g"], dp["norm2"]["b"])
    log_dur = conv1d(dp["out"], h)[..., 0]
    return log_dur * mask  # [b, L]


def _length_regulate(
    h: jax.Array, durations: jax.Array, max_frames: int
) -> Tuple[jax.Array, jax.Array]:
    """Expand phone-level features to frames via duration gather.

    durations: [b, L] int32. Returns (frames [b, max_frames, d],
    frame_mask [b, max_frames]).
    """
    cum = jnp.cumsum(durations, axis=1)  # [b, L] — end frame of each phone
    total = cum[:, -1]
    frame_idx = jnp.arange(max_frames)[None, :]  # [1, F]
    # phone index for each frame: first phone whose cum > frame
    phone_idx = jnp.sum(frame_idx[:, :, None] >= cum[:, None, :], axis=-1)  # [b, F]
    phone_idx = jnp.clip(phone_idx, 0, h.shape[1] - 1)
    frames = jnp.take_along_axis(h, phone_idx[..., None], axis=1)
    frame_mask = (frame_idx < total[:, None]).astype(h.dtype)
    return frames * frame_mask[..., None], frame_mask


def _flow_inverse(params: Params, z: jax.Array, mask: jax.Array) -> jax.Array:
    """Inverse pass of the affine coupling stack (z → latent)."""
    half = z.shape[-1] // 2
    for flow in reversed(params["flows"]):
        # inverse of: [a; b] -> [a; b*exp(s(a)) + t(a)], with channel flip
        z1, z2 = z[..., :half], z[..., half:]
        h = leaky_relu(conv1d(flow["conv1"], z1))
        h = leaky_relu(conv1d(flow["conv2"], h))
        st = conv1d(flow["out"], h)
        s, t = st[..., :half], st[..., half:]
        s = jnp.tanh(s)
        z2 = (z2 - t) * jnp.exp(-s) * mask[..., None]
        z = jnp.concatenate([z2, z1], axis=-1)  # flip halves each step
    return z


# ── public inference ────────────────────────────────────────────────────


def encode_and_durations(
    params: Params,
    cfg: VITSConfig,
    phones: jax.Array,      # [b, max_phones] int32 (padded with 0)
    phone_lengths: jax.Array,  # [b]
    speaker_id: jax.Array,  # [b] int32
    rng: jax.Array,
    *,
    length_scale: float = 1.0,
    noise_w: float = 0.8,
) -> Tuple[jax.Array, jax.Array]:
    """Stage A: text encoding + durations.

    Returns (hidden [b, max_phones, d], durations [b, max_phones]).
    Split from the decode stage so the runtime can pick the FRAME
    bucket from the actual predicted duration — the vocoder (the
    dominant FLOPs) then renders only ~the frames that exist instead
    of always max_frames.
    """
    b, max_p = phones.shape
    mask = (jnp.arange(max_p)[None, :] < phone_lengths[:, None]).astype(cfg.dtype)
    spk = params["speaker_emb"][speaker_id]

    h = _encoder(params, cfg, phones, mask, spk)
    log_dur = _duration_predictor(params, h, mask)
    # duration jitter stands in for the stochastic duration predictor
    log_dur = log_dur + noise_w * 0.1 * jax.random.normal(rng, log_dur.shape)
    durations = jnp.clip(
        jnp.round(jnp.exp(log_dur) * float(length_scale)), 1.0, 80.0
    ) * mask
    return h, durations.astype(jnp.int32)


def decode_frames(
    params: Params,
    cfg: VITSConfig,
    h: jax.Array,           # [b, max_phones, d] from stage A
    durations: jax.Array,   # [b, max_phones]
    rng: jax.Array,
    *,
    max_frames: int,
    noise_scale: float = 0.667,
) -> Tuple[jax.Array, jax.Array]:
    """Stage B: expand → flow inverse → vocoder at a chosen frame bucket."""
    frames, frame_mask = _length_regulate(h, durations, max_frames)
    stats = jnp.dot(frames, params["stats_proj"])
    m, logs = stats[..., : cfg.latent_dim], stats[..., cfg.latent_dim :]
    logs = jnp.clip(logs, -6.0, 2.0)
    eps = jax.random.normal(rng, m.shape, dtype=jnp.float32).astype(m.dtype)
    z = m + eps * jnp.exp(logs) * noise_scale
    z = _flow_inverse(params, z * frame_mask[..., None], frame_mask)

    audio = apply_vocoder(params["vocoder"], cfg.vocoder, z)
    hop = cfg.vocoder.hop
    sample_lengths = (
        jnp.minimum(jnp.sum(durations, axis=1), max_frames) * hop
    ).astype(jnp.int32)
    return audio, sample_lengths


def synthesize(
    params: Params,
    cfg: VITSConfig,
    phones: jax.Array,
    phone_lengths: jax.Array,
    speaker_id: jax.Array,
    rng: jax.Array,
    *,
    length_scale: float = 1.0,
    noise_scale: float = 0.667,
    noise_w: float = 0.8,
) -> Tuple[jax.Array, jax.Array]:
    """Single-jit convenience path (stage A + stage B at max_frames)."""
    rng, k1, k2 = jax.random.split(rng, 3)
    h, durations = encode_and_durations(
        params, cfg, phones, phone_lengths, speaker_id, k1,
        length_scale=length_scale, noise_w=noise_w,
    )
    return decode_frames(
        params, cfg, h, durations, k2,
        max_frames=cfg.max_frames, noise_scale=noise_scale,
    )


__all__ = ["VITSConfig", "init_vits", "encode_and_durations", "decode_frames", "synthesize"]
