"""XTTS-v2 conditioning path: mel → ConditioningEncoder → Perceiver.

The published XTTS-v2 checkpoint derives its 32 GPT conditioning
latents from the reference audio, not from a speaker vector: an
80-mel spectrogram of the reference passes through a stack of
pointwise-conv + self-attention blocks (the tortoise-style
``ConditioningEncoder``), then a 2-layer ``PerceiverResampler``
cross-attends 32 learned latents over the encoded frames (ref:
SURVEY §2.4 XTTS re-support mandate; BASELINE config #2 names the
engine "XTTS-v2 French voice clone from a Ref_audio/ sample" — this
module is what makes the published ``gpt.conditioning_encoder.*`` /
``gpt.conditioning_perceiver.*`` tensors loadable, closing the
"conditioning perceiver" delta in docs/PARITY.md).

Layouts are TPU-native: activations [batch, frames, channels]
(channels on lanes → every pointwise conv is an MXU matmul); the
attention blocks run as plain XLA softmax attention — conditioning
runs once per reference clip, far off the decode hot path, so kernel
effort is not warranted here.

Conversion from the torch layout lives in
``models/convert/xtts_modules.py``; parity vs an independent torch
replica in ``tests/test_convert_xtts_cond.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.audio import mel_filterbank, stft

Params = Dict[str, Any]


# ── cloning mel front-end ────────────────────────────────────────────────
#
# The published front-end (XTTS `wav_to_mel_cloning`): 22.05 kHz audio,
# |STFT|² with n_fft = win = 4096 / hop 1024, slaney-normalized mel
# (fmin 0, fmax 8000, 80 bands, HTK-style break points), natural log
# clamped at 1e-5, then divided per-band by the checkpoint's
# `mel_stats.pth` norms.

CLONING_SR = 22050
CLONING_N_FFT = 4096
CLONING_HOP = 1024
CLONING_N_MELS = 80
CLONING_FMAX = 8000.0


def cloning_mel(
    audio: jax.Array,            # [batch, T] at 22.05 kHz, float32 in [-1, 1]
    mel_norms: Optional[jax.Array] = None,  # [80] per-band divisors
) -> jax.Array:
    """[batch, T] → [batch, frames, 80] normalized log-mel.

    Filterbank is librosa-compatible (Slaney scale + slaney norm) —
    the tortoise-lineage front-end the published checkpoint's
    mel_norms were computed against."""
    spec = jnp.abs(stft(audio.astype(jnp.float32), CLONING_N_FFT, CLONING_HOP)) ** 2
    fb = mel_filterbank(CLONING_SR, CLONING_N_FFT, CLONING_N_MELS, 0.0, CLONING_FMAX,
                        scale="slaney")
    mel = jnp.einsum("bfk,km->bfm", spec, fb)
    mel = jnp.log(jnp.maximum(mel, 1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, None, :]
    return mel


# ── ConditioningEncoder ─────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class ConditioningEncoderConfig:
    spec_dim: int = 80
    d_model: int = 1024
    n_blocks: int = 6
    n_heads: int = 16
    groups: int = 32          # GroupNorm groups in each attention block
    dtype: Any = jnp.float32


def _conv1x1_init(key, c_in, c_out, dtype):
    scale = 1.0 / math.sqrt(c_in)
    w = jax.random.uniform(key, (c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def _attn_block_init(key, cfg: ConditioningEncoderConfig) -> Params:
    k1, k2 = jax.random.split(key)
    d = cfg.d_model
    return {
        "norm_w": jnp.ones((d,), jnp.float32),
        "norm_b": jnp.zeros((d,), jnp.float32),
        # qkv channel order is the torch "legacy" per-head [q|k|v]
        # interleave (head h owns channels [h·3dh, (h+1)·3dh)); the
        # apply below reshapes accordingly so converted checkpoints
        # drop in without a permutation.
        "qkv": _conv1x1_init(k1, d, 3 * d, cfg.dtype),
        "proj": _conv1x1_init(k2, d, d, cfg.dtype),
    }


def init_conditioning_encoder(key: jax.Array, cfg: ConditioningEncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.n_blocks + 1)
    return {
        "init": _conv1x1_init(keys[0], cfg.spec_dim, cfg.d_model, cfg.dtype),
        "blocks": [_attn_block_init(keys[i + 1], cfg) for i in range(cfg.n_blocks)],
    }


def _group_norm(x: jax.Array, groups: int, w: jax.Array, b: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the channel axis of [b, T, C] — stats span the
    FULL (T, C/groups) extent per group, matching torch GroupNorm on
    [b, C, T]."""
    bsz, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(bsz, t, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(bsz, t, c) * w + b).astype(x.dtype)


def _attn_block_apply(p: Params, cfg: ConditioningEncoderConfig, x: jax.Array) -> jax.Array:
    bsz, t, d = x.shape
    h, dh = cfg.n_heads, d // cfg.n_heads
    y = _group_norm(x, cfg.groups, p["norm_w"], p["norm_b"])
    qkv = jnp.dot(y, p["qkv"]["w"]) + p["qkv"]["b"]          # [b, T, 3d]
    qkv = qkv.reshape(bsz, t, h, 3, dh)                       # legacy interleave
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]  # [b, T, h, dh]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bsz, t, d)
    out = jnp.dot(out, p["proj"]["w"]) + p["proj"]["b"]
    return x + out


def apply_conditioning_encoder(
    params: Params, cfg: ConditioningEncoderConfig, mel: jax.Array  # [b, T, 80]
) -> jax.Array:
    x = jnp.dot(mel.astype(cfg.dtype), params["init"]["w"]) + params["init"]["b"]
    for blk in params["blocks"]:
        x = _attn_block_apply(blk, cfg, x)
    return x                                                   # [b, T, d]


# ── PerceiverResampler ──────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    dim: int = 1024
    depth: int = 2
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @property
    def dim_inner(self) -> int:
        return self.dim_head * self.heads

    @property
    def ff_inner(self) -> int:
        # lucidrains GEGLU sizing: int(dim · mult · 2/3)
        return int(self.dim * self.ff_mult * 2 / 3)


def _nobias_linear_init(key, d_in, d_out, dtype):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) / math.sqrt(d_in)
    return {"w": w.astype(dtype)}


def init_perceiver(key: jax.Array, cfg: PerceiverConfig) -> Params:
    keys = jax.random.split(key, 1 + 5 * cfg.depth)
    layers = []
    for i in range(cfg.depth):
        kq, kkv, ko, kf1, kf2 = keys[1 + 5 * i : 6 + 5 * i]
        layers.append({
            "to_q": _nobias_linear_init(kq, cfg.dim, cfg.dim_inner, cfg.dtype),
            "to_kv": _nobias_linear_init(kkv, cfg.dim, 2 * cfg.dim_inner, cfg.dtype),
            "to_out": _nobias_linear_init(ko, cfg.dim_inner, cfg.dim, cfg.dtype),
            "ff_in": {
                "w": (jax.random.normal(kf1, (cfg.dim, 2 * cfg.ff_inner), jnp.float32)
                      / math.sqrt(cfg.dim)).astype(cfg.dtype),
                "b": jnp.zeros((2 * cfg.ff_inner,), cfg.dtype),
            },
            "ff_out": {
                "w": (jax.random.normal(kf2, (cfg.ff_inner, cfg.dim), jnp.float32)
                      / math.sqrt(cfg.ff_inner)).astype(cfg.dtype),
                "b": jnp.zeros((cfg.dim,), cfg.dtype),
            },
        })
    return {
        "latents": (jax.random.normal(keys[0], (cfg.num_latents, cfg.dim), jnp.float32)
                    * 0.02).astype(cfg.dtype),
        "layers": layers,
        "norm_gamma": jnp.ones((cfg.dim,), jnp.float32),
    }


def _perceiver_attn(layer: Params, cfg: PerceiverConfig,
                    latents: jax.Array, context: jax.Array) -> jax.Array:
    bsz, n, d = latents.shape
    h, dh = cfg.heads, cfg.dim_head
    # cross_attn_include_queries=True: latents prepend the context
    ctx = jnp.concatenate([latents, context], axis=1)
    q = jnp.dot(latents, layer["to_q"]["w"]).reshape(bsz, n, h, dh)
    kv = jnp.dot(ctx, layer["to_kv"]["w"])
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(bsz, -1, h, dh)
    v = v.reshape(bsz, -1, h, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(latents.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bsz, n, h * dh)
    return jnp.dot(out, layer["to_out"]["w"])


def _geglu_ff(layer: Params, x: jax.Array) -> jax.Array:
    hid = jnp.dot(x, layer["ff_in"]["w"]) + layer["ff_in"]["b"]
    val, gate = jnp.split(hid, 2, axis=-1)
    hid = val * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return jnp.dot(hid, layer["ff_out"]["w"]) + layer["ff_out"]["b"]


def _rms_norm_unit(x: jax.Array, gamma: jax.Array, dim: int) -> jax.Array:
    """lucidrains RMSNorm: L2-normalize then scale by √dim · γ."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.maximum(jnp.sum(xf * xf, -1, keepdims=True), 1e-24))
    return (xf * math.sqrt(dim) * gamma).astype(x.dtype)


def apply_perceiver(params: Params, cfg: PerceiverConfig,
                    context: jax.Array) -> jax.Array:  # [b, T, dim] → [b, 32, dim]
    bsz = context.shape[0]
    latents = jnp.broadcast_to(params["latents"][None], (bsz, cfg.num_latents, cfg.dim))
    for layer in params["layers"]:
        latents = _perceiver_attn(layer, cfg, latents, context) + latents
        latents = _geglu_ff(layer, latents) + latents
    return _rms_norm_unit(latents, params["norm_gamma"], cfg.dim)


# ── combined conditioning path ──────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class XTTSConditioningConfig:
    encoder: ConditioningEncoderConfig = ConditioningEncoderConfig()
    perceiver: PerceiverConfig = PerceiverConfig()


def init_xtts_conditioning(key: jax.Array, cfg: XTTSConditioningConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_conditioning_encoder(k1, cfg.encoder),
        "perceiver": init_perceiver(k2, cfg.perceiver),
        # per-band mel divisors from the checkpoint's mel_stats.pth
        "mel_norms": jnp.ones((cfg.encoder.spec_dim,), jnp.float32),
    }


def compute_cond_latents(
    params: Params, cfg: XTTSConditioningConfig, audio_22k: jax.Array  # [b, T]
) -> jax.Array:
    """Reference audio → [b, num_latents, dim] GPT conditioning latents."""
    mel = cloning_mel(audio_22k, params["mel_norms"])
    enc = apply_conditioning_encoder(params["encoder"], cfg.encoder, mel)
    return apply_perceiver(params["perceiver"], cfg.perceiver, enc)


__all__ = [
    "CLONING_SR",
    "ConditioningEncoderConfig",
    "PerceiverConfig",
    "XTTSConditioningConfig",
    "cloning_mel",
    "init_conditioning_encoder",
    "apply_conditioning_encoder",
    "init_perceiver",
    "apply_perceiver",
    "init_xtts_conditioning",
    "compute_cond_latents",
]
