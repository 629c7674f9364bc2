"""S3-family speech tokenizer (whisper-style encoder + FSQ) in JAX.

The published CosyVoice2 stack extracts prompt speech tokens for
zero-shot cloning with an "S3" tokenizer (ref:
tts_backends/cosyvoice_runner.py:87-125 inference_zero_shot — the
25 Hz speech_tokenizer_v2): whisper-style log-mel front-end (16 kHz,
128 bands, librosa filters, log10 + max-8 clamp + (x+4)/4), a conv
stem (k3 GELU, second conv stride 2), sinusoidal positions, pre-LN
transformer blocks, an optional ×2 average pool down to 25 Hz, and a
finite-scalar quantizer (8 dims × 3 levels → 6561 codes).

This module + ``models/convert/s3_tokenizer.py`` close the
"speech tokenizer" delta in docs/PARITY.md: with a converted tokenizer
checkpoint, the CosyVoice clone mode conditions the LM on real prompt
speech tokens and the flow on the prompt mel (speech continuation),
instead of the x-vector-only simplification.

TPU notes: tokenization runs once per reference clip, off the decode
hot path — plain XLA attention, channels-last convs (MXU matmuls),
one jit per (chunk-length) bucket. Parity vs an independent torch
replica in ``tests/test_convert_s3_tokenizer.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.common.audio import _mel_filterbank_np, frame_signal

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    d_model: int = 1280
    n_heads: int = 20
    n_layers: int = 6
    sr: int = 16000
    n_fft: int = 400
    hop: int = 160
    #: conv2 stride (whisper stem): 100 fps mel → 50 fps
    conv2_stride: int = 2
    #: extra average-pool after the encoder: 50 → 25 Hz (the published
    #: 25 Hz tokenizers; set 1 for the 50 Hz v1 layout)
    pool: int = 2
    #: FSQ: fsq_dims scalars quantized to fsq_levels each
    fsq_dims: int = 8
    fsq_levels: int = 3
    dtype: Any = jnp.float32

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels ** self.fsq_dims

    @property
    def tokens_per_second(self) -> float:
        return self.sr / self.hop / self.conv2_stride / self.pool


# ── whisper-style log-mel front-end ─────────────────────────────────────


def whisper_log_mel(audio: jax.Array, cfg: S3TokenizerConfig) -> jax.Array:
    """[b, T] 16 kHz → [b, frames, n_mels], whisper normalization:
    log10(clamp(power-mel, 1e-10)), floor at per-row max − 8, (x+4)/4."""
    frames = frame_signal(audio.astype(jnp.float32), cfg.n_fft, cfg.hop)
    window = jnp.asarray(
        (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)), jnp.float32
    )
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1)) ** 2
    # whisper drops the last frame (stft produces T/hop+1, it keeps T/hop)
    spec = spec[:, :-1]
    fb = jnp.asarray(
        _mel_filterbank_np(cfg.sr, cfg.n_fft, cfg.n_mels, 0.0, cfg.sr / 2,
                           scale="slaney")
    )
    mel = jnp.einsum("bfk,km->bfm", spec, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


# ── encoder ─────────────────────────────────────────────────────────────


def _linear_init(key, d_in, d_out, dtype, bias=True):
    w = (jax.random.normal(key, (d_in, d_out), jnp.float32) / math.sqrt(d_in))
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _conv_init(key, k, c_in, c_out, dtype):
    scale = 1.0 / math.sqrt(k * c_in)
    w = jax.random.uniform(key, (k, c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def init_s3_tokenizer(key: jax.Array, cfg: S3TokenizerConfig) -> Params:
    keys = jax.random.split(key, 4 + cfg.n_layers)
    blocks = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[4 + i], 6)
        blocks.append({
            "attn_ln_w": jnp.ones((cfg.d_model,), jnp.float32),
            "attn_ln_b": jnp.zeros((cfg.d_model,), jnp.float32),
            "q": _linear_init(ks[0], cfg.d_model, cfg.d_model, cfg.dtype),
            # whisper convention: the key projection has no bias
            "k": _linear_init(ks[1], cfg.d_model, cfg.d_model, cfg.dtype, bias=False),
            "v": _linear_init(ks[2], cfg.d_model, cfg.d_model, cfg.dtype),
            "out": _linear_init(ks[3], cfg.d_model, cfg.d_model, cfg.dtype),
            "mlp_ln_w": jnp.ones((cfg.d_model,), jnp.float32),
            "mlp_ln_b": jnp.zeros((cfg.d_model,), jnp.float32),
            "mlp_in": _linear_init(ks[4], cfg.d_model, 4 * cfg.d_model, cfg.dtype),
            "mlp_out": _linear_init(ks[5], 4 * cfg.d_model, cfg.d_model, cfg.dtype),
        })
    return {
        "conv1": _conv_init(keys[0], 3, cfg.n_mels, cfg.d_model, cfg.dtype),
        "conv2": _conv_init(keys[1], 3, cfg.d_model, cfg.d_model, cfg.dtype),
        "blocks": blocks,
        "ln_post_w": jnp.ones((cfg.d_model,), jnp.float32),
        "ln_post_b": jnp.zeros((cfg.d_model,), jnp.float32),
        "fsq_proj": _linear_init(keys[2], cfg.d_model, cfg.fsq_dims, cfg.dtype),
    }


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _conv1d(p, x, stride=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + p["b"].astype(x.dtype)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """whisper sinusoidal positions: [length, channels]."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def _attn(blk: Params, cfg: S3TokenizerConfig, x: jax.Array) -> jax.Array:
    b, t, d = x.shape
    h, dh = cfg.n_heads, d // cfg.n_heads
    q = (jnp.dot(x, blk["q"]["w"]) + blk["q"]["b"]).reshape(b, t, h, dh)
    k = jnp.dot(x, blk["k"]["w"]).reshape(b, t, h, dh)
    v = (jnp.dot(x, blk["v"]["w"]) + blk["v"]["b"]).reshape(b, t, h, dh)
    # whisper scales q and k by dh^-0.25 each
    scale = dh ** -0.25
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
    return jnp.dot(out, blk["out"]["w"]) + blk["out"]["b"]


def encode_features(params: Params, cfg: S3TokenizerConfig,
                    mel: jax.Array) -> jax.Array:
    """[b, frames, n_mels] → [b, frames//(conv2_stride·pool), fsq_dims]."""
    x = jax.nn.gelu(_conv1d(params["conv1"], mel.astype(cfg.dtype)), approximate=False)
    x = jax.nn.gelu(_conv1d(params["conv2"], x, stride=cfg.conv2_stride),
                    approximate=False)
    if "pos_emb" in params:     # checkpoint-stored positions (whisper buffer)
        pos = params["pos_emb"][: x.shape[1]]
    else:
        pos = jnp.asarray(_sinusoids(x.shape[1], cfg.d_model))
    x = x + pos[None].astype(x.dtype)
    for blk in params["blocks"]:
        x = x + _attn(blk, cfg, _ln(x, blk["attn_ln_w"], blk["attn_ln_b"]))
        y = _ln(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
        y = jax.nn.gelu(jnp.dot(y, blk["mlp_in"]["w"]) + blk["mlp_in"]["b"],
                        approximate=False)
        x = x + (jnp.dot(y, blk["mlp_out"]["w"]) + blk["mlp_out"]["b"])
    x = _ln(x, params["ln_post_w"], params["ln_post_b"])
    if cfg.pool > 1:
        t = (x.shape[1] // cfg.pool) * cfg.pool
        x = x[:, :t].reshape(x.shape[0], t // cfg.pool, cfg.pool, -1).mean(axis=2)
    return jnp.dot(x, params["fsq_proj"]["w"]) + params["fsq_proj"]["b"]


def fsq_quantize(z: jax.Array, cfg: S3TokenizerConfig) -> jax.Array:
    """Finite scalar quantization → token ids [b, t].

    Each of the fsq_dims scalars is squashed with tanh, scaled to the
    level range, rounded, and the digits combine base-``fsq_levels``
    (dim 0 least significant)."""
    half = (cfg.fsq_levels - 1) / 2.0
    # the published FSQ shrinks by a hair below 1.0 so tanh(±∞) rounds
    # inward deterministically
    h = jnp.tanh(z.astype(jnp.float32)) * 0.999 * half
    digits = jnp.round(h) + half                       # in [0, levels)
    base = cfg.fsq_levels ** jnp.arange(cfg.fsq_dims)
    return jnp.sum(digits.astype(jnp.int32) * base[None, None, :], axis=-1)


def tokenize(params: Params, cfg: S3TokenizerConfig, audio_16k: jax.Array) -> jax.Array:
    """[b, T] 16 kHz → [b, n_tokens] speech token ids."""
    mel = whisper_log_mel(audio_16k, cfg)
    z = encode_features(params, cfg, mel)
    return fsq_quantize(z, cfg)


__all__ = [
    "S3TokenizerConfig",
    "init_s3_tokenizer",
    "whisper_log_mel",
    "encode_features",
    "fsq_quantize",
    "tokenize",
]
