"""Upsampling conformer token encoder (CosyVoice2/S3Gen flow front-end).

The published flow module both the reference's CosyVoice engine and
Chatterbox's S3Gen stage load (ref: tts_backends/cosyvoice_runner.py:
67-76, tts_backends/chatterbox_impl.py:63-73) encodes speech tokens
with an ``UpsampleConformerEncoder``: linear embed (+ Espnet
relative-position encoding), a pre-lookahead conv layer, N conformer
blocks (rel-pos self-attention + ReLU FFN, pre-norm, no cnn/macaron in
the published config), a nearest×2 upsample conv, then M more blocks
and a final LayerNorm. This module implements that graph functionally
in JAX; the param tree mirrors the torch module tree (convert/
conformer.py maps published ``flow.encoder.*`` state dicts onto it).

TPU notes: activations are [b, t, c]; the Transformer-XL relative
attention term is an einsum against the static [2T-1] position table
followed by a take_along_axis gather — no rel-shift view tricks, same
math (bd[i, j] reads relative position i-j), verified against a torch
replica in tests/test_convert_conformer.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.unet2d import dense, dense_init

Params = Dict[str, Any]

_DN = ("NHC", "HIO", "NHC")


@dataclasses.dataclass(frozen=True)
class ConformerEncoderConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    upsample_stride: int = 2
    pre_lookahead_len: int = 3
    #: compute dtype (norms/softmax stay f32); full scale runs bf16
    dtype: Any = jnp.float32

    @property
    def d_head(self) -> int:
        return self.output_size // self.attention_heads


def _conv1d_init(key, kernel, c_in, c_out):
    scale = 1.0 / math.sqrt(kernel * c_in)
    w = jax.random.uniform(key, (kernel, c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def _conv1d_valid(p: Params, x: jax.Array, pad: tuple[int, int]) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [pad], dimension_numbers=_DN
    )
    return out + p["b"].astype(x.dtype)


def _layer_norm(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _embed_init(key, d_in, d_out):
    return {
        "linear": dense_init(key, d_in, d_out),
        "norm_g": jnp.ones((d_out,), jnp.float32),
        "norm_b": jnp.zeros((d_out,), jnp.float32),
    }


def _layer_init(key, cfg: ConformerEncoderConfig):
    d, h, dk = cfg.output_size, cfg.attention_heads, cfg.d_head
    keys = jax.random.split(key, 8)
    return {
        "linear_q": dense_init(keys[0], d, d),
        "linear_k": dense_init(keys[1], d, d),
        "linear_v": dense_init(keys[2], d, d),
        "linear_out": dense_init(keys[3], d, d),
        "linear_pos": dense_init(keys[4], d, d)["w"],  # bias=False
        "pos_bias_u": jnp.zeros((h, dk), jnp.float32),
        "pos_bias_v": jnp.zeros((h, dk), jnp.float32),
        "norm_mha_g": jnp.ones((d,), jnp.float32),
        "norm_mha_b": jnp.zeros((d,), jnp.float32),
        "ff_w1": dense_init(keys[5], d, cfg.linear_units),
        "ff_w2": dense_init(keys[6], cfg.linear_units, d),
        "norm_ff_g": jnp.ones((d,), jnp.float32),
        "norm_ff_b": jnp.zeros((d,), jnp.float32),
    }


def init_conformer_encoder(key: jax.Array, cfg: ConformerEncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.num_blocks + cfg.num_up_blocks + 5)
    it = iter(keys)
    return {
        "embed": _embed_init(next(it), cfg.input_size, cfg.output_size),
        "pre_lookahead": {
            "conv1": _conv1d_init(next(it), cfg.pre_lookahead_len + 1, cfg.output_size, cfg.output_size),
            "conv2": _conv1d_init(next(it), 3, cfg.output_size, cfg.output_size),
        },
        "encoders": [_layer_init(next(it), cfg) for _ in range(cfg.num_blocks)],
        "up_layer": _conv1d_init(
            next(it), cfg.upsample_stride * 2 + 1, cfg.output_size, cfg.output_size
        ),
        "up_embed": _embed_init(next(it), cfg.input_size, cfg.output_size),
        "up_encoders": [_layer_init(next(it), cfg) for _ in range(cfg.num_up_blocks)],
        "after_norm_g": jnp.ones((cfg.output_size,), jnp.float32),
        "after_norm_b": jnp.zeros((cfg.output_size,), jnp.float32),
    }


def _rel_pos_table(t: int, d: int) -> jax.Array:
    """Espnet relative positional encoding: [2t-1, d], index k ↦
    position t-1-k (positive = query after key)."""
    pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)  # t-1 … -(t-1)
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * (-math.log(10000.0) / d))
    ang = pos[:, None] * div[None, :]
    pe = jnp.zeros((2 * t - 1, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def _rel_attention(
    p: Params, cfg: ConformerEncoderConfig, x: jax.Array,
    pos_p: jax.Array, attn_bias: Optional[jax.Array],
) -> jax.Array:
    """Transformer-XL rel-pos attention (espnet RelPositionMultiHeadedAttention)."""
    b, t, d = x.shape
    h, dk = cfg.attention_heads, cfg.d_head
    q = dense(p["linear_q"], x).reshape(b, t, h, dk)
    k = dense(p["linear_k"], x).reshape(b, t, h, dk)
    v = dense(p["linear_v"], x).reshape(b, t, h, dk)

    ac = jnp.einsum("bihd,bjhd->bhij", q + p["pos_bias_u"].astype(q.dtype), k)
    bd_full = jnp.einsum(
        "bihd,khd->bhik", q + p["pos_bias_v"].astype(q.dtype), pos_p.astype(q.dtype)
    )  # [b, h, t, 2t-1]
    # bd[i, j] = bd_full[i, t-1 + j - i]  (relative distance i-j)
    idx = (t - 1) + jnp.arange(t)[None, :] - jnp.arange(t)[:, None]  # [t, t]
    bd = jnp.take_along_axis(bd_full, idx[None, None, :, :].astype(jnp.int32), axis=-1)

    logits = (ac + bd).astype(jnp.float32) / math.sqrt(dk)
    if attn_bias is not None:
        logits = logits + attn_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bjhd->bihd", probs, v).reshape(b, t, d)
    return dense(p["linear_out"], o)


def _conformer_layer(
    p: Params, cfg: ConformerEncoderConfig, x: jax.Array,
    pos_p: jax.Array, attn_bias: Optional[jax.Array],
) -> jax.Array:
    """Pre-norm block: rel-pos MHA, then ReLU FFN (no macaron/cnn in the
    published flow-encoder config)."""
    h = _layer_norm(x, p["norm_mha_g"], p["norm_mha_b"])
    x = x + _rel_attention(p, cfg, h, pos_p, attn_bias)
    h = _layer_norm(x, p["norm_ff_g"], p["norm_ff_b"])
    h = dense(p["ff_w2"], jax.nn.relu(dense(p["ff_w1"], h)))
    return x + h


def apply_conformer_encoder(
    p: Params,
    cfg: ConformerEncoderConfig,
    x: jax.Array,                       # [b, t, input_size]
    mask: Optional[jax.Array] = None,   # [b, t, 1] validity
) -> jax.Array:
    """Tokens-features → [b, t*stride, output_size]."""
    xscale = math.sqrt(cfg.output_size)
    x = x.astype(cfg.dtype)

    def embed(ep, h):
        h = dense(ep["linear"], h)
        h = _layer_norm(h, ep["norm_g"], ep["norm_b"])
        return h * xscale

    def attn_bias_of(m):
        if m is None:
            return None
        keep = m[:, None, None, :, 0] > 0
        return jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    x = embed(p["embed"], x)

    # pre-lookahead: right-pad conv (sees the future), leaky_relu(0.01),
    # left-pad conv, residual
    pl = p["pre_lookahead"]
    h = _conv1d_valid(pl["conv1"], x, (0, cfg.pre_lookahead_len))
    h = jnp.where(h >= 0, h, 0.01 * h)
    h = _conv1d_valid(pl["conv2"], h, (2, 0))
    x = x + h

    bias = attn_bias_of(mask)
    pe = _rel_pos_table(x.shape[1], cfg.output_size)
    for layer in p["encoders"]:
        pos_p = jnp.dot(pe, layer["linear_pos"]).reshape(-1, cfg.attention_heads, cfg.d_head)
        x = _conformer_layer(layer, cfg, x, pos_p, bias)

    # nearest ×stride upsample, left-pad causal conv (k = 2*stride+1)
    s = cfg.upsample_stride
    x = jnp.repeat(x, s, axis=1)
    x = _conv1d_valid(p["up_layer"], x, (2 * s, 0))
    up_mask = None if mask is None else jnp.repeat(mask, s, axis=1)

    x = embed(p["up_embed"], x)
    bias = attn_bias_of(up_mask)
    pe = _rel_pos_table(x.shape[1], cfg.output_size)
    for layer in p["up_encoders"]:
        pos_p = jnp.dot(pe, layer["linear_pos"]).reshape(-1, cfg.attention_heads, cfg.d_head)
        x = _conformer_layer(layer, cfg, x, pos_p, bias)

    x = _layer_norm(x, p["after_norm_g"], p["after_norm_b"])
    if up_mask is not None:
        x = x * up_mask
    return x


__all__ = [
    "ConformerEncoderConfig",
    "init_conformer_encoder",
    "apply_conformer_encoder",
]
