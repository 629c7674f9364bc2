"""Decoder-only transformer core (functional, pytree params).

One implementation serves every AR family in the framework
(Chatterbox-class T3, Qwen3-TTS-class LM, CosyVoice-class LM, XTTS
GPT): pre-norm RMSNorm blocks, RoPE, GQA attention, SwiGLU MLP,
bfloat16 params with float32 norms/logits.

Design notes (TPU):
- prefill runs the Pallas flash-attention kernel (ops/flash_attention);
- decode steps use the static KV cache (ops/kv_cache) so the whole
  sampling loop stays inside one jitted ``lax.while_loop``;
- all shapes static; batch/length bucketing happens in the runtimes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.ops.flash_attention import flash_attention
from vocalie_tts_tpu.ops.kv_cache import KVCache, decode_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_head: int
    d_ff: int
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    #: extra input channels concatenated/conditioned (0 = none)
    cond_dim: int = 0
    dtype: Any = jnp.bfloat16

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.d_head

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.d_head


# ── init ────────────────────────────────────────────────────────────────


def _dense_init(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_params(key: jax.Array, cfg: TransformerConfig) -> Params:
    keys = jax.random.split(key, cfg.n_layers + 3)
    params: Params = {
        "tok_emb": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "lm_head": _dense_init(keys[1], cfg.d_model, cfg.vocab_size, cfg.dtype),
        "layers": [],
    }
    if cfg.cond_dim:
        params["cond_proj"] = _dense_init(keys[2], cfg.cond_dim, cfg.d_model, cfg.dtype)
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[3 + i], 7)
        params["layers"].append(
            {
                "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "wq": _dense_init(lk[0], cfg.d_model, cfg.q_dim, cfg.dtype),
                "wk": _dense_init(lk[1], cfg.d_model, cfg.kv_dim, cfg.dtype),
                "wv": _dense_init(lk[2], cfg.d_model, cfg.kv_dim, cfg.dtype),
                "wo": _dense_init(lk[3], cfg.q_dim, cfg.d_model, cfg.dtype),
                "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "w_gate": _dense_init(lk[4], cfg.d_model, cfg.d_ff, cfg.dtype),
                "w_up": _dense_init(lk[5], cfg.d_model, cfg.d_ff, cfg.dtype),
                "w_down": _dense_init(lk[6], cfg.d_ff, cfg.d_model, cfg.dtype),
            }
        )
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ── building blocks ─────────────────────────────────────────────────────


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def rope_angles(positions: jax.Array, d_head: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables for *positions* — [..., d_head // 2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d_head, 2, dtype=jnp.float32) / d_head)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [batch, heads, seq, d_head]; cos/sin: [batch?, seq, d_head/2]."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    while cos.ndim < x1.ndim:
        cos = cos[:, None] if cos.ndim == x1.ndim - 1 else cos[None]
        sin = sin[:, None] if sin.ndim == x1.ndim - 1 else sin[None]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _split_heads(x: jax.Array, n_heads: int, d_head: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, d_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _swiglu(x: jax.Array, layer: Params) -> jax.Array:
    gate = jax.nn.silu(jnp.dot(x, layer["w_gate"], preferred_element_type=jnp.float32))
    up = jnp.dot(x, layer["w_up"], preferred_element_type=jnp.float32)
    return jnp.dot((gate * up).astype(x.dtype), layer["w_down"],
                   preferred_element_type=jnp.float32).astype(x.dtype)


# ── forward passes ──────────────────────────────────────────────────────


def prefill(
    params: Params,
    cfg: TransformerConfig,
    tokens: jax.Array,  # [batch, seq] int32
    lengths: jax.Array,  # [batch] valid prompt lengths
    caches: Optional[Tuple[KVCache, ...]] = None,
    cond: Optional[jax.Array] = None,  # [batch, seq, cond_dim] extra conditioning
    inputs_embeds: Optional[jax.Array] = None,
    cache_len: Optional[int] = None,
) -> Tuple[jax.Array, Tuple[KVCache, ...]]:
    """Encode the prompt, fill caches, return last-position logits.

    ``cache_len`` sizes the allocated KV cache (default
    cfg.max_seq_len) — size it to prompt_bucket + decode_bucket so HBM
    isn't wasted on unreachable positions.

    Returns (logits [batch, vocab], caches).
    """
    if inputs_embeds is None:
        b, s = tokens.shape
        x = params["tok_emb"][tokens]
    else:
        b, s = inputs_embeds.shape[:2]
        x = inputs_embeds
    if cond is not None and cfg.cond_dim:
        x = x + jnp.dot(cond.astype(x.dtype), params["cond_proj"])

    positions = jnp.arange(s)[None, :].repeat(b, axis=0)
    cos, sin = rope_angles(positions, cfg.d_head, cfg.rope_theta)

    if caches is None:
        caches = tuple(
            KVCache.create(
                b, cfg.n_kv_heads, cache_len or cfg.max_seq_len, cfg.d_head, cfg.dtype
            )
            for _ in range(cfg.n_layers)
        )
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = _split_heads(jnp.dot(h, layer["wq"]), cfg.n_heads, cfg.d_head)
        k = _split_heads(jnp.dot(h, layer["wk"]), cfg.n_kv_heads, cfg.d_head)
        v = _split_heads(jnp.dot(h, layer["wv"]), cfg.n_kv_heads, cfg.d_head)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.write_prefill(k, v, lengths)
        new_caches.append(cache)
        attn = flash_attention(q, k, v, causal=True)
        x = x + jnp.dot(_merge_heads(attn), layer["wo"]).astype(x.dtype)
        h2 = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        x = x + _swiglu(h2, layer)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    # logits at each row's last valid position
    last_idx = jnp.clip(lengths - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits = jnp.dot(x_last, params["lm_head"], preferred_element_type=jnp.float32)
    return logits, tuple(new_caches)


def decode_step(
    params: Params,
    cfg: TransformerConfig,
    token: jax.Array,  # [batch] int32 — previous token
    caches: Tuple[KVCache, ...],
    cond_vec: Optional[jax.Array] = None,  # [batch, cond_dim] per-step conditioning
) -> Tuple[jax.Array, Tuple[KVCache, ...]]:
    """One AR step: returns (logits [batch, vocab], updated caches)."""
    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]  # [b, 1, d_model]
    if cond_vec is not None and cfg.cond_dim:
        x = x + jnp.dot(cond_vec.astype(x.dtype), params["cond_proj"])[:, None, :]

    positions = caches[0].length[:, None]  # [b, 1]
    cos, sin = rope_angles(positions, cfg.d_head, cfg.rope_theta)

    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = _split_heads(jnp.dot(h, layer["wq"]), cfg.n_heads, cfg.d_head)
        k = _split_heads(jnp.dot(h, layer["wk"]), cfg.n_kv_heads, cfg.d_head)
        v = _split_heads(jnp.dot(h, layer["wv"]), cfg.n_kv_heads, cfg.d_head)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.append(k, v)
        new_caches.append(cache)
        attn = decode_attention(q, cache)
        x = x + jnp.dot(_merge_heads(attn), layer["wo"]).astype(x.dtype)
        h2 = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        x = x + _swiglu(h2, layer)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = jnp.dot(x[:, 0], params["lm_head"], preferred_element_type=jnp.float32)
    return logits, tuple(new_caches)


__all__ = [
    "TransformerConfig",
    "init_params",
    "param_count",
    "rms_norm",
    "rope_angles",
    "apply_rope",
    "prefill",
    "decode_step",
]
