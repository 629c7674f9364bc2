"""Static KV cache for autoregressive decode.

Fixed-shape, preallocated [batch, kv_heads, max_len, head_dim] buffers
so the decode step compiles once per bucket (no dynamic shapes under
jit — the prerequisite for lax.while_loop decode on TPU).

Decode-step attention (q_len == 1) is an HBM-bandwidth-bound gather +
two skinny matmuls; XLA fuses the masked softmax well, so the step
uses plain einsum with a length mask rather than a custom kernel.
Prefill uses ops/flash_attention.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


class KVCache(NamedTuple):
    """One layer's cache. ``length`` counts valid positions per batch row."""

    k: jax.Array  # [batch, kv_heads, max_len, head_dim]
    v: jax.Array  # [batch, kv_heads, max_len, head_dim]
    length: jax.Array  # [batch] int32

    @classmethod
    def create(
        cls,
        batch: int,
        kv_heads: int,
        max_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (batch, kv_heads, max_len, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def write_prefill(self, k_new: jax.Array, v_new: jax.Array, lengths: jax.Array) -> "KVCache":
        """Install prompt K/V at positions [0, prompt_len); *lengths* is
        the per-row valid prompt length."""
        plen = k_new.shape[2]
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), (0, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), (0, 0, 0, 0))
        del plen
        return KVCache(k=k, v=v, length=lengths.astype(jnp.int32))

    def append(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Append one token's K/V at each row's current length."""
        # k_new: [batch, kv_heads, 1, head_dim]
        batch = self.k.shape[0]
        max_len = self.k.shape[2]
        # scatter along the seq axis at per-row positions
        onehot = jax.nn.one_hot(self.length, max_len, dtype=self.k.dtype)  # [b, max_len]
        onehot = onehot[:, None, :, None]  # [b, 1, max_len, 1]
        k = self.k * (1 - onehot) + k_new.astype(self.k.dtype) * onehot
        v = self.v * (1 - onehot) + v_new.astype(self.v.dtype) * onehot
        del batch
        return KVCache(k=k, v=v, length=self.length + 1)


def decode_attention(
    q: jax.Array,  # [batch, q_heads, 1, head_dim]
    cache: KVCache,
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """Single-token attention against the cache with length masking."""
    b, h, _, d = q.shape
    hk = cache.k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if hk != h:
        group = h // hk
        qg = q.reshape(b, hk, group, d)
        s = jnp.einsum(
            "bhgd,bhtd->bhgt",
            qg.astype(jnp.float32),
            cache.k.astype(jnp.float32),
        ) * sm_scale
        positions = jnp.arange(cache.max_len)[None, None, None, :]
        mask = positions < cache.length[:, None, None, None]
        s = jnp.where(mask, s, _NEG)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhgt,bhtd->bhgd", p, cache.v.astype(jnp.float32))
        return out.reshape(b, h, 1, d).astype(q.dtype)
    s = jnp.einsum(
        "bhqd,bhtd->bhqt", q.astype(jnp.float32), cache.k.astype(jnp.float32)
    ) * sm_scale
    positions = jnp.arange(cache.max_len)[None, None, None, :]
    mask = positions < cache.length[:, None, None, None]
    s = jnp.where(mask, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqt,bhtd->bhqd", p, cache.v.astype(jnp.float32)).astype(q.dtype)


def pick_bucket(length: int, buckets: Tuple[int, ...]) -> int:
    """Smallest bucket ≥ length (last bucket if none fits) — keeps the
    number of compiled decode variants bounded."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def round_cache_len(n: int, multiple: int = 128) -> int:
    """Round a KV-cache allocation up to a 128-multiple: the T-blocked
    decode-attention kernel streams the cache in 128-slot lane-aligned
    blocks and clamps DMA at the valid length, so the pad slots cost
    memory but never bandwidth (see ops/decode_attention)."""
    return -(-n // multiple) * multiple


__all__ = ["KVCache", "decode_attention", "pick_bucket", "round_cache_len"]
