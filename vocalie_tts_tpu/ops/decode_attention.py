"""Fused single-step (q_len == 1) decode attention as a Pallas kernel.

STATUS: experimental opt-in (``TransformerConfig.decode_kernel`` /
``VOCALIE_DECODE_KERNEL=1``) — measured on v5e, the XLA fused einsum
path in decode_step remains FASTER for the int8 cache:

    per-step, b=16, cache 576, 0.5B (kv+w int8):  XLA 4.5 ms · this
    kernel 6.7 ms; bf16 cache: XLA 5.96 ms · this kernel 5.56 ms.

Findings (kept for the next attempt): (1) pallas_call operands
materialize — feeding it a dynamic slice of the stacked cache costs a
full extra HBM round trip per layer; the stacked variant below avoids
that with a scalar-prefetch layer index in the BlockSpec index_map.
(2) Mosaic lowers M=1 dot_generals with transposes/relayouts, and its
int8→f32 VMEM dequant is slower than XLA's fused kLoop dequant.
(3) [1, T] broadcast-reduce shapes hit "Not implemented: Offset
change" in vector.multi_reduction. Net: the einsum chain XLA already
emits reads K/V once at 1 B/elem and is hard to beat without a
lower-level (Mosaic-custom) dequant path.

Handles GQA (q block [group, d] per kv head) and the int8-quantized
cache (per-position amax scales folded into the score and the
probabilities — same math as the XLA path in
models/common/transformer.py decode_step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_quant(q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref, *, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)          # [g, d]
    k = k_ref[0, 0].astype(jnp.float32)          # [T, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # [g, T]
    s = s * sm_scale * ks_ref[0, 0] + bias_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p * vs_ref[0, 0]
    v = v_ref[0, 0].astype(jnp.float32)          # [T, d]
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _kernel_plain(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention(
    q: jax.Array,                       # [b, kv, g, d]
    k_cache: jax.Array,                 # [b, kv, T, d]  bf16 or int8
    v_cache: jax.Array,
    bias: jax.Array,                    # [b, T] f32 additive mask
    k_scale: jax.Array | None = None,   # [b, kv, T] f32 (int8 cache)
    # (reshaped internally to carry a unit dim for Mosaic block rules)
    v_scale: jax.Array | None = None,
    *,
    sm_scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """softmax(q·Kᵀ·sm_scale + bias)·V per (batch, kv head) — [b,kv,g,d] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, kv, g, d = q.shape
    T = k_cache.shape[2]
    quant = k_scale is not None

    # scales/bias carry a unit second-minor dim so every block satisfies
    # the Mosaic rule: last-two block dims divide (8, 128) or equal the
    # array dims ([1, T] blocks over [*, 1, T] arrays)
    bias = bias[:, None, :]
    if quant:
        k_scale = k_scale[:, :, None, :]
        v_scale = v_scale[:, :, None, :]
    qkv_spec = pl.BlockSpec((1, 1, g, d), lambda b_, h_: (b_, h_, 0, 0))
    cache_spec = pl.BlockSpec((1, 1, T, d), lambda b_, h_: (b_, h_, 0, 0))
    scale_spec = pl.BlockSpec((1, 1, 1, T), lambda b_, h_: (b_, h_, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, T), lambda b_, h_: (b_, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, kv, g, d), jnp.float32)

    if quant:
        kernel = functools.partial(_kernel_quant, sm_scale=sm_scale)
        in_specs = [qkv_spec, cache_spec, cache_spec, scale_spec, scale_spec, bias_spec]
        args = (q, k_cache, v_cache, k_scale, v_scale, bias)
    else:
        kernel = functools.partial(_kernel_plain, sm_scale=sm_scale)
        in_specs = [qkv_spec, cache_spec, cache_spec, bias_spec]
        args = (q, k_cache, v_cache, bias)

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, kv),
        in_specs=in_specs,
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)


# ── stacked-cache variant (zero-copy layer indexing) ────────────────────
#
# Calling the per-layer kernel with a dynamic slice of the stacked
# [L, b, kv, T, d] cache forces XLA to materialize that slice as a
# pallas operand — an extra HBM read+write of the whole layer cache per
# step. Here the LAYER INDEX is a scalar-prefetch operand used in the
# BlockSpec index_map, so each program DMAs its block straight out of
# the stacked array. Grid is (batch,) — one program per row handles all
# kv heads (batched dots) to amortize per-program overhead.


def _attend_chunk(q, k, v, scores_extra, bias):
    """q [C, g, d]; k/v [C, T, d] f32 → out [C, g, d] (batched dots)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [C, g, T]
    s = s * scores_extra + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [C, g, d]
    return o / jnp.maximum(l, 1e-30)


def _kernel_stacked_quant(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                          bias_ref, o_ref, *, sm_scale):
    del l_ref  # consumed by the index_map
    q = q_ref[0].astype(jnp.float32)              # [C, g, d]
    k = k_ref[0, 0].astype(jnp.float32)           # [C, T, d]
    v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0][:, 0, :][:, :, None]
    extra = sm_scale * ks_ref[0, 0]               # [C, 1, T]
    bias = bias_ref[0][None]                      # [1, 1, T]
    o_ref[0] = _attend_chunk(q, k, v, extra, bias).astype(o_ref.dtype)


def _kernel_stacked_plain(l_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale):
    del l_ref
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0][None]
    o_ref[0] = _attend_chunk(
        q, k, v, jnp.float32(sm_scale), bias
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention_stacked(
    q: jax.Array,                       # [b, kv, g, d]
    k_all: jax.Array,                   # [L, b, kv, T, d]  bf16 or int8
    v_all: jax.Array,
    bias: jax.Array,                    # [b, T] f32 additive mask
    layer: jax.Array,                   # scalar int32 layer index
    k_scale: jax.Array | None = None,   # [L, b, kv, T] f32 (int8 cache)
    v_scale: jax.Array | None = None,
    *,
    sm_scale: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention reading layer ``layer`` of the stacked cache
    in place (scalar-prefetch index_map — no slice materialization)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, kv, g, d = q.shape
    T = k_all.shape[3]
    quant = k_scale is not None

    bias = bias[:, None, :]                           # [b, 1, T]
    if quant:
        k_scale = k_scale[:, :, :, None, :]           # [L, b, kv, 1, T]
        v_scale = v_scale[:, :, :, None, :]

    # chunk kv heads: few enough programs to amortize launch overhead,
    # small enough blocks to fit scoped VMEM (~16 MiB)
    C = 1
    for cand in (8, 4, 2, 1):
        if kv % cand == 0 and cand * T * d * 4 * 2 <= 6 * 1024 * 1024:
            C = cand
            break
    q_spec = pl.BlockSpec((1, C, g, d), lambda b_, h_, l_ref: (b_, h_, 0, 0))
    cache_spec = pl.BlockSpec(
        (1, 1, C, T, d), lambda b_, h_, l_ref: (l_ref[0], b_, h_, 0, 0)
    )
    scale_spec = pl.BlockSpec(
        (1, 1, C, 1, T), lambda b_, h_, l_ref: (l_ref[0], b_, h_, 0, 0)
    )
    bias_spec = pl.BlockSpec((1, 1, T), lambda b_, h_, l_ref: (b_, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, kv, g, d), jnp.float32)

    if quant:
        kernel = functools.partial(_kernel_stacked_quant, sm_scale=sm_scale)
        in_specs = [q_spec, cache_spec, cache_spec, scale_spec, scale_spec, bias_spec]
        args = (q, k_all, v_all, k_scale, v_scale, bias)
    else:
        kernel = functools.partial(_kernel_stacked_plain, sm_scale=sm_scale)
        in_specs = [q_spec, cache_spec, cache_spec, bias_spec]
        args = (q, k_all, v_all, bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv // C),
        in_specs=in_specs,
        out_specs=q_spec,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)


__all__ = ["decode_attention", "decode_attention_stacked"]
