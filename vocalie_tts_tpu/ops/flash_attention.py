"""Flash attention as a Pallas TPU kernel (forward + custom-VJP backward).

Online-softmax tiled attention: the (S, S) score matrix is never
materialized — each (block_q, block_k) tile lives only in VMEM while
running max/sum/accumulator statistics are corrected per tile
(see /opt/skills/guides/boom_attention_tricks.md §2-7 for the
patterns this follows).

Used for prefill (prompt encoding) in the AR TTS decoders, where the
quadratic score matrix is the memory bottleneck, and — through
``flash_attention_trainable`` — for the fine-tuning path, with Pallas
dKV/dQ backward kernels (ops/flash_attention_bwd) fed by saved
logsumexp residuals instead of the score matrix.

Decode-step attention (q_len == 1) uses the fused XLA path in
models/common/transformer.py instead.

Replaces the reference's reliance on torch SDPA inside per-engine
subprocesses (ref: tts_backends/chatterbox_impl.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * float32_max: large negative that survives exp() without NaN.
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _attention_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    q_len: int, kv_len: int, num_kv_blocks: int, lens_ref=None,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    # padded-KV limit: static, or this row's dynamic length (scalar
    # prefetch, one entry per flattened (batch, head) row)
    if lens_ref is not None:
        kv_len = jnp.minimum(lens_ref[pl.program_id(0)], kv_len)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # Whole-tile causal skip: tile strictly above the diagonal.
    if causal:
        run = ((qi + 1) * block_q - 1) >= (ki * block_k)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # [block_q, d]
        k = k_ref[0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if sm_scale != 1.0:
            s = s * sm_scale

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        mask = col_ids < kv_len  # padded-KV mask
        if causal:
            mask = mask & (col_ids <= row_ids)
        s = s + jnp.where(mask, 0.0, _MASK_VALUE)

        m_prev = m_scratch[...]   # [block_q, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)        # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)              # broadcast to LANES
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0]  # [block_k, d]
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        lse = m_scratch[...] + jnp.log(jnp.maximum(l_scratch[...], 1e-30))
        lse_ref[0] = lse.astype(lse_ref.dtype)


def _attention_kernel_lens(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                           m_scratch, l_scratch, acc_scratch, **kw):
    _attention_kernel(
        q_ref, k_ref, v_ref, o_ref, lse_ref,
        m_scratch, l_scratch, acc_scratch, lens_ref=lens_ref, **kw,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_inputs(q, k, v, block_q, block_k):
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, _round_up(q_len, _LANES))
    block_k = min(block_k, _round_up(kv_len, _LANES))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    # lane dim: blocks equal to the array dim are legal for any d, so
    # d=64 heads skip the explicit pad-to-128 (which materialized 2×
    # copies of q/k/v per call); other odd widths still pad.
    d_pad = d if (d == 64 or d % _LANES == 0) else _round_up(d, _LANES)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad - q_len), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, d_pad - d)))
    bh = b * h
    return (
        qp.reshape(bh, q_pad, d_pad),
        kp.reshape(bh, kv_pad, d_pad),
        vp.reshape(bh, kv_pad, d_pad),
        block_q, block_k,
    )


def _flash_attention_padded(
    qp, kp, vp, *, sm_scale, causal, block_q, block_k, q_len, kv_len, interpret,
    lens_bh=None,
):
    """Padded [bh, s, d] path returning (out, lse [bh, q_pad]).

    ``lens_bh`` [bh] int32 gives each row's valid KV length (scalar
    prefetch) — keys at or beyond it are masked, which is how padded
    variable-length batches (e.g. the CFM mel batches) run without a
    materialized [T, T] bias."""
    bh, q_pad, d_pad = qp.shape
    kv_pad = kp.shape[1]
    num_q_blocks = q_pad // block_q
    num_kv_blocks = kv_pad // block_k

    kw = dict(
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        q_len=q_len,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, q_pad, d_pad), qp.dtype),
        jax.ShapeDtypeStruct((bh, q_pad, _LANES), jnp.float32),
    )
    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, d_pad), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if lens_bh is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, num_q_blocks, num_kv_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad),
                             lambda bh_, qi, ki, lens: (bh_, qi, 0)),
                pl.BlockSpec((1, block_k, d_pad),
                             lambda bh_, qi, ki, lens: (bh_, ki, 0)),
                pl.BlockSpec((1, block_k, d_pad),
                             lambda bh_, qi, ki, lens: (bh_, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, d_pad),
                             lambda bh_, qi, ki, lens: (bh_, qi, 0)),
                pl.BlockSpec((1, block_q, _LANES),
                             lambda bh_, qi, ki, lens: (bh_, qi, 0)),
            ),
            scratch_shapes=scratch_shapes,
        )
        out, lse = pl.pallas_call(
            functools.partial(_attention_kernel_lens, **kw),
            out_shape=out_shape,
            grid_spec=grid_spec,
            compiler_params=params,
            interpret=interpret,
        )(lens_bh.astype(jnp.int32), qp, kp, vp)
        return out, lse[..., 0]

    out, lse = pl.pallas_call(
        functools.partial(_attention_kernel, **kw),
        out_shape=out_shape,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh_, qi, ki: (bh_, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh_, qi, ki: (bh_, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh_, qi, ki: (bh_, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh_, qi, ki: (bh_, qi, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda bh_, qi, ki: (bh_, qi, 0)),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=params,
        interpret=interpret,
    )(qp, kp, vp)
    return out, lse[..., 0]


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    kv_lens: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Tiled attention over [batch, heads, seq, head_dim] inputs.

    Supports GQA (kv heads dividing q heads) and ragged shapes (inputs
    are padded to tile multiples internally; padded KV is masked).
    ``kv_lens`` [batch] int32 masks each row's keys at or beyond its
    valid length (prefix-valid variable-length batches).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, q_len, d = q.shape
    bk, hk, kv_len, dk = k.shape
    assert d == dk and b == bk
    if hk != h:
        assert h % hk == 0, (h, hk)
        rep = h // hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    qp, kp, vp, block_q, block_k = _pad_inputs(q, k, v, block_q, block_k)
    lens_bh = None
    if kv_lens is not None:
        lens_bh = jnp.repeat(kv_lens.astype(jnp.int32), h)
    out, _lse = _flash_attention_padded(
        qp, kp, vp, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
        interpret=interpret, lens_bh=lens_bh,
    )
    out = out.reshape(b, h, qp.shape[1], qp.shape[2])
    return out[:, :, :q_len, :d]


# ── differentiable variant (training path) ──────────────────────────────


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def flash_attention_trainable(
    q, k, v, causal: bool = True, sm_scale: float | None = None,
    block_q: int = 128, block_k: int = 128,
):
    """Differentiable flash attention (Pallas forward AND backward).

    GQA handled by head-repeat in forward and group-sum in backward.
    """
    out, _res = _fa_fwd(q, k, v, causal, sm_scale, block_q, block_k)
    return out


def _fa_fwd(q, k, v, causal, sm_scale, block_q, block_k):
    interpret = jax.default_backend() != "tpu"
    b, h, q_len, d = q.shape
    hk = k.shape[1]
    if hk != h:
        rep = h // hk
        k_full = jnp.repeat(k, rep, axis=1)
        v_full = jnp.repeat(v, rep, axis=1)
    else:
        k_full, v_full = k, v
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)

    qp, kp, vp, bq, bk_ = _pad_inputs(q, k_full, v_full, block_q, block_k)
    out_p, lse = _flash_attention_padded(
        qp, kp, vp, sm_scale=scale, causal=causal,
        block_q=bq, block_k=bk_, q_len=q_len, kv_len=k.shape[2],
        interpret=interpret,
    )
    out = out_p.reshape(b, h, qp.shape[1], qp.shape[2])[:, :, :q_len, :d]
    residuals = (qp, kp, vp, out_p, lse, b, h, hk, q_len, k.shape[2], d, scale, bq, bk_)
    return out, residuals


def _fa_bwd(causal, sm_scale, block_q, block_k, residuals, g):
    from vocalie_tts_tpu.ops.flash_attention_bwd import flash_attention_bwd

    (qp, kp, vp, out_p, lse, b, h, hk, q_len, kv_len, d, scale, bq, bk_) = residuals
    interpret = jax.default_backend() != "tpu"
    bh, q_pad, d_pad = qp.shape

    do = jnp.zeros((b, h, q_pad, d_pad), g.dtype)
    do = do.at[:, :, :q_len, :d].set(g)
    do = do.reshape(bh, q_pad, d_pad)

    dq, dk, dv = flash_attention_bwd(
        qp, kp, vp, out_p, lse, do,
        sm_scale=scale, causal=causal, block_q=bq, block_k=bk_,
        q_len=q_len, kv_len=kv_len, interpret=interpret,
    )
    dq = dq.reshape(b, h, q_pad, d_pad)[:, :, :q_len, :d]
    kv_pad = kp.shape[1]
    dk = dk.reshape(b, h, kv_pad, d_pad)[:, :, :kv_len, :d]
    dv = dv.reshape(b, h, kv_pad, d_pad)[:, :, :kv_len, :d]
    if hk != h:
        group = h // hk
        dk = dk.reshape(b, hk, group, kv_len, d).sum(axis=2)
        dv = dv.reshape(b, hk, group, kv_len, d).sum(axis=2)
    return dq, dk, dv


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """Naive XLA attention, used as the parity oracle in tests."""
    b, h, q_len, d = q.shape
    hk = k.shape[1]
    if hk != h:
        k = jnp.repeat(k, h // hk, axis=1)
        v = jnp.repeat(v, h // hk, axis=1)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * sm_scale
    if causal:
        # start-aligned: q position i maps to kv position i (prefill)
        kv_len = k.shape[2]
        mask = jnp.tril(jnp.ones((q_len, kv_len), dtype=bool), k=0)
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def flash_attention_sharded(q, k, v, mesh, *, causal: bool = True):
    """``flash_attention_trainable`` under shard_map for SPMD training.

    Attention is fully parallel over (batch, heads): batch shards on
    ``dp``, heads on ``tp`` — no collectives inside, so the Pallas
    custom-VJP kernel simply runs per shard in forward AND backward.
    This is what lets the TP fine-tune path keep the fused kernel
    (previously it silently fell back to XLA attention).

    Requires batch % dp == 0 and n_heads (and kv heads) % tp == 0.
    """
    from jax.sharding import PartitionSpec as P

    spec = P("dp", "tp", None, None)

    def local(q, k, v):
        return flash_attention_trainable(q, k, v, causal)

    # check_vma=False: pallas_call out_shapes don't carry varying-axis
    # metadata, and this body is collective-free by construction
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


__all__ = [
    "flash_attention",
    "flash_attention_trainable",
    "flash_attention_sharded",
    "reference_attention",
]
