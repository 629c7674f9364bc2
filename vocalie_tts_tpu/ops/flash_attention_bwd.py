"""Flash attention backward pass: Pallas dKV and dQ kernels.

Completes the custom-VJP story for ops.flash_attention so the Pallas
kernel can serve the training path (fine-tuning, SURVEY §7) without
materializing the (S, S) score matrix in the backward either.

Math (per (q, k) tile, with residuals lse = m + log l from forward):
    p  = exp(q·kᵀ·scale − lse)
    dv += pᵀ @ do
    dp = do @ vᵀ
    ds = p ⊙ (dp − di) · scale          with di = rowsum(do ⊙ o)
    dk += dsᵀ @ q
    dq += ds @ k

Two kernels with different iteration orders (guide §7): dKV fixes a KV
tile and sweeps Q tiles; dQ fixes a Q tile and sweeps KV tiles — each
accumulates its output in a VMEM scratch across the sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _tile_ds(q, k, v, do_tile, lse, di, *, sm_scale, causal, mask_ok,
             q_offset, k_offset, block_q, block_k):
    """Common per-tile recompute: returns (p, ds) in f32."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_offset
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_offset
    mask = mask_ok(row_ids, col_ids)
    if causal:
        mask = mask & (col_ids <= row_ids)
    # mask s before the exp (keeps padded rows from overflowing) AND
    # zero p after (padded rows have garbage lse)
    s = s + jnp.where(mask, 0.0, _MASK_VALUE)
    p = jnp.exp(s - lse[:, :1])
    p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(
        do_tile, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di[:, :1]) * sm_scale
    return p, ds


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, sm_scale, causal, block_q, block_k, q_len, kv_len, num_q_blocks,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    if causal:
        run = ((qi + 1) * block_q - 1) >= (ki * block_k)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do_tile = do_ref[0]
        lse = lse_ref[0]
        di = di_ref[0]

        def mask_ok(row_ids, col_ids):
            return (row_ids < q_len) & (col_ids < kv_len)

        p, ds = _tile_ds(
            q, k, v, do_tile, lse, di,
            sm_scale=sm_scale, causal=causal, mask_ok=mask_ok,
            q_offset=qi * block_q, k_offset=ki * block_k,
            block_q=block_q, block_k=block_k,
        )
        dv_scratch[...] += jax.lax.dot_general(
            p, do_tile, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_scratch[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    dq_scratch,
    *, sm_scale, causal, block_q, block_k, q_len, kv_len, num_kv_blocks,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    if causal:
        run = ((qi + 1) * block_q - 1) >= (ki * block_k)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do_tile = do_ref[0]
        lse = lse_ref[0]
        di = di_ref[0]

        def mask_ok(row_ids, col_ids):
            return (row_ids < q_len) & (col_ids < kv_len)

        _p, ds = _tile_ds(
            q, k, v, do_tile, lse, di,
            sm_scale=sm_scale, causal=causal, mask_ok=mask_ok,
            q_offset=qi * block_q, k_offset=ki * block_k,
            block_q=block_q, block_k=block_k,
        )
        dq_scratch[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


def flash_attention_bwd(
    q, k, v, o, lse, do,
    *, sm_scale, causal, block_q, block_k, q_len, kv_len, interpret,
):
    """Inputs are the PADDED [bh, s_pad, d_pad] arrays from forward."""
    bh, q_pad, d_pad = q.shape
    kv_pad = k.shape[1]
    num_q_blocks = q_pad // block_q
    num_kv_blocks = kv_pad // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [bh, q_pad]
    di = jnp.broadcast_to(di[..., None], (*di.shape, 128))
    lse_b = jnp.broadcast_to(lse[..., None], (*lse.shape, 128))

    dkv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
            num_q_blocks=num_q_blocks,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, ki, qi: (b, qi, 0)),  # q
            pl.BlockSpec((1, block_k, d_pad), lambda b, ki, qi: (b, ki, 0)),  # k
            pl.BlockSpec((1, block_k, d_pad), lambda b, ki, qi: (b, ki, 0)),  # v
            pl.BlockSpec((1, block_q, d_pad), lambda b, ki, qi: (b, qi, 0)),  # do
            pl.BlockSpec((1, block_q, 128), lambda b, ki, qi: (b, qi, 0)),    # lse
            pl.BlockSpec((1, block_q, 128), lambda b, ki, qi: (b, qi, 0)),    # di
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, ki, qi: (b, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse_b, di)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
            num_kv_blocks=num_kv_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse_b, di)

    return dq, dk, dv


__all__ = ["flash_attention_bwd"]
