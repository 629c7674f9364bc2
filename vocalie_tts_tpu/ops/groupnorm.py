"""Fused GroupNorm Pallas kernel for the batched diffusion UNet.

Round-3 profile of the AudioSR DDIM loop (32-window dispatch, 100
steps, scripts/profile_audiosr.py): the UNet's ~41 GroupNorms cost
~170 ms/dispatch in XLA `convert_reduce_fusion`s plus their share of
the apply fusions — ~43 GB/s effective, ~10× over the HBM floor —
while the convolutions (the MXU work) are ~15 ms. XLA lowers each
norm as separate moment-reduction passes and a separate normalize
pass, so every activation streams from HBM ~3×.

This kernel does the whole op in ONE activation pass through VMEM:

    [optional] x += e          (FiLM embedding add, [B, C] broadcast)
    per-channel moments        (sublane reduction, f32)
    per-group aggregation      (tiny one-hot selector matmuls — lane
                                -native, the ops/decode_attention trick;
                                in-kernel lane-dim reshapes are not)
    y = x·scale + bias         (folded inv·gamma / beta-mean·scale)
    [optional] y = silu(y)

so the UNet's `h+e → norm → silu` chains (unet2d._resblock) become a
single read+write of the activation. f32 inputs keep the exact XLA
path in unet2d.group_norm (pinned by the torch-replica parity tests).

OUTCOME (measured, round 3): net-negative in the real UNet — the
custom-call's standard-layout operand constraint forces relayout
copies at every norm boundary (the neighboring convs live in
conv-tiled layouts) and un-fuses the skip concats; the DDIM loop went
479→627 ms per 32-window dispatch. Kept opt-in (VOCALIE_GN_PALLAS=1,
see unet2d._norm_act) as the measurement harness for revisiting when
custom-call layout propagation improves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 40 * 1024 * 1024  # bytes of per-program activation traffic


def _gn_kernel(x_ref, e_ref, g_ref, b_ref, o_ref, *, groups, eps, silu,
               n_per_group):
    x = x_ref[...].astype(jnp.float32)          # [Bb, S, C]
    e = e_ref[...].astype(jnp.float32)          # [Bb, C]
    x = x + e[:, None, :]
    c = x.shape[-1]
    cg = c // groups
    s1 = jnp.sum(x, axis=1)                     # [Bb, C]
    s2 = jnp.sum(x * x, axis=1)
    # group aggregation + broadcast-back via one-hot selectors (the
    # lane dim stays dense; an in-kernel [Bb, G, C/G] reshape does not)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    sel = (ch // cg == gr).astype(jnp.float32)  # [C, G]
    sum_g = jax.lax.dot_general(s1, sel, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_g = jax.lax.dot_general(s2, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mean_g = sum_g / n_per_group
    var_g = jnp.maximum(sq_g / n_per_group - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot_general(mean_g, sel, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, sel, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)      # [1, C]
    beta = b_ref[...].astype(jnp.float32)
    scale = inv_c * gamma                       # [Bb, C]
    bias = beta - mean_c * scale
    y = x * scale[:, None, :] + bias[:, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _gn_xla(x3: jax.Array, e: jax.Array, gamma: jax.Array, beta: jax.Array,
            *, groups: int, eps: float, silu: bool) -> jax.Array:
    """Plain-XLA fallback with the same math (f32 moments, native
    layout) for shapes the Mosaic block rules can't tile."""
    b, s, c = x3.shape
    xf = x3.astype(jnp.float32) + e.astype(jnp.float32)[:, None, :]
    m = xf.reshape(b, s, groups, c // groups)
    mean = jnp.mean(m, axis=(1, 3))
    var = jnp.maximum(jnp.mean(m * m, axis=(1, 3)) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    scale = inv_c * gamma.astype(jnp.float32)
    bias = beta.astype(jnp.float32) - mean_c * scale
    y = xf * scale[:, None, :] + bias[:, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x3.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def group_norm_fused(
    x: jax.Array,                  # [B, *spatial, C]
    gamma: jax.Array,              # [C]
    beta: jax.Array,               # [C]
    *,
    groups: int,
    eps: float = 1e-5,
    silu: bool = False,
    pre_add: jax.Array | None = None,   # [B, C] FiLM row, added pre-norm
    interpret: bool | None = None,
) -> jax.Array:
    """One-pass GroupNorm(+pre-add)(+SiLU) over channels-last ``x``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    bdim, c = x.shape[0], x.shape[-1]
    if c % groups:
        raise ValueError(f"C={c} not divisible by groups={groups}")
    s = 1
    for dim in orig_shape[1:-1]:
        s *= dim
    x3 = x.reshape(bdim, s, c)                  # trailing-dim merge: free
    e = pre_add if pre_add is not None else jnp.zeros((bdim, c), x.dtype)

    # largest power-of-two batch block that fits VMEM, counting the
    # in/out double buffering (2× each) plus ~4 live f32 temporaries
    # (xf, x·x, y, reduction state — Mosaic spilled 80 MB when this was
    # under-counted on the big VAE norms). Mosaic also requires sublane
    # blocks divisible by 8 (or whole) and lane-dense C; shapes that
    # miss (large-spatial × small-batch or C%128≠0 — the 1×-per-dispatch
    # VAE norms) take the XLA fallback, the kernel serves the ×100
    # UNet norms inside the DDIM loop.
    per_row = s * c * (4 * x3.dtype.itemsize + 16)
    bb = bdim
    while bb > 1 and (bb * per_row > _VMEM_BUDGET or bdim % bb):
        bb //= 2
    if (bb < 8 and bb != bdim) or c % 128 or bb * per_row > _VMEM_BUDGET:
        y = _gn_xla(x3, e, gamma, beta, groups=groups, eps=eps, silu=silu)
        return y.reshape(orig_shape)
    n_blocks = bdim // bb

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, groups=groups, eps=eps, silu=silu,
            n_per_group=float(s * (c // groups)),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bb, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bdim, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, e, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(orig_shape)


__all__ = ["group_norm_fused"]
