"""int8-native decode-step dense/MLP Pallas kernels (weights path).

Round-2 profile of the shipping int8 decode step (b=16, 0.5B, T=576):
attention 1.96 ms (Pallas int8 kernel) + **weights ~1.4 ms** vs a
~0.6 ms HBM floor (16.8 MB int8/layer × 30 layers at v5e bandwidth).
The deficit is the same VPU story the attention kernel already beat:
XLA's weight-only int8 dot unpacks int8→bf16 elementwise before the
MXU. These kernels keep the weights int8 all the way into the MXU and
quantize the small per-step activations in-kernel (per-row amax, the
pattern from ops/decode_attention._kernel_stacked_int8dots):

    y = (x_i8 · W_i8)_i32 · x_scale_row · w_scale_col

Kernel set (one fused kernel per structural piece of a decode layer;
the shipping configs use the norm+qkv and whole-tail forms — fewer
pallas calls per layer means fewer scheduling bubbles in the 30-layer
scan, measured worth ~0.5 ms/step):

- ``qkv_norm_int8_stacked`` / ``qkv_lnorm_int8_stacked`` — rms / layer
  norm + the fused qkv projection in one kernel.
- ``tail_swiglu_int8_stacked`` / ``tail_gelu_int8_stacked`` — the
  WHOLE layer tail: o-proj(+bias) → residual → norm → MLP → residual,
  grid over d_ff tiles with the [b, d_ff] hidden living only in VMEM
  and the down-dot accumulated in scratch.
- ``dense_int8_stacked`` and ``mlp_swiglu/gelu_int8_stacked`` — the
  unfused building blocks, kept as the fallback for config variants
  the fused tails don't cover.

Both read layer ``l`` of the STACKED weight arrays in place via a
scalar-prefetch index_map — inside the decode layer scan the sliced
per-layer weights would otherwise materialize as pallas-operand
copies, re-spending the exact HBM traffic the kernel saves (same
finding as the stacked KV cache, see ops/decode_attention).

Why the suite stays at TWO launches per layer (attention kernel +
megatail) instead of one whole-layer kernel: the attention kernel's
output lives head-on-SUBLANES ([b·kv, g, d] — the layout the cache
matmuls need), while the tail's o-proj needs head-on-LANES
([b, h·d] rows). That boundary is a sublane→lane block transpose
Mosaic has no cheap primitive for (strided sublane slices and
row-dependent selector matmuls both dead-end); the XLA reshape fused
between the two launches is doing real layout work, not overhead.
Merging would save ~30 launches ≈ 0.1-0.15 ms/step at 0.5B but
requires either per-head mini-dots over strided scratch rows
(unsupported) or double-materializing the attention output — park it
unless Mosaic grows a sublane/lane transpose.

Accuracy: activations are quantized to ~7 bits per row (amax), on top
of the existing per-channel int8 weights — measured ~0.3-1% relative
on decode logits; opt-in via the int8 serving config
(``TransformerConfig.dense_kernel``, VOCALIE_DENSE_KERNEL), like the
~7-bit attention kernel it pairs with.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, vmem_budget: int, bytes_per_col: int) -> int:
    """Largest 128-multiple tile dividing n within the VMEM budget
    (any 128-multiple divisor — e.g. 3072 for the fused qkv width and
    1536 for its half — bigger streamed blocks mean fewer grid bubbles
    and larger DMA bursts).

    VOCALIE_TILE_MB overrides the per-block budget (MB) for perf
    sweeps: smaller tiles → more grid steps with a shorter pipeline
    fill, bigger tiles → fewer per-step overheads. The 6 MB default
    was tuned at b=16 (scripts/microbench_decode.py)."""
    import os

    mb = os.environ.get("VOCALIE_TILE_MB")
    if mb:
        override = int(float(mb) * 1024 * 1024)
        floor = bytes_per_col * 128  # one 128-col tile must fit
        if override < floor:
            raise ValueError(
                f"VOCALIE_TILE_MB={mb} is below the minimum one-tile budget "
                f"({floor / 1024 / 1024:.2f} MB = 128 cols × {bytes_per_col} "
                f"bytes/col for this layer); raise it or unset the knob. "
                f"Note: read at first jit trace — sweeps need a fresh "
                f"process per value."
            )
        vmem_budget = override
    cap = min(n, vmem_budget // max(bytes_per_col, 1)) // 128 * 128
    for t in range(cap, 0, -128):
        if n % t == 0:
            return t
    return 0


def _quantize_rows(x: jax.Array):
    """[b, d] f32 → (int8 [b, d], f32 scales [b, 1]) per-row amax."""
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(a / 127.0, 1e-8)
    return jnp.round(x / s).astype(jnp.int8), s


def _dense_kernel(l_ref, x_ref, w_ref, s_ref, o_ref):
    del l_ref  # consumed by the index_maps
    x = x_ref[...].astype(jnp.float32)            # [b, d_in]
    x_i8, xs = _quantize_rows(x)
    y = jax.lax.dot_general(
        x_i8, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                             # [b, tile]
    o_ref[...] = y.astype(jnp.float32) * xs * s_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_int8_stacked(
    x: jax.Array,        # [b, d_in] bf16/f32 activations
    w_all: jax.Array,    # [L, d_in, d_out] int8
    s_all: jax.Array,    # [L, 1, d_out] f32 per-channel scales
    layer: jax.Array,    # scalar int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """x · W[layer] with int8×int8 MXU dots → [b, d_out] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_in = x.shape
    d_out = w_all.shape[2]
    tile = _pick_tile(d_out, 6 * 1024 * 1024, d_in)
    if tile == 0:
        raise ValueError(f"d_out={d_out} has no 128-multiple tile")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d_out // tile,),
        in_specs=[
            pl.BlockSpec((b, d_in), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, d_in, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j, l_ref: (0, j)),
    )
    return pl.pallas_call(
        _dense_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_all, s_all)


def _mlp_kernel(l_ref, x_ref, wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                o_ref, acc_ref, *, n_tiles):
    del l_ref
    j = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)            # [b, d]
    x_i8, xs = _quantize_rows(x)
    g = jax.lax.dot_general(
        x_i8, wg_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * sg_ref[0]        # [b, tile]
    u = jax.lax.dot_general(
        x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * su_ref[0]
    h = jax.nn.silu(g) * u                        # hidden never leaves VMEM
    h_i8, hs = _quantize_rows(h)
    d_part = jax.lax.dot_general(
        h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs                    # [b, d_model]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = d_part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] = acc_ref[...] + d_part

    @pl.when(j == n_tiles - 1)
    def _flush():
        o_ref[...] = acc_ref[...] * sd_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_swiglu_int8_stacked(
    x: jax.Array,          # [b, d_model] post-norm activations
    wgu_all: jax.Array,    # [L, d_model, 2*d_ff] int8 ([gate | up] concat)
    sgu_all: jax.Array,    # [L, 1, 2*d_ff] f32
    wd_all: jax.Array,     # [L, d_ff, d_model] int8
    sd_all: jax.Array,     # [L, 1, d_model] f32
    layer: jax.Array,      # scalar int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """silu(x·Wg)·(x·Wu)·Wd for layer ``layer`` → [b, d_model] f32.

    The [b, d_ff] hidden tensor is produced and consumed tile-by-tile
    in VMEM; both weight matrices stream from HBM exactly once at int8
    width (Pallas double-buffers the grid-streamed blocks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    d_ff = wd_all.shape[1]
    if wgu_all.shape[2] != 2 * d_ff:
        raise ValueError("wgu_all must be the fused [gate | up] concat")
    # budget: 3 blocks/iter (gate+up+down), double-buffered by pallas
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    if tile == 0:
        raise ValueError(f"d_ff={d_ff} has no 128-multiple tile")
    n_tiles = d_ff // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            # gate tile j lives at block column j, up tile at n_tiles + j
            pl.BlockSpec((1, d_model, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, d_model, tile),
                         lambda j, l_ref: (l_ref[0], 0, n_tiles + j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, n_tiles + j)),
            pl.BlockSpec((1, tile, d_model), lambda j, l_ref: (l_ref[0], j, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
        scratch_shapes=[pltpu.VMEM((b, d_model), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # sequential: the output block accumulates across tiles
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, wgu_all, wgu_all, sgu_all, sgu_all, wd_all, sd_all,
    )


def _rms_rows(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """f32 RMSNorm over the last dim (transformer.rms_norm semantics)."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _qkv_norm_kernel(l_ref, x_ref, nw_ref, w_ref, s_ref, o_ref, *, eps):
    del l_ref
    x = x_ref[...].astype(jnp.float32)            # [b, d]
    h = _rms_rows(x, nw_ref[0, 0].astype(jnp.float32), eps)
    h_i8, hs = _quantize_rows(h)
    y = jax.lax.dot_general(
        h_i8, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = y.astype(jnp.float32) * hs * s_ref[0]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def qkv_norm_int8_stacked(
    x: jax.Array,        # [b, d_model] RAW residual stream
    nw_all: jax.Array,   # [L, d_model] attn-norm weights
    w_all: jax.Array,    # [L, d_model, d_out] int8 (fused qkv)
    s_all: jax.Array,    # [L, 1, d_out] f32
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
) -> jax.Array:
    """rms_norm(x)·Wqkv[layer] in one kernel — the attn-norm runs on
    the VPU between the operand DMA and the MXU dot instead of being a
    separate XLA fusion (each extra op between pallas calls is a
    scheduling bubble in the 30-layer decode scan)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_in = x.shape
    d_out = w_all.shape[2]
    tile = _pick_tile(d_out, 6 * 1024 * 1024, d_in)
    if tile == 0:
        raise ValueError(f"d_out={d_out} has no 128-multiple tile")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d_out // tile,),
        in_specs=[
            pl.BlockSpec((b, d_in), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, 1, d_in), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, d_in, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j, l_ref: (0, j)),
    )
    return pl.pallas_call(
        functools.partial(_qkv_norm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, d_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, nw_all[:, None, :], w_all, s_all)


def _tail_kernel(l_ref, attn_ref, x_ref, wo_ref, wos_ref, mw_ref,
                 wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                 o_ref, x2_ref, hq_ref, hs_ref, acc_ref, *, n_tiles, eps):
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        # o-projection + residual + mlp-norm, once per layer; the
        # quantized h2 is reused by every d_ff tile from scratch
        a = attn_ref[...].astype(jnp.float32)
        a_i8, as_ = _quantize_rows(a)
        o = jax.lax.dot_general(
            a_i8, wo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_ * wos_ref[0]
        x2 = x_ref[...].astype(jnp.float32) + o
        x2_ref[...] = x2
        h2 = _rms_rows(x2, mw_ref[0, 0].astype(jnp.float32), eps)
        h_i8, hs = _quantize_rows(h2)
        hq_ref[...] = h_i8
        hs_ref[...] = hs

    x_i8 = hq_ref[...]
    xs = hs_ref[...]
    g = jax.lax.dot_general(
        x_i8, wg_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * sg_ref[0]
    u = jax.lax.dot_general(
        x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * su_ref[0]
    h = jax.nn.silu(g) * u
    h_i8, hs2 = _quantize_rows(h)
    d_part = jax.lax.dot_general(
        h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs2

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = d_part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] = acc_ref[...] + d_part

    @pl.when(j == n_tiles - 1)
    def _flush():
        o_ref[...] = x2_ref[...] + acc_ref[...] * sd_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def tail_swiglu_int8_stacked(
    attn: jax.Array,     # [b, n_heads*d_head] merged attention output
    x: jax.Array,        # [b, d_model] residual stream INTO the block
    wo_all: jax.Array,   # [L, n_heads*d_head, d_model] int8
    wos_all: jax.Array,  # [L, 1, d_model] f32
    mw_all: jax.Array,   # [L, d_model] mlp-norm weights
    wgu_all: jax.Array,  # [L, d_model, 2*d_ff] int8 ([gate | up])
    sgu_all: jax.Array,  # [L, 1, 2*d_ff] f32
    wd_all: jax.Array,   # [L, d_ff, d_model] int8
    sd_all: jax.Array,   # [L, 1, d_model] f32
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
) -> jax.Array:
    """The whole decode-layer tail in ONE kernel: o-proj → residual →
    rms_norm → SwiGLU MLP → residual, for the rms/swiglu families.
    Returns the layer's output residual stream, [b, d_model] f32.

    One pallas call replaces three kernels plus four XLA glue fusions
    per layer; all intermediates (post-attn residual, normed+quantized
    h2, the [b, d_ff] hidden) stay in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    d_ff = wd_all.shape[1]
    if wgu_all.shape[2] != 2 * d_ff:
        raise ValueError("wgu_all must be the fused [gate | up] concat")
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    if tile == 0:
        raise ValueError(f"d_ff={d_ff} has no 128-multiple tile")
    n_tiles = d_ff // tile
    d_attn = attn.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d_attn), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            # constant index across j: DMA'd once per layer invocation
            pl.BlockSpec((1, d_attn, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, d_model, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, d_model, tile),
                         lambda j, l_ref: (l_ref[0], 0, n_tiles + j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, n_tiles + j)),
            pl.BlockSpec((1, tile, d_model), lambda j, l_ref: (l_ref[0], j, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, d_model), jnp.float32),   # x2 (post-attn resid)
            pltpu.VMEM((b, d_model), jnp.int8),      # quantized h2
            pltpu.VMEM((b, 1), jnp.float32),         # h2 row scales
            pltpu.VMEM((b, d_model), jnp.float32),   # down-proj accumulator
        ],
    )
    return pl.pallas_call(
        functools.partial(_tail_kernel, n_tiles=n_tiles, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        attn, x, wo_all, wos_all, mw_all[:, None, :],
        wgu_all, wgu_all, sgu_all, sgu_all, wd_all, sd_all,
    )


def _tail_qkv_kernel(l_ref, attn_ref, x_ref, wo_ref, wos_ref, mw_ref,
                     wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                     nw_ref, wq_ref, sq_ref,
                     o_ref, qkv_ref, x2_ref, hq_ref, hs_ref, acc_ref,
                     xq_ref, xs_ref, *, n_tiles, eps):
    """Grid = d_ff tiles of the layer tail, then qkv tiles of the NEXT
    layer. Phase 1 is _tail_kernel verbatim; at the tail flush the
    layer output is rms-normed + row-quantized into scratch, and phase
    2 streams the next layer's Wqkv against it. One pallas call per
    layer replaces the tail + next-qkv pair — one launch boundary
    (pipeline fill/drain + XLA glue) less per decode layer."""
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        a = attn_ref[...].astype(jnp.float32)
        a_i8, as_ = _quantize_rows(a)
        o = jax.lax.dot_general(
            a_i8, wo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_ * wos_ref[0]
        x2 = x_ref[...].astype(jnp.float32) + o
        x2_ref[...] = x2
        h2 = _rms_rows(x2, mw_ref[0, 0].astype(jnp.float32), eps)
        h_i8, hs = _quantize_rows(h2)
        hq_ref[...] = h_i8
        hs_ref[...] = hs

    @pl.when(j < n_tiles)
    def _tail_phase():
        x_i8 = hq_ref[...]
        xs = hs_ref[...]
        g = jax.lax.dot_general(
            x_i8, wg_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs * sg_ref[0]
        u = jax.lax.dot_general(
            x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs * su_ref[0]
        h = jax.nn.silu(g) * u
        h_i8, hs2 = _quantize_rows(h)
        d_part = jax.lax.dot_general(
            h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * hs2

        @pl.when(j == 0)
        def _init():
            acc_ref[...] = d_part

        @pl.when(j > 0)
        def _accum():
            acc_ref[...] = acc_ref[...] + d_part

        @pl.when(j == n_tiles - 1)
        def _flush():
            x_out = x2_ref[...] + acc_ref[...] * sd_ref[0, 0]
            o_ref[...] = x_out
            hn = _rms_rows(x_out, nw_ref[0, 0].astype(jnp.float32), eps)
            xq, xqs = _quantize_rows(hn)
            xq_ref[...] = xq
            xs_ref[...] = xqs

    @pl.when(j >= n_tiles)
    def _qkv_phase():
        y = jax.lax.dot_general(
            xq_ref[...], wq_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qkv_ref[...] = y.astype(jnp.float32) * xs_ref[...] * sq_ref[0]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def tail_swiglu_qkv_int8_stacked(
    attn: jax.Array,     # [b, n_heads*d_head] merged attention output
    x: jax.Array,        # [b, d_model] residual stream INTO the block
    wo_all: jax.Array,   # [L, n_heads*d_head, d_model] int8
    wos_all: jax.Array,  # [L, 1, d_model] f32
    mw_all: jax.Array,   # [L, d_model] mlp-norm weights
    wgu_all: jax.Array,  # [L, d_model, 2*d_ff] int8 ([gate | up])
    sgu_all: jax.Array,  # [L, 1, 2*d_ff] f32
    wd_all: jax.Array,   # [L, d_ff, d_model] int8
    sd_all: jax.Array,   # [L, 1, d_model] f32
    nw_all: jax.Array,   # [L, d_model] attn-norm weights (next layer's)
    wq_all: jax.Array,   # [L, d_model, d_qkv] int8 fused qkv
    sq_all: jax.Array,   # [L, 1, d_qkv] f32
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
):
    """Layer tail + the NEXT layer's norm+qkv in ONE kernel.

    Returns ``(x_out [b, d_model], qkv_next [b, d_qkv])`` — qkv_next is
    ``rms_norm(x_out) · Wqkv[min(layer+1, L-1)]``; at the last layer the
    caller discards it (cheaper than a ragged grid: one wasted ~3 MB
    weight stream per step).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    L = wq_all.shape[0]
    d_ff = wd_all.shape[1]
    d_qkv = wq_all.shape[2]
    if wgu_all.shape[2] != 2 * d_ff:
        raise ValueError("wgu_all must be the fused [gate | up] concat")
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    qtile = _pick_tile(d_qkv, 6 * 1024 * 1024, d_model)
    if tile == 0 or qtile == 0:
        raise ValueError(f"d_ff={d_ff}/d_qkv={d_qkv} has no 128-multiple tile")
    n_tiles = d_ff // tile
    n_qtiles = d_qkv // qtile
    d_attn = attn.shape[1]

    def _nxt(l_ref):
        return jnp.minimum(l_ref[0] + 1, L - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles + n_qtiles,),
        in_specs=[
            pl.BlockSpec((b, d_attn), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, d_attn, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            # ff-tile operands clamp to the last tile during the qkv
            # phase (same block index -> no re-DMA)
            pl.BlockSpec((1, d_model, tile),
                         lambda j, l_ref: (l_ref[0], 0, jnp.minimum(j, n_tiles - 1))),
            pl.BlockSpec((1, d_model, tile),
                         lambda j, l_ref: (l_ref[0], 0,
                                           n_tiles + jnp.minimum(j, n_tiles - 1))),
            pl.BlockSpec((1, 1, tile),
                         lambda j, l_ref: (l_ref[0], 0, jnp.minimum(j, n_tiles - 1))),
            pl.BlockSpec((1, 1, tile),
                         lambda j, l_ref: (l_ref[0], 0,
                                           n_tiles + jnp.minimum(j, n_tiles - 1))),
            pl.BlockSpec((1, tile, d_model),
                         lambda j, l_ref: (l_ref[0], jnp.minimum(j, n_tiles - 1), 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            # next layer's norm + qkv weights; block 0 of the qkv tiles
            # prefetches during the tail phase
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (_nxt(l_ref), 0, 0)),
            pl.BlockSpec((1, d_model, qtile),
                         lambda j, l_ref: (_nxt(l_ref), 0,
                                           jnp.maximum(j - n_tiles, 0))),
            pl.BlockSpec((1, 1, qtile),
                         lambda j, l_ref: (_nxt(l_ref), 0,
                                           jnp.maximum(j - n_tiles, 0))),
        ],
        out_specs=[
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, qtile),
                         lambda j, l_ref: (0, jnp.maximum(j - n_tiles, 0))),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d_model), jnp.float32),   # x2 (post-attn resid)
            pltpu.VMEM((b, d_model), jnp.int8),      # quantized h2
            pltpu.VMEM((b, 1), jnp.float32),         # h2 row scales
            pltpu.VMEM((b, d_model), jnp.float32),   # down-proj accumulator
            pltpu.VMEM((b, d_model), jnp.int8),      # quantized normed x_out
            pltpu.VMEM((b, 1), jnp.float32),         # its row scales
        ],
    )
    return pl.pallas_call(
        functools.partial(_tail_qkv_kernel, n_tiles=n_tiles, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
            jax.ShapeDtypeStruct((b, d_qkv), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        attn, x, wo_all, wos_all, mw_all[:, None, :],
        wgu_all, wgu_all, sgu_all, sgu_all, wd_all, sd_all,
        nw_all[:, None, :], wq_all, sq_all,
    )


def _ln_rows(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """f32 LayerNorm over the last dim (transformer._norm semantics)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) * (x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _qkv_lnorm_kernel(l_ref, x_ref, ng_ref, nb_ref, w_ref, s_ref, o_ref, *, eps):
    del l_ref
    x = x_ref[...].astype(jnp.float32)
    h = _ln_rows(x, ng_ref[0, 0].astype(jnp.float32),
                 nb_ref[0, 0].astype(jnp.float32), eps)
    h_i8, hs = _quantize_rows(h)
    y = jax.lax.dot_general(
        h_i8, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = y.astype(jnp.float32) * hs * s_ref[0]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def qkv_lnorm_int8_stacked(
    x: jax.Array,        # [b, d_model] RAW residual stream
    ng_all: jax.Array,   # [L, d_model] LayerNorm gains
    nb_all: jax.Array,   # [L, d_model] LayerNorm biases
    w_all: jax.Array,    # [L, d_model, d_out] int8 (fused qkv)
    s_all: jax.Array,    # [L, 1, d_out] f32
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
) -> jax.Array:
    """layer_norm(x)·Wqkv[layer] in one kernel (the GPT-2 / XTTS
    variant of qkv_norm_int8_stacked)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_in = x.shape
    d_out = w_all.shape[2]
    tile = _pick_tile(d_out, 6 * 1024 * 1024, d_in)
    if tile == 0:
        raise ValueError(f"d_out={d_out} has no 128-multiple tile")

    vec_spec = pl.BlockSpec((1, 1, d_in), lambda j, l_ref: (l_ref[0], 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d_out // tile,),
        in_specs=[
            pl.BlockSpec((b, d_in), lambda j, l_ref: (0, 0)),
            vec_spec,
            vec_spec,
            pl.BlockSpec((1, d_in, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j, l_ref: (0, j)),
    )
    return pl.pallas_call(
        functools.partial(_qkv_lnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, d_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x, ng_all[:, None, :], nb_all[:, None, :], w_all, s_all)


def _tail_gelu_kernel(l_ref, attn_ref, x_ref, wo_ref, wos_ref, bo_ref,
                      lg_ref, lb_ref, wu_ref, su_ref, bu_ref,
                      wd_ref, sd_ref, bd_ref,
                      o_ref, x2_ref, hq_ref, hs_ref, acc_ref,
                      *, n_tiles, eps):
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        a = attn_ref[...].astype(jnp.float32)
        a_i8, as_ = _quantize_rows(a)
        o = jax.lax.dot_general(
            a_i8, wo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_ * wos_ref[0]
        o = o + bo_ref[0, 0].astype(jnp.float32)
        x2 = x_ref[...].astype(jnp.float32) + o
        x2_ref[...] = x2
        h2 = _ln_rows(x2, lg_ref[0, 0].astype(jnp.float32),
                      lb_ref[0, 0].astype(jnp.float32), eps)
        h_i8, hs = _quantize_rows(h2)
        hq_ref[...] = h_i8
        hs_ref[...] = hs

    x_i8 = hq_ref[...]
    xs = hs_ref[...]
    u = jax.lax.dot_general(
        x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * su_ref[0] + bu_ref[0, 0].astype(jnp.float32)
    h = jax.nn.gelu(u, approximate=True)      # the published GPT-2 nonlin
    h_i8, hs2 = _quantize_rows(h)
    d_part = jax.lax.dot_general(
        h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs2

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = d_part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] = acc_ref[...] + d_part

    @pl.when(j == n_tiles - 1)
    def _flush():
        o_ref[...] = (x2_ref[...] + acc_ref[...] * sd_ref[0, 0]
                      + bd_ref[0, 0].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def tail_gelu_int8_stacked(
    attn: jax.Array,     # [b, n_heads*d_head] merged attention output
    x: jax.Array,        # [b, d_model] residual stream INTO the block
    wo_all: jax.Array,   # [L, n_heads*d_head, d_model] int8
    wos_all: jax.Array,  # [L, 1, d_model] f32
    bo_all: jax.Array,   # [L, d_model] o-proj bias
    lg_all: jax.Array,   # [L, d_model] mlp LayerNorm gains
    lb_all: jax.Array,   # [L, d_model] mlp LayerNorm biases
    wu_all: jax.Array,   # [L, d_model, d_ff] int8
    su_all: jax.Array,   # [L, 1, d_ff] f32
    bu_all: jax.Array,   # [L, d_ff] fc bias
    wd_all: jax.Array,   # [L, d_ff, d_model] int8
    sd_all: jax.Array,   # [L, 1, d_model] f32
    bd_all: jax.Array,   # [L, d_model] proj bias
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
) -> jax.Array:
    """The GPT-2 / XTTS decode-layer tail in ONE kernel: o-proj(+bias)
    → residual → LayerNorm → fc(+bias) → gelu → proj(+bias) → residual.
    Returns the layer's output residual stream, [b, d_model] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    d_ff = wd_all.shape[1]
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    if tile == 0:
        raise ValueError(f"d_ff={d_ff} has no 128-multiple tile")
    n_tiles = d_ff // tile
    d_attn = attn.shape[1]

    vec_d = pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d_attn), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, d_attn, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            vec_d,                                      # wo scales
            vec_d,                                      # bo
            vec_d,                                      # ln gain
            vec_d,                                      # ln bias
            pl.BlockSpec((1, d_model, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, tile, d_model), lambda j, l_ref: (l_ref[0], j, 0)),
            vec_d,                                      # wd scales
            vec_d,                                      # bd
        ],
        out_specs=pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, d_model), jnp.float32),
            pltpu.VMEM((b, d_model), jnp.int8),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, d_model), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_tail_gelu_kernel, n_tiles=n_tiles, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        attn, x, wo_all, wos_all, bo_all[:, None, :],
        lg_all[:, None, :], lb_all[:, None, :],
        wu_all, su_all, bu_all[:, None, :],
        wd_all, sd_all, bd_all[:, None, :],
    )


def _mlp_gelu_kernel(l_ref, x_ref, wu_ref, su_ref, bu_ref, wd_ref, sd_ref,
                     o_ref, acc_ref, *, n_tiles):
    del l_ref
    j = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    x_i8, xs = _quantize_rows(x)
    u = jax.lax.dot_general(
        x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * su_ref[0] + bu_ref[0, 0].astype(jnp.float32)
    # tanh-approx gelu — the published GPT-2 nonlinearity, matching the
    # XLA path in transformer._block_tail
    h = jax.nn.gelu(u, approximate=True)
    h_i8, hs = _quantize_rows(h)
    d_part = jax.lax.dot_general(
        h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = d_part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] = acc_ref[...] + d_part

    @pl.when(j == n_tiles - 1)
    def _flush():
        o_ref[...] = acc_ref[...] * sd_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_gelu_int8_stacked(
    x: jax.Array,        # [b, d_model] post-norm activations
    wu_all: jax.Array,   # [L, d_model, d_ff] int8
    su_all: jax.Array,   # [L, 1, d_ff] f32
    bu_all: jax.Array,   # [L, d_ff] f32 fc bias (GPT-2 has them)
    wd_all: jax.Array,   # [L, d_ff, d_model] int8
    sd_all: jax.Array,   # [L, 1, d_model] f32
    layer: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """gelu(x·Wu + bu)·Wd for layer ``layer`` → [b, d_model] f32
    (the GPT-2 / XTTS MLP; the proj bias is the caller's add)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    d_ff = wd_all.shape[1]
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    if tile == 0:
        raise ValueError(f"d_ff={d_ff} has no 128-multiple tile")
    n_tiles = d_ff // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, d_model, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda j, l_ref: (l_ref[0], 0, j)),
            pl.BlockSpec((1, tile, d_model), lambda j, l_ref: (l_ref[0], j, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
        scratch_shapes=[pltpu.VMEM((b, d_model), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_mlp_gelu_kernel, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, wu_all, su_all, bu_all[:, None, :], wd_all, sd_all,
    )


def _tail_gelu_qkv_kernel(l_ref, attn_ref, x_ref, wo_ref, wos_ref, bo_ref,
                          lg_ref, lb_ref, wu_ref, su_ref, bu_ref,
                          wd_ref, sd_ref, bd_ref,
                          ng_ref, nb_ref, wq_ref, sq_ref,
                          o_ref, qkv_ref, x2_ref, hq_ref, hs_ref, acc_ref,
                          xq_ref, xs_ref, *, n_tiles, eps):
    """GPT-2 megakernel: the gelu layer tail, then the NEXT layer's
    LayerNorm+qkv (same two-phase grid as _tail_qkv_kernel)."""
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prologue():
        a = attn_ref[...].astype(jnp.float32)
        a_i8, as_ = _quantize_rows(a)
        o = jax.lax.dot_general(
            a_i8, wo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_ * wos_ref[0]
        o = o + bo_ref[0, 0].astype(jnp.float32)
        x2 = x_ref[...].astype(jnp.float32) + o
        x2_ref[...] = x2
        h2 = _ln_rows(x2, lg_ref[0, 0].astype(jnp.float32),
                      lb_ref[0, 0].astype(jnp.float32), eps)
        h_i8, hs = _quantize_rows(h2)
        hq_ref[...] = h_i8
        hs_ref[...] = hs

    @pl.when(j < n_tiles)
    def _tail_phase():
        x_i8 = hq_ref[...]
        xs = hs_ref[...]
        u = jax.lax.dot_general(
            x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs * su_ref[0] + bu_ref[0, 0].astype(jnp.float32)
        h = jax.nn.gelu(u, approximate=True)  # the published GPT-2 nonlin
        h_i8, hs2 = _quantize_rows(h)
        d_part = jax.lax.dot_general(
            h_i8, wd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * hs2

        @pl.when(j == 0)
        def _init():
            acc_ref[...] = d_part

        @pl.when(j > 0)
        def _accum():
            acc_ref[...] = acc_ref[...] + d_part

        @pl.when(j == n_tiles - 1)
        def _flush():
            x_out = (x2_ref[...] + acc_ref[...] * sd_ref[0, 0]
                     + bd_ref[0, 0].astype(jnp.float32))
            o_ref[...] = x_out
            hn = _ln_rows(x_out, ng_ref[0, 0].astype(jnp.float32),
                          nb_ref[0, 0].astype(jnp.float32), eps)
            xq, xqs = _quantize_rows(hn)
            xq_ref[...] = xq
            xs_ref[...] = xqs

    @pl.when(j >= n_tiles)
    def _qkv_phase():
        y = jax.lax.dot_general(
            xq_ref[...], wq_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qkv_ref[...] = y.astype(jnp.float32) * xs_ref[...] * sq_ref[0]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def tail_gelu_qkv_int8_stacked(
    attn: jax.Array,     # [b, n_heads*d_head] merged attention output
    x: jax.Array,        # [b, d_model] residual stream INTO the block
    wo_all: jax.Array,   # [L, n_heads*d_head, d_model] int8
    wos_all: jax.Array,  # [L, 1, d_model] f32
    bo_all: jax.Array,   # [L, d_model] o-proj bias
    lg_all: jax.Array,   # [L, d_model] mlp LayerNorm gains
    lb_all: jax.Array,   # [L, d_model] mlp LayerNorm biases
    wu_all: jax.Array,   # [L, d_model, d_ff] int8
    su_all: jax.Array,   # [L, 1, d_ff] f32
    bu_all: jax.Array,   # [L, d_ff] fc bias
    wd_all: jax.Array,   # [L, d_ff, d_model] int8
    sd_all: jax.Array,   # [L, 1, d_model] f32
    bd_all: jax.Array,   # [L, d_model] proj bias
    ng_all: jax.Array,   # [L, d_model] attn LayerNorm gains (next layer)
    nb_all: jax.Array,   # [L, d_model] attn LayerNorm biases
    wq_all: jax.Array,   # [L, d_model, d_qkv] int8 fused qkv
    sq_all: jax.Array,   # [L, 1, d_qkv] f32
    layer: jax.Array,
    *,
    eps: float,
    interpret: bool | None = None,
):
    """GPT-2 layer tail + the NEXT layer's LN+qkv in ONE kernel — the
    gelu/LayerNorm sibling of ``tail_swiglu_qkv_int8_stacked`` (same
    carry contract: returns ``(x_out, qkv_next)``, qkv_next indexed at
    ``min(layer+1, L-1)``; the qkv BIAS stays the caller's add, as in
    the unfused path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d_model = x.shape
    L = wq_all.shape[0]
    d_ff = wd_all.shape[1]
    d_qkv = wq_all.shape[2]
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    qtile = _pick_tile(d_qkv, 6 * 1024 * 1024, d_model)
    if tile == 0 or qtile == 0:
        raise ValueError(f"d_ff={d_ff}/d_qkv={d_qkv} has no 128-multiple tile")
    n_tiles = d_ff // tile
    n_qtiles = d_qkv // qtile
    d_attn = attn.shape[1]

    def _nxt(l_ref):
        return jnp.minimum(l_ref[0] + 1, L - 1)

    vec_d = pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (l_ref[0], 0, 0))
    ff_w = pl.BlockSpec(
        (1, d_model, tile),
        lambda j, l_ref: (l_ref[0], 0, jnp.minimum(j, n_tiles - 1)),
    )
    ff_v = pl.BlockSpec(
        (1, 1, tile),
        lambda j, l_ref: (l_ref[0], 0, jnp.minimum(j, n_tiles - 1)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles + n_qtiles,),
        in_specs=[
            pl.BlockSpec((b, d_attn), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((1, d_attn, d_model), lambda j, l_ref: (l_ref[0], 0, 0)),
            vec_d,                                      # wo scales
            vec_d,                                      # bo
            vec_d,                                      # ln gain
            vec_d,                                      # ln bias
            ff_w,                                       # wu tile
            ff_v,                                       # wu scales
            ff_v,                                       # bu
            pl.BlockSpec(
                (1, tile, d_model),
                lambda j, l_ref: (l_ref[0], jnp.minimum(j, n_tiles - 1), 0),
            ),                                          # wd tile
            vec_d,                                      # wd scales
            vec_d,                                      # bd
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (_nxt(l_ref), 0, 0)),
            pl.BlockSpec((1, 1, d_model), lambda j, l_ref: (_nxt(l_ref), 0, 0)),
            pl.BlockSpec(
                (1, d_model, qtile),
                lambda j, l_ref: (_nxt(l_ref), 0, jnp.maximum(j - n_tiles, 0)),
            ),
            pl.BlockSpec(
                (1, 1, qtile),
                lambda j, l_ref: (_nxt(l_ref), 0, jnp.maximum(j - n_tiles, 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((b, d_model), lambda j, l_ref: (0, 0)),
            pl.BlockSpec((b, qtile),
                         lambda j, l_ref: (0, jnp.maximum(j - n_tiles, 0))),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d_model), jnp.float32),   # x2 (post-attn resid)
            pltpu.VMEM((b, d_model), jnp.int8),      # quantized LN(x2)
            pltpu.VMEM((b, 1), jnp.float32),         # its row scales
            pltpu.VMEM((b, d_model), jnp.float32),   # down-proj accumulator
            pltpu.VMEM((b, d_model), jnp.int8),      # quantized LN(x_out)
            pltpu.VMEM((b, 1), jnp.float32),         # its row scales
        ],
    )
    return pl.pallas_call(
        functools.partial(_tail_gelu_qkv_kernel, n_tiles=n_tiles, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
            jax.ShapeDtypeStruct((b, d_qkv), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        attn, x, wo_all, wos_all, bo_all[:, None, :],
        lg_all[:, None, :], lb_all[:, None, :],
        wu_all, su_all, bu_all[:, None, :],
        wd_all, sd_all, bd_all[:, None, :],
        ng_all[:, None, :], nb_all[:, None, :], wq_all, sq_all,
    )


__all__ = [
    "dense_int8_stacked",
    "mlp_swiglu_int8_stacked",
    "mlp_gelu_int8_stacked",
    "qkv_norm_int8_stacked",
    "qkv_lnorm_int8_stacked",
    "tail_swiglu_int8_stacked",
    "tail_swiglu_qkv_int8_stacked",
    "tail_gelu_int8_stacked",
    "tail_gelu_qkv_int8_stacked",
]
