"""Fused single-step (q_len == 1) decode attention as a Pallas kernel.

STATUS (round 2): the **int8-native MXU kernel over the lane-PACKED
cache runs at the DMA floor** and is the default under
``TransformerConfig.decode_kernel`` — measured on v5e at b=16, h=16,
T=576, d=64, 30 layers (ms/step attention-only):

    XLA fused einsum path       3.4    (112 µs/layer)
    round-1 f32-dequant         3.0    (101 µs/layer)
    int8-MXU kernel, split k/v  1.65   ( 55 µs/layer)
    + lane-packed k|v cache     0.82   ( 27 µs/layer)  ≈ DMA floor

Three stacked findings:
1. int8 must feed the MXU directly — Mosaic's (and XLA's) elementwise
   int8→f32 VPU dequant of the big K/V arrays carries a ~4× unpack
   penalty; q and the probabilities quantize in-kernel instead
   (_kernel_stacked_int8dots).
2. d_head=64 arrays PAD to 128 lanes in the tiled layout, silently
   doubling cache reads — packing k|v into one [.., T, 2d] array
   (TransformerConfig.kv_packed) fills the lanes exactly; constant
   selector matmuls zero-extend q and extract the v half of the
   output (_kernel_stacked_int8dots_packed).
3. The unit-dim reshape of the scale arrays for Mosaic's block rules
   forced a ~73 µs×2 per-step relayout — 4D scale blocks with full
   (C, T) trailing dims avoid it (_row_scales handles both layouts).

Remaining round-1 findings that still apply: pallas operands
materialize (→ scalar-prefetch layer index), M=1 dots relayout (→
batched [C, g, T] layout, g kept as the unit M dim), and batched
matvecs ([C,d]·[C,T,d]) hit a Mosaic dot-dimension parser bug — keep
the unit dim.

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


def _attend_chunk(q, k, v, scores_extra, bias, k_new=None, v_new=None,
                  sm_scale=1.0):
    """q [C, g, d]; k/v [C, T, d] f32 → out [C, g, d] (batched dots).

    ``k_new``/``v_new`` [C, d] merge the CURRENT token's position into
    the softmax exactly (flash-style), letting the big cache arrays
    stay read-only outside the step's layer loop."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [C, g, T]
    s = s * scores_extra + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    if k_new is not None:
        s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
        m = jnp.maximum(m, s_new)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [C, g, d]
    if k_new is not None:
        p_new = jnp.exp(s_new - m)                 # [C, g, 1]
        l = l + p_new
        o = o + p_new * v_new[:, None, :]
    return o / jnp.maximum(l, 1e-30)


def _row_scales(ref, i):
    """Row i's per-position scales as f32 [C, T] — handles both the 4D
    ([L, b, C, T]) and the unit-dim 5D ([L, b, C, 1, T]) block layouts
    (the 4D form avoids a ~73 µs/step relayout of the 35 MB scale
    arrays; the 5D form is the fallback for Mosaic-rule edge shapes)."""
    sc = ref[0, i]
    if sc.ndim == 3:
        sc = sc[:, 0, :]
    return sc.astype(jnp.float32)


def _kernel_stacked_int8dots(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                             bias_ref, o_ref, *, sm_scale,
                             kn_ref=None, vn_ref=None):
    """int8-native decode attention: K/V feed the MXU as int8.

    Round-1's loss came from dequantizing the whole cache int8→f32 on
    the VPU (~4× unpack penalty). Here the big arrays never convert
    elementwise: q is quantized in-kernel (per-row amax), the score dot
    runs int8×int8→int32 on the MXU, per-position k-scales fold into
    the small [N, g, T] score tensor, probabilities fold the v-scales
    and are re-quantized to int8 for the second MXU dot. Measured
    65 µs/layer vs 112 µs for the XLA einsum path and 101 µs for the
    f32-dequant kernel (b=16, h=16, T=576, d=64). Accuracy: ~7-bit q/p
    — ~3% relative on worst-case uniform data, tighter on real
    softmax-concentrated distributions; opt-in for the int8-cache
    serving config where the cache itself is already quantized.

    Blocks carry ``Bb`` batch rows × ``C`` kv heads per program —
    fewer, bigger programs amortize per-program sync against the DMA
    stream. Rows are processed by a STATIC in-kernel loop (refs sliced
    per row) so the peak live vector set stays one row's worth —
    loading the whole multi-row block as a value blows the 16 MiB
    scoped-VMEM budget.
    """
    del l_ref
    Bb = q_ref.shape[0]
    for i in range(Bb):
        q = q_ref[i].astype(jnp.float32)          # [C, g, d]
        k = k_ref[0, i]                           # [C, T, d] int8
        v = v_ref[0, i]
        ks = _row_scales(ks_ref, i)               # [C, T]
        vs = _row_scales(vs_ref, i)
        bias = bias_ref[i]                        # [1, T]
        k_new = kn_ref[i].astype(jnp.float32) if kn_ref is not None else None
        v_new = vn_ref[i].astype(jnp.float32) if vn_ref is not None else None

        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-8)
        q_i8 = jnp.round(q / qs).astype(jnp.int8)
        s_i32 = jax.lax.dot_general(
            q_i8, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, T]
        s = s_i32.astype(jnp.float32) * (qs * sm_scale) * ks[:, None, :]
        s = s + bias[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        if k_new is not None:
            # the CURRENT token's column, unquantized (exact)
            s_new = jnp.sum(
                q * k_new[:, None, :], axis=-1, keepdims=True
            ) * sm_scale
            m = jnp.maximum(m, s_new)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :]                    # fold v scales pre-quant
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, d]
        o = o_i32.astype(jnp.float32) * ps
        if k_new is not None:
            p_new = jnp.exp(s_new - m)
            l = l + p_new
            o = o + p_new * v_new[:, None, :]
        o_ref[i] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _kernel_stacked_int8dots_new(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                                 bias_ref, kn_ref, vn_ref, o_ref, *, sm_scale):
    _kernel_stacked_int8dots(
        l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
        sm_scale=sm_scale, kn_ref=kn_ref, vn_ref=vn_ref,
    )


def _kernel_stacked_int8dots_packed(l_ref, q_ref, kv_ref, ks_ref, vs_ref,
                                    bias_ref, kn_ref, vn_ref, o_ref,
                                    *, sm_scale):
    """int8 decode attention over the lane-PACKED cache: one
    [C, T, 2d] array holds k in lanes [0, d) and v in [d, 2d).

    Why: tiled layouts pad the minor dim to 128 lanes — a split
    d_head=64 cache reads 2× its bytes (measured 55 vs 28.5 µs/layer
    at identical logical bytes). The packed array fills the lanes
    exactly. Lane slicing at d=64 is unsupported in Mosaic, so:

    - q is zero-extended into the k lanes with a constant selector
      matmul, making the score dot contract the full 2d lanes (the v
      lanes hit q's zeros — exact);
    - the output dot yields (p·k | p·v) side by side; a second
      constant selector matmul extracts the v half.

    Both selectors are tiny constant MXU ops; the kernel stays
    bandwidth-bound at ~the DMA floor.
    """
    del l_ref
    Bb, C, g, d = q_ref.shape
    D = kv_ref.shape[4]                           # 2*d
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 1)
    e_lo = (col_ids == row_ids).astype(jnp.float32)        # [d, D] k half
    hi_r = jax.lax.broadcasted_iota(jnp.int32, (D, d), 0)
    hi_c = jax.lax.broadcasted_iota(jnp.int32, (D, d), 1)
    e_hi = (hi_r == hi_c + d).astype(jnp.float32)          # [D, d] v half
    for i in range(Bb):                           # static row loop
        q = q_ref[i].astype(jnp.float32)          # [C, g, d]
        kv2 = kv_ref[0, i]                        # [C, T, D] int8
        ks = _row_scales(ks_ref, i)               # [C, T]
        vs = _row_scales(vs_ref, i)
        bias = bias_ref[i]                        # [1, T]
        k_new = kn_ref[i].astype(jnp.float32)     # [C, d]
        v_new = vn_ref[i].astype(jnp.float32)

        q_ext = jax.lax.dot_general(              # [C, g, D], v lanes zero
            q, e_lo, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qa = jnp.max(jnp.abs(q_ext), axis=-1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-8)
        q_i8 = jnp.round(q_ext / qs).astype(jnp.int8)
        s_i32 = jax.lax.dot_general(
            q_i8, kv2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, T]
        s = s_i32.astype(jnp.float32) * (qs * sm_scale) * ks[:, None, :]
        s = s + bias[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        # the CURRENT token's column, unquantized (exact)
        s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
        m = jnp.maximum(m, s_new)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :]                    # fold v scales pre-quant
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, kv2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, D] = (p·k | p·v)
        o = o_i32.astype(jnp.float32) * ps
        o_v = jax.lax.dot_general(                # [C, g, d] — the v half
            o, e_hi, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_new = jnp.exp(s_new - m)
        l = l + p_new
        o_v = o_v + p_new * v_new[:, None, :]
        o_ref[i] = (o_v / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _kernel_stacked_int8dots_packed_tblk(
    s_ref, q_ref, kv_ref, ks_ref, vs_ref, bias_ref, kn_ref, vn_ref,
    o_ref, qq_ref, qs_ref, m_ref, lsum_ref, acc_ref, *, sm_scale, n_tblk,
):
    """T-blocked flash-style variant of the packed int8 kernel over
    the ROW-MERGED cache view ([L, b·kv, T, d] — caller reshapes).

    The cache's T axis is the ONLY grid dim: 128-slot blocks of ALL
    (row, head) pairs stream as one ~4 MB DMA per block, and blocks
    past the session's VALID length clamp their index_map to the last
    valid block — Mosaic skips the DMA when the block index repeats,
    so a step at cache fill f streams only ~f/T of the allocation
    (the cache read is THE decode bottleneck: ~27 µs/layer full-read).
    One program per layer keeps Mosaic's per-grid-step overhead off
    the critical path (a (b, kv/C, T/128) grid measured 56 µs/layer —
    the 80 small steps cost more than the skipped DMA saved).
    ``s_ref`` carries (layer, last_valid_block) via scalar prefetch;
    the softmax runs as a running (m, l, acc) rescale in scratch, q is
    zero-extended + quantized ONCE into scratch at t == 0, and the
    current token's column merges in the final grid step.
    """
    t = pl.program_id(0)
    valid_last = s_ref[1]
    C, g, d = q_ref.shape                         # C = b·kv merged
    D = kv_ref.shape[3]

    @pl.when(t == 0)
    def _init():
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 1)
        e_lo = (col_ids == row_ids).astype(jnp.float32)    # [d, D] k half
        q = q_ref[...].astype(jnp.float32)
        q_ext = jax.lax.dot_general(              # [C, g, D], v lanes zero
            q, e_lo, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qa = jnp.max(jnp.abs(q_ext), axis=-1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-8)
        qq_ref[...] = jnp.round(q_ext / qs).astype(jnp.int8)
        qs_ref[...] = qs
        m_ref[...] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        lsum_ref[...] = jnp.zeros(lsum_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(t <= valid_last)
    def _block():
        hi_r = jax.lax.broadcasted_iota(jnp.int32, (D, d), 0)
        hi_c = jax.lax.broadcasted_iota(jnp.int32, (D, d), 1)
        e_hi = (hi_r == hi_c + d).astype(jnp.float32)      # [D, d] v half
        kv2 = kv_ref[0]                           # [C, Tblk, D] int8
        ks = ks_ref[0]                            # [C, Tblk]
        vs = vs_ref[0]
        bias = bias_ref[...]                      # [C, Tblk]
        s_i32 = jax.lax.dot_general(
            qq_ref[...], kv2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, Tblk]
        s = s_i32.astype(jnp.float32) * (qs_ref[...] * sm_scale)
        s = s * ks[:, None, :].astype(jnp.float32) + bias[:, None, :]
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        lsum_ref[...] = lsum_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :].astype(jnp.float32)  # fold v scales pre-quant
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, kv2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [C, g, D] = (p·k | p·v)
        o_v = jax.lax.dot_general(                # [C, g, d] — the v half
            o_i32.astype(jnp.float32) * ps, e_hi,
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * corr + o_v
        m_ref[...] = m_new

    @pl.when(t == n_tblk - 1)
    def _final():
        q = q_ref[...].astype(jnp.float32)
        k_new = kn_ref[...].astype(jnp.float32)   # [C, d]
        v_new = vn_ref[...].astype(jnp.float32)
        s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
        m_prev = m_ref[...]
        m_fin = jnp.maximum(m_prev, s_new)
        corr = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = lsum_ref[...] * corr + p_new
        o = acc_ref[...] * corr + p_new * v_new[:, None, :]
        o_ref[...] = (o / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def _kernel_stacked_int8dots_tblk(
    s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, kn_ref, vn_ref,
    o_ref, qq_ref, qs_ref, m_ref, lsum_ref, acc_ref, *, sm_scale, n_tblk,
):
    """T-blocked flash-style variant of the UNPACKED int8 kernel over
    row-merged [L, b·kv, T, d] k/v views (the d_head=128 families —
    lanes already full, no packing selectors needed).

    Same valid-length clamp as the packed sibling: T is the only grid
    dim, blocks past the session fill clamp their index_map to the
    last valid block (Mosaic skips the repeated DMA), so a step at
    cache fill f streams ~f/T of the k AND v allocations. Numerics
    mirror _kernel_stacked_int8dots exactly (in-kernel ~7-bit q/p
    quantization, v-scales folded pre-quant, current token merged
    unquantized in the final grid step)."""
    t = pl.program_id(0)
    valid_last = s_ref[1]

    @pl.when(t == 0)
    def _init():
        q = q_ref[...].astype(jnp.float32)        # [BC, g, d]
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-8)
        qq_ref[...] = jnp.round(q / qs).astype(jnp.int8)
        qs_ref[...] = qs
        m_ref[...] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        lsum_ref[...] = jnp.zeros(lsum_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(t <= valid_last)
    def _block():
        k = k_ref[0]                              # [BC, Tblk, d] int8
        v = v_ref[0]
        ks = ks_ref[0]                            # [BC, Tblk]
        vs = vs_ref[0]
        bias = bias_ref[...]                      # [BC, Tblk]
        s_i32 = jax.lax.dot_general(
            qq_ref[...], k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [BC, g, Tblk]
        s = s_i32.astype(jnp.float32) * (qs_ref[...] * sm_scale)
        s = s * ks[:, None, :].astype(jnp.float32) + bias[:, None, :]
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        lsum_ref[...] = lsum_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :].astype(jnp.float32)  # fold v scales pre-quant
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                         # [BC, g, d]
        acc_ref[...] = acc_ref[...] * corr + o_i32.astype(jnp.float32) * ps
        m_ref[...] = m_new

    @pl.when(t == n_tblk - 1)
    def _final():
        q = q_ref[...].astype(jnp.float32)
        k_new = kn_ref[...].astype(jnp.float32)   # [BC, d]
        v_new = vn_ref[...].astype(jnp.float32)
        s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
        m_prev = m_ref[...]
        m_fin = jnp.maximum(m_prev, s_new)
        corr = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = lsum_ref[...] * corr + p_new
        o = acc_ref[...] * corr + p_new * v_new[:, None, :]
        o_ref[...] = (o / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def _kernel_stacked_quant(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                          bias_ref, o_ref, *, sm_scale,
                          kn_ref=None, vn_ref=None):
    del l_ref  # consumed by the index_map
    Bb = q_ref.shape[0]
    for i in range(Bb):                           # static row loop
        q = q_ref[i].astype(jnp.float32)          # [C, g, d]
        k = k_ref[0, i].astype(jnp.float32)       # [C, T, d]
        v = v_ref[0, i].astype(jnp.float32) * _row_scales(vs_ref, i)[:, :, None]
        extra = sm_scale * _row_scales(ks_ref, i)[:, None, :]  # [C, 1, T]
        bias = bias_ref[i][None]                  # [1, 1, T]
        k_new = kn_ref[i].astype(jnp.float32) if kn_ref is not None else None
        v_new = vn_ref[i].astype(jnp.float32) if vn_ref is not None else None
        o_ref[i] = _attend_chunk(
            q, k, v, extra, bias, k_new, v_new, sm_scale
        ).astype(o_ref.dtype)


def _kernel_stacked_quant_new(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                              bias_ref, kn_ref, vn_ref, o_ref, *, sm_scale):
    _kernel_stacked_quant(
        l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
        sm_scale=sm_scale, kn_ref=kn_ref, vn_ref=vn_ref,
    )


def _kernel_stacked_plain(l_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                          *, sm_scale, kn_ref=None, vn_ref=None):
    del l_ref
    Bb = q_ref.shape[0]
    for i in range(Bb):                           # static row loop
        q = q_ref[i].astype(jnp.float32)
        k = k_ref[0, i].astype(jnp.float32)
        v = v_ref[0, i].astype(jnp.float32)
        bias = bias_ref[i][None]
        k_new = kn_ref[i].astype(jnp.float32) if kn_ref is not None else None
        v_new = vn_ref[i].astype(jnp.float32) if vn_ref is not None else None
        o_ref[i] = _attend_chunk(
            q, k, v, jnp.float32(sm_scale), bias, k_new, v_new, sm_scale
        ).astype(o_ref.dtype)


def _kernel_stacked_plain_new(l_ref, q_ref, k_ref, v_ref, bias_ref,
                              kn_ref, vn_ref, o_ref, *, sm_scale):
    _kernel_stacked_plain(
        l_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
        sm_scale=sm_scale, kn_ref=kn_ref, vn_ref=vn_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "int8_dots", "packed", "interpret")
)
def decode_attention_stacked(
    q: jax.Array,                       # [b, kv, g, d]
    k_all: jax.Array,                   # [L, b, kv, T, d]  bf16 or int8;
    #                                     [.., T, 2d] k|v when packed
    v_all: jax.Array | None,            # None when packed
    bias: jax.Array,                    # [b, T] f32 additive mask
    layer: jax.Array,                   # scalar int32 layer index
    k_scale: jax.Array | None = None,   # [L, b, kv, T] f32 (int8 cache)
    v_scale: jax.Array | None = None,
    k_new: jax.Array | None = None,     # [b, kv, d] current token's k
    v_new: jax.Array | None = None,
    valid_len: jax.Array | None = None,  # scalar int32 — cached slots in use
    *,
    sm_scale: float,
    int8_dots: bool = False,
    packed: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention reading layer ``layer`` of the stacked cache
    in place (scalar-prefetch index_map — no slice materialization).

    ``k_new``/``v_new`` merge the CURRENT token's position into the
    softmax without it being written to the cache first — this keeps
    the stacked cache READ-ONLY across the whole step's layer loop,
    which is what lets XLA pass it to pallas without materializing a
    copy (a cache carried+updated inside the loop costs ~1 ms/step in
    copies at 0.5B scale).

    ``int8_dots=True`` (int8 cache only) runs the int8-native MXU
    kernel — faster, ~7-bit q/p quantization (see
    _kernel_stacked_int8dots)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, kv, g, d = q.shape
    T = k_all.shape[3]
    quant = k_scale is not None
    if int8_dots and not quant:
        raise ValueError("int8_dots requires the int8-quantized cache")
    if packed:
        if not (int8_dots and quant and k_new is not None and v_all is None):
            raise ValueError(
                "packed mode needs int8_dots, scales, k_new/v_new, v_all=None"
            )
        if k_all.shape[4] != 2 * d:
            raise ValueError("packed cache last dim must be 2*d_head")

    bias = bias[:, None, :]                           # [b, 1, T]

    # chunk kv heads: few enough programs to amortize per-program sync
    # against the DMA stream, small enough blocks to fit VMEM. int8
    # blocks are half the bytes — measured fastest with ALL heads in
    # one program. Multi-row blocks (Bb > 1) measured net-slower
    # (165 vs 155 µs/layer·30 at Bb=4): fewer programs lose the
    # compute/DMA pipelining without reducing total DMA, so Bb stays 1
    # (the multi-row kernel path is kept for future shapes).
    d_store = 2 * d if packed else d
    elem = 1 if int8_dots else 4
    C = 1
    for cand in (16, 8, 4, 2, 1):
        if kv % cand == 0 and cand * T * d_store * elem * 2 <= 6 * 1024 * 1024:
            C = cand
            break
    Bb = 1
    q_spec = pl.BlockSpec((Bb, C, g, d), lambda b_, h_, l_ref: (b_, h_, 0, 0))
    cache_spec = pl.BlockSpec(
        (1, Bb, C, T, d_store), lambda b_, h_, l_ref: (l_ref[0], b_, h_, 0, 0)
    )
    # scales: 4D blocks over the native [L, b, kv, T] arrays whenever the
    # (C, T) trailing block obeys Mosaic's rules — the unit-dim 5D
    # reshape forces XLA to RELAYOUT the 35 MB arrays every step
    # (~73 µs × 2 at 0.5B). Fallback keeps the 5D layout.
    scales_4d = quant and (C % 8 == 0 or C == kv)
    if quant and not scales_4d:
        k_scale = k_scale[:, :, :, None, :]           # [L, b, kv, 1, T]
        v_scale = v_scale[:, :, :, None, :]
    if scales_4d:
        scale_spec = pl.BlockSpec(
            (1, Bb, C, T), lambda b_, h_, l_ref: (l_ref[0], b_, h_, 0)
        )
    else:
        scale_spec = pl.BlockSpec(
            (1, Bb, C, 1, T), lambda b_, h_, l_ref: (l_ref[0], b_, h_, 0, 0)
        )
    bias_spec = pl.BlockSpec((Bb, 1, T), lambda b_, h_, l_ref: (b_, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, kv, g, d), jnp.float32)

    with_new = k_new is not None
    new_spec = pl.BlockSpec((Bb, C, d), lambda b_, h_, l_ref: (b_, h_, 0))

    if packed and valid_len is not None and T % 128 == 0 and quant:
        # T-blocked path over the row-merged [L, b·kv, T, 2d] view:
        # stream only the VALID region of the cache (index_map clamp —
        # see _kernel_stacked_int8dots_packed_tblk)
        L = k_all.shape[0]
        BC = b * kv
        n_tblk = T // 128
        valid_last = jnp.clip(
            (jnp.asarray(valid_len, jnp.int32) + 127) // 128 - 1, 0, n_tblk - 1
        )
        scalars = jnp.stack(
            [jnp.asarray(layer, jnp.int32), valid_last]
        ).astype(jnp.int32)
        kv_m = k_all.reshape(L, BC, T, d_store)
        ks_m = (k_scale if scales_4d else k_scale[:, :, :, 0, :]).reshape(L, BC, T)
        vs_m = (v_scale if scales_4d else v_scale[:, :, :, 0, :]).reshape(L, BC, T)
        # per-(row, head) bias rows — bias is [b, 1, T] here
        bias_m = jnp.broadcast_to(bias, (b, kv, T)).reshape(BC, T)
        q_m = q.reshape(BC, g, d)
        kn_m = k_new.reshape(BC, d)
        vn_m = v_new.reshape(BC, d)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tblk,),
            in_specs=[
                pl.BlockSpec((BC, g, d), lambda t, s: (0, 0, 0)),
                pl.BlockSpec(
                    (1, BC, 128, d_store),
                    lambda t, s: (s[0], 0, jnp.minimum(t, s[1]), 0),
                ),
                pl.BlockSpec(
                    (1, BC, 128), lambda t, s: (s[0], 0, jnp.minimum(t, s[1]))
                ),
                pl.BlockSpec(
                    (1, BC, 128), lambda t, s: (s[0], 0, jnp.minimum(t, s[1]))
                ),
                pl.BlockSpec((BC, 128), lambda t, s: (0, jnp.minimum(t, s[1]))),
                pl.BlockSpec((BC, d), lambda t, s: (0, 0)),
                pl.BlockSpec((BC, d), lambda t, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BC, g, d), lambda t, s: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((BC, g, 2 * d), jnp.int8),   # quantized q_ext
                pltpu.VMEM((BC, g, 1), jnp.float32),    # its row scales
                pltpu.VMEM((BC, g, 1), jnp.float32),    # running max
                pltpu.VMEM((BC, g, 1), jnp.float32),    # running denom
                pltpu.VMEM((BC, g, d), jnp.float32),    # running numerator
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_stacked_int8dots_packed_tblk,
                sm_scale=sm_scale, n_tblk=n_tblk,
            ),
            out_shape=jax.ShapeDtypeStruct((BC, g, d), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(scalars, q_m, kv_m, ks_m, vs_m, bias_m, kn_m, vn_m)
        return out.reshape(b, kv, g, d)

    if (
        not packed
        and quant
        and int8_dots
        and with_new
        and valid_len is not None
        and T % 128 == 0
    ):
        # T-blocked path for the UNPACKED (d_head-128) cache families:
        # same valid-length index_map clamp as the packed branch above,
        # with separate k/v streams (lanes are already full at d=128).
        L = k_all.shape[0]
        BC = b * kv
        n_tblk = T // 128
        valid_last = jnp.clip(
            (jnp.asarray(valid_len, jnp.int32) + 127) // 128 - 1, 0, n_tblk - 1
        )
        scalars = jnp.stack(
            [jnp.asarray(layer, jnp.int32), valid_last]
        ).astype(jnp.int32)
        k_m = k_all.reshape(L, BC, T, d)
        v_m = v_all.reshape(L, BC, T, d)
        ks_m = (k_scale if scales_4d else k_scale[:, :, :, 0, :]).reshape(L, BC, T)
        vs_m = (v_scale if scales_4d else v_scale[:, :, :, 0, :]).reshape(L, BC, T)
        bias_m = jnp.broadcast_to(bias, (b, kv, T)).reshape(BC, T)
        q_m = q.reshape(BC, g, d)
        kn_m = k_new.reshape(BC, d)
        vn_m = v_new.reshape(BC, d)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tblk,),
            in_specs=[
                pl.BlockSpec((BC, g, d), lambda t, s: (0, 0, 0)),
                pl.BlockSpec(
                    (1, BC, 128, d),
                    lambda t, s: (s[0], 0, jnp.minimum(t, s[1]), 0),
                ),
                pl.BlockSpec(
                    (1, BC, 128, d),
                    lambda t, s: (s[0], 0, jnp.minimum(t, s[1]), 0),
                ),
                pl.BlockSpec(
                    (1, BC, 128), lambda t, s: (s[0], 0, jnp.minimum(t, s[1]))
                ),
                pl.BlockSpec(
                    (1, BC, 128), lambda t, s: (s[0], 0, jnp.minimum(t, s[1]))
                ),
                pl.BlockSpec((BC, 128), lambda t, s: (0, jnp.minimum(t, s[1]))),
                pl.BlockSpec((BC, d), lambda t, s: (0, 0)),
                pl.BlockSpec((BC, d), lambda t, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BC, g, d), lambda t, s: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((BC, g, d), jnp.int8),       # quantized q
                pltpu.VMEM((BC, g, 1), jnp.float32),    # its row scales
                pltpu.VMEM((BC, g, 1), jnp.float32),    # running max
                pltpu.VMEM((BC, g, 1), jnp.float32),    # running denom
                pltpu.VMEM((BC, g, d), jnp.float32),    # running numerator
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_stacked_int8dots_tblk,
                sm_scale=sm_scale, n_tblk=n_tblk,
            ),
            out_shape=jax.ShapeDtypeStruct((BC, g, d), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(scalars, q_m, k_m, v_m, ks_m, vs_m, bias_m, kn_m, vn_m)
        return out.reshape(b, kv, g, d)

    if packed:
        kernel = functools.partial(
            _kernel_stacked_int8dots_packed, sm_scale=sm_scale
        )
        in_specs = [q_spec, cache_spec, scale_spec, scale_spec, bias_spec,
                    new_spec, new_spec]
        args = [q, k_all, k_scale, v_scale, bias, k_new, v_new]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // Bb, kv // C),
            in_specs=in_specs,
            out_specs=q_spec,
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *args)

    if quant and int8_dots:
        base = _kernel_stacked_int8dots_new if with_new else _kernel_stacked_int8dots
        kernel = functools.partial(base, sm_scale=sm_scale)
        in_specs = [q_spec, cache_spec, cache_spec, scale_spec, scale_spec, bias_spec]
        args = [q, k_all, v_all, k_scale, v_scale, bias]
    elif quant:
        base = _kernel_stacked_quant_new if with_new else _kernel_stacked_quant
        kernel = functools.partial(base, sm_scale=sm_scale)
        in_specs = [q_spec, cache_spec, cache_spec, scale_spec, scale_spec, bias_spec]
        args = [q, k_all, v_all, k_scale, v_scale, bias]
    else:
        base = _kernel_stacked_plain_new if with_new else _kernel_stacked_plain
        kernel = functools.partial(base, sm_scale=sm_scale)
        in_specs = [q_spec, cache_spec, cache_spec, bias_spec]
        args = [q, k_all, v_all, bias]
    if with_new:
        in_specs += [new_spec, new_spec]
        args += [k_new, v_new]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // Bb, kv // C),
        in_specs=in_specs,
        out_specs=q_spec,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)


__all__ = ["decode_attention", "decode_attention_stacked"]
