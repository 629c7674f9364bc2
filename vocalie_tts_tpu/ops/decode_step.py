"""ONE-launch whole decode STEP: every layer fused into a single
pallas call, ONE grid step per layer.

Round-4's streaming profile left the b=1 tail kernel at 29.35 µs/layer
against a ~19.5 µs weight-DMA floor. The first cut of this kernel
(grid = layers × phases, 8 phase steps/layer) measured 1.05 ms/step at
0.5B/30L on TPU — 35 µs/layer, only 3% better than the per-layer
launches: at b=1 the bottleneck is not launch boundaries but the FIXED
COST PER GRID STEP (~1.5-2 µs of Mosaic loop/semaphore/DMA-issue
overhead), and 240 grid steps/step burn ~400 µs against ~5 µs of
actual compute. So this kernel holds the entire layer in one grid
step:

    grid = (n_layers,)
    per step: whole-cache attention block + per-head o-proj + whole
    d_ff MLP + the NEXT layer's head-stacked qkv projection + RoPE

Per-layer resident blocks ≈ 17.5 MB (0.5B shapes: gate 4 + up 4 +
down 4 + qkv_h 3 + wo 1 + cache ~1.3), ×2 for pallas double-buffering
— comfortably under the 100 MB VMEM limit, and the layer-(l+1) DMA
overlaps layer l's (tiny) compute, so the launch is DMA-bound at the
weight-streaming floor. The whole-cache attention gives up the
T-blocked valid-length DMA clamp (ops/decode_attention); at b=1 the
cache is ~1-3 MB/layer against 16 MB of weights, so the clamp's
saving is noise here.

The cross-layer blocker (lane→sublane head transpose for the next
layer's qkv) is dodged by changing the WEIGHT layout instead of
transposing the activation: the runtime installs a decode-only
head-stacked copy

    wqkv_h : [L, 3H, d_model, d]   (head-major; q rows, k rows, v rows)

so the in-kernel projection is a BATCHED dot over the head axis —
``[3H, 1, d_model] · [3H, d_model, d] → [3H, 1, d]`` — whose output
already has heads on sublanes. RoPE is applied flat on [3H, d] with a
constant half-swap permutation dot (out = y·cos‖ + (y·P)·±sin‖),
masked to the q‖k rows; q/k/v are then static 8-aligned sublane
slices. Layer l's epilogue writes layer l+1's k/v to output block l
([L] blocks, one per grid step); the caller prepends the operand-side
layer-0 k/v, so the step's cache append stays ONE batched call
outside, exactly like the scan path.

Scope (statically asserted): b==1, MHA (g==1), packed int8 KV
(d_head 64), rms/swiglu family, RoPE, no qk-norm — the CosyVoice /
T3 streaming configs the round-5 target names. Opt-in via
VOCALIE_FUSED_STEP until TPU-validated.

Numerics match the megalayer path (~7-bit in-kernel activation
quantization over int8 weights); the single-block softmax is the
T-blocked online softmax's exact limit at one block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocalie_tts_tpu.ops.decode_dense import _quantize_rows, _rms_rows


def head_stack_qkv(layers: dict, n_heads: int, n_kv_heads: int, d_head: int):
    """Build the decode-only head-stacked qkv layout from the fused
    int8 ``wqkv`` tree: ``{"q": [L, 3H, d_model, d], "s": [L, 3H, 1, d]}``
    plus ``bqkv_h [L, 3H, 1, d]`` (zeros when the family has no qkv
    bias). Head order is q-heads, k-heads, v-heads — the row order the
    fused-step kernel slices."""
    w = layers["wqkv"]
    L, d_model, d_qkv = w["q"].shape
    h3 = n_heads + 2 * n_kv_heads
    if d_qkv != h3 * d_head:
        raise ValueError(f"wqkv width {d_qkv} != (H + 2kv)*d = {h3 * d_head}")
    q = w["q"].reshape(L, d_model, h3, d_head).transpose(0, 2, 1, 3)
    s = w["s"].reshape(L, 1, h3, d_head).transpose(0, 2, 1, 3)
    b = layers.get("bqkv")
    if b is None:
        bh = jnp.zeros((L, h3, 1, d_head), jnp.float32)
    else:
        bh = b.reshape(L, 1, h3, d_head).transpose(0, 2, 1, 3).astype(jnp.float32)
    return {"q": q, "s": s.astype(jnp.float32)}, bh


def _layer_body(l, q0_ref, kn0_ref, vn0_ref, x0_ref,
                kv_ref, ks_ref, vs_ref, bias_ref,
                wo_ref, wos_ref, mw_ref,
                wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                nw_ref, wh_ref, sh_ref, bh_ref, cos_ref, sin_ref,
                o_ref, kno_ref, vno_ref,
                qf_ref, knf_ref, vnf_ref, xres_ref,
                *, sm_scale, eps, kv, d):
    """The WHOLE decode layer + next-layer qkv, in one grid step."""
    h3 = 3 * kv
    d_model = x0_ref.shape[1]

    @pl.when(l == 0)
    def _load_layer0():
        qf_ref[...] = q0_ref[...]
        knf_ref[...] = kn0_ref[...]
        vnf_ref[...] = vn0_ref[...]
        xres_ref[...] = x0_ref[...].astype(jnp.float32)

    # ── attention: single whole-cache block (packed int8 k|v) ──
    D = kv_ref.shape[3]                                # 2d
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 1)
    e_lo = (col_ids == row_ids).astype(jnp.float32)    # [d, D] k half
    hi_r = jax.lax.broadcasted_iota(jnp.int32, (D, d), 0)
    hi_c = jax.lax.broadcasted_iota(jnp.int32, (D, d), 1)
    e_hi = (hi_r == hi_c + d).astype(jnp.float32)      # [D, d] v half

    q = qf_ref[...]                                    # [kv, 1, d] f32
    q_ext = jax.lax.dot_general(                       # zero-extend to [.., D]
        q, e_lo, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qa = jnp.max(jnp.abs(q_ext), axis=-1, keepdims=True)
    qs = jnp.maximum(qa / 127.0, 1e-8)
    qq = jnp.round(q_ext / qs).astype(jnp.int8)        # [kv, 1, D]

    kv2 = kv_ref[0]                                    # [kv, T, D] int8
    ks = ks_ref[0]                                     # [kv, T] bf16
    vs = vs_ref[0]
    bias = bias_ref[...]                               # [kv, T] f32 (0 / -inf)
    s = jax.lax.dot_general(
        qq, kv2, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (qs * sm_scale)            # [kv, 1, T]
    s = s * ks[:, None, :].astype(jnp.float32) + bias[:, None, :]
    # merged current-token column (kept f32, outside the cache)
    k_new = knf_ref[...]                               # [kv, d]
    v_new = vnf_ref[...]
    s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp(s - m)
    p_new = jnp.exp(s_new - m)
    l_sum = jnp.sum(p, axis=-1, keepdims=True) + p_new
    p = p * vs[:, None, :].astype(jnp.float32)
    pa = jnp.max(p, axis=-1, keepdims=True)
    ps = jnp.maximum(pa / 127.0, 1e-20)
    p_i8 = jnp.round(p / ps).astype(jnp.int8)
    o_i32 = jax.lax.dot_general(
        p_i8, kv2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                  # [kv, 1, D]
    o_v = jax.lax.dot_general(
        o_i32.astype(jnp.float32) * ps, e_hi, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [kv, 1, d]
    o = (o_v + p_new * v_new[:, None, :]) / jnp.maximum(l_sum, 1e-30)

    # ── o-proj as ONE batched head dot: heads stay on sublanes, and
    # the [h·d, d_model] weight splits to [kv, d, d_model] for FREE
    # (leading-axis reshape done by the caller). Per-head row scales —
    # the same granularity the per-head-chunk loop had, without 16
    # python-unrolled dots + quantizes in the kernel body. ──
    oa = jnp.max(jnp.abs(o), axis=-1, keepdims=True)   # [kv, 1, 1]
    os_ = jnp.maximum(oa / 127.0, 1e-8)
    o_i8 = jnp.round(o / os_).astype(jnp.int8)
    y_h = jax.lax.dot_general(
        o_i8, wo_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * os_                        # [kv, 1, d_model]
    y = jnp.sum(y_h, axis=0) * wos_ref[0]              # [1, d_model]
    x2 = xres_ref[...] + y
    h2 = _rms_rows(x2, mw_ref[0, 0].astype(jnp.float32), eps)
    h_i8, hs = _quantize_rows(h2)

    # ── whole-d_ff SwiGLU MLP + residual ──
    g_ = jax.lax.dot_general(
        h_i8, wg_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs * sg_ref[0]
    u = jax.lax.dot_general(
        h_i8, wu_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * hs * su_ref[0]
    hmid = jax.nn.silu(g_) * u
    m_i8, ms = _quantize_rows(hmid)
    dn = jax.lax.dot_general(
        m_i8, wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * ms * sd_ref[0, 0]
    x_out = x2 + dn
    o_ref[...] = x_out                 # dead store except at l == L-1
    xres_ref[...] = x_out

    # ── next layer's qkv: batched head dot + RoPE + split ──
    hn = _rms_rows(x_out, nw_ref[0, 0].astype(jnp.float32), eps)
    amax = jnp.max(jnp.abs(hn), axis=-1, keepdims=True)
    s_row = jnp.maximum(amax / 127.0, 1e-8)            # [1, 1]
    hb = jnp.broadcast_to(
        (hn / s_row).reshape(1, 1, d_model), (h3, 1, d_model)
    )
    hq = jnp.round(hb).astype(jnp.int8)
    yq = jax.lax.dot_general(
        hq, wh_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)                              # [3H, 1, d]
    yq = yq * s_row * sh_ref[0] + bh_ref[0]
    y2 = yq.reshape(h3, d)                             # leading reshape — free
    dh = d // 2
    pr = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    perm = ((pr == pc + dh) | (pc == pr + dh)).astype(jnp.float32)
    swap = jax.lax.dot_general(
        y2, perm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    roped = y2 * cos_ref[...] + swap * sin_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h3, d), 0)
    out = jnp.where(rows < 2 * kv, roped, y2)          # v rows un-roped
    qf_ref[...] = out[0:kv].reshape(kv, 1, d)
    knf_ref[...] = out[kv:2 * kv]
    vnf_ref[...] = out[2 * kv:3 * kv]
    kno_ref[...] = out[kv:2 * kv].reshape(1, kv, d)
    vno_ref[...] = out[2 * kv:3 * kv].reshape(1, kv, d)


def _step_kernel(q0_ref, kn0_ref, vn0_ref, x0_ref,
                 kv_ref, ks_ref, vs_ref, bias_ref,
                 wo_ref, wos_ref, mw_ref,
                 wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                 nw_ref, wh_ref, sh_ref, bh_ref, cos_ref, sin_ref,
                 o_ref, kno_ref, vno_ref,
                 qf_ref, knf_ref, vnf_ref, xres_ref,
                 *, sm_scale, eps, kv, d):
    _layer_body(pl.program_id(0),
                q0_ref, kn0_ref, vn0_ref, x0_ref,
                kv_ref, ks_ref, vs_ref, bias_ref,
                wo_ref, wos_ref, mw_ref,
                wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                nw_ref, wh_ref, sh_ref, bh_ref, cos_ref, sin_ref,
                o_ref, kno_ref, vno_ref,
                qf_ref, knf_ref, vnf_ref, xres_ref,
                sm_scale=sm_scale, eps=eps, kv=kv, d=d)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "eps", "interpret")
)
def decode_step_fused_packed(
    q0: jax.Array,        # [kv, 1, d] f32 — layer-0 post-RoPE q
    kn0: jax.Array,       # [kv, d] f32 — layer-0 current-token k
    vn0: jax.Array,       # [kv, d] f32
    x: jax.Array,         # [1, d_model] residual INTO layer 0
    k_all: jax.Array,     # [L, 1, kv, T, 2d] int8 packed cache
    k_scale: jax.Array,   # [L, 1, kv, T] bf16
    v_scale: jax.Array,
    bias2d: jax.Array,    # [1, T] f32
    valid_len: jax.Array,  # unused (bias masks); kept for call parity
    wo_all: jax.Array,    # [L, h·d, d_model] int8
    wos_all: jax.Array,   # [L, 1, d_model]
    mw_all: jax.Array,    # [L, d_model]
    wgu_all: jax.Array,   # [L, d_model, 2*d_ff] int8
    sgu_all: jax.Array,   # [L, 1, 2*d_ff]
    wd_all: jax.Array,    # [L, d_ff, d_model] int8
    sd_all: jax.Array,    # [L, 1, d_model]
    nw_all: jax.Array,    # [L, d_model] attn-norm (next layer's)
    wh_all: jax.Array,    # [L, 3H, d_model, d] int8 head-stacked qkv
    sh_all: jax.Array,    # [L, 3H, 1, d] f32
    bh_all: jax.Array,    # [L, 3H, 1, d] f32 (zeros when no qkv bias)
    cos_f: jax.Array,     # [1, d] f32 — cos tiled to both halves
    sin_f: jax.Array,     # [1, d] f32 — [-sin | +sin]
    *,
    sm_scale: float,
    eps: float,
    interpret: bool | None = None,
):
    """The whole decode step (all layers) in ONE pallas launch, one
    grid step per layer.

    Returns ``(x_out [1, d_model] f32, kn_nxt [L, kv, d] f32,
    vn_nxt [L, kv, d] f32)`` — ``kn_nxt[l]`` is layer l+1's
    current-token k (the caller prepends the operand-side layer-0 k/v
    and drops row L-1's successor, which does not exist).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv, g, d = q0.shape
    if g != 1:
        raise ValueError("fused step kernel is MHA-only (g == 1)")
    L, b, _, T, d_store = k_all.shape
    if b != 1:
        raise ValueError("fused step kernel is b=1 only")
    d_model = x.shape[1]
    d_ff = wd_all.shape[1]
    h3 = 3 * kv

    kv_m = k_all.reshape(L, kv, T, d_store)
    ks_m = k_scale.reshape(L, kv, T)
    vs_m = v_scale.reshape(L, kv, T)
    bias_m = jnp.broadcast_to(bias2d, (kv, T))

    def _nxt(l):
        return jnp.minimum(l + 1, L - 1)

    in_specs = [
        pl.BlockSpec((kv, 1, d), lambda l: (0, 0, 0)),              # q0
        pl.BlockSpec((kv, d), lambda l: (0, 0)),                     # kn0
        pl.BlockSpec((kv, d), lambda l: (0, 0)),                     # vn0
        pl.BlockSpec((1, d_model), lambda l: (0, 0)),                # x0
        pl.BlockSpec((1, kv, T, d_store), lambda l: (l, 0, 0, 0)),   # kv cache
        pl.BlockSpec((1, kv, T), lambda l: (l, 0, 0)),               # ks
        pl.BlockSpec((1, kv, T), lambda l: (l, 0, 0)),               # vs
        pl.BlockSpec((kv, T), lambda l: (0, 0)),                     # bias
        pl.BlockSpec((1, kv, d, d_model), lambda l: (l, 0, 0, 0)),   # wo
        pl.BlockSpec((1, 1, d_model), lambda l: (l, 0, 0)),          # wos
        pl.BlockSpec((1, 1, d_model), lambda l: (l, 0, 0)),          # mw
        pl.BlockSpec((1, d_model, d_ff), lambda l: (l, 0, 0)),       # wg
        pl.BlockSpec((1, d_model, d_ff), lambda l: (l, 0, 1)),       # wu
        pl.BlockSpec((1, 1, d_ff), lambda l: (l, 0, 0)),             # sg
        pl.BlockSpec((1, 1, d_ff), lambda l: (l, 0, 1)),             # su
        pl.BlockSpec((1, d_ff, d_model), lambda l: (l, 0, 0)),       # wd
        pl.BlockSpec((1, 1, d_model), lambda l: (l, 0, 0)),          # sd
        pl.BlockSpec((1, 1, d_model), lambda l: (_nxt(l), 0, 0)),    # nw
        pl.BlockSpec((1, h3, d_model, d), lambda l: (_nxt(l), 0, 0, 0)),  # wh
        pl.BlockSpec((1, h3, 1, d), lambda l: (_nxt(l), 0, 0, 0)),   # sh
        pl.BlockSpec((1, h3, 1, d), lambda l: (_nxt(l), 0, 0, 0)),   # bh
        pl.BlockSpec((1, d), lambda l: (0, 0)),                      # cos
        pl.BlockSpec((1, d), lambda l: (0, 0)),                      # sin
    ]
    out_specs = [
        pl.BlockSpec((1, d_model), lambda l: (0, 0)),                # x_out
        pl.BlockSpec((1, kv, d), lambda l: (l, 0, 0)),               # kn_nxt
        pl.BlockSpec((1, kv, d), lambda l: (l, 0, 0)),               # vn_nxt
    ]

    kernel = functools.partial(
        _step_kernel, sm_scale=sm_scale, eps=eps, kv=kv, d=d,
    )
    x_out, kn_nxt, vn_nxt = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, d_model), jnp.float32),
            jax.ShapeDtypeStruct((L, kv, d), jnp.float32),
            jax.ShapeDtypeStruct((L, kv, d), jnp.float32),
        ],
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((kv, 1, d), jnp.float32),       # qf (this layer's q)
            pltpu.VMEM((kv, d), jnp.float32),          # knf
            pltpu.VMEM((kv, d), jnp.float32),          # vnf
            pltpu.VMEM((1, d_model), jnp.float32),     # x residual carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        q0, kn0, vn0, x,
        kv_m, ks_m, vs_m, bias_m,
        wo_all.reshape(L, kv, d, d_model), wos_all, mw_all[:, None, :],
        wgu_all, wgu_all, sgu_all, sgu_all, wd_all, sd_all,
        nw_all[:, None, :], wh_all, sh_all, bh_all, cos_f, sin_f,
    )
    return x_out, kn_nxt, vn_nxt


__all__ = ["decode_step_fused_packed", "head_stack_qkv"]
