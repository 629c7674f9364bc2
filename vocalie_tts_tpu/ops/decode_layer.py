"""ONE-launch decode layer: attention + o-proj + MLP tail + next qkv.

Round-3 parked the attention/tail merge on the sublane→lane head
transpose at the o-proj boundary (ops/decode_dense.py module note):
the attention kernel's output keeps heads on SUBLANES ([b·kv, g, d] —
the layout the cache matmuls need) while the tail's o-proj consumes
head-on-LANES rows ([b, h·d]). The round-4 unblock: **don't transpose —
decompose the o-proj per head.** The attention accumulator is read as a
VALUE, leading-reshaped to [b, kv, g, d] (minor dims unchanged — free),
and the o-proj runs as kv·g chunk dots

    y += (o[:, h, j, :])_i8 · Wo[(h·g+j)·d : +d, :]_i8 · scales

— [b, d] @ [d, d_model] with M = b (NOT the M=1 mini-dots that
dead-ended), each Wo chunk a statically 8-aligned sublane slice of the
weight block already resident for the tail. The layer then continues
with decode_dense's tail phases (residual → rms → SwiGLU → residual →
next layer's norm+qkv) in the SAME pallas call:

    grid = (T/128 attention blocks ‖ d_ff tiles ‖ d_qkv tiles)

Attention blocks keep the T-blocked valid-length clamp (index_map
repeats past the session fill → Mosaic skips the DMA), and clamp their
index during the tail phases (no re-DMA). One launch per decode layer
instead of two removes ~30 launch boundaries (pipeline fill/drain +
XLA glue) per step. Numerics are identical to the two-kernel pair:
~7-bit in-kernel q/p quantization, v-scales folded pre-quant, the
current token merged unquantized, per-chunk o-proj row scales (finer
than the pair's whole-row scale).

Opt-in via TransformerConfig/VOCALIE_MEGALAYER until TPU-validated
(the fewer-bigger-programs direction has lost before — see the Bb>1
note in ops/decode_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocalie_tts_tpu.ops.decode_dense import _pick_tile, _quantize_rows, _rms_rows


def _attn_tblock_packed(t, s_ref, q_ref, kv_ref, ks_ref, vs_ref, bias_ref,
                        qq_ref, qs_ref, m_ref, lsum_ref, acc_ref, *, sm_scale):
    """One 128-slot T block of packed int8 flash attention (the
    _kernel_stacked_int8dots_packed_tblk body, shared here)."""
    valid_last = s_ref[1]
    C, g, d = q_ref.shape
    D = kv_ref.shape[3]

    @pl.when(t == 0)
    def _init():
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (d, D), 1)
        e_lo = (col_ids == row_ids).astype(jnp.float32)    # [d, D] k half
        q = q_ref[...].astype(jnp.float32)
        q_ext = jax.lax.dot_general(
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
        kv2 = kv_ref[0]
        ks = ks_ref[0]
        vs = vs_ref[0]
        bias = bias_ref[...]
        s = jax.lax.dot_general(
            qq_ref[...], kv2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (qs_ref[...] * sm_scale)
        s = s * ks[:, None, :].astype(jnp.float32) + bias[:, None, :]
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        lsum_ref[...] = lsum_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :].astype(jnp.float32)
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, kv2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        o_v = jax.lax.dot_general(
            o_i32.astype(jnp.float32) * ps, e_hi, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * corr + o_v
        m_ref[...] = m_new


def _attn_tblock_split(t, s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
                       qq_ref, qs_ref, m_ref, lsum_ref, acc_ref, *, sm_scale):
    """One T block of UNPACKED int8 flash attention (d_head = 128
    families — lanes already full; _kernel_stacked_int8dots_tblk body)."""
    valid_last = s_ref[1]

    @pl.when(t == 0)
    def _init():
        q = q_ref[...].astype(jnp.float32)
        qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-8)
        qq_ref[...] = jnp.round(q / qs).astype(jnp.int8)
        qs_ref[...] = qs
        m_ref[...] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        lsum_ref[...] = jnp.zeros(lsum_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(t <= valid_last)
    def _block():
        k = k_ref[0]
        v = v_ref[0]
        ks = ks_ref[0]
        vs = vs_ref[0]
        bias = bias_ref[...]
        s = jax.lax.dot_general(
            qq_ref[...], k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (qs_ref[...] * sm_scale)
        s = s * ks[:, None, :].astype(jnp.float32) + bias[:, None, :]
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        lsum_ref[...] = lsum_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs[:, None, :].astype(jnp.float32)
        pa = jnp.max(p, axis=-1, keepdims=True)
        ps = jnp.maximum(pa / 127.0, 1e-20)
        p_i8 = jnp.round(p / ps).astype(jnp.int8)
        o_i32 = jax.lax.dot_general(
            p_i8, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        acc_ref[...] = acc_ref[...] * corr + o_i32.astype(jnp.float32) * ps
        m_ref[...] = m_new


def _finish_attn_and_oproj(s_ref, q_ref, kn_ref, vn_ref, x_ref,
                           wo_ref, wos_ref, mw_ref,
                           m_ref, lsum_ref, acc_ref, x2_ref, hq_ref, hs_ref,
                           *, sm_scale, eps, b, kv, g, d):
    """Final attention step: merge the current token's column, then the
    per-head-chunk o-proj + residual + mlp-norm (the tail prologue)."""
    del s_ref
    q = q_ref[...].astype(jnp.float32)                 # [BC, g, d]
    k_new = kn_ref[...].astype(jnp.float32)            # [BC, d]
    v_new = vn_ref[...].astype(jnp.float32)
    s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * sm_scale
    m_prev = m_ref[...]
    m_fin = jnp.maximum(m_prev, s_new)
    corr = jnp.exp(m_prev - m_fin)
    p_new = jnp.exp(s_new - m_fin)
    l_fin = lsum_ref[...] * corr + p_new
    o = (acc_ref[...] * corr + p_new * v_new[:, None, :]) / jnp.maximum(
        l_fin, 1e-30
    )                                                  # [BC, g, d]
    # per-head-chunk o-proj: heads stay on sublanes; each chunk is a
    # [b, d] slice of the VALUE (leading-dim index — no transpose) and
    # a statically 8-aligned sublane slice of the resident Wo block
    o4 = o.reshape(b, kv, g, d)
    y = jnp.zeros(x2_ref.shape, jnp.float32)
    for h in range(kv):
        for j in range(g):
            xh = o4[:, h, j, :]                        # [b, d]
            xh_i8, xs_ = _quantize_rows(xh)
            off = (h * g + j) * d
            part = jax.lax.dot_general(
                xh_i8, wo_ref[0, off:off + d, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * xs_
            y = y + part
    y = y * wos_ref[0]
    x2 = x_ref[...].astype(jnp.float32) + y
    x2_ref[...] = x2
    h2 = _rms_rows(x2, mw_ref[0, 0].astype(jnp.float32), eps)
    h_i8, hs = _quantize_rows(h2)
    hq_ref[...] = h_i8
    hs_ref[...] = hs


def _mlp_and_qkv_phase(t, wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                       nw_ref, wq_ref, sq_ref, o_ref, qkv_ref,
                       x2_ref, hq_ref, hs_ref, acc_ref, xq_ref, xs_ref,
                       *, n_tblk, n_tiles, eps):
    """decode_dense._tail_qkv_kernel's ff + qkv phases at offset n_tblk."""
    j = t - n_tblk

    @pl.when((j >= 0) & (j < n_tiles))
    def _tail_phase():
        x_i8 = hq_ref[...]
        xs = hs_ref[...]
        gte = jax.lax.dot_general(
            x_i8, wg_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs * sg_ref[0]
        u = jax.lax.dot_general(
            x_i8, wu_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xs * su_ref[0]
        h = jax.nn.silu(gte) * u
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


def _layer_kernel_packed(s_ref, q_ref, kv_ref, ks_ref, vs_ref, bias_ref,
                         kn_ref, vn_ref, x_ref, wo_ref, wos_ref, mw_ref,
                         wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                         nw_ref, wq_ref, sq_ref,
                         o_ref, qkv_ref,
                         qq_ref, qs_ref, m_ref, lsum_ref, acc_ref,
                         x2_ref, hq_ref, hs_ref, accd_ref, xq_ref, xs_ref,
                         *, sm_scale, eps, n_tblk, n_tiles, b, kv, g, d):
    t = pl.program_id(0)

    @pl.when(t < n_tblk)
    def _attn():
        _attn_tblock_packed(t, s_ref, q_ref, kv_ref, ks_ref, vs_ref, bias_ref,
                            qq_ref, qs_ref, m_ref, lsum_ref, acc_ref,
                            sm_scale=sm_scale)

    @pl.when(t == n_tblk - 1)
    def _oproj():
        _finish_attn_and_oproj(
            s_ref, q_ref, kn_ref, vn_ref, x_ref, wo_ref, wos_ref, mw_ref,
            m_ref, lsum_ref, acc_ref, x2_ref, hq_ref, hs_ref,
            sm_scale=sm_scale, eps=eps, b=b, kv=kv, g=g, d=d,
        )

    _mlp_and_qkv_phase(t, wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                       nw_ref, wq_ref, sq_ref, o_ref, qkv_ref,
                       x2_ref, hq_ref, hs_ref, accd_ref, xq_ref, xs_ref,
                       n_tblk=n_tblk, n_tiles=n_tiles, eps=eps)


def _layer_kernel_split(s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
                        kn_ref, vn_ref, x_ref, wo_ref, wos_ref, mw_ref,
                        wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                        nw_ref, wq_ref, sq_ref,
                        o_ref, qkv_ref,
                        qq_ref, qs_ref, m_ref, lsum_ref, acc_ref,
                        x2_ref, hq_ref, hs_ref, accd_ref, xq_ref, xs_ref,
                        *, sm_scale, eps, n_tblk, n_tiles, b, kv, g, d):
    t = pl.program_id(0)

    @pl.when(t < n_tblk)
    def _attn():
        _attn_tblock_split(t, s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                           bias_ref, qq_ref, qs_ref, m_ref, lsum_ref, acc_ref,
                           sm_scale=sm_scale)

    @pl.when(t == n_tblk - 1)
    def _oproj():
        _finish_attn_and_oproj(
            s_ref, q_ref, kn_ref, vn_ref, x_ref, wo_ref, wos_ref, mw_ref,
            m_ref, lsum_ref, acc_ref, x2_ref, hq_ref, hs_ref,
            sm_scale=sm_scale, eps=eps, b=b, kv=kv, g=g, d=d,
        )

    _mlp_and_qkv_phase(t, wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
                       nw_ref, wq_ref, sq_ref, o_ref, qkv_ref,
                       x2_ref, hq_ref, hs_ref, accd_ref, xq_ref, xs_ref,
                       n_tblk=n_tblk, n_tiles=n_tiles, eps=eps)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "eps", "packed", "interpret"),
)
def layer_swiglu_qkv_int8_stacked(
    q: jax.Array,              # [b, kv, g, d] f32 (post-RoPE)
    x: jax.Array,              # [b, d_model] residual INTO the block
    k_all: jax.Array,          # [L, b, kv, T, d] int8; [.., T, 2d] packed
    v_all: jax.Array | None,   # None when packed
    k_scale: jax.Array,        # [L, b, kv, T]
    v_scale: jax.Array,
    bias2d: jax.Array,         # [b, T] f32
    k_new: jax.Array,          # [b, kv, d] f32 — current token's k
    v_new: jax.Array,
    layer: jax.Array,
    valid_len: jax.Array,
    wo_all: jax.Array,         # [L, h·d, d_model] int8
    wos_all: jax.Array,        # [L, 1, d_model]
    mw_all: jax.Array,         # [L, d_model]
    wgu_all: jax.Array,        # [L, d_model, 2*d_ff] int8
    sgu_all: jax.Array,        # [L, 1, 2*d_ff]
    wd_all: jax.Array,         # [L, d_ff, d_model] int8
    sd_all: jax.Array,         # [L, 1, d_model]
    nw_all: jax.Array,         # [L, d_model] (next layer's attn norm)
    wq_all: jax.Array,         # [L, d_model, d_qkv] int8
    sq_all: jax.Array,         # [L, 1, d_qkv]
    *,
    sm_scale: float,
    eps: float,
    packed: bool,
    interpret: bool | None = None,
):
    """The whole decode layer in one pallas launch — see module doc.
    Returns (x_out [b, d_model] f32, qkv_next [b, d_qkv] f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, kv, g, d = q.shape
    L, _, _, T, d_store = k_all.shape
    if T % 128:
        raise ValueError(f"cache length {T} must be a multiple of 128")
    d_model = x.shape[1]
    d_ff = wd_all.shape[1]
    d_qkv = wq_all.shape[2]
    BC = b * kv
    n_tblk = T // 128
    tile = _pick_tile(d_ff, 6 * 1024 * 1024, 2 * d_model)
    qtile = _pick_tile(d_qkv, 6 * 1024 * 1024, d_model)
    if tile == 0 or qtile == 0:
        raise ValueError(f"d_ff={d_ff}/d_qkv={d_qkv} has no 128-multiple tile")
    n_tiles = d_ff // tile
    n_qtiles = d_qkv // qtile
    grid = n_tblk + n_tiles + n_qtiles

    valid_last = jnp.clip(
        (jnp.asarray(valid_len, jnp.int32) + 127) // 128 - 1, 0, n_tblk - 1
    )
    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32), valid_last]
    ).astype(jnp.int32)

    kv_m = k_all.reshape(L, BC, T, d_store)
    ks_m = k_scale.reshape(L, BC, T)
    vs_m = v_scale.reshape(L, BC, T)
    bias_m = jnp.broadcast_to(bias2d[:, None, :], (b, kv, T)).reshape(BC, T)
    q_m = q.reshape(BC, g, d)
    kn_m = k_new.reshape(BC, d)
    vn_m = v_new.reshape(BC, d)

    def _tclamp(t, s):
        return jnp.minimum(t, s[1])

    def _ff(t, s):
        del s
        return jnp.clip(t - n_tblk, 0, n_tiles - 1)

    def _qk(t, s):
        del s
        return jnp.maximum(t - n_tblk - n_tiles, 0)

    def _nxt(s):
        return jnp.minimum(s[0] + 1, L - 1)

    attn_specs = [
        pl.BlockSpec((BC, g, d), lambda t, s: (0, 0, 0)),                 # q
    ]
    if packed:
        attn_specs += [
            pl.BlockSpec((1, BC, 128, d_store),
                         lambda t, s: (s[0], 0, _tclamp(t, s), 0)),       # kv
        ]
        args_cache = (kv_m,)
    else:
        cache_spec = pl.BlockSpec(
            (1, BC, 128, d_store), lambda t, s: (s[0], 0, _tclamp(t, s), 0)
        )
        attn_specs += [cache_spec, cache_spec]                            # k, v
        args_cache = (kv_m, v_all.reshape(L, BC, T, d_store))
    attn_specs += [
        pl.BlockSpec((1, BC, 128), lambda t, s: (s[0], 0, _tclamp(t, s))),  # ks
        pl.BlockSpec((1, BC, 128), lambda t, s: (s[0], 0, _tclamp(t, s))),  # vs
        pl.BlockSpec((BC, 128), lambda t, s: (0, _tclamp(t, s))),           # bias
        pl.BlockSpec((BC, d), lambda t, s: (0, 0)),                          # kn
        pl.BlockSpec((BC, d), lambda t, s: (0, 0)),                          # vn
    ]
    tail_specs = [
        pl.BlockSpec((b, d_model), lambda t, s: (0, 0)),                     # x
        pl.BlockSpec((1, kv * g * d, d_model), lambda t, s: (s[0], 0, 0)),   # wo
        pl.BlockSpec((1, 1, d_model), lambda t, s: (s[0], 0, 0)),            # wos
        pl.BlockSpec((1, 1, d_model), lambda t, s: (s[0], 0, 0)),            # mw
        pl.BlockSpec((1, d_model, tile), lambda t, s: (s[0], 0, _ff(t, s))),  # wg
        pl.BlockSpec((1, d_model, tile),
                     lambda t, s: (s[0], 0, n_tiles + _ff(t, s))),            # wu
        pl.BlockSpec((1, 1, tile), lambda t, s: (s[0], 0, _ff(t, s))),        # sg
        pl.BlockSpec((1, 1, tile),
                     lambda t, s: (s[0], 0, n_tiles + _ff(t, s))),            # su
        pl.BlockSpec((1, tile, d_model), lambda t, s: (s[0], _ff(t, s), 0)),  # wd
        pl.BlockSpec((1, 1, d_model), lambda t, s: (s[0], 0, 0)),             # sd
        pl.BlockSpec((1, 1, d_model), lambda t, s: (_nxt(s), 0, 0)),          # nw
        pl.BlockSpec((1, d_model, qtile), lambda t, s: (_nxt(s), 0, _qk(t, s))),  # wq
        pl.BlockSpec((1, 1, qtile), lambda t, s: (_nxt(s), 0, _qk(t, s))),    # sq
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=attn_specs + tail_specs,
        out_specs=[
            pl.BlockSpec((b, d_model), lambda t, s: (0, 0)),
            pl.BlockSpec((b, qtile), lambda t, s: (0, _qk(t, s))),
        ],
        scratch_shapes=[
            pltpu.VMEM((BC, g, 2 * d if packed else d), jnp.int8),  # qq
            pltpu.VMEM((BC, g, 1), jnp.float32),                    # qs
            pltpu.VMEM((BC, g, 1), jnp.float32),                    # m
            pltpu.VMEM((BC, g, 1), jnp.float32),                    # lsum
            pltpu.VMEM((BC, g, d), jnp.float32),                    # acc
            pltpu.VMEM((b, d_model), jnp.float32),                  # x2
            pltpu.VMEM((b, d_model), jnp.int8),                     # h2 int8
            pltpu.VMEM((b, 1), jnp.float32),                        # h2 scales
            pltpu.VMEM((b, d_model), jnp.float32),                  # down acc
            pltpu.VMEM((b, d_model), jnp.int8),                     # x_out int8
            pltpu.VMEM((b, 1), jnp.float32),                        # its scales
        ],
    )
    kernel = functools.partial(
        _layer_kernel_packed if packed else _layer_kernel_split,
        sm_scale=sm_scale, eps=eps, n_tblk=n_tblk, n_tiles=n_tiles,
        b=b, kv=kv, g=g, d=d,
    )
    out = pl.pallas_call(
        kernel,
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
        scalars, q_m, *args_cache, ks_m, vs_m, bias_m, kn_m, vn_m,
        x, wo_all, wos_all, mw_all[:, None, :],
        wgu_all, wgu_all, sgu_all, sgu_all, wd_all, sd_all,
        nw_all[:, None, :], wq_all, sq_all,
    )
    return out[0], out[1]


__all__ = ["layer_swiglu_qkv_int8_stacked"]
