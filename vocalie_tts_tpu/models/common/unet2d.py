"""LDM-style 2D UNet (functional JAX, NHWC) for latent diffusion.

The reference's AudioSR engine loads the published latent-diffusion
model (`build_model("basic")`, ref: backend/workers/audiosr_runner.py:
93-97), whose denoiser is the CompVis/guided-diffusion ``UNetModel``:
ResBlocks with FiLM time embedding, self-attention at configured
resolutions, skip connections between the down and up paths. This
module implements that computation graph with a param tree whose
structure mirrors the torch module tree 1:1, so published checkpoints
map mechanically (see convert/ldm.py).

TPU notes: NHWC keeps channels on the lane dimension (convs hit the
MXU); attention flattens H×W into the sequence axis; everything is
static-shape and jit-friendly. GroupNorm runs in f32.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.ops.groupnorm import group_norm_fused
from vocalie_tts_tpu.utils.env import bool_env

Params = Dict[str, Any]

_DN2D = ("NHWC", "HWIO", "NHWC")


def conv2d_init(key, kernel: int, c_in: int, c_out: int, *, zero: bool = False,
                dtype=jnp.float32) -> Params:
    if zero:
        w = jnp.zeros((kernel, kernel, c_in, c_out), dtype)
    else:
        scale = 1.0 / math.sqrt(kernel * kernel * c_in)
        w = jax.random.uniform(
            key, (kernel, kernel, c_in, c_out), jnp.float32, -scale, scale
        ).astype(dtype)
    return {"w": w, "b": jnp.zeros((c_out,), dtype)}


def conv2d(params: Params, x: jax.Array, *, stride: int = 1,
           padding="SAME") -> jax.Array:
    if "w_q" in params:
        return _conv2d_int8(params, x, stride=stride, padding=padding)
    out = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DN2D,
    )
    return out + params["b"].astype(x.dtype)


def conv_quantize_int8(params: Params) -> Params:
    """Pre-quantize a conv2d param dict to symmetric per-output-channel
    int8 (``w_q`` [k,k,ci,co] + ``w_s`` [co] f32 dequant scales).

    v5e MXU int8 throughput is ~2× bf16 and the AudioSR DDIM loop is
    conv-bound at the bf16 peak (see models/audiosr/runtime.py), so
    int8 convs are the remaining studio-pass lever. Symmetric scales
    keep SAME zero-padding exact (0 ↦ 0)."""
    w = params["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.round(w / s).astype(jnp.int8)
    return {"w_q": wq, "w_s": s, "b": params["b"]}


def _conv2d_int8(params: Params, x: jax.Array, *, stride: int = 1,
                 padding="SAME") -> jax.Array:
    """s8×s8→s32 conv with dynamic per-sample activation quantization.

    The activation side is quantized in-graph (amax over each sample's
    spatial×channel extent — diffusion activations vary per window and
    per timestep, so static scales would clip): the rounding pass fuses
    into the preceding norm/SiLU elementwise chain; the amax reduce is
    the only extra pass over HBM, and the conv FLOPs dominate at the
    UNet's channel widths (FLOPs/byte doubles per level)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(range(1, x.ndim)),
                 keepdims=True)
    sx = jnp.maximum(ax, 1e-12) / 127.0                     # [b,1,1,1] f32
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    out = jax.lax.conv_general_dilated(
        xq, params["w_q"], (stride, stride), padding,
        dimension_numbers=_DN2D, preferred_element_type=jnp.int32,
    )
    scale = sx * params["w_s"]                              # [b,1,1,co]
    out = out.astype(jnp.float32) * scale + params["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def dense_init(key, d_in: int, d_out: int, *, zero: bool = False,
               dtype=jnp.float32) -> Params:
    if zero:
        w = jnp.zeros((d_in, d_out), dtype)
    else:
        scale = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale).astype(dtype)
    return {"w": w, "b": jnp.zeros((d_out,), dtype)}


def dense(params: Params, x: jax.Array) -> jax.Array:
    return jnp.dot(x, params["w"].astype(x.dtype)) + params["b"].astype(x.dtype)


def n_groups(c: int, want: int = 32) -> int:
    """Largest divisor of ``c`` that is ≤ ``want`` (published models use
    32-channel groups; small test scales need a divisible fallback)."""
    g = min(want, c)
    while c % g:
        g -= 1
    return g


def group_norm(x: jax.Array, g: jax.Array, b: jax.Array, *, groups: int = 32,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over channels-last x (any spatial rank).

    Statistics always accumulate in f32. For f32 inputs every op runs
    f32 (bit-exact vs the torch replicas). For bf16 inputs the
    normalize/affine APPLY stays bf16 — the reductions dominate the
    accuracy and the elementwise passes dominate the HBM traffic of
    this op inside the batched DDIM loop (~40 norms/UNet step)."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    groups = n_groups(c, groups)
    spatial = x.shape[1:-1]
    if orig_dtype == jnp.float32:
        xg = x.reshape(x.shape[0], -1, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + eps)
        xf = xg.reshape((x.shape[0], *spatial, c))
        return xf * g + b
    # bf16 fast path: per-channel moments reduced in the NATIVE
    # [b, *spatial, C] layout (lanes = C stay dense — the grouped 4D
    # reshape leaves only c/groups lanes and its reductions ran ~100×
    # over the HBM floor), then group-aggregated on the tiny [b, C].
    bdim = x.shape[0]
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_per_group = (c // groups) * int(np.prod(spatial)) if spatial else (c // groups)
    sum_c = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)          # [b, C]
    sq_c = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial_axes)
    sum_g = sum_c.reshape(bdim, groups, c // groups).sum(-1)
    sq_g = sq_c.reshape(bdim, groups, c // groups).sum(-1)
    mean_g = sum_g / n_per_group
    var_g = jnp.maximum(sq_g / n_per_group - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels, one fused bf16 apply pass
    mean_c = jnp.repeat(mean_g, c // groups, axis=1).astype(orig_dtype)
    inv_c = jnp.repeat(inv_g, c // groups, axis=1).astype(orig_dtype)
    bc = (1,) * len(spatial)
    mean_c = mean_c.reshape(bdim, *bc, c)
    inv_c = inv_c.reshape(bdim, *bc, c)
    return ((x - mean_c) * inv_c * g.astype(orig_dtype)
            + b.astype(orig_dtype)).astype(orig_dtype)


def norm_init(c: int) -> Params:
    return {"g": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def _norm_act(x: jax.Array, p: Params, *, silu: bool = False,
              pre_add: jax.Array | None = None, groups: int = 32,
              eps: float = 1e-5) -> jax.Array:
    """GroupNorm with optional pre-norm FiLM add and post-norm SiLU.

    Measured finding (round-3 AudioSR profile, kept so nobody re-walks
    this path): XLA's split moment/apply norm passes run ~10× over the
    HBM floor here, BUT swapping in the one-pass Pallas kernel
    (ops/groupnorm) made the DDIM loop net-SLOWER (479→627 ms per
    32-window dispatch) — the custom-call's standard-layout operand
    constraint forces relayout copies at every norm boundary because
    the surrounding convs live in conv-tiled layouts ({3,0,2,1}), and
    the skip concats stop fusing. The XLA path stays the default;
    VOCALIE_GN_PALLAS=1 re-enables the kernel for experiments (e.g. a
    future XLA version with relayout-free custom-call boundaries)."""
    c = x.shape[-1]
    g = n_groups(c, groups)
    if x.dtype != jnp.float32 and bool_env("VOCALIE_GN_PALLAS"):
        row = pre_add.astype(x.dtype) if pre_add is not None else None
        return group_norm_fused(
            x, p["g"], p["b"], groups=g, eps=eps, silu=silu, pre_add=row
        )
    if pre_add is not None:
        x = x + pre_add.reshape(
            pre_add.shape[0], *(1,) * (x.ndim - 2), c
        ).astype(x.dtype)
    y = group_norm(x, p["g"], p["b"], groups=g, eps=eps)
    return jax.nn.silu(y) if silu else y


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal step embedding, cos-first (the LDM util convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ── UNet blocks (torch-tree-mirroring param layout) ─────────────────────


def _resblock_init(key, c_in: int, c_out: int, emb_dim: int,
                   scale_shift: bool) -> Params:
    k = jax.random.split(key, 4)
    p: Params = {
        "in_norm": norm_init(c_in),
        "in_conv": conv2d_init(k[0], 3, c_in, c_out),
        "emb": dense_init(k[1], emb_dim, 2 * c_out if scale_shift else c_out),
        "out_norm": norm_init(c_out),
        # zero-init final conv → identity residual at init (LDM convention)
        "out_conv": conv2d_init(k[2], 3, c_out, c_out, zero=True),
    }
    if c_in != c_out:
        p["skip"] = conv2d_init(k[3], 1, c_in, c_out)
    return p


def _resblock(p: Params, x: jax.Array, emb: jax.Array, scale_shift: bool) -> jax.Array:
    h = _norm_act(x, p["in_norm"], silu=True)
    h = conv2d(p["in_conv"], h)
    e_row = dense(p["emb"], jax.nn.silu(emb))          # [b, c_out(·2)]
    if scale_shift:
        e = e_row[:, None, None, :]
        scale, shift = jnp.split(e, 2, axis=-1)
        h = group_norm(h, p["out_norm"]["g"], p["out_norm"]["b"]) * (1 + scale) + shift
        h = conv2d(p["out_conv"], jax.nn.silu(h))
    else:
        # h+e → norm → silu in one fused pass on the serving path
        h = _norm_act(h, p["out_norm"], silu=True, pre_add=e_row)
        h = conv2d(p["out_conv"], h)
    skip = conv2d(p["skip"], x) if "skip" in p else x
    return skip + h


def _attnblock_init(key, c: int) -> Params:
    k = jax.random.split(key, 2)
    return {
        "norm": norm_init(c),
        "qkv": conv2d_init(k[0], 1, c, 3 * c),
        # zero-init projection (LDM convention)
        "proj": conv2d_init(k[1], 1, c, c, zero=True),
    }


def _attnblock(p: Params, x: jax.Array, n_heads: int) -> jax.Array:
    b, hh, ww, c = x.shape
    h = _norm_act(x, p["norm"])
    d = c // n_heads
    # legacy QKVAttention channel layout: heads-major (h, {q,k,v}, d) —
    # the ordering published checkpoints use (use_new_attention_order
    # defaults off in the LDM UNetModel). Permute the WEIGHT columns to
    # grouped [q_all | k_all | v_all] instead of reshaping the
    # activation to [.., heads, 3, d]: the weight gather is
    # loop-invariant (hoisted out of the DDIM while), while the 5-D
    # activation reshape measured ~58 ms/dispatch in relayout+copy
    # (profile round 3); the grouped slices below are lane-aligned and
    # the [b,t,c]→[b,t,heads,d] splits are free trailing-dim reshapes.
    perm = np.arange(3 * c).reshape(n_heads, 3, d)
    perm = np.concatenate([perm[:, j, :].reshape(-1) for j in range(3)])
    if "w_q" in p["qkv"]:
        # per-output-channel scales permute with their columns
        qkv_p: Params = {
            "w_q": p["qkv"]["w_q"][..., perm],
            "w_s": p["qkv"]["w_s"][perm],
            "b": p["qkv"]["b"][perm],
        }
    else:
        qkv_p = {"w": p["qkv"]["w"][..., perm], "b": p["qkv"]["b"][perm]}
    qkv = conv2d(qkv_p, h).reshape(b, hh * ww, 3 * c)
    q = qkv[:, :, :c].reshape(b, hh * ww, n_heads, d)
    k = qkv[:, :, c:2 * c].reshape(b, hh * ww, n_heads, d)
    v = qkv[:, :, 2 * c:].reshape(b, hh * ww, n_heads, d)
    # legacy QKVAttention scaling: 1/sqrt(sqrt(d)) applied to q AND k
    scale = 1.0 / math.sqrt(math.sqrt(c // n_heads))
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k * scale,
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    a = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, hh, ww, c)
    return x + conv2d(p["proj"], a)


def _upsample(p: Params, x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return conv2d(p, x)


# ── full UNet ───────────────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 32          # z + lowres-cond concat
    model_channels: int = 128
    out_channels: int = 16
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2)   # in downsample factors
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 8
    use_scale_shift_norm: bool = False
    dtype: Any = jnp.float32


def _plan(cfg: UNet2DConfig) -> Tuple[List[List[str]], List[List[str]], List[Tuple[int, int]]]:
    """Module sequence per input/output block (mirrors the torch
    ModuleList construction, so param indices line up with checkpoints).

    Returns (input_plan, output_plan, input_channels) where each plan
    entry is the list of sub-module kinds inside that block and
    input_channels tracks (c_in, c_out) per input block for skips.
    """
    input_plan: List[List[str]] = [["conv"]]
    chans = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            mods = ["res"]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                mods.append("attn")
            input_plan.append(mods)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_plan.append(["down"])
            chans.append(ch)
            ds *= 2

    output_plan: List[List[str]] = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            mods = ["res"]
            ch = cfg.model_channels * mult
            if ds in cfg.attention_resolutions:
                mods.append("attn")
            if level and i == cfg.num_res_blocks:
                mods.append("up")
                ds //= 2
            output_plan.append(mods)
    return input_plan, output_plan, chans


def init_unet2d(key: jax.Array, cfg: UNet2DConfig) -> Params:
    input_plan, output_plan, chans = _plan(cfg)
    emb_dim = 4 * cfg.model_channels
    keys = iter(jax.random.split(key, 8 + 4 * (len(input_plan) + len(output_plan))))
    ss = cfg.use_scale_shift_norm

    params: Params = {
        "time_embed": {
            "l0": dense_init(next(keys), cfg.model_channels, emb_dim),
            "l2": dense_init(next(keys), emb_dim, emb_dim),
        },
        "input_blocks": [],
        "middle_block": {},
        "output_blocks": [],
        "out_norm": norm_init(0),  # placeholder, set below
    }

    ch = cfg.model_channels
    for bi, mods in enumerate(input_plan):
        block: Params = {}
        for kind in mods:
            if kind == "conv":
                block["conv"] = conv2d_init(next(keys), 3, cfg.in_channels, cfg.model_channels)
                ch = cfg.model_channels
            elif kind == "res":
                c_out = chans[bi]
                block["res"] = _resblock_init(next(keys), ch, c_out, emb_dim, ss)
                ch = c_out
            elif kind == "attn":
                block["attn"] = _attnblock_init(next(keys), ch)
            elif kind == "down":
                block["down"] = conv2d_init(next(keys), 3, ch, ch)
        params["input_blocks"].append(block)

    params["middle_block"] = {
        "res1": _resblock_init(next(keys), ch, ch, emb_dim, ss),
        "attn": _attnblock_init(next(keys), ch),
        "res2": _resblock_init(next(keys), ch, ch, emb_dim, ss),
    }

    skip_chans = list(chans)
    ds = 2 ** (len(cfg.channel_mult) - 1)
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            block = {}
            ich = skip_chans.pop()
            c_out = cfg.model_channels * mult
            block["res"] = _resblock_init(next(keys), ch + ich, c_out, emb_dim, ss)
            ch = c_out
            if ds in cfg.attention_resolutions:
                block["attn"] = _attnblock_init(next(keys), ch)
            if level and i == cfg.num_res_blocks:
                block["up"] = conv2d_init(next(keys), 3, ch, ch)
                ds //= 2
            params["output_blocks"].append(block)

    params["out_norm"] = norm_init(ch)
    params["out_conv"] = conv2d_init(next(keys), 3, ch, cfg.out_channels, zero=True)
    return params


def quantize_unet_convs(params: Params) -> Params:
    """Return a copy of a UNet param tree with every interior conv
    pre-quantized to int8 (see ``conv_quantize_int8``).

    The FINAL ``out_conv`` stays full precision: it produces the eps
    estimate directly (16 channels — negligible FLOPs) and its error
    feeds the DDIM update un-renormalized. Dense layers (time/FiLM
    embeddings, 2-D ``w``) are tiny and stay as-is."""

    def walk(node, *, skip_final: bool = False):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                return conv_quantize_int8(node)
            return {
                k: (v if (skip_final and k == "out_conv")
                    else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params, skip_final=True)


def apply_unet2d(
    params: Params, cfg: UNet2DConfig, x: jax.Array, t: jax.Array
) -> jax.Array:
    """x: [b, H, W, in_channels]; t: [b] diffusion steps → eps [b,H,W,out]."""
    ss = cfg.use_scale_shift_norm
    emb = dense(params["time_embed"]["l0"], timestep_embedding(t, cfg.model_channels))
    emb = dense(params["time_embed"]["l2"], jax.nn.silu(emb))
    # match the activation dtype: the f32 sinusoidal embedding must not
    # promote every ResBlock's `h + e` (and thus the whole UNet) to f32
    # when the caller feeds bf16 activations
    emb = emb.astype(x.dtype)

    hs = []
    h = x
    for block in params["input_blocks"]:
        if "conv" in block:
            h = conv2d(block["conv"], h)
        if "res" in block:
            h = _resblock(block["res"], h, emb, ss)
        if "attn" in block:
            h = _attnblock(block["attn"], h, cfg.num_heads)
        if "down" in block:
            # explicit (1,1) padding: XLA's SAME pads (0,1) at stride 2,
            # which is shifted one pixel vs the published conv padding
            h = conv2d(block["down"], h, stride=2, padding=((1, 1), (1, 1)))
        hs.append(h)

    mid = params["middle_block"]
    h = _resblock(mid["res1"], h, emb, ss)
    h = _attnblock(mid["attn"], h, cfg.num_heads)
    h = _resblock(mid["res2"], h, emb, ss)

    for block in params["output_blocks"]:
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _resblock(block["res"], h, emb, ss)
        if "attn" in block:
            h = _attnblock(block["attn"], h, cfg.num_heads)
        if "up" in block:
            h = _upsample(block["up"], h)

    h = _norm_act(h, params["out_norm"], silu=True)
    return conv2d(params["out_conv"], h)


__all__ = [
    "UNet2DConfig",
    "init_unet2d",
    "apply_unet2d",
    "conv2d",
    "conv2d_init",
    "conv_quantize_int8",
    "quantize_unet_convs",
    "dense",
    "dense_init",
    "group_norm",
    "norm_init",
    "timestep_embedding",
]
