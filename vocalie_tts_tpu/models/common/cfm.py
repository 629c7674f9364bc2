"""Conditional flow-matching mel decoder (Matcha/CosyVoice family).

The reference's CosyVoice engine (ref: tts_backends/cosyvoice_runner.py:
67-125) and Chatterbox's S3Gen token→wav stage (ref:
tts_backends/chatterbox_impl.py:63-73) both decode speech tokens to mel
with the published conditional flow-matching decoder: a 1-D U-Net
"estimator" (ResnetBlock1D + diffusers-style BasicTransformerBlock
stacks, FiLM-free additive time embedding) driven by an Euler ODE from
noise, with classifier-free guidance and a cosine time schedule.

This module implements that computation graph functionally in JAX with
a param tree mirroring the torch module tree 1:1, so published
checkpoints (``flow.decoder.estimator.*``) map mechanically — see
convert/cfm.py. Two published variants are covered:

- ``causal=False``: Matcha-TTS shape — Block1D = Conv1d(3, SAME) +
  GroupNorm(8) + Mish; Downsample1D / Upsample1D between levels.
- ``causal=True``: CosyVoice2/3 shape — CausalConv1d (left pad) +
  LayerNorm + Mish; single-level (no resampling) in the published
  config, but resampling layers stay causal if configured.

TPU notes: activations are channels-last [b, t, c] (lane dim), convs
and attention hit the MXU, the ODE loop is a ``lax.fori_loop`` over a
precomputed t_span (static step count), and CFG runs cond/uncond as one
doubled batch per step — one estimator call, no wave of tiny kernels.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.unet2d import dense, dense_init

Params = Dict[str, Any]

_DN = ("NHC", "HIO", "NHC")


@dataclasses.dataclass(frozen=True)
class CFMDecoderConfig:
    in_channels: int = 320          # [x ‖ mu ‖ spk ‖ cond] · out_channels
    out_channels: int = 80
    channels: Tuple[int, ...] = (256,)
    attention_head_dim: int = 64
    n_blocks: int = 4               # transformer blocks per level
    num_mid_blocks: int = 12
    num_heads: int = 8
    causal: bool = True             # CosyVoice2/3 causal variant
    # inference-time CFM knobs (published defaults)
    n_timesteps: int = 10
    cfg_rate: float = 0.7
    t_scheduler: str = "cosine"
    sigma_min: float = 1e-6
    #: compute dtype for the U-Net body (norms/softmax stay f32). The
    #: full-scale engines run bf16 (MXU-native); parity tests pin f32.
    dtype: Any = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.channels[0] * 4


# ── primitives ──────────────────────────────────────────────────────────


def _conv1d_init(key, kernel: int, c_in: int, c_out: int) -> Params:
    scale = 1.0 / math.sqrt(kernel * c_in)
    w = jax.random.uniform(key, (kernel, c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def _conv1d(p: Params, x: jax.Array, *, stride: int = 1, causal: bool = False) -> jax.Array:
    k = p["w"].shape[0]
    if causal:
        pad = [(k - 1, 0)]
    elif stride == 1:
        pad = [((k - 1) // 2, k // 2)]
    else:  # torch Conv1d(k=3, stride=2, padding=1)
        pad = [(1, 1)]
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), pad, dimension_numbers=_DN
    )
    return out + p["b"].astype(x.dtype)


def _conv_transpose1d(p: Params, x: jax.Array, *, stride: int = 2) -> jax.Array:
    """torch ConvTranspose1d(k=4, s=2, p=1) ≡ lhs-dilated conv with the
    (converter-flipped) kernel and symmetric crop — see convnets.py."""
    k = p["w"].shape[0]
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
    )
    t_out = x.shape[1] * stride
    start = (out.shape[1] - t_out) // 2
    out = jax.lax.dynamic_slice_in_dim(out, start, t_out, axis=1)
    return out + p["b"].astype(x.dtype)


def _mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def _group_norm8(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """GroupNorm(8) over channels-last [b, t, c], f32 math."""
    c = x.shape[-1]
    groups = 8 if c % 8 == 0 else 1
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (groups, c // groups))
    mean = jnp.mean(xf, axis=(-3, -1), keepdims=True)
    var = jnp.var(xf, axis=(-3, -1), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(x.shape) * g + b).astype(x.dtype)


def _layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def sinusoidal_pos_emb(t: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """Matcha SinusoidalPosEmb: [b] → [b, dim], t pre-scaled by 1000."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = scale * t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


# ── blocks (param trees mirror the torch module tree) ───────────────────


def _block1d_init(key, c_in: int, c_out: int, causal: bool) -> Params:
    k1, _ = jax.random.split(key)
    p = {"conv": _conv1d_init(k1, 3, c_in, c_out)}
    # causal variant normalizes with LayerNorm, Matcha with GroupNorm(8)
    p["norm_g"] = jnp.ones((c_out,), jnp.float32)
    p["norm_b"] = jnp.zeros((c_out,), jnp.float32)
    del causal
    return p


def _block1d(p: Params, cfg: CFMDecoderConfig, x: jax.Array, mask: jax.Array) -> jax.Array:
    h = _conv1d(p["conv"], x * mask, causal=cfg.causal)
    if cfg.causal:
        h = _layer_norm(h, p["norm_g"], p["norm_b"])
    else:
        h = _group_norm8(h, p["norm_g"], p["norm_b"])
    return _mish(h) * mask


def _resnet1d_init(key, c_in: int, c_out: int, emb_dim: int, causal: bool) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "mlp": dense_init(k1, emb_dim, c_out),
        "block1": _block1d_init(k2, c_in, c_out, causal),
        "block2": _block1d_init(k3, c_out, c_out, causal),
        "res_conv": _conv1d_init(k4, 1, c_in, c_out),
    }


def _resnet1d(
    p: Params, cfg: CFMDecoderConfig, x: jax.Array, mask: jax.Array, temb: jax.Array
) -> jax.Array:
    h = _block1d(p["block1"], cfg, x, mask)
    h = h + dense(p["mlp"], _mish(temb))[:, None, :]
    h = _block1d(p["block2"], cfg, h, mask)
    return h + _conv1d(p["res_conv"], x * mask)


def _xf_block_init(key, dim: int, n_heads: int, d_head: int) -> Params:
    inner = n_heads * d_head
    keys = jax.random.split(key, 6)
    return {
        "norm1_g": jnp.ones((dim,), jnp.float32),
        "norm1_b": jnp.zeros((dim,), jnp.float32),
        "to_q": dense_init(keys[0], dim, inner)["w"],
        "to_k": dense_init(keys[1], dim, inner)["w"],
        "to_v": dense_init(keys[2], dim, inner)["w"],
        "to_out": dense_init(keys[3], inner, dim),
        "norm3_g": jnp.ones((dim,), jnp.float32),
        "norm3_b": jnp.zeros((dim,), jnp.float32),
        "ff_in": dense_init(keys[4], dim, dim * 4),
        "ff_out": dense_init(keys[5], dim * 4, dim),
    }


def _xf_block(
    p: Params, cfg: CFMDecoderConfig, x: jax.Array, attn_bias: Optional[jax.Array],
    kv_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """diffusers BasicTransformerBlock (self-attn only, gelu FF).

    ``kv_lens`` is accepted for interface symmetry (the flash path was
    tried and measured slower at CFM shapes — see below)."""
    b, t, _ = x.shape
    nh, hd = cfg.num_heads, cfg.attention_head_dim
    h = _layer_norm(x, p["norm1_g"], p["norm1_b"])
    sm = 1.0 / math.sqrt(hd)
    # The naive path materializes [b, h, T, T] f32 scores — ~216 MB of
    # HBM traffic per block at full scale, the dominant CFM cost. The
    # flash kernel wins ONLY with whole-row tiles (block_q = block_k =
    # T padded): default 128×128 tiles fragment (b·h × nq × nk) into
    # thousands of tiny programs and measured 2× SLOWER end to end.
    # With one k-tile per program the scores live entirely in VMEM.
    # q/k/v come from reshaped-weight einsums so the dot WRITES the
    # [b, h, t, d] layout the kernel wants (a separate transpose was
    # ~17 ms/ODE-step of pure copies).
    if kv_lens is not None and t >= 256 and os.environ.get(
            "VOCALIE_CFM_FLASH", "1") == "1":
        from vocalie_tts_tpu.ops.flash_attention import flash_attention

        wq = p["to_q"].reshape(-1, nh, hd).astype(h.dtype)
        wk = p["to_k"].reshape(-1, nh, hd).astype(h.dtype)
        wv = p["to_v"].reshape(-1, nh, hd).astype(h.dtype)
        q = jnp.einsum("btc,chd->bhtd", h, wq)
        k = jnp.einsum("btc,chd->bhtd", h, wk)
        v = jnp.einsum("btc,chd->bhtd", h, wv)
        t_pad = ((t + 127) // 128) * 128
        o4 = flash_attention(
            q, k, v, causal=False, sm_scale=sm, kv_lens=kv_lens,
            block_q=t_pad, block_k=t_pad,
        )                                          # [b, h, t, d]
        wo = p["to_out"]["w"].reshape(nh, hd, -1).astype(x.dtype)
        o = jnp.einsum("bhtd,hdc->btc", o4.astype(x.dtype), wo)
        o = o + p["to_out"]["b"].astype(o.dtype)
        x = x + o
    else:
        q = jnp.dot(h, p["to_q"].astype(h.dtype)).reshape(b, t, nh, -1)
        k = jnp.dot(h, p["to_k"].astype(h.dtype)).reshape(b, t, nh, -1)
        v = jnp.dot(h, p["to_v"].astype(h.dtype)).reshape(b, t, nh, -1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * sm
        if attn_bias is not None:
            logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, -1)
        x = x + dense(p["to_out"], o)
    h = _layer_norm(x, p["norm3_g"], p["norm3_b"])
    h = dense(p["ff_out"], jax.nn.gelu(dense(p["ff_in"], h), approximate=False))
    return x + h


# ── the estimator U-Net ─────────────────────────────────────────────────


def init_cfm_estimator(key: jax.Array, cfg: CFMDecoderConfig) -> Params:
    emb = cfg.time_embed_dim
    keys = iter(jax.random.split(key, 4096))

    def level(c_in, c_out):
        return {
            "resnet": _resnet1d_init(next(keys), c_in, c_out, emb, cfg.causal),
            "transformer": [
                _xf_block_init(next(keys), c_out, cfg.num_heads, cfg.attention_head_dim)
                for _ in range(cfg.n_blocks)
            ],
        }

    p: Params = {
        "time_mlp": {
            "linear_1": dense_init(next(keys), cfg.in_channels, emb),
            "linear_2": dense_init(next(keys), emb, emb),
        }
    }

    downs = []
    c_prev = cfg.in_channels
    for i, ch in enumerate(cfg.channels):
        blk = level(c_prev, ch)
        blk["downsample"] = _conv1d_init(next(keys), 3, ch, ch)
        downs.append(blk)
        c_prev = ch
    p["down_blocks"] = downs

    p["mid_blocks"] = [level(cfg.channels[-1], cfg.channels[-1]) for _ in range(cfg.num_mid_blocks)]

    ups = []
    rev = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
    for i in range(len(rev) - 1):
        blk = level(rev[i] * 2, rev[i + 1])
        if i == len(rev) - 2:  # last level: stride-1 conv, no upsampling
            blk["upsample"] = _conv1d_init(next(keys), 3, rev[i + 1], rev[i + 1])
        else:
            blk["upsample"] = _conv1d_init(next(keys), 4, rev[i + 1], rev[i + 1])
        ups.append(blk)
    p["up_blocks"] = ups

    p["final_block"] = _block1d_init(next(keys), rev[-1], rev[-1], cfg.causal)
    p["final_proj"] = _conv1d_init(next(keys), 1, rev[-1], cfg.out_channels)
    return p


def apply_cfm_estimator(
    p: Params,
    cfg: CFMDecoderConfig,
    x: jax.Array,        # [b, t, out_channels] current sample
    mask: jax.Array,     # [b, t, 1]
    mu: jax.Array,       # [b, t, out_channels] conditioning (encoder out)
    t: jax.Array,        # [b] ODE time in [0, 1]
    spks: Optional[jax.Array] = None,   # [b, out_channels]
    cond: Optional[jax.Array] = None,   # [b, t, out_channels]
) -> jax.Array:
    """Velocity v(x_t, t | mu, spk, cond) → [b, t, out_channels]."""
    temb = sinusoidal_pos_emb(t, cfg.in_channels).astype(cfg.dtype)
    temb = dense(p["time_mlp"]["linear_1"], temb)
    temb = dense(p["time_mlp"]["linear_2"], jax.nn.silu(temb))

    # cast the 0/1 mask to the compute dtype ONCE: every `x * mask` in
    # the blocks otherwise silently promotes the whole estimator to f32
    # (bf16 · f32 → f32), doubling HBM traffic and halving MXU rate —
    # found via the round-3 token2wav profile (q/k/v copies were f32).
    # 0/1 values are exact in bf16; the attention bias/length math below
    # stays f32/int32.
    mask = mask.astype(cfg.dtype)
    x = x.astype(cfg.dtype)
    feats = [x, mu.astype(cfg.dtype)]
    if spks is not None:
        feats.append(jnp.broadcast_to(spks[:, None, :], x.shape).astype(x.dtype))
    if cond is not None:
        feats.append(cond.astype(x.dtype))
    h = jnp.concatenate(feats, axis=-1)

    def attn_bias_from(m):
        # diffusers prepare_attention_mask: masked keys get -inf
        keep = m[:, None, None, :, 0] > 0
        return jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    def lens_from(m):
        # prefix-valid masks → per-row valid KV length for the flash path
        return jnp.sum(m[:, :, 0] > 0, axis=1).astype(jnp.int32)

    # resampling between levels is static config: every level but the
    # last downsamples (stride 2) / upsamples (transposed conv)
    n_levels = len(p["down_blocks"])
    hiddens = []
    masks = [mask]
    for i, blk in enumerate(p["down_blocks"]):
        m = masks[-1]
        h = _resnet1d(blk["resnet"], cfg, h, m, temb)
        bias = attn_bias_from(m)
        lens = lens_from(m)
        for xf in blk["transformer"]:
            h = _xf_block(xf, cfg, h, bias, lens)
        hiddens.append(h)
        if i < n_levels - 1:
            h = _conv1d(blk["downsample"], h * m, stride=2)
            masks.append(m[:, ::2, :])
        else:
            h = _conv1d(blk["downsample"], h * m, causal=cfg.causal)
            masks.append(m)
    masks = masks[:-1]

    m = masks[-1]
    bias = attn_bias_from(m)
    lens = lens_from(m)
    for blk in p["mid_blocks"]:
        h = _resnet1d(blk["resnet"], cfg, h, m, temb)
        for xf in blk["transformer"]:
            h = _xf_block(xf, cfg, h, bias, lens)

    for i, blk in enumerate(p["up_blocks"]):
        m = masks.pop()
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, : skip.shape[1], :], skip], axis=-1)
        h = _resnet1d(blk["resnet"], cfg, h, m, temb)
        bias = attn_bias_from(m)
        lens = lens_from(m)
        for xf in blk["transformer"]:
            h = _xf_block(xf, cfg, h, bias, lens)
        if i < len(p["up_blocks"]) - 1:
            h = _conv_transpose1d(blk["upsample"], h * m)
        else:
            h = _conv1d(blk["upsample"], h * m, causal=cfg.causal)

    h = _block1d(p["final_block"], cfg, h, m)
    return _conv1d(p["final_proj"], h * m) * mask


# ── the ODE solver (inference) ──────────────────────────────────────────


def cfm_t_span(cfg: CFMDecoderConfig) -> jax.Array:
    t = jnp.linspace(0.0, 1.0, cfg.n_timesteps + 1)
    if cfg.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    return t


def cfm_generate(
    p: Params,
    cfg: CFMDecoderConfig,
    rng: jax.Array,
    mu: jax.Array,                     # [b, t, out_channels]
    mask: jax.Array,                   # [b, t, 1]
    spks: Optional[jax.Array] = None,  # [b, out_channels]
    cond: Optional[jax.Array] = None,  # [b, t, out_channels]
    temperature: float = 1.0,
) -> jax.Array:
    """Euler ODE from noise → mel with classifier-free guidance.

    CFG runs cond/uncond as ONE doubled batch per step (the published
    inference does the same) — a single estimator dispatch per step.
    """
    b, t_len, c = mu.shape
    z = jax.random.normal(rng, (b, t_len, c), jnp.float32) * temperature
    t_span = cfm_t_span(cfg)
    use_cfg = cfg.cfg_rate > 0.0

    if use_cfg:
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        mask2 = jnp.concatenate([mask, mask], axis=0)
        spks2 = None if spks is None else jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond2 = None if cond is None else jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def step(i, x):
        t_cur = t_span[i]
        dt = t_span[i + 1] - t_span[i]
        if use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            v2 = apply_cfm_estimator(
                p, cfg, x2, mask2, mu2, jnp.full((2 * b,), t_cur), spks2, cond2
            )
            v_c, v_u = v2[:b], v2[b:]
            v = (1.0 + cfg.cfg_rate) * v_c - cfg.cfg_rate * v_u
        else:
            v = apply_cfm_estimator(p, cfg, x, mask, mu, jnp.full((b,), t_cur), spks, cond)
        return x + dt * v.astype(x.dtype)

    x = jax.lax.fori_loop(0, cfg.n_timesteps, step, z)
    return x * mask


__all__ = [
    "CFMDecoderConfig",
    "init_cfm_estimator",
    "apply_cfm_estimator",
    "cfm_t_span",
    "cfm_generate",
    "sinusoidal_pos_emb",
]
