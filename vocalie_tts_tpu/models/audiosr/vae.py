"""AutoencoderKL (CompVis layout) for the AudioSR latent space.

The published AudioSR checkpoint's first stage is the CompVis VAE
(ref: backend/workers/audiosr_runner.py:93-97 ``build_model("basic")``)
— 2D ResnetBlocks with swish, a single-head attention at the bottleneck,
asymmetric-padded stride-2 downsampling, nearest-2× upsampling. This
module implements that computation graph (NHWC, functional) with a
param tree mirroring the torch module tree, so checkpoints convert
mechanically (convert/ldm.py::convert_vae).

Mel spectrograms enter as [b, T, F, 1] "images"; the latent is
[b, T/2^n, F/2^n, z_channels].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.unet2d import (
    _norm_act,
    conv2d,
    conv2d_init,
    norm_init,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 1
    base_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    embed_dim: int = 16
    dtype: Any = jnp.float32

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)


def _resnet_init(key, c_in: int, c_out: int) -> Params:
    k = jax.random.split(key, 3)
    p: Params = {
        "norm1": norm_init(c_in),
        "conv1": conv2d_init(k[0], 3, c_in, c_out),
        "norm2": norm_init(c_out),
        "conv2": conv2d_init(k[1], 3, c_out, c_out),
    }
    if c_in != c_out:
        p["nin_shortcut"] = conv2d_init(k[2], 1, c_in, c_out)
    return p


def _resnet(p: Params, x: jax.Array) -> jax.Array:
    h = _norm_act(x, p["norm1"], silu=True, eps=1e-6)
    h = conv2d(p["conv1"], h)
    h = _norm_act(h, p["norm2"], silu=True, eps=1e-6)
    h = conv2d(p["conv2"], h)
    skip = conv2d(p["nin_shortcut"], x) if "nin_shortcut" in p else x
    return skip + h


def _attn_init(key, c: int) -> Params:
    k = jax.random.split(key, 4)
    return {
        "norm": norm_init(c),
        "q": conv2d_init(k[0], 1, c, c),
        "k": conv2d_init(k[1], 1, c, c),
        "v": conv2d_init(k[2], 1, c, c),
        "proj_out": conv2d_init(k[3], 1, c, c),
    }


def _attn(p: Params, x: jax.Array) -> jax.Array:
    """Single-head bottleneck attention (the CompVis AttnBlock)."""
    b, hh, ww, c = x.shape
    h = _norm_act(x, p["norm"], eps=1e-6)
    q = conv2d(p["q"], h).reshape(b, hh * ww, c)
    k = conv2d(p["k"], h).reshape(b, hh * ww, c)
    v = conv2d(p["v"], h).reshape(b, hh * ww, c)
    w = jax.nn.softmax(
        jnp.einsum("btc,bsc->bts", q, k, preferred_element_type=jnp.float32)
        * (1.0 / math.sqrt(c)),
        axis=-1,
    ).astype(v.dtype)
    a = jnp.einsum("bts,bsc->btc", w, v).reshape(b, hh, ww, c)
    return x + conv2d(p["proj_out"], a)


def _downsample(p: Params, x: jax.Array) -> jax.Array:
    # CompVis pads (right, bottom) only, then convs VALID at stride 2
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p, x, stride=2, padding="VALID")


def _upsample(p: Params, x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return conv2d(p, x)


# ── init ────────────────────────────────────────────────────────────────


def init_vae(key: jax.Array, cfg: VAEConfig) -> Params:
    n_levels = len(cfg.channel_mult)
    keys = iter(jax.random.split(key, 16 + 4 * n_levels * (cfg.num_res_blocks + 2)))

    enc: Params = {
        "conv_in": conv2d_init(next(keys), 3, cfg.in_channels, cfg.base_channels),
        "down": [],
    }
    ch = cfg.base_channels
    for level, mult in enumerate(cfg.channel_mult):
        blocks = []
        c_out = cfg.base_channels * mult
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resnet_init(next(keys), ch, c_out))
            ch = c_out
        lvl: Params = {"block": blocks}
        if level != n_levels - 1:
            lvl["downsample"] = conv2d_init(next(keys), 3, ch, ch)
        enc["down"].append(lvl)
    enc["mid"] = {
        "block_1": _resnet_init(next(keys), ch, ch),
        "attn_1": _attn_init(next(keys), ch),
        "block_2": _resnet_init(next(keys), ch, ch),
    }
    enc["norm_out"] = norm_init(ch)
    enc["conv_out"] = conv2d_init(next(keys), 3, ch, 2 * cfg.z_channels)

    dec: Params = {
        "conv_in": conv2d_init(next(keys), 3, cfg.embed_dim, ch),
        "mid": {
            "block_1": _resnet_init(next(keys), ch, ch),
            "attn_1": _attn_init(next(keys), ch),
            "block_2": _resnet_init(next(keys), ch, ch),
        },
        "up": [None] * n_levels,
    }
    for level in reversed(range(n_levels)):
        blocks = []
        c_out = cfg.base_channels * cfg.channel_mult[level]
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet_init(next(keys), ch, c_out))
            ch = c_out
        lvl = {"block": blocks}
        if level != 0:
            lvl["upsample"] = conv2d_init(next(keys), 3, ch, ch)
        dec["up"][level] = lvl
    dec["norm_out"] = norm_init(ch)
    dec["conv_out"] = conv2d_init(next(keys), 3, ch, cfg.in_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv2d_init(next(keys), 1, 2 * cfg.z_channels, 2 * cfg.embed_dim),
        "post_quant_conv": conv2d_init(next(keys), 1, cfg.embed_dim, cfg.embed_dim),
    }


# ── apply ───────────────────────────────────────────────────────────────


def vae_encode_moments(params: Params, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """x [b, H, W, in] → moments [b, H/ds, W/ds, 2*embed] (mean ‖ logvar)."""
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x)
    n_levels = len(cfg.channel_mult)
    for level, lvl in enumerate(enc["down"]):
        for block in lvl["block"]:
            h = _resnet(block, h)
        if level != n_levels - 1:
            h = _downsample(lvl["downsample"], h)
    h = _resnet(enc["mid"]["block_1"], h)
    h = _attn(enc["mid"]["attn_1"], h)
    h = _resnet(enc["mid"]["block_2"], h)
    h = _norm_act(h, enc["norm_out"], silu=True, eps=1e-6)
    h = conv2d(enc["conv_out"], h)
    return conv2d(params["quant_conv"], h)


def vae_encode(params: Params, cfg: VAEConfig, x: jax.Array,
               rng: jax.Array | None = None) -> jax.Array:
    """Deterministic (mean) or sampled latent."""
    moments = vae_encode_moments(params, cfg, x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is None:
        return mean
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def vae_decode(params: Params, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    dec = params["decoder"]
    h = conv2d(params["post_quant_conv"], z)
    h = conv2d(dec["conv_in"], h)
    h = _resnet(dec["mid"]["block_1"], h)
    h = _attn(dec["mid"]["attn_1"], h)
    h = _resnet(dec["mid"]["block_2"], h)
    for level in reversed(range(len(cfg.channel_mult))):
        lvl = dec["up"][level]
        for block in lvl["block"]:
            h = _resnet(block, h)
        if level != 0:
            h = _upsample(lvl["upsample"], h)
    h = _norm_act(h, dec["norm_out"], silu=True, eps=1e-6)
    return conv2d(dec["conv_out"], h)


__all__ = [
    "VAEConfig",
    "init_vae",
    "vae_encode",
    "vae_encode_moments",
    "vae_decode",
]
