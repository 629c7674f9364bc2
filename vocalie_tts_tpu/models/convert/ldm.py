"""LDM/guided-diffusion ``UNetModel`` state dict → unet2d params.

The published AudioSR checkpoint's denoiser follows the CompVis module
tree (ref: backend/workers/audiosr_runner.py:93-97 loads
``build_model("basic")``, a latent-diffusion model):

  time_embed.{0,2}                          MLP on the step embedding
  input_blocks.0.0                          stem conv
  input_blocks.N.{0,1}                      ResBlock [, AttentionBlock]
  input_blocks.N.0.op                       Downsample conv (stride 2)
  middle_block.{0,1,2}                      Res, Attn, Res
  output_blocks.N.{0,1,2}                   Res [, Attn] [, Upsample.conv]
  out.{0,2}                                 GroupNorm, conv

ResBlock:   in_layers.{0,2}, emb_layers.1, out_layers.{0,3},
            skip_connection (1×1, only when channels change)
Attention:  norm, qkv (1×1, heads-major legacy layout), proj_out

The module sequence is reconstructed from ``UNet2DConfig`` exactly the
way the torch ModuleList is built, so indices line up mechanically.
Fails loud: KeyError for missing tensors, ValueError on shape drift.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vocalie_tts_tpu.models.common.unet2d import UNet2DConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    w = _np(state[f"{key}.weight"])
    b = state.get(f"{key}.bias")
    if w.ndim == 3:  # conv1d over flattened spatial == 1×1 conv2d
        w = w[:, :, :, None]  # [out, in, 1, 1]
    # torch [out, in, kh, kw] → HWIO [kh, kw, in, out]
    w = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    return {
        "w": jnp.asarray(w, jnp.float32),
        "b": jnp.asarray(
            b if b is not None else np.zeros(w.shape[-1], np.float32), jnp.float32
        ),
    }


def _dense(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    return {
        "w": jnp.asarray(_np(state[f"{key}.weight"]).T, jnp.float32),
        "b": jnp.asarray(_np(state[f"{key}.bias"]), jnp.float32),
    }


def _norm(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    return {
        "g": jnp.asarray(_np(state[f"{key}.weight"]), jnp.float32),
        "b": jnp.asarray(_np(state[f"{key}.bias"]), jnp.float32),
    }


def _resblock(state: Dict, base: str) -> Dict:
    p = {
        "in_norm": _norm(state, f"{base}.in_layers.0"),
        "in_conv": _conv(state, f"{base}.in_layers.2"),
        "emb": _dense(state, f"{base}.emb_layers.1"),
        "out_norm": _norm(state, f"{base}.out_layers.0"),
        "out_conv": _conv(state, f"{base}.out_layers.3"),
    }
    if f"{base}.skip_connection.weight" in state:
        p["skip"] = _conv(state, f"{base}.skip_connection")
    return p


def _attnblock(state: Dict, base: str) -> Dict:
    return {
        "norm": _norm(state, f"{base}.norm"),
        "qkv": _conv(state, f"{base}.qkv"),
        "proj": _conv(state, f"{base}.proj_out"),
    }


def convert_ldm_unet(
    state: Dict[str, np.ndarray], cfg: UNet2DConfig, *, prefix: str = ""
) -> Dict:
    """Build apply_unet2d-ready params from a UNetModel state dict."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}

    stem = _np(state["input_blocks.0.0.weight"])
    if stem.shape[:2] != (cfg.model_channels, cfg.in_channels):
        raise ValueError(
            f"stem conv is {stem.shape[:2]}, config expects "
            f"({cfg.model_channels}, {cfg.in_channels})"
        )

    params: Dict = {
        "time_embed": {
            "l0": _dense(state, "time_embed.0"),
            "l2": _dense(state, "time_embed.2"),
        },
        "input_blocks": [{"conv": _conv(state, "input_blocks.0.0")}],
        "output_blocks": [],
    }

    # replay the torch ModuleList construction
    bi = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for _ in range(cfg.num_res_blocks):
            block = {"res": _resblock(state, f"input_blocks.{bi}.0")}
            if ds in cfg.attention_resolutions:
                block["attn"] = _attnblock(state, f"input_blocks.{bi}.1")
            params["input_blocks"].append(block)
            bi += 1
        if level != len(cfg.channel_mult) - 1:
            params["input_blocks"].append(
                {"down": _conv(state, f"input_blocks.{bi}.0.op")}
            )
            bi += 1
            ds *= 2

    params["middle_block"] = {
        "res1": _resblock(state, "middle_block.0"),
        "attn": _attnblock(state, "middle_block.1"),
        "res2": _resblock(state, "middle_block.2"),
    }

    bo = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            block = {"res": _resblock(state, f"output_blocks.{bo}.0")}
            idx = 1
            if ds in cfg.attention_resolutions:
                block["attn"] = _attnblock(state, f"output_blocks.{bo}.{idx}")
                idx += 1
            if level and i == cfg.num_res_blocks:
                block["up"] = _conv(state, f"output_blocks.{bo}.{idx}.conv")
                ds //= 2
            params["output_blocks"].append(block)
            bo += 1

    params["out_norm"] = _norm(state, "out.0")
    params["out_conv"] = _conv(state, "out.2")
    return params


def _vae_resnet(state: Dict, base: str) -> Dict:
    p = {
        "norm1": _norm(state, f"{base}.norm1"),
        "conv1": _conv(state, f"{base}.conv1"),
        "norm2": _norm(state, f"{base}.norm2"),
        "conv2": _conv(state, f"{base}.conv2"),
    }
    if f"{base}.nin_shortcut.weight" in state:
        p["nin_shortcut"] = _conv(state, f"{base}.nin_shortcut")
    return p


def _vae_attn(state: Dict, base: str) -> Dict:
    return {
        "norm": _norm(state, f"{base}.norm"),
        "q": _conv(state, f"{base}.q"),
        "k": _conv(state, f"{base}.k"),
        "v": _conv(state, f"{base}.v"),
        "proj_out": _conv(state, f"{base}.proj_out"),
    }


def convert_vae(state: Dict[str, np.ndarray], cfg, *, prefix: str = "") -> Dict:
    """CompVis AutoencoderKL state dict → audiosr.vae params.

    Key layout: encoder.down.{i}.block.{j} / downsample.conv, mid
    block_1/attn_1/block_2, norm_out/conv_out; decoder mirrored with
    up.{i} (level-indexed); quant_conv / post_quant_conv.
    """
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}

    stem = _np(state["encoder.conv_in.weight"])
    if stem.shape[:2] != (cfg.base_channels, cfg.in_channels):
        raise ValueError(
            f"encoder stem is {stem.shape[:2]}, config expects "
            f"({cfg.base_channels}, {cfg.in_channels})"
        )

    n_levels = len(cfg.channel_mult)
    enc: Dict = {"conv_in": _conv(state, "encoder.conv_in"), "down": []}
    for i in range(n_levels):
        lvl = {
            "block": [
                _vae_resnet(state, f"encoder.down.{i}.block.{j}")
                for j in range(cfg.num_res_blocks)
            ]
        }
        if i != n_levels - 1:
            lvl["downsample"] = _conv(state, f"encoder.down.{i}.downsample.conv")
        enc["down"].append(lvl)
    enc["mid"] = {
        "block_1": _vae_resnet(state, "encoder.mid.block_1"),
        "attn_1": _vae_attn(state, "encoder.mid.attn_1"),
        "block_2": _vae_resnet(state, "encoder.mid.block_2"),
    }
    enc["norm_out"] = _norm(state, "encoder.norm_out")
    enc["conv_out"] = _conv(state, "encoder.conv_out")

    dec: Dict = {
        "conv_in": _conv(state, "decoder.conv_in"),
        "mid": {
            "block_1": _vae_resnet(state, "decoder.mid.block_1"),
            "attn_1": _vae_attn(state, "decoder.mid.attn_1"),
            "block_2": _vae_resnet(state, "decoder.mid.block_2"),
        },
        "up": [],
    }
    for i in range(n_levels):
        lvl = {
            "block": [
                _vae_resnet(state, f"decoder.up.{i}.block.{j}")
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if i != 0:
            lvl["upsample"] = _conv(state, f"decoder.up.{i}.upsample.conv")
        dec["up"].append(lvl)
    dec["norm_out"] = _norm(state, "decoder.norm_out")
    dec["conv_out"] = _conv(state, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(state, "quant_conv"),
        "post_quant_conv": _conv(state, "post_quant_conv"),
    }


__all__ = ["convert_ldm_unet", "convert_vae"]
