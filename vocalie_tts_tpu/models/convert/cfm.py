"""torch → JAX conversion for the conditional flow-matching estimator.

Maps the published Matcha/CosyVoice decoder state dict
(``flow.decoder.estimator.*`` in CosyVoice / Chatterbox-S3Gen bundles,
ref: tts_backends/cosyvoice_runner.py:67-76,
tts_backends/chatterbox_impl.py:63-73) onto the param tree of
``models/common/cfm.py``. The torch module tree this mirrors:

    time_mlp.linear_{1,2}                 (diffusers TimestepEmbedding)
    {down,mid,up}_blocks.{i}.0            ResnetBlock1D
      .mlp.1 / .block{1,2}.block.{0,1|2} / .res_conv
    {down,mid,up}_blocks.{i}.1.{j}        BasicTransformerBlock
      .norm1 / .attn1.to_{q,k,v} / .attn1.to_out.0 / .norm3
      / .ff.net.0.proj / .ff.net.2
    down_blocks.{i}.2                     Downsample1D (.conv) | Conv1d
    up_blocks.{i}.2                       Upsample1D (.conv, transposed) | Conv1d
    final_block.block.{0,1|2} / final_proj

Both norm variants are auto-detected: Matcha's Block1D carries
GroupNorm(8) at ``block.1``; the causal CosyVoice2 Block1D carries
LayerNorm at ``block.2``. Parity is pinned by tests/test_convert_cfm.py
(independent torch replica → converted params → velocity match).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vocalie_tts_tpu.models.common.cfm import CFMDecoderConfig
from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_conv_transpose1d,
    convert_linear,
)

Params = Dict[str, Any]


def _dense(state: Dict, key: str) -> Params:
    return convert_linear(state[f"{key}.weight"], state.get(f"{key}.bias"))


def _conv(state: Dict, key: str) -> Params:
    return convert_conv1d(state[f"{key}.weight"], state.get(f"{key}.bias"))


def _block1d(state: Dict, base: str) -> tuple[Params, bool]:
    """Block1D → params; returns (params, is_causal_layout)."""
    p = {"conv": _conv(state, f"{base}.block.0")}
    if f"{base}.block.2.weight" in state:  # causal: LayerNorm at index 2
        p["norm_g"] = np.asarray(state[f"{base}.block.2.weight"], np.float32)
        p["norm_b"] = np.asarray(state[f"{base}.block.2.bias"], np.float32)
        return p, True
    p["norm_g"] = np.asarray(state[f"{base}.block.1.weight"], np.float32)
    p["norm_b"] = np.asarray(state[f"{base}.block.1.bias"], np.float32)
    return p, False


def _resnet(state: Dict, base: str) -> tuple[Params, bool]:
    b1, causal = _block1d(state, f"{base}.block1")
    b2, _ = _block1d(state, f"{base}.block2")
    return {
        "mlp": _dense(state, f"{base}.mlp.1"),
        "block1": b1,
        "block2": b2,
        "res_conv": _conv(state, f"{base}.res_conv"),
    }, causal


def _xf(state: Dict, base: str) -> Params:
    return {
        "norm1_g": np.asarray(state[f"{base}.norm1.weight"], np.float32),
        "norm1_b": np.asarray(state[f"{base}.norm1.bias"], np.float32),
        "to_q": np.ascontiguousarray(state[f"{base}.attn1.to_q.weight"].T),
        "to_k": np.ascontiguousarray(state[f"{base}.attn1.to_k.weight"].T),
        "to_v": np.ascontiguousarray(state[f"{base}.attn1.to_v.weight"].T),
        "to_out": _dense(state, f"{base}.attn1.to_out.0"),
        "norm3_g": np.asarray(state[f"{base}.norm3.weight"], np.float32),
        "norm3_b": np.asarray(state[f"{base}.norm3.bias"], np.float32),
        "ff_in": _dense(state, f"{base}.ff.net.0.proj"),
        "ff_out": _dense(state, f"{base}.ff.net.2"),
    }


def _level(state: Dict, base: str, n_blocks: int) -> tuple[Params, bool]:
    resnet, causal = _resnet(state, f"{base}.0")
    return {
        "resnet": resnet,
        "transformer": [_xf(state, f"{base}.1.{j}") for j in range(n_blocks)],
    }, causal


def _count(state: Dict, pattern: str) -> int:
    n = 0
    while any(k.startswith(pattern.format(n)) for k in state):
        n += 1
    return n


def infer_cfm_config(state: Dict[str, np.ndarray], base: CFMDecoderConfig | None = None) -> CFMDecoderConfig:
    """Derive the estimator shape from a (prefix-stripped) state dict."""
    base = base or CFMDecoderConfig()
    in_channels = state["time_mlp.linear_1.weight"].shape[1]
    out_channels = state["final_proj.weight"].shape[0]
    n_down = _count(state, "down_blocks.{}.")
    channels = tuple(
        state[f"down_blocks.{i}.0.res_conv.weight"].shape[0] for i in range(n_down)
    )
    num_mid = _count(state, "mid_blocks.{}.")
    n_blocks = _count(state, "down_blocks.0.1.{}.")
    inner = state["down_blocks.0.1.0.attn1.to_q.weight"].shape[0]
    causal = "down_blocks.0.0.block1.block.2.weight" in state
    num_heads = max(1, inner // base.attention_head_dim)
    return CFMDecoderConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        channels=channels,
        attention_head_dim=inner // num_heads,
        n_blocks=n_blocks,
        num_mid_blocks=num_mid,
        num_heads=num_heads,
        causal=causal,
        n_timesteps=base.n_timesteps,
        cfg_rate=base.cfg_rate,
        t_scheduler=base.t_scheduler,
        dtype=base.dtype,
    )


def convert_cfm_estimator(
    state: Dict[str, np.ndarray],
    cfg: CFMDecoderConfig | None = None,
    *,
    prefix: str = "",
) -> tuple[Params, CFMDecoderConfig]:
    """Convert an estimator state dict; returns (params, inferred cfg)."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    cfg = infer_cfm_config(state, cfg)

    p: Params = {
        "time_mlp": {
            "linear_1": _dense(state, "time_mlp.linear_1"),
            "linear_2": _dense(state, "time_mlp.linear_2"),
        }
    }

    downs = []
    for i in range(len(cfg.channels)):
        blk, _ = _level(state, f"down_blocks.{i}", cfg.n_blocks)
        is_last = i == len(cfg.channels) - 1
        if f"down_blocks.{i}.2.conv.weight" in state:  # Downsample1D
            if is_last:
                raise ValueError("Downsample1D at the last level is unsupported")
            blk["downsample"] = _conv(state, f"down_blocks.{i}.2.conv")
        else:  # plain (causal) Conv1d at the last level
            if not is_last:
                raise ValueError(f"down_blocks.{i} missing Downsample1D conv")
            blk["downsample"] = _conv(state, f"down_blocks.{i}.2")
        downs.append(blk)
    p["down_blocks"] = downs

    p["mid_blocks"] = [
        _level(state, f"mid_blocks.{i}", cfg.n_blocks)[0] for i in range(cfg.num_mid_blocks)
    ]

    ups = []
    n_up = len(cfg.channels)
    for i in range(n_up):
        blk, _ = _level(state, f"up_blocks.{i}", cfg.n_blocks)
        if f"up_blocks.{i}.2.conv.weight" in state:  # Upsample1D (transposed)
            if i == n_up - 1:
                raise ValueError("Upsample1D at the last level is unsupported")
            blk["upsample"] = convert_conv_transpose1d(
                state[f"up_blocks.{i}.2.conv.weight"], state.get(f"up_blocks.{i}.2.conv.bias")
            )
        else:
            if i != n_up - 1:
                raise ValueError(f"up_blocks.{i} missing Upsample1D conv")
            blk["upsample"] = _conv(state, f"up_blocks.{i}.2")
        ups.append(blk)
    p["up_blocks"] = ups

    fb, _ = _block1d(state, "final_block")
    p["final_block"] = fb
    p["final_proj"] = _conv(state, "final_proj")
    return p, cfg


__all__ = ["convert_cfm_estimator", "infer_cfm_config"]
