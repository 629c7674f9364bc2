"""torch → JAX conversion for the upsample conformer token encoder.

Maps the published CosyVoice2/S3Gen ``flow.encoder.*`` state dict
(wenet-style UpsampleConformerEncoder) onto models/common/conformer.py.
Torch module tree this mirrors:

    embed.out.{0,1}                      Linear + LayerNorm
    pre_lookahead_layer.conv{1,2}        Conv1d
    encoders.{i}.self_attn.linear_{q,k,v,out,pos} / .pos_bias_{u,v}
    encoders.{i}.feed_forward.w_{1,2} / .norm_mha / .norm_ff
    up_layer.conv                        Conv1d (k = 2*stride+1)
    up_embed.out.{0,1} / up_encoders.{i}.* / after_norm

Unused-by-config keys the wenet layer may carry (concat_linear,
norm_final, …) are ignored. Parity pinned by
tests/test_convert_conformer.py (independent torch replica).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vocalie_tts_tpu.models.common.conformer import ConformerEncoderConfig
from vocalie_tts_tpu.models.convert.torch_bridge import convert_conv1d, convert_linear

Params = Dict[str, Any]


def _dense(state: Dict, key: str) -> Params:
    return convert_linear(state[f"{key}.weight"], state.get(f"{key}.bias"))


def _conv(state: Dict, key: str) -> Params:
    return convert_conv1d(state[f"{key}.weight"], state.get(f"{key}.bias"))


def _embed(state: Dict, base: str) -> Params:
    return {
        "linear": _dense(state, f"{base}.out.0"),
        "norm_g": np.asarray(state[f"{base}.out.1.weight"], np.float32),
        "norm_b": np.asarray(state[f"{base}.out.1.bias"], np.float32),
    }


def _layer(state: Dict, base: str) -> Params:
    return {
        "linear_q": _dense(state, f"{base}.self_attn.linear_q"),
        "linear_k": _dense(state, f"{base}.self_attn.linear_k"),
        "linear_v": _dense(state, f"{base}.self_attn.linear_v"),
        "linear_out": _dense(state, f"{base}.self_attn.linear_out"),
        "linear_pos": np.ascontiguousarray(state[f"{base}.self_attn.linear_pos.weight"].T),
        "pos_bias_u": np.asarray(state[f"{base}.self_attn.pos_bias_u"], np.float32),
        "pos_bias_v": np.asarray(state[f"{base}.self_attn.pos_bias_v"], np.float32),
        "norm_mha_g": np.asarray(state[f"{base}.norm_mha.weight"], np.float32),
        "norm_mha_b": np.asarray(state[f"{base}.norm_mha.bias"], np.float32),
        "ff_w1": _dense(state, f"{base}.feed_forward.w_1"),
        "ff_w2": _dense(state, f"{base}.feed_forward.w_2"),
        "norm_ff_g": np.asarray(state[f"{base}.norm_ff.weight"], np.float32),
        "norm_ff_b": np.asarray(state[f"{base}.norm_ff.bias"], np.float32),
    }


def _count(state: Dict, pattern: str) -> int:
    n = 0
    while any(k.startswith(pattern.format(n)) for k in state):
        n += 1
    return n


def infer_conformer_config(state: Dict[str, np.ndarray],
                           base: ConformerEncoderConfig | None = None) -> ConformerEncoderConfig:
    base = base or ConformerEncoderConfig()
    dtype = base.dtype
    d_in = state["embed.out.0.weight"].shape[1]
    d_out = state["embed.out.0.weight"].shape[0]
    heads = state["encoders.0.self_attn.pos_bias_u"].shape[0]
    return ConformerEncoderConfig(
        input_size=d_in,
        output_size=d_out,
        attention_heads=heads,
        linear_units=state["encoders.0.feed_forward.w_1.weight"].shape[0],
        num_blocks=_count(state, "encoders.{}."),
        num_up_blocks=_count(state, "up_encoders.{}."),
        upsample_stride=(state["up_layer.conv.weight"].shape[2] - 1) // 2,
        pre_lookahead_len=state["pre_lookahead_layer.conv1.weight"].shape[2] - 1,
        dtype=dtype,
    )


def convert_conformer_encoder(
    state: Dict[str, np.ndarray], *, prefix: str = "",
    base: ConformerEncoderConfig | None = None,
) -> tuple[Params, ConformerEncoderConfig]:
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    cfg = infer_conformer_config(state, base)
    p: Params = {
        "embed": _embed(state, "embed"),
        "pre_lookahead": {
            "conv1": _conv(state, "pre_lookahead_layer.conv1"),
            "conv2": _conv(state, "pre_lookahead_layer.conv2"),
        },
        "encoders": [_layer(state, f"encoders.{i}") for i in range(cfg.num_blocks)],
        "up_layer": _conv(state, "up_layer.conv"),
        "up_embed": _embed(state, "up_embed"),
        "up_encoders": [_layer(state, f"up_encoders.{i}") for i in range(cfg.num_up_blocks)],
        "after_norm_g": np.asarray(state["after_norm.weight"], np.float32),
        "after_norm_b": np.asarray(state["after_norm.bias"], np.float32),
    }
    return p, cfg


__all__ = ["convert_conformer_encoder", "infer_conformer_config"]
