"""torch → JAX conversion for the HiFT (NSF + ISTFT) generator.

Maps the published CosyVoice/S3Gen ``mel2wav.*`` / ``hift.*`` state
dict onto models/common/hift.py. Torch module tree mirrored:

    f0_predictor.condnet.{0,2,4,…}      weight-normed Conv1d (+ ELU)
    f0_predictor.classifier             Linear
    m_source.l_linear                   Linear (harmonics → source)
    conv_pre / conv_post                weight-normed Conv1d
    ups.{i}                             weight-normed ConvTranspose1d
    source_downs.{i}                    Conv1d (stride = remaining rate)
    source_resblocks.{i} / resblocks.{i·K+j}
        .convs{1,2}.{j} (weight-normed) + .activations{1,2}.{j}.alpha (Snake)

Weight-norm pairs (weight_g/weight_v, incl. torch≥2.1 parametrize
naming) are fused at conversion. Parity pinned by
tests/test_convert_hift.py against an independent torch replica with
the stochastic source terms disabled.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from vocalie_tts_tpu.models.common.hift import HiFTConfig
from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_conv_transpose1d,
    convert_linear,
    fused_weight,
)

Params = Dict[str, Any]


def _conv(state: Dict, key: str) -> Params:
    return convert_conv1d(fused_weight(state, key), state.get(f"{key}.bias"))


def _convt(state: Dict, key: str) -> Params:
    return convert_conv_transpose1d(fused_weight(state, key), state.get(f"{key}.bias"))


def _dense(state: Dict, key: str) -> Params:
    return convert_linear(state[f"{key}.weight"], state.get(f"{key}.bias"))


def _snake_resblock(state: Dict, base: str, n: int) -> Params:
    return {
        "convs1": [_conv(state, f"{base}.convs1.{j}") for j in range(n)],
        "convs2": [_conv(state, f"{base}.convs2.{j}") for j in range(n)],
        "alphas1": [
            np.asarray(state[f"{base}.activations1.{j}.alpha"], np.float32).reshape(-1)
            for j in range(n)
        ],
        "alphas2": [
            np.asarray(state[f"{base}.activations2.{j}.alpha"], np.float32).reshape(-1)
            for j in range(n)
        ],
    }


def _count(state: Dict, pattern: str) -> int:
    n = 0
    while any(k.startswith(pattern.format(n)) for k in state):
        n += 1
    return n


def _kernel_of(state: Dict, key: str) -> int:
    return fused_weight(state, key).shape[2]


def infer_hift_config(
    state: Dict[str, np.ndarray], base: HiFTConfig | None = None
) -> HiFTConfig:
    base = base or HiFTConfig()
    pre_w = fused_weight(state, "conv_pre")
    n_ups = _count(state, "ups.{}.")
    up_kernels = tuple(_kernel_of(state, f"ups.{i}") for i in range(n_ups))
    # published convention: stride = kernel // 2 for the NSF upsamplers
    up_rates = tuple(k // 2 for k in up_kernels)
    n_res_per_stage = _count(state, "resblocks.{}.") // n_ups
    rb_kernels = tuple(
        _kernel_of(state, f"resblocks.{j}.convs1.0") for j in range(n_res_per_stage)
    )
    n_fft = fused_weight(state, "conv_post").shape[0] - 2
    f0_layers = 0
    idx = 0
    while f"f0_predictor.condnet.{idx}.weight" in state or (
        f"f0_predictor.condnet.{idx}.weight_v" in state
    ) or (f"f0_predictor.condnet.{idx}.parametrizations.weight.original0" in state):
        f0_layers += 1
        idx += 2
    src_kernels = tuple(
        _kernel_of(state, f"source_resblocks.{i}.convs1.0") for i in range(n_ups)
    )
    return HiFTConfig(
        in_channels=pre_w.shape[1],
        base_channels=pre_w.shape[0],
        nb_harmonics=state["m_source.l_linear.weight"].shape[1] - 1,
        sampling_rate=base.sampling_rate,
        upsample_rates=up_rates,
        upsample_kernels=up_kernels,
        istft_n_fft=n_fft,
        istft_hop=base.istft_hop,
        resblock_kernels=rb_kernels,
        resblock_dilations=base.resblock_dilations[:n_res_per_stage],
        source_resblock_kernels=src_kernels,
        source_resblock_dilations=base.source_resblock_dilations[:n_ups],
        f0_cond_channels=fused_weight(state, "f0_predictor.condnet.0").shape[0],
        f0_layers=f0_layers,
    )


def convert_hift(
    state: Dict[str, np.ndarray],
    cfg: HiFTConfig | None = None,
    *,
    prefix: str = "",
) -> tuple[Params, HiFTConfig]:
    """Convert a HiFT generator state dict; returns (params, cfg)."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    cfg = infer_hift_config(state, cfg)

    condnet: List[Params] = []
    for i in range(cfg.f0_layers):
        condnet.append(_conv(state, f"f0_predictor.condnet.{2 * i}"))

    n_kernels = len(cfg.resblock_kernels)
    p: Params = {
        "f0_predictor": {
            "condnet": condnet,
            "classifier": _dense(state, "f0_predictor.classifier"),
        },
        "m_source": {"l_linear": _dense(state, "m_source.l_linear")},
        "conv_pre": _conv(state, "conv_pre"),
        "ups": [_convt(state, f"ups.{i}") for i in range(len(cfg.upsample_rates))],
        "source_downs": [
            _conv(state, f"source_downs.{i}") for i in range(len(cfg.upsample_rates))
        ],
        "source_resblocks": [
            _snake_resblock(
                state, f"source_resblocks.{i}", len(cfg.source_resblock_dilations[i])
            )
            for i in range(len(cfg.upsample_rates))
        ],
        "resblocks": [
            [
                _snake_resblock(
                    state, f"resblocks.{i * n_kernels + j}", len(cfg.resblock_dilations[j])
                )
                for j in range(n_kernels)
            ]
            for i in range(len(cfg.upsample_rates))
        ],
        "conv_post": _conv(state, "conv_post"),
    }
    return p, cfg


__all__ = ["convert_hift", "infer_hift_config"]
