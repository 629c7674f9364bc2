"""HiFi-GAN-class neural vocoder (generator) in JAX.

mel [batch, frames, n_mels] → waveform [batch, frames * prod(rates)].
Multi-receptive-field fusion resblocks after each transposed-conv
upsample stage, matching the HiFi-GAN V1 topology used by the engines
the reference wraps (VITS/Piper, Chatterbox S3Gen's decoder stage,
XTTS, CosyVoice — all ship HiFi-GAN-family vocoders).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    conv1d_transpose,
    leaky_relu,
    resblock_apply,
    resblock_init,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    n_mels: int = 80
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)       # 256× → 24 kHz @ 93.75 fps
    upsample_kernels: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    dtype: Any = jnp.float32

    @property
    def hop(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def init_vocoder(key: jax.Array, cfg: VocoderConfig) -> Params:
    n_up = len(cfg.upsample_rates)
    keys = jax.random.split(key, 2 + n_up + n_up * len(cfg.resblock_kernels))
    params: Params = {
        "pre": conv1d_init(keys[0], 7, cfg.n_mels, cfg.base_channels, cfg.dtype),
        "ups": [],
        "resblocks": [],  # [stage][kernel]
    }
    ch = cfg.base_channels
    ki = 2
    for i, (rate, kern) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        ch_out = ch // 2
        params["ups"].append(conv1d_init(keys[ki], kern, ch, ch_out, cfg.dtype))
        ki += 1
        stage = []
        for rk, dil in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            stage.append(resblock_init(keys[ki], ch_out, rk, dil, cfg.dtype))
            ki += 1
        params["resblocks"].append(stage)
        ch = ch_out
    params["post"] = conv1d_init(keys[1], 7, ch, 1, cfg.dtype)
    return params


def apply_vocoder(
    params: Params, cfg: VocoderConfig, mel: jax.Array,
    cond: jax.Array | None = None,
    stage_conds: Sequence[jax.Array] | None = None,
) -> jax.Array:
    """mel [batch, frames, n_mels] → audio [batch, frames * hop].

    ``cond`` [batch, base_channels] is the speaker-conditioning vector
    the published generator adds after the stem conv (its ``cond``
    1×1 projection lives with the caller's params). ``stage_conds``
    (one [batch, ch_i] vector per upsample stage) is the
    cond-in-each-up-layer variant the XTTS-v2 waveform decoder uses —
    added right after each upsample conv, before the MRF resblocks."""
    x = conv1d(params["pre"], mel.astype(cfg.dtype))
    if cond is not None:
        x = x + cond[:, None, :].astype(x.dtype)
    for i, rate in enumerate(cfg.upsample_rates):
        x = leaky_relu(x)
        x = conv1d_transpose(params["ups"][i], x, stride=rate)
        if stage_conds is not None:
            x = x + stage_conds[i][:, None, :].astype(x.dtype)
        acc = None
        for rb, dil in zip(params["resblocks"][i], cfg.resblock_dilations):
            y = resblock_apply(rb, x, dil)
            acc = y if acc is None else acc + y
        x = acc / len(params["resblocks"][i])
    # the canonical generator's final activation uses the framework
    # default slope (0.01), not the 0.1 used elsewhere — matters for
    # weight compatibility with published checkpoints
    x = leaky_relu(x, 0.01)
    x = conv1d(params["post"], x)
    return jnp.tanh(x)[..., 0]


__all__ = ["VocoderConfig", "init_vocoder", "apply_vocoder"]
