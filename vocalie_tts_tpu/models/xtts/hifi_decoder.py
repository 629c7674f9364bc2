"""XTTS-v2 latent-consuming HiFi-GAN waveform decoder.

The published XTTS-v2 stage 2 is NOT a mel vocoder: the GPT's final-
norm hidden states at the speech-code positions (1024-dim "latents",
one per 1024 output samples at 22.05 kHz) are linearly interpolated
up to the 256-sample hop rate, rate-converted 22050→24000, and fed to
a HiFi-GAN V1 generator whose stem consumes the 1024-channel latents
and which receives a 512-dim speaker d-vector both after the stem conv
(``cond_layer``) and after every upsample stage (``conds.{i}``,
cond_d_vector_in_each_upsampling_layer=True). Ref: SURVEY §2.4 XTTS
re-support mandate (BASELINE config #2); this module + the converters
in ``models/convert/xtts_modules.py`` close the "latent-consuming
HiFi-GAN decoder" delta in docs/PARITY.md.

TPU notes: the whole decoder is one jit — latents land channels-last
so the 1×1 stem/cond projections are MXU matmuls; the two linear
interpolations compile to gathers+fma (static shapes: callers pad the
latent count to the decode bucket and slice audio by true length).
Parity vs an independent torch replica (F.interpolate semantics
included) in ``tests/test_convert_xtts_decoder.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.vocoder import (
    VocoderConfig,
    apply_vocoder,
    init_vocoder,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HifiDecoderConfig:
    latent_dim: int = 1024
    d_vector_dim: int = 512
    ar_mel_length_compression: int = 1024   # samples per GPT latent (input sr)
    output_hop: int = 256
    input_sr: int = 22050
    output_sr: int = 24000
    base_channels: int = 512
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernels: tuple = (16, 16, 4, 4)
    resblock_kernels: tuple = (3, 7, 11)
    dtype: Any = jnp.float32

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(
            n_mels=self.latent_dim,
            base_channels=self.base_channels,
            upsample_rates=self.upsample_rates,
            upsample_kernels=self.upsample_kernels,
            resblock_kernels=self.resblock_kernels,
            resblock_dilations=((1, 3, 5),) * len(self.resblock_kernels),
            dtype=self.dtype,
        )

    @property
    def latent_upsample(self) -> int:
        return self.ar_mel_length_compression // self.output_hop

    def num_frames(self, n_latents: int) -> int:
        """Generator input frames for ``n_latents`` (static shape math)."""
        t = n_latents * self.latent_upsample
        if self.output_sr != self.input_sr:
            t = int(t * self.output_sr / self.input_sr)
        return t


def _cond_proj_init(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def init_hifi_decoder(key: jax.Array, cfg: HifiDecoderConfig) -> Params:
    n_up = len(cfg.upsample_rates)
    keys = jax.random.split(key, 2 + n_up)
    conds = []
    ch = cfg.base_channels
    for i in range(n_up):
        ch //= 2
        conds.append(_cond_proj_init(keys[2 + i], cfg.d_vector_dim, ch, cfg.dtype))
    return {
        "vocoder": init_vocoder(keys[0], cfg.vocoder),
        "cond_layer": _cond_proj_init(keys[1], cfg.d_vector_dim, cfg.base_channels, cfg.dtype),
        "conds": conds,
    }


def _linear_interp_time(x: jax.Array, t_out: int, scale: float | None = None) -> jax.Array:
    """[b, T, C] → [b, t_out, C], torch F.interpolate(mode="linear",
    align_corners=False) semantics (half-pixel centers, edge clamp).

    ``scale``, when given, is the torch ``scale_factor`` (out/in): torch
    maps src = (dst+0.5)/scale - 0.5 with the PROVIDED factor, which for
    non-integer factors differs slightly from the t_in/t_out ratio
    (t_out = floor(t_in·scale))."""
    b, t_in, c = x.shape
    inv = (1.0 / scale) if scale is not None else (t_in / t_out)
    src = (jnp.arange(t_out, dtype=jnp.float32) + 0.5) * inv - 0.5
    src = jnp.clip(src, 0.0, t_in - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    frac = (src - lo.astype(jnp.float32)).astype(x.dtype)[None, :, None]
    return x[:, lo, :] * (1.0 - frac) + x[:, hi, :] * frac


def apply_hifi_decoder(
    params: Params,
    cfg: HifiDecoderConfig,
    latents: jax.Array,   # [b, n_latents, latent_dim] GPT final-norm states
    spk: jax.Array,       # [b, d_vector_dim] speaker d-vector (unit-norm)
) -> jax.Array:
    """→ [b, n_latents · samples_per_latent_out] waveform at output_sr."""
    x = latents.astype(cfg.dtype)
    x = _linear_interp_time(x, x.shape[1] * cfg.latent_upsample)
    if cfg.output_sr != cfg.input_sr:
        x = _linear_interp_time(x, cfg.num_frames(latents.shape[1]),
                                scale=cfg.output_sr / cfg.input_sr)
    spk = spk.astype(cfg.dtype)
    cond = jnp.dot(spk, params["cond_layer"]["w"]) + params["cond_layer"]["b"]
    stage_conds = [jnp.dot(spk, c["w"]) + c["b"] for c in params["conds"]]
    return apply_vocoder(params["vocoder"], cfg.vocoder, x,
                         cond=cond, stage_conds=stage_conds)


__all__ = ["HifiDecoderConfig", "init_hifi_decoder", "apply_hifi_decoder"]
