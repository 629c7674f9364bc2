"""AudioSR-class latent diffusion model.

Mirrors the reference worker's behavior surface (ref:
backend/workers/audiosr_runner.py): 48 kHz mono output, ddim_steps /
guidance_scale / seed parameters, chunked long-audio processing with
overlap, optional multiband ensemble (mean of full-band and
lowpassed-input passes).

Architecture (jitted end-to-end): input audio → 48 kHz mel →
VAE-encode to a ×4-downsampled latent → DDIM loop over an
eps-predicting conv denoiser conditioned on the low-res latent
(classifier-free guidance against a zero condition) → VAE-decode →
HiFi-GAN at 48 kHz (hop 512). The reference runs this in a separate
venv subprocess with a 900 s timeout; here it is a resident jitted
diffusion loop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.audio import log_mel_spectrogram
from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    conv1d_transpose,
    leaky_relu,
)
from vocalie_tts_tpu.models.common.vocoder import (
    VocoderConfig,
    apply_vocoder,
    init_vocoder,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AudioSRConfig:
    sample_rate: int = 48000
    n_fft: int = 2048
    hop: int = 512              # 93.75 fps mel at 48 kHz
    n_mels: int = 128
    latent_dim: int = 64
    latent_stride: int = 4      # latent at ~23.4 fps
    denoiser_channels: int = 256
    n_denoiser_blocks: int = 6
    n_train_steps: int = 1000   # diffusion time discretization
    dtype: Any = jnp.float32

    @property
    def vocoder(self) -> VocoderConfig:
        # hop 512 @ 48 kHz
        return VocoderConfig(
            n_mels=self.n_mels,
            base_channels=512,
            upsample_rates=(8, 8, 4, 2),
            upsample_kernels=(16, 16, 8, 4),
            dtype=jnp.float32,
        )


def _dense(key, d_in, d_out):
    scale = 1.0 / math.sqrt(d_in)
    return jax.random.normal(key, (d_in, d_out), jnp.float32) * scale


def init_audiosr(key: jax.Array, cfg: AudioSRConfig) -> Params:
    keys = jax.random.split(key, 10 + cfg.n_denoiser_blocks)
    ch = cfg.denoiser_channels
    params: Params = {
        # VAE encoder: mel → latent (stride 4)
        "enc1": conv1d_init(keys[0], 5, cfg.n_mels, ch, jnp.float32),
        "enc2": conv1d_init(keys[1], 4, ch, ch, jnp.float32),       # stride 2
        "enc3": conv1d_init(keys[2], 4, ch, cfg.latent_dim, jnp.float32),  # stride 2
        # VAE decoder: latent → mel
        "dec1": conv1d_init(keys[3], 4, cfg.latent_dim, ch, jnp.float32),  # up 2
        "dec2": conv1d_init(keys[4], 4, ch, ch, jnp.float32),               # up 2
        "dec3": conv1d_init(keys[5], 5, ch, cfg.n_mels, jnp.float32),
        # denoiser
        "time_proj": _dense(keys[6], 64, ch),
        "den_in": conv1d_init(keys[7], 3, 2 * cfg.latent_dim, ch, jnp.float32),
        "den_blocks": [],
        "den_out": conv1d_init(keys[8], 3, ch, cfg.latent_dim, jnp.float32),
        "vocoder": init_vocoder(keys[9], cfg.vocoder),
    }
    for i in range(cfg.n_denoiser_blocks):
        bk = jax.random.split(keys[10 + i], 2)
        params["den_blocks"].append(
            {
                "c1": conv1d_init(bk[0], 5, ch, ch, jnp.float32),
                "c2": conv1d_init(bk[1], 5, ch, ch, jnp.float32),
            }
        )
    return params


def vae_encode(params: Params, mel: jax.Array) -> jax.Array:
    h = leaky_relu(conv1d(params["enc1"], mel))
    h = leaky_relu(conv1d(params["enc2"], h, stride=2))
    return conv1d(params["enc3"], h, stride=2)


def vae_decode(params: Params, z: jax.Array) -> jax.Array:
    h = leaky_relu(conv1d_transpose(params["dec1"], z, stride=2))
    h = leaky_relu(conv1d_transpose(params["dec2"], h, stride=2))
    return conv1d(params["dec3"], h)


def _time_embedding(t: jax.Array) -> jax.Array:
    half = 32
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def denoise_eps(
    params: Params, x_t: jax.Array, cond: jax.Array, t: jax.Array
) -> jax.Array:
    """eps prediction conditioned on the low-res latent (concat)."""
    temb = jnp.dot(_time_embedding(t), params["time_proj"])
    h = conv1d(params["den_in"], jnp.concatenate([x_t, cond], axis=-1))
    h = h + temb[:, None, :]
    for i, block in enumerate(params["den_blocks"]):
        dil = 2 ** (i % 3)
        r = leaky_relu(conv1d(block["c1"], h, dilation=dil))
        r = conv1d(block["c2"], r)
        h = h + r
    return conv1d(params["den_out"], leaky_relu(h))


def _alpha_bar(t_frac: jax.Array) -> jax.Array:
    """Cosine schedule ᾱ(t) (t_frac ∈ [0,1])."""
    return jnp.cos((t_frac + 0.008) / 1.008 * jnp.pi / 2) ** 2


def ddim_super_resolution(
    params: Params,
    cfg: AudioSRConfig,
    mel_lowres: jax.Array,   # [b, frames, n_mels] log-mel of the input
    rng: jax.Array,
    *,
    ddim_steps: int,
    guidance_scale: float,
) -> jax.Array:
    """Run the DDIM loop, return the SR mel [b, frames, n_mels]."""
    cond = vae_encode(params, mel_lowres)
    b, lat_frames, _ = cond.shape
    x = jax.random.normal(rng, (b, lat_frames, cfg.latent_dim), jnp.float32)
    uncond = jnp.zeros_like(cond)

    # descending time fractions 1→0 over ddim_steps
    ts = jnp.linspace(1.0, 0.0, ddim_steps + 1)

    def step(i, x):
        t_now, t_next = ts[i], ts[i + 1]
        a_now, a_next = _alpha_bar(t_now), _alpha_bar(t_next)
        t_vec = jnp.full((b,), t_now * cfg.n_train_steps)
        eps_c = denoise_eps(params, x, cond, t_vec)
        eps_u = denoise_eps(params, x, uncond, t_vec)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        x0 = (x - jnp.sqrt(1 - a_now) * eps) / jnp.sqrt(jnp.maximum(a_now, 1e-8))
        x0 = jnp.clip(x0, -10.0, 10.0)
        return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps

    x = jax.lax.fori_loop(0, ddim_steps, step, x)
    return vae_decode(params, x)


def enhance_window(
    params: Params,
    cfg: AudioSRConfig,
    audio_48k: jax.Array,  # [b, T] at 48 kHz
    rng: jax.Array,
    *,
    ddim_steps: int,
    guidance_scale: float,
) -> jax.Array:
    """Audio window → SR audio window (same length)."""
    mel = log_mel_spectrogram(
        audio_48k, sr=cfg.sample_rate, n_fft=cfg.n_fft, hop=cfg.hop, n_mels=cfg.n_mels
    )
    # pad latent frames to the stride
    frames = mel.shape[1]
    pad = (-frames) % cfg.latent_stride
    if pad:
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    sr_mel = ddim_super_resolution(
        params, cfg, mel, rng, ddim_steps=ddim_steps, guidance_scale=guidance_scale
    )
    audio = apply_vocoder(params["vocoder"], cfg.vocoder, sr_mel)
    return audio[:, : audio_48k.shape[1]]


__all__ = [
    "AudioSRConfig",
    "init_audiosr",
    "vae_encode",
    "vae_decode",
    "denoise_eps",
    "ddim_super_resolution",
    "enhance_window",
]
