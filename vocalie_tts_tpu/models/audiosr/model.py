"""AudioSR-class latent diffusion model (checkpoint-compatible shapes).

Mirrors the reference worker's behavior surface (ref:
backend/workers/audiosr_runner.py): 48 kHz mono output, ddim_steps /
guidance_scale / seed parameters, chunked long-audio processing with
overlap, optional multiband ensemble (mean of full-band and
lowpassed-input passes).

Architecture (jitted end-to-end), now the published model's actual
shape so real AudioSR checkpoints can convert (convert/ldm.py):

  input audio → 48 kHz log-mel "image" [b, T, F, 1]
    → **AutoencoderKL** (CompVis VAE, vae.py) → latent [b, T/4, F/4, C]
    → DDIM loop over an **LDM UNet** eps-denoiser (unet2d.py — ResBlocks
      with FiLM time embedding, bottleneck self-attention, skip
      connections), conditioned on the low-res latent by channel concat
      with classifier-free guidance against a zeroed condition
    → VAE decode → HiFi-GAN at 48 kHz (hop 512).

The reference runs the torch original in a separate venv subprocess
with a 900 s timeout; here it is a resident jitted diffusion loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.audiosr.vae import (
    VAEConfig,
    init_vae,
    vae_decode,
    vae_encode,
)
from vocalie_tts_tpu.models.common.audio import log_mel_spectrogram
from vocalie_tts_tpu.models.common.unet2d import (
    UNet2DConfig,
    apply_unet2d,
    init_unet2d,
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
    hop: int = 512                  # 93.75 fps mel at 48 kHz
    n_mels: int = 128
    # published AudioSR front-end convention (librosa.filters.mel:
    # Slaney SCALE + slaney norm, fmin 20) — band edges differ from the
    # HTK-point filterbank audibly above ~4 kHz, so imported VAE/UNet
    # weights must see this filterbank
    mel_fmin: float = 20.0
    mel_scale: str = "slaney"
    # first stage (AutoencoderKL)
    vae_base: int = 64
    vae_mult: Tuple[int, ...] = (1, 2, 4)
    vae_res_blocks: int = 2
    z_channels: int = 16
    embed_dim: int = 16
    # denoiser (LDM UNet)
    unet_channels: int = 128
    unet_mult: Tuple[int, ...] = (1, 2, 4)
    unet_res_blocks: int = 2
    unet_attn_res: Tuple[int, ...] = (4,)
    unet_heads: int = 8
    n_train_steps: int = 1000      # diffusion time discretization
    dtype: Any = jnp.float32

    @property
    def vae(self) -> VAEConfig:
        return VAEConfig(
            in_channels=1,
            base_channels=self.vae_base,
            channel_mult=self.vae_mult,
            num_res_blocks=self.vae_res_blocks,
            z_channels=self.z_channels,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
        )

    @property
    def unet(self) -> UNet2DConfig:
        return UNet2DConfig(
            in_channels=2 * self.embed_dim,   # [x_t ‖ lowres cond]
            model_channels=self.unet_channels,
            out_channels=self.embed_dim,
            num_res_blocks=self.unet_res_blocks,
            attention_resolutions=self.unet_attn_res,
            channel_mult=self.unet_mult,
            num_heads=self.unet_heads,
            dtype=self.dtype,
        )

    @property
    def latent_stride(self) -> int:
        """Total time downsampling: VAE stride × UNet depth alignment."""
        vae_ds = 2 ** (len(self.vae_mult) - 1)
        unet_ds = 2 ** (len(self.unet_mult) - 1)
        return vae_ds * unet_ds

    @property
    def vocoder(self) -> VocoderConfig:
        # hop 512 @ 48 kHz; compute dtype follows the serving dtype
        # (bf16 at full scale, f32 at the parity-test tiny scale)
        return VocoderConfig(
            n_mels=self.n_mels,
            base_channels=512,
            upsample_rates=(8, 8, 4, 2),
            upsample_kernels=(16, 16, 8, 4),
            dtype=self.dtype,
        )


def init_audiosr(key: jax.Array, cfg: AudioSRConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vae": init_vae(k1, cfg.vae),
        "unet": init_unet2d(k2, cfg.unet),
        "vocoder": init_vocoder(k3, cfg.vocoder),
    }


def denoise_eps(
    params: Params, cfg: AudioSRConfig, x_t: jax.Array, cond: jax.Array, t: jax.Array
) -> jax.Array:
    """eps prediction conditioned on the low-res latent (channel concat)."""
    return apply_unet2d(
        params["unet"], cfg.unet, jnp.concatenate([x_t, cond], axis=-1), t
    )


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
    """Run the DDIM loop, return the SR mel [b, frames, n_mels].

    Compute dtype: the VAE and UNet run in ``cfg.dtype`` (bf16 at
    serving scale — MXU-native, halves HBM weight streaming per DDIM
    step); the DDIM state/update math stays f32 for stability. At
    ``dtype=float32`` every cast is a no-op, so the torch-replica
    parity tests pin the exact published math.
    """
    cdt = cfg.dtype
    image = mel_lowres[..., None].astype(cdt)          # [b, T, F, 1]
    cond = vae_encode(params["vae"], cfg.vae, image)   # [b, T', F', C]
    b = cond.shape[0]
    lat_shape = cond.shape
    x = jax.random.normal(rng, lat_shape, jnp.float32)
    uncond = jnp.zeros_like(cond)

    # descending time fractions 1→0 over ddim_steps; CFG runs cond and
    # uncond through ONE doubled-batch UNet call per step
    ts = jnp.linspace(1.0, 0.0, ddim_steps + 1)
    x2_cond = jnp.concatenate([cond, uncond], axis=0).astype(cdt)

    # f32 path: keep the loop state in latent layout (bit-for-bit the
    # published math, pinned by the torch-parity tests). bf16 serving
    # path: carry the state FLAT [b, H*W*C] — the z-channel dim (16) is
    # the lane dim in latent layout and tiles pad it 16→128, so every
    # carry copy and DDIM-update pass over [b,H,W,16] moves 8× its
    # bytes; flat state keeps lanes dense and pays two reshapes/step
    # at the UNet boundary instead.
    flat = cdt != jnp.float32

    def step(i, x):
        t_now, t_next = ts[i], ts[i + 1]
        a_now, a_next = _alpha_bar(t_now), _alpha_bar(t_next)
        t_vec = jnp.full((2 * b,), t_now * cfg.n_train_steps)
        x4 = x.reshape(lat_shape) if flat else x
        eps2 = denoise_eps(
            params, cfg, jnp.concatenate([x4, x4], axis=0).astype(cdt), x2_cond, t_vec
        ).astype(jnp.float32)
        eps_c, eps_u = eps2[:b], eps2[b:]
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        if flat:
            eps = eps.reshape(b, -1)
        x0 = (x - jnp.sqrt(1 - a_now) * eps) / jnp.sqrt(jnp.maximum(a_now, 1e-8))
        x0 = jnp.clip(x0, -10.0, 10.0)
        return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps

    if flat:
        x = x.reshape(b, -1)
    x = jax.lax.fori_loop(0, ddim_steps, step, x)
    x = x.reshape(lat_shape)
    return vae_decode(params["vae"], cfg.vae, x.astype(cdt))[..., 0].astype(jnp.float32)


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
    if jnp.issubdtype(audio_48k.dtype, jnp.integer):
        # int16 PCM wire format (halves the tunnel upload at exact
        # 16-bit precision — f16 would floor quantization at -66 dBFS)
        audio_48k = audio_48k.astype(jnp.float32) / 32767.0
    else:
        audio_48k = audio_48k.astype(jnp.float32)
    mel = log_mel_spectrogram(
        audio_48k, sr=cfg.sample_rate, n_fft=cfg.n_fft, hop=cfg.hop,
        n_mels=cfg.n_mels, fmin=cfg.mel_fmin, scale=cfg.mel_scale,
    )
    # Align time frames to the latent stride so the VAE and UNet can
    # halve them cleanly. Hop-multiple windows (all WINDOW_BUCKETS)
    # produce stride·k + 1 centered frames; TRIM the lone boundary
    # frame (centered at the window edge, covering mostly padding)
    # instead of padding up a whole stride — padding 65→80 frames was
    # ~19% pure waste in every conv of the batched DDIM loop (round-3
    # profile: the loop is conv-bound). Other remainders still pad.
    frames = mel.shape[1]
    rem = frames % cfg.latent_stride
    if rem == 1 and frames > 1:
        mel = mel[:, : frames - 1]
    elif rem:
        mel = jnp.pad(mel, ((0, 0), (0, cfg.latent_stride - rem), (0, 0)))
    sr_mel = ddim_super_resolution(
        params, cfg, mel, rng, ddim_steps=ddim_steps, guidance_scale=guidance_scale
    )
    audio = apply_vocoder(params["vocoder"], cfg.vocoder, sr_mel)
    audio = audio[:, : audio_48k.shape[1]]
    if cfg.dtype != jnp.float32:
        # serving path: ship int16 PCM across the host link — half the
        # device→host bytes (~12 MB/session through the ~20 MB/s
        # tunnel) at exactly the precision of the final PCM_16 file
        audio = jnp.clip(audio, -1.0, 1.0)
        audio = jnp.round(audio * 32767.0).astype(jnp.int16)
    return audio


__all__ = [
    "AudioSRConfig",
    "init_audiosr",
    "denoise_eps",
    "ddim_super_resolution",
    "enhance_window",
]
