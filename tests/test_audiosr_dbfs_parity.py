"""AudioSR end-to-end parity vs a torch reference pipeline: dBFS delta.

The BASELINE north star asks for output loudness within 0.1 dBFS of
the reference implementation (ref: backend/workers/audiosr_runner.py).
Published AudioSR weights can't be fetched in this environment, so the
strongest honest evidence is: run the SAME synthetic checkpoint
through our JAX pipeline (log-mel → VAE-encode → DDIM+CFG → VAE-decode
→ HiFi-GAN) and through a torch replica built from the public module
definitions, with identical noise, and compare the output audio and
its dBFS. Elementwise agreement makes the dBFS claim transfer to any
real checkpoint the converters accept.
"""

import dataclasses

import numpy as np
import pytest

from tests.test_convert_hifigan import _build_torch_generator
from tests.test_convert_ldm import _build_torch_unet
from tests.test_convert_vae import _build_torch_vae

pytestmark = pytest.mark.unit


def _dbfs_peak(x: np.ndarray) -> float:
    return 20.0 * np.log10(max(float(np.max(np.abs(x))), 1e-12))


def _dbfs_rms(x: np.ndarray) -> float:
    return 20.0 * np.log10(max(float(np.sqrt((x ** 2).mean())), 1e-12))


def test_audiosr_pipeline_dbfs_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.audiosr.model import (
        _alpha_bar,
        ddim_super_resolution,
    )
    from vocalie_tts_tpu.models.audiosr.runtime import SCALES
    from vocalie_tts_tpu.models.common.audio import log_mel_spectrogram
    from vocalie_tts_tpu.models.common.vocoder import VocoderConfig, apply_vocoder
    from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator
    from vocalie_tts_tpu.models.convert.ldm import convert_ldm_unet, convert_vae

    cfg = SCALES["tiny"]
    voc_cfg = VocoderConfig(
        n_mels=cfg.n_mels, base_channels=16,
        upsample_rates=(8, 8, 4, 2), upsample_kernels=(16, 16, 8, 4),
    )

    vae_t = _build_torch_vae(cfg.vae, seed=11)
    unet_t = _build_torch_unet(cfg.unet, seed=12)
    voc_t = _build_torch_generator(
        voc_cfg.n_mels, voc_cfg.base_channels, voc_cfg.upsample_rates,
        voc_cfg.upsample_kernels, voc_cfg.resblock_kernels,
        voc_cfg.resblock_dilations, seed=13,
    )
    params = {
        "vae": convert_vae(
            {k: v.detach().numpy() for k, v in vae_t.state_dict().items()},
            cfg.vae,
        ),
        "unet": convert_ldm_unet(
            {k: v.detach().numpy() for k, v in unet_t.state_dict().items()},
            cfg.unet,
        ),
    }
    voc_params = convert_hifigan_generator(
        {k: v.detach().numpy() for k, v in voc_t.state_dict().items()}, voc_cfg
    )

    sr, hop = cfg.sample_rate, cfg.hop
    t = np.arange(hop * 16) / sr
    audio = (0.25 * np.sin(2 * np.pi * 440 * t)
             + 0.05 * np.sin(2 * np.pi * 1330 * t)).astype(np.float32)[None]
    ddim_steps, guidance = 4, 2.0
    rng = jax.random.PRNGKey(123)

    # ── JAX pipeline (the enhance_window stages) ────────────────────────
    mel = log_mel_spectrogram(
        jnp.asarray(audio), sr=sr, n_fft=cfg.n_fft, hop=hop, n_mels=cfg.n_mels
    )
    pad = (-mel.shape[1]) % cfg.latent_stride
    if pad:
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    sr_mel = ddim_super_resolution(
        params, cfg, mel, rng, ddim_steps=ddim_steps, guidance_scale=guidance
    )
    audio_j = np.asarray(
        apply_vocoder(voc_params, voc_cfg, sr_mel)
    )[:, : audio.shape[1]]

    # ── torch replica: same mel, same noise, same DDIM math ─────────────
    mel_np = np.asarray(mel, np.float32)
    with torch.no_grad():
        image = torch.tensor(mel_np[:, None, :, :])        # [b, 1, T, F]
        moments = vae_t.encode_moments(image)
        cond = moments.chunk(2, dim=1)[0].numpy()          # mean, [b,C,H,W]
        # identical noise: replicate the pipeline's jax.random call
        cond_jax_shape = (1, cond.shape[2], cond.shape[3], cond.shape[1])
        noise = np.asarray(jax.random.normal(rng, cond_jax_shape, jnp.float32))
        x = noise.transpose(0, 3, 1, 2).copy()
        uncond = np.zeros_like(cond)
        x2_cond = torch.tensor(np.concatenate([cond, uncond], axis=0))
        ts = np.linspace(1.0, 0.0, ddim_steps + 1, dtype=np.float32)
        for i in range(ddim_steps):
            a_now = float(_alpha_bar(ts[i]))
            a_next = float(_alpha_bar(ts[i + 1]))
            t_vec = torch.full((2,), float(ts[i]) * cfg.n_train_steps)
            x2 = torch.tensor(np.concatenate([x, x], axis=0))
            eps2 = unet_t(torch.cat([x2, x2_cond], dim=1), t_vec).numpy()
            eps = eps2[1:] + guidance * (eps2[:1] - eps2[1:])
            x0 = (x - np.float32(np.sqrt(1 - a_now)) * eps) / np.float32(
                np.sqrt(max(a_now, 1e-8))
            )
            x0 = np.clip(x0, -10.0, 10.0)
            x = (np.float32(np.sqrt(a_next)) * x0
                 + np.float32(np.sqrt(1 - a_next)) * eps).astype(np.float32)
        sr_mel_t = vae_t.decode(torch.tensor(x)).numpy()[:, 0]  # [b, T, F]
        audio_t = voc_t(
            torch.tensor(sr_mel_t.transpose(0, 2, 1))          # [b, F, T]
        ).numpy()[:, 0, : audio.shape[1]]

    # elementwise agreement (accumulated float drift across 4 DDIM steps)
    scale = np.abs(audio_t).max() + 1e-9
    assert np.max(np.abs(audio_j - audio_t)) / scale < 5e-3

    d_peak = abs(_dbfs_peak(audio_j) - _dbfs_peak(audio_t))
    d_rms = abs(_dbfs_rms(audio_j) - _dbfs_rms(audio_t))
    print(f"dBFS delta: peak {d_peak:.5f} dB, rms {d_rms:.5f} dB")
    assert d_peak < 0.1 and d_rms < 0.1
