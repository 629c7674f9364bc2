"""Speech-token → waveform stage (flow + HiFT), CosyVoice2/S3Gen shape.

Both the reference's CosyVoice engine and Chatterbox's S3Gen stage
(ref: tts_backends/cosyvoice_runner.py:67-76,
tts_backends/chatterbox_impl.py:63-73) turn LM speech tokens into audio
with the same published two-part network:

1. **flow** (CausalMaskedDiffWithXvec): token embedding → upsample
   conformer encoder (×2 to mel rate) → linear proj to mel dims = the
   CFM conditioning ``mu``; the x-vector is L2-normalized and affine-
   projected to mel dims as ``spks``; an optional prompt mel rides in
   ``cond``; the CFM U-Net ODE produces mel.
2. **hift**: NSF-HiFiGAN with ISTFT head → waveform.

This module assembles those pieces (models/common/{conformer,cfm,hift})
into one config + param bundle whose tree the full-stage converter
(convert/token2wav.py) fills from published ``flow.*``/``mel2wav.*``
state dicts. All stages are jit-friendly and channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.cfm import (
    CFMDecoderConfig,
    cfm_generate,
    init_cfm_estimator,
)
from vocalie_tts_tpu.models.common.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    init_conformer_encoder,
)
from vocalie_tts_tpu.models.common.hift import HiFTConfig, apply_hift, init_hift
from vocalie_tts_tpu.models.common.unet2d import dense, dense_init

Params = Dict[str, Any]

#: published CosyVoice2/S3Gen HiFT shape: 8·5·3 upsampling over an
#: ISTFT hop of 4 → mel hop 480 at 24 kHz (50 mel fps, 25 token Hz)
PUBLISHED_HIFT = HiFTConfig(
    upsample_rates=(8, 5, 3),
    upsample_kernels=(16, 11, 7),
    source_resblock_kernels=(7, 7, 11),
    source_resblock_dilations=((1, 3, 5),) * 3,
)


@dataclasses.dataclass(frozen=True)
class TokenToWavConfig:
    speech_vocab: int = 6561        # FSQ speech-token codebook
    spk_dim: int = 192              # x-vector dims
    n_mels: int = 80
    encoder: ConformerEncoderConfig = ConformerEncoderConfig()
    decoder: CFMDecoderConfig = CFMDecoderConfig()
    hift: HiFTConfig = PUBLISHED_HIFT

    @property
    def token_mel_ratio(self) -> int:
        return self.encoder.upsample_stride

    @property
    def samples_per_token(self) -> int:
        return self.token_mel_ratio * self.hift.hop


def tiny_token2wav_config(speech_vocab: int) -> TokenToWavConfig:
    """Test-scale config (32 samples/token) used by the tiny engines."""
    return TokenToWavConfig(
        speech_vocab=speech_vocab,
        spk_dim=192,
        n_mels=8,
        encoder=ConformerEncoderConfig(
            input_size=16, output_size=16, attention_heads=2, linear_units=32,
            num_blocks=1, num_up_blocks=1,
        ),
        decoder=CFMDecoderConfig(
            in_channels=32, out_channels=8, channels=(16,), attention_head_dim=8,
            n_blocks=1, num_mid_blocks=1, num_heads=2, n_timesteps=2,
        ),
        hift=HiFTConfig(
            in_channels=8, base_channels=32, nb_harmonics=3,
            upsample_rates=(2, 2), upsample_kernels=(4, 4),
            f0_cond_channels=16, f0_layers=2,
        ),
    )


def t2w_scale_configs(speech_vocab: int) -> Dict[str, TokenToWavConfig]:
    """Per-scale token→wav stages shared by the CosyVoice and Chatterbox
    families. "full" is the published shape (speech_vocab 6561 is a
    superset of every family's LM token range, so real checkpoints load
    into the same template); smaller scales shrink every stage."""
    return {
        "full": TokenToWavConfig(
            encoder=ConformerEncoderConfig(dtype=jnp.bfloat16),
            decoder=CFMDecoderConfig(dtype=jnp.bfloat16),
            hift=dataclasses.replace(PUBLISHED_HIFT, dtype=jnp.bfloat16),
        ),
        "small": TokenToWavConfig(
            speech_vocab=speech_vocab,
            encoder=ConformerEncoderConfig(
                input_size=256, output_size=256, attention_heads=4,
                linear_units=1024, num_blocks=3, num_up_blocks=2,
            ),
            decoder=CFMDecoderConfig(
                in_channels=320, out_channels=80, channels=(128,), n_blocks=2,
                num_mid_blocks=6, num_heads=4,
            ),
            hift=dataclasses.replace(PUBLISHED_HIFT, base_channels=128),
        ),
        "tiny": tiny_token2wav_config(speech_vocab),
    }


def init_token2wav(key: jax.Array, cfg: TokenToWavConfig) -> Params:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "input_embedding": (
            jax.random.normal(k1, (cfg.speech_vocab, cfg.encoder.input_size), jnp.float32)
            * 0.02
        ),
        "spk_embed_affine": dense_init(k2, cfg.spk_dim, cfg.n_mels),
        "encoder": init_conformer_encoder(k3, cfg.encoder),
        "encoder_proj": dense_init(k4, cfg.encoder.output_size, cfg.n_mels),
        "estimator": init_cfm_estimator(k5, cfg.decoder),
        "hift": init_hift(k6, cfg.hift),
    }


def token2mel(
    p: Params,
    cfg: TokenToWavConfig,
    tokens: jax.Array,       # [b, n] speech-token ids
    token_mask: jax.Array,   # [b, n] 1.0 valid
    spk_emb: jax.Array,      # [b, spk_dim] x-vector
    rng: jax.Array,
    prompt_feat: Optional[jax.Array] = None,  # [b, p_mel, n_mels] prompt mel
) -> Tuple[jax.Array, jax.Array]:
    """Flow inference → (mel [b, n·ratio, n_mels], mel_mask [b, n·ratio, 1]).

    Mirrors the published flow.inference: normalized x-vector → affine;
    clamped token embedding → conformer (×ratio) → proj = mu; prompt mel
    (zero-shot continuation) rides in ``cond`` and stays in the output
    frame count (callers crop the prompt region)."""
    spk = spk_emb / jnp.maximum(jnp.linalg.norm(spk_emb, axis=-1, keepdims=True), 1e-8)
    spk = dense(p["spk_embed_affine"], spk.astype(jnp.float32))

    tok = jnp.clip(tokens, 0, cfg.speech_vocab - 1)
    h = p["input_embedding"][tok] * token_mask[..., None]
    h = apply_conformer_encoder(p["encoder"], cfg.encoder, h, token_mask[..., None])
    mu = dense(p["encoder_proj"], h)  # [b, n·ratio, n_mels]

    mel_mask = jnp.repeat(token_mask[..., None], cfg.token_mel_ratio, axis=1)
    cond = jnp.zeros_like(mu)
    if prompt_feat is not None:
        cond = cond.at[:, : prompt_feat.shape[1], :].set(prompt_feat.astype(cond.dtype))
    mel = cfm_generate(
        p["estimator"], cfg.decoder, rng, mu, mel_mask, spks=spk, cond=cond
    )
    return mel, mel_mask


def mel2wav(
    p: Params,
    cfg: TokenToWavConfig,
    mel: jax.Array,                    # [b, frames, n_mels]
    rng: Optional[jax.Array] = None,   # NSF noise; None → deterministic
) -> jax.Array:
    return apply_hift(p["hift"], cfg.hift, mel, rng)


def token2wav(
    p: Params,
    cfg: TokenToWavConfig,
    tokens: jax.Array,
    token_mask: jax.Array,
    spk_emb: jax.Array,
    rng: jax.Array,
) -> jax.Array:
    """tokens → waveform [b, n · samples_per_token]."""
    r1, r2 = jax.random.split(rng)
    mel, _ = token2mel(p, cfg, tokens, token_mask, spk_emb, r1)
    return mel2wav(p, cfg, mel, r2)


__all__ = [
    "TokenToWavConfig",
    "PUBLISHED_HIFT",
    "tiny_token2wav_config",
    "t2w_scale_configs",
    "init_token2wav",
    "token2mel",
    "mel2wav",
    "token2wav",
]
