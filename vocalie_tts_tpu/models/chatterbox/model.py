"""Chatterbox-class model graph.

Two stages, mirroring the reference engine's structure (ref:
tts_backends/chatterbox_impl.py — T3 text→speech-token model + S3Gen
token→waveform decoder, 24 kHz):

1. **T3**: decoder-only transformer over a mixed vocabulary
   [byte text tokens | speech tokens | control]. The prompt is
   [speaker-cond slot, exaggeration-cond slot, text..., BOS_speech];
   decode emits speech tokens at ~23.4 Hz with classifier-free
   guidance (uncond = zeroed conditioning slots, same cache batch).
   The FR fine-tune is a weight overlay on this stage only
   (ref: chatterbox_impl.py:63-73).

2. **Token decoder (S3Gen-class)**: speech tokens → embedding →
   ×4 transposed-conv upsample → 80-mel frames at 93.75 fps →
   HiFi-GAN to 24 kHz (hop 256).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    conv1d_transpose,
    leaky_relu,
)
from vocalie_tts_tpu.models.common.speaker import (
    SpeakerEncoderConfig,
    init_speaker_encoder,
)
from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    init_params as init_transformer,
)
from vocalie_tts_tpu.models.common.vocoder import (
    VocoderConfig,
    apply_vocoder,
    init_vocoder,
)
from vocalie_tts_tpu.text.phonemes import BYTE_VOCAB_SIZE

Params = Dict[str, Any]

SPEECH_VOCAB = 1024
TEXT_BASE = 0                      # byte tokens [0, 260)
SPEECH_BASE = BYTE_VOCAB_SIZE      # speech tokens [260, 1284)
BOS_SPEECH = SPEECH_BASE + SPEECH_VOCAB        # 1284
EOS_SPEECH = BOS_SPEECH + 1                    # 1285
COND_SLOT = EOS_SPEECH + 1                     # 1286 (embedding overridden)
VOCAB = COND_SLOT + 1                          # 1287

TOKENS_PER_SECOND = 24000 / 256 / 4  # 23.4375 — mel fps / upsample


@dataclasses.dataclass(frozen=True)
class T3Config:
    d_model: int = 1024
    n_layers: int = 30
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 4096
    max_seq_len: int = 2048
    speaker_dim: int = 256
    sample_rate: int = 24000
    n_mels: int = 80
    token_upsample: int = 4
    kv_quant: bool = False
    #: experimental Pallas decode attention (ops/decode_attention)
    decode_kernel: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def lm(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=VOCAB,
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            n_kv_heads=self.n_kv_heads,
            d_head=self.d_model // self.n_heads,
            d_ff=self.d_ff,
            max_seq_len=self.max_seq_len,
            kv_quant=self.kv_quant,
            decode_kernel=self.decode_kernel,
            dtype=self.dtype,
        )

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(
            n_mels=self.n_mels,
            base_channels=512,
            upsample_rates=(8, 8, 2, 2),
            upsample_kernels=(16, 16, 4, 4),
            dtype=jnp.float32,
        )

    @property
    def speaker(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=self.speaker_dim)


def _dense(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_t3(key: jax.Array, cfg: T3Config) -> Params:
    """Stage-1 params (the part the FR fine-tune overlays)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lm": init_transformer(k1, cfg.lm),
        "spk_cond": _dense(k2, cfg.speaker_dim, cfg.d_model, cfg.dtype),
        # exaggeration scalar → conditioning vector
        "exag_cond": _dense(k3, 1, cfg.d_model, cfg.dtype),
    }


def init_token_decoder(key: jax.Array, cfg: T3Config) -> Params:
    """Stage-2 params: tokens → mel → waveform."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    up_ch = 512
    return {
        "tok_emb": (
            jax.random.normal(k1, (SPEECH_VOCAB + 2, up_ch), jnp.float32) * 0.02
        ),
        "up": conv1d_init(k2, 8, up_ch, up_ch, jnp.float32),
        "post1": conv1d_init(k3, 5, up_ch, up_ch, jnp.float32),
        "mel_out": conv1d_init(k4, 5, up_ch, cfg.n_mels, jnp.float32),
        "vocoder": init_vocoder(k5, cfg.vocoder),
        "speaker": init_speaker_encoder(jax.random.fold_in(key, 7), cfg.speaker),
    }


def build_prompt_embeds(
    t3: Params,
    cfg: T3Config,
    text_tokens: jax.Array,   # [b, text_len] byte ids (padded with 0)
    spk_emb: jax.Array,       # [b, speaker_dim] (zeros → unconditioned)
    exaggeration: jax.Array,  # [b] scalar
) -> jax.Array:
    """[b, 2 + text_len + 1, d_model] prompt embeddings:
    [spk slot, exag slot, text..., BOS_speech]."""
    lm = t3["lm"]
    text_emb = lm["tok_emb"][text_tokens]
    spk_slot = jnp.dot(spk_emb.astype(text_emb.dtype), t3["spk_cond"])[:, None, :]
    exag_slot = jnp.dot(
        exaggeration[:, None].astype(text_emb.dtype), t3["exag_cond"]
    )[:, None, :]
    bos = lm["tok_emb"][jnp.full((text_tokens.shape[0], 1), BOS_SPEECH)]
    return jnp.concatenate([spk_slot, exag_slot, text_emb, bos], axis=1)


def speech_logit_bias() -> jax.Array:
    """Additive bias restricting sampling to speech tokens + EOS."""
    bias = jnp.full((VOCAB,), -1e30, jnp.float32)
    bias = bias.at[SPEECH_BASE : SPEECH_BASE + SPEECH_VOCAB].set(0.0)
    bias = bias.at[EOS_SPEECH].set(0.0)
    return bias


def tokens_to_audio(
    dec: Params,
    cfg: T3Config,
    speech_tokens: jax.Array,  # [b, n_tok] values in [0, SPEECH_VOCAB)
    token_mask: jax.Array,     # [b, n_tok] 1.0 for valid
) -> jax.Array:
    """Stage 2: speech tokens → waveform [b, n_tok * 4 * 256]."""
    x = dec["tok_emb"][speech_tokens] * token_mask[..., None]
    x = conv1d_transpose(dec["up"], x, stride=cfg.token_upsample)
    x = leaky_relu(x)
    x = leaky_relu(conv1d(dec["post1"], x))
    mel = conv1d(dec["mel_out"], x)
    return apply_vocoder(dec["vocoder"], cfg.vocoder, mel)


__all__ = [
    "T3Config",
    "SPEECH_VOCAB",
    "SPEECH_BASE",
    "BOS_SPEECH",
    "EOS_SPEECH",
    "VOCAB",
    "TOKENS_PER_SECOND",
    "init_t3",
    "init_token_decoder",
    "build_prompt_embeds",
    "speech_logit_bias",
    "tokens_to_audio",
]
