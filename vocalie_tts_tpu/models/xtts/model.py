"""XTTS-v2-class model graph (~0.4B GPT + HiFi-GAN).

BASELINE config #2 names this engine ("XTTS-v2 French voice clone
from a Ref_audio/ sample"). Structure: a GPT-style decoder over
[conditioning latents from reference mel | byte text | VQ speech
latents] emitting ~21.5 Hz VQ codes; a speaker-conditioned HiFi-GAN
renders 24 kHz audio from upsampled code embeddings.
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

# The real checkpoint's mel-code space (ref: SURVEY §2.4 XTTS mandate):
# 1024 VQ codes + start (1024) + stop (1025). The LM core operates
# directly in this space; text enters only through inputs_embeds from a
# separate text embedding table (the published layout).
VQ_VOCAB = 1024
VQ_BASE = 0
BOS_VQ = 1024
EOS_VQ = 1025
VOCAB = 1026
#: the published text-BPE vocabulary size; our byte frontend uses the
#: first BYTE_VOCAB_SIZE rows unless a real tokenizer.json is supplied
TEXT_VOCAB = 6681

TOKENS_PER_SECOND = 24000 / 256 / 4      # ≈21.5-class rate (23.4 here)
N_COND_LATENTS = 32                       # conditioning prefix length


@dataclasses.dataclass(frozen=True)
class XTTSConfig:
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 4096
    max_seq_len: int = 2048
    text_vocab: int = TEXT_VOCAB
    text_pos_len: int = 404              # published text position table
    mel_pos_len: int = 608               # published mel position table
    speaker_dim: int = 512
    sample_rate: int = 24000
    n_mels: int = 80
    token_upsample: int = 4
    kv_quant: bool = False
    #: experimental Pallas decode attention (ops/decode_attention)
    decode_kernel: bool = False
    #: int8-native Pallas dense/MLP decode kernels (ops/decode_dense)
    dense_kernel: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def lm(self) -> TransformerConfig:
        # GPT-2 variant: biased LayerNorm, gelu MLP, learned positions
        # indexed decode-relative (mel position = n_decoded + 1; the
        # prompt carries its own text/mel-BOS position embeddings)
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
            dense_kernel=self.dense_kernel,
            norm_type="layer",
            mlp_type="gelu",
            bias=True,
            attn_bias=True,
            pos_type="learned",
            pos_index="decode_relative",
            pos_len=self.mel_pos_len,
            head_bias=True,
            dtype=self.dtype,
        )

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(n_mels=self.n_mels, base_channels=512, dtype=jnp.float32)

    @property
    def speaker(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=self.speaker_dim)


def _dense(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_xtts(key: jax.Array, cfg: XTTSConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "lm": init_transformer(k1, cfg.lm),
        # text enters only through inputs_embeds (published layout:
        # separate text embedding + text position tables)
        "text_emb": (
            jax.random.normal(k4, (cfg.text_vocab, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "text_pos": (
            jax.random.normal(k5, (cfg.text_pos_len, cfg.d_model), jnp.float32) * 0.01
        ).astype(cfg.dtype),
        # speaker embedding → N_COND_LATENTS learned conditioning latents
        "cond_proj": _dense(k2, cfg.speaker_dim, N_COND_LATENTS * cfg.d_model, cfg.dtype),
        "cond_bias": (
            jax.random.normal(k3, (N_COND_LATENTS, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
    }


def init_vq_decoder(key: jax.Array, cfg: XTTSConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ch = 512
    return {
        "tok_emb": jax.random.normal(k1, (VQ_VOCAB + 2, ch), jnp.float32) * 0.02,
        "up": conv1d_init(k2, 8, ch, ch, jnp.float32),
        "spk_mod": _dense(k3, cfg.speaker_dim, ch, jnp.float32),
        "mel_out": conv1d_init(k4, 5, ch, cfg.n_mels, jnp.float32),
        "vocoder": init_vocoder(k5, cfg.vocoder),
        "speaker": init_speaker_encoder(jax.random.fold_in(key, 3), cfg.speaker),
    }


def build_prompt_embeds(
    params: Params,
    cfg: XTTSConfig,
    text_tokens: jax.Array,  # [b, L]
    spk_emb: jax.Array,      # [b, speaker_dim]
) -> jax.Array:
    """[cond latents ×32, text+text_pos..., BOS_mel+mel_pos0].

    Positions are the caller's job for learned-position prompts: text
    tokens carry the text position table, the mel BOS carries mel
    position 0; the core adds mel positions n_decoded+1 per step."""
    lm = params["lm"]
    b, L = text_tokens.shape
    text = params["text_emb"][text_tokens]
    text = text + params["text_pos"][jnp.arange(L) % cfg.text_pos_len][None].astype(text.dtype)
    cond = jnp.dot(spk_emb.astype(text.dtype), params["cond_proj"])
    cond = cond.reshape(b, N_COND_LATENTS, cfg.d_model) + params["cond_bias"][None]
    bos = lm["tok_emb"][jnp.full((b, 1), BOS_VQ)] + lm["pos_emb"][0][None, None].astype(text.dtype)
    return jnp.concatenate([cond, text, bos], axis=1)


def build_prompt_embeds_from_latents(
    params: Params,
    cfg: XTTSConfig,
    text_tokens: jax.Array,   # [b, L]
    cond_latents: jax.Array,  # [b, N_COND_LATENTS, d_model] — published path
) -> jax.Array:
    """Published-checkpoint prompt: the 32 conditioning latents come
    from the reference audio via ConditioningEncoder+Perceiver
    (models/xtts/conditioning.py), not from a speaker vector."""
    lm = params["lm"]
    b, L = text_tokens.shape
    text = params["text_emb"][text_tokens]
    text = text + params["text_pos"][jnp.arange(L) % cfg.text_pos_len][None].astype(text.dtype)
    bos = lm["tok_emb"][jnp.full((b, 1), BOS_VQ)] + lm["pos_emb"][0][None, None].astype(text.dtype)
    return jnp.concatenate([cond_latents.astype(text.dtype), text, bos], axis=1)


def vq_logit_bias() -> jax.Array:
    bias = jnp.full((VOCAB,), -1e30, jnp.float32)
    bias = bias.at[VQ_BASE : VQ_BASE + VQ_VOCAB].set(0.0)
    bias = bias.at[EOS_VQ].set(0.0)
    return bias


def tokens_to_audio(
    dec: Params,
    cfg: XTTSConfig,
    vq_tokens: jax.Array,
    token_mask: jax.Array,
    spk_emb: jax.Array,  # [b, speaker_dim] — timbre modulation
) -> jax.Array:
    x = dec["tok_emb"][vq_tokens] * token_mask[..., None]
    x = leaky_relu(conv1d_transpose(dec["up"], x, stride=cfg.token_upsample))
    x = x * (1.0 + jnp.dot(spk_emb, dec["spk_mod"]))[:, None, :]
    mel = conv1d(dec["mel_out"], x)
    return apply_vocoder(dec["vocoder"], cfg.vocoder, mel)


__all__ = [
    "XTTSConfig",
    "VQ_VOCAB",
    "VQ_BASE",
    "BOS_VQ",
    "EOS_VQ",
    "VOCAB",
    "N_COND_LATENTS",
    "TOKENS_PER_SECOND",
    "init_xtts",
    "init_vq_decoder",
    "build_prompt_embeds",
    "build_prompt_embeds_from_latents",
    "vq_logit_bias",
    "tokens_to_audio",
]
