"""Qwen3-TTS-class model graph (LLM-TTS, ~1.7B).

Mirrors the capability surface of the reference's Qwen3 runner (ref:
tts_backends/qwen3_runner.py): one LM, three conditioning modes —
custom_voice (named speaker), voice_design (instruction text), and
voice_clone (x-vector from reference audio, with optional transcript).

Architecture: decoder-only LM over the codec-token vocabulary with a
separate text embedding table (published mixed [text ‖ codec] tables
split at conversion time), emitting 12.5 Hz codec tokens;
a codec decoder upsamples ×8 to 100 fps mel and a HiFi-GAN (hop 240)
renders 24 kHz audio. The reference had to run this model in fp16 to
fit small containers (ref: qwen3_runner.py:66-68); here the LM is
bfloat16 — the TPU-native matmul type.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

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

# LM-core vocabulary: codec-only. Text lives in a separate
# ``text_emb`` table sized by cfg.text_vocab (byte frontend by
# default; the checkpoint's published tokenizer vocabulary after
# convert-hf — published Qwen-style checkpoints ship one mixed
# [text ‖ codec] embedding that the converter splits, see
# convert/import_checkpoint.import_hf_checkpoint).
CODEC_VOCAB = 2048
BOS_AUDIO = CODEC_VOCAB                         # 2048
EOS_AUDIO = BOS_AUDIO + 1                       # 2049
VOCAB = EOS_AUDIO + 1                           # 2050

TOKENS_PER_SECOND = 12.5
SPEAKERS = (
    "Vivian", "Serena", "Uncle_Fu", "Dylan", "Eric", "Ryan",
    "Aiden", "Ono_Anna", "Sohee",
)


@dataclasses.dataclass(frozen=True)
class LMTTSConfig:
    d_model: int = 2048
    n_layers: int = 28
    n_heads: int = 16
    n_kv_heads: int = 8
    d_ff: int = 8192
    max_seq_len: int = 2048
    #: text embedding rows (byte frontend by default; a converted
    #: checkpoint's published tokenizer vocabulary otherwise)
    text_vocab: int = BYTE_VOCAB_SIZE
    #: codec-token codebook size (converted checkpoints bring theirs)
    codec_vocab: int = CODEC_VOCAB
    speaker_dim: int = 256
    sample_rate: int = 24000
    n_mels: int = 80
    token_upsample: int = 8        # 12.5 Hz → 100 fps mel
    kv_quant: bool = False
    #: experimental Pallas decode attention (ops/decode_attention)
    decode_kernel: bool = False
    #: int8-native Pallas dense/MLP decode kernels (ops/decode_dense)
    dense_kernel: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def bos_audio(self) -> int:
        return self.codec_vocab

    @property
    def eos_audio(self) -> int:
        return self.codec_vocab + 1

    @property
    def lm(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.codec_vocab + 2,
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
            # Qwen3 backbone: per-head q/k RMSNorm, eps 1e-6 — real
            # checkpoints convert via convert_hf_decoder_state
            qk_norm=True,
            norm_eps=1e-6,
            dtype=self.dtype,
        )

    @property
    def vocoder(self) -> VocoderConfig:
        # hop 240 @ 24 kHz → 100 fps mel
        return VocoderConfig(
            n_mels=self.n_mels,
            base_channels=512,
            upsample_rates=(8, 6, 5),
            upsample_kernels=(16, 12, 10),
            dtype=jnp.float32,
        )

    @property
    def speaker(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=self.speaker_dim)


def _dense(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_lmtts(key: jax.Array, cfg: LMTTSConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "lm": init_transformer(k1, cfg.lm),
        # separate text embedding (codec-only LM core; published mixed
        # tables split into these two at conversion time)
        "text_emb": (
            jax.random.normal(jax.random.fold_in(key, 5),
                              (cfg.text_vocab, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "speaker_table": (
            jax.random.normal(k2, (len(SPEAKERS), cfg.speaker_dim), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "spk_cond": _dense(k3, cfg.speaker_dim, cfg.d_model, cfg.dtype),
        "lang_cond": _dense(k4, 16, cfg.d_model, cfg.dtype),
    }


def init_codec_decoder(key: jax.Array, cfg: LMTTSConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ch = 512
    return {
        "tok_emb": jax.random.normal(k1, (cfg.codec_vocab + 2, ch), jnp.float32) * 0.02,
        "up1": conv1d_init(k2, 8, ch, ch, jnp.float32),   # ×4
        "up2": conv1d_init(k3, 4, ch, ch, jnp.float32),   # ×2
        "mel_out": conv1d_init(k4, 5, ch, cfg.n_mels, jnp.float32),
        "vocoder": init_vocoder(k5, cfg.vocoder),
        "speaker": init_speaker_encoder(jax.random.fold_in(key, 9), cfg.speaker),
    }


LANGS = (
    "Auto", "Chinese", "English", "Japanese", "Korean", "German",
    "French", "Russian", "Portuguese", "Spanish", "Italian",
)


def lang_one_hot(language: str) -> jnp.ndarray:
    idx = LANGS.index(language) if language in LANGS else 0
    return jax.nn.one_hot(jnp.asarray(idx), 16, dtype=jnp.float32)


def build_prompt_embeds(
    params: Params,
    cfg: LMTTSConfig,
    text_tokens: jax.Array,     # [b, L] byte ids (instruct ‖ SEP ‖ text)
    spk_emb: jax.Array,         # [b, speaker_dim]
    lang_vec: jax.Array,        # [b, 16]
) -> jax.Array:
    """[spk slot, lang slot, text..., BOS_audio] embeddings."""
    lm = params["lm"]
    text_emb = params["text_emb"][text_tokens]
    spk_slot = jnp.dot(spk_emb.astype(text_emb.dtype), params["spk_cond"])[:, None, :]
    lang_slot = jnp.dot(lang_vec.astype(text_emb.dtype), params["lang_cond"])[:, None, :]
    bos = lm["tok_emb"][jnp.full((text_tokens.shape[0], 1), cfg.bos_audio)]
    return jnp.concatenate([spk_slot, lang_slot, text_emb, bos], axis=1)


def codec_logit_bias(cfg: Optional[LMTTSConfig] = None) -> jax.Array:
    """Restrict sampling to codec tokens + EOS (mask BOS)."""
    cv = cfg.codec_vocab if cfg is not None else CODEC_VOCAB
    bias = jnp.full((cv + 2,), -1e30, jnp.float32)
    bias = bias.at[:cv].set(0.0)
    bias = bias.at[cv + 1].set(0.0)  # EOS
    return bias


def tokens_to_mel(
    dec: Params,
    cfg: LMTTSConfig,
    codec_tokens: jax.Array,   # [b, n] in [0, CODEC_VOCAB)
    token_mask: jax.Array,
) -> jax.Array:
    """Codec decoder stage: 12.5 Hz tokens → 100 fps mel (×8)."""
    x = dec["tok_emb"][codec_tokens] * token_mask[..., None]
    x = leaky_relu(conv1d_transpose(dec["up1"], x, stride=4))
    x = leaky_relu(conv1d_transpose(dec["up2"], x, stride=2))
    return conv1d(dec["mel_out"], x)


def tokens_to_audio(
    dec: Params,
    cfg: LMTTSConfig,
    codec_tokens: jax.Array,   # [b, n] in [0, CODEC_VOCAB)
    token_mask: jax.Array,
) -> jax.Array:
    mel = tokens_to_mel(dec, cfg, codec_tokens, token_mask)
    return apply_vocoder(dec["vocoder"], cfg.vocoder, mel)


__all__ = [
    "LMTTSConfig",
    "CODEC_VOCAB",
    "BOS_AUDIO",
    "EOS_AUDIO",
    "VOCAB",
    "TOKENS_PER_SECOND",
    "SPEAKERS",
    "LANGS",
    "init_lmtts",
    "init_codec_decoder",
    "lang_one_hot",
    "build_prompt_embeds",
    "codec_logit_bias",
    "tokens_to_mel",
    "tokens_to_audio",
]
