"""Chatterbox-class model graph.

Two stages, mirroring the reference engine's structure (ref:
tts_backends/chatterbox_impl.py — T3 text→speech-token model + S3Gen
token→waveform decoder, 24 kHz):

1. **T3**: decoder-only transformer over the speech-token vocabulary,
   with a SEPARATE text embedding table (the published T3 layout:
   text_emb / speech_emb, text reaching the LM only through
   inputs_embeds). The prompt is
   [speaker-cond slot, exaggeration-cond slot, text..., BOS_speech];
   decode emits speech tokens at 25 Hz with classifier-free
   guidance (uncond = zeroed conditioning slots, same cache batch).
   The FR fine-tune is a weight overlay on this stage only
   (ref: chatterbox_impl.py:63-73).

2. **S3Gen (token→wav)**: the published flow + HiFT stage
   (models/common/token2wav — upsample-conformer flow encoder,
   CFM U-Net conditioned on a 192-dim x-vector, NSF/ISTFT HiFT
   generator). Real ``s3gen`` checkpoints (``flow.*`` + ``mel2wav.*``)
   import directly via convert/token2wav.py. Two speaker nets mirror
   the published split: the T3 voice-encoder conditioning (256-dim)
   and S3Gen's x-vector (192-dim).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.speaker import (
    SpeakerEncoderConfig,
    init_speaker_encoder,
)
from vocalie_tts_tpu.models.common.token2wav import (
    TokenToWavConfig,
    init_token2wav,
    t2w_scale_configs,
    token2wav,
)
from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    init_params as init_transformer,
)
from vocalie_tts_tpu.text.phonemes import BYTE_VOCAB_SIZE

Params = Dict[str, Any]

# LM-core vocabulary: speech-only, the published T3 layout (separate
# text_emb/speech_emb tables + speech head, text entering only through
# inputs_embeds — ref: chatterbox_impl.py:63-73 t3_cfg.safetensors
# structure). Text ids index the ``text_emb`` table sized by
# cfg.text_vocab (260-byte frontend by default; the checkpoint's
# published tokenizer vocabulary after convert-hf). The speech space is
# cfg.speech_vocab (dev default 1024; converted checkpoints bring their
# own — e.g. the 6561-code FSQ family) with BOS/EOS appended: core ids
# are [speech… , BOS, EOS]. Module constants below are the dev-default
# values; runtime paths derive them from cfg.
SPEECH_VOCAB = 1024
BOS_SPEECH = SPEECH_VOCAB                      # 1024
EOS_SPEECH = BOS_SPEECH + 1                    # 1025
VOCAB = EOS_SPEECH + 1                         # 1026

#: S3 speech tokens run at 25 Hz (mel hop 480 at 24 kHz, ratio 2)
TOKENS_PER_SECOND = 25.0

#: S3Gen x-vector dims (the published spk_embed_affine input)
XVECTOR_DIM = 192

_T2W_SCALES: Dict[str, TokenToWavConfig] = t2w_scale_configs(SPEECH_VOCAB)


@dataclasses.dataclass(frozen=True)
class T3Config:
    d_model: int = 1024
    n_layers: int = 30
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 4096
    max_seq_len: int = 2048
    #: text embedding rows (byte frontend by default; a converted
    #: checkpoint's published tokenizer vocabulary otherwise)
    text_vocab: int = BYTE_VOCAB_SIZE
    #: speech-token codebook size (converted checkpoints bring theirs)
    speech_vocab: int = SPEECH_VOCAB
    speaker_dim: int = 256          # T3 voice-encoder conditioning dims
    sample_rate: int = 24000
    t2w_scale: str = "full"
    kv_quant: bool = False
    #: experimental Pallas decode attention (ops/decode_attention)
    decode_kernel: bool = False
    #: int8-native Pallas dense/MLP decode kernels (ops/decode_dense)
    dense_kernel: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def bos_speech(self) -> int:
        return self.speech_vocab

    @property
    def eos_speech(self) -> int:
        return self.speech_vocab + 1

    @property
    def lm(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.speech_vocab + 2,
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
            dtype=self.dtype,
        )

    @property
    def t2w(self) -> TokenToWavConfig:
        if self.speech_vocab == SPEECH_VOCAB:
            return _T2W_SCALES[self.t2w_scale]
        return t2w_scale_configs(self.speech_vocab)[self.t2w_scale]

    @property
    def samples_per_token(self) -> int:
        return self.t2w.samples_per_token

    @property
    def speaker(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=self.speaker_dim)

    @property
    def xvector(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=XVECTOR_DIM)


def _dense(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_t3(key: jax.Array, cfg: T3Config) -> Params:
    """Stage-1 params (the part the FR fine-tune overlays)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "lm": init_transformer(k1, cfg.lm),
        # separate text embedding (published T3 layout; rows = the text
        # tokenizer's id space — bytes or the staged tokenizer.json)
        "text_emb": (
            jax.random.normal(k4, (cfg.text_vocab, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "spk_cond": _dense(k2, cfg.speaker_dim, cfg.d_model, cfg.dtype),
        # exaggeration scalar → conditioning vector
        "exag_cond": _dense(k3, 1, cfg.d_model, cfg.dtype),
    }


def init_token_decoder(key: jax.Array, cfg: T3Config) -> Params:
    """Stage-2 params: flow+HiFT bundle + both speaker nets."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "t2w": init_token2wav(k1, cfg.t2w),
        "speaker": init_speaker_encoder(k2, cfg.speaker),    # T3 ve (256)
        "xvector": init_speaker_encoder(k3, cfg.xvector),    # S3Gen (192)
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
    text_emb = t3["text_emb"][text_tokens]
    spk_slot = jnp.dot(spk_emb.astype(text_emb.dtype), t3["spk_cond"])[:, None, :]
    exag_slot = jnp.dot(
        exaggeration[:, None].astype(text_emb.dtype), t3["exag_cond"]
    )[:, None, :]
    bos = lm["tok_emb"][jnp.full((text_tokens.shape[0], 1), cfg.bos_speech)]
    return jnp.concatenate([spk_slot, exag_slot, text_emb, bos], axis=1)


def speech_logit_bias(cfg: Optional[T3Config] = None) -> jax.Array:
    """Additive bias restricting sampling to speech tokens + EOS
    (masks BOS in the speech-only core vocabulary)."""
    sv = cfg.speech_vocab if cfg is not None else SPEECH_VOCAB
    bias = jnp.full((sv + 2,), -1e30, jnp.float32)
    bias = bias.at[:sv].set(0.0)
    bias = bias.at[sv + 1].set(0.0)  # EOS
    return bias


def tokens_to_audio(
    dec: Params,
    cfg: T3Config,
    speech_tokens: jax.Array,  # [b, n_tok] values in [0, SPEECH_VOCAB)
    token_mask: jax.Array,     # [b, n_tok] 1.0 for valid
    xvec_emb: Optional[jax.Array] = None,  # [b, XVECTOR_DIM]
    rng: Optional[jax.Array] = None,       # CFM/NSF noise
) -> jax.Array:
    """Stage 2 (S3Gen): speech tokens → waveform
    [b, n_tok · samples_per_token]."""
    if xvec_emb is None:
        xvec_emb = jnp.zeros((speech_tokens.shape[0], XVECTOR_DIM), jnp.float32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return token2wav(dec["t2w"], cfg.t2w, speech_tokens, token_mask, xvec_emb, rng)


__all__ = [
    "T3Config",
    "SPEECH_VOCAB",
    "BOS_SPEECH",
    "EOS_SPEECH",
    "VOCAB",
    "TOKENS_PER_SECOND",
    "XVECTOR_DIM",
    "init_t3",
    "init_token_decoder",
    "build_prompt_embeds",
    "speech_logit_bias",
    "tokens_to_audio",
]
