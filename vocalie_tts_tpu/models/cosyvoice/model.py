"""CosyVoice-class model graph (~0.5B LM + flow + HiFT).

Mirrors the reference engine's three modes (ref:
tts_backends/cosyvoice_runner.py:87-125 — inference_instruct2 /
inference_zero_shot / inference_cross_lingual) and its streaming
capability (150 ms first-packet claim, ref: cosyvoice_backend.py:9).

Pipeline: byte text (+instruction, SEP-joined) → AR LM emits speech
tokens (25 Hz) → the published token→wav stage (models/common/
token2wav): upsample-conformer flow encoder (×2 to 50 mel fps) +
conditional flow-matching U-Net conditioned on the x-vector → HiFT
NSF/ISTFT generator at 24 kHz (mel hop 480). Published CosyVoice2/3
``flow.*``/``hift.*`` checkpoints import directly
(convert/token2wav.py). Streaming runs the same stages over token
windows and flushes audio per window.
"""

from __future__ import annotations

import dataclasses
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
    mel2wav,
    t2w_scale_configs,
    token2mel,
)
from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    init_params as init_transformer,
)
from vocalie_tts_tpu.text.phonemes import BYTE_VOCAB_SIZE

Params = Dict[str, Any]

# LM-core vocabulary: speech-only, mirroring the published CosyVoice
# LM layout (Qwen2 text embedding + separate speech_embedding +
# llm_decoder speech head — ref: cosyvoice_runner.py:67-76 model
# structure). Text ids index the ``text_emb`` table sized by
# cfg.text_vocab; clone prompts splice speech tokens at +text_vocab in
# the PROMPT space (see build_prompt_embeds).
SPEECH_VOCAB = 4096
BOS_SPEECH = SPEECH_VOCAB                      # 4096
EOS_SPEECH = BOS_SPEECH + 1                    # 4097
VOCAB = EOS_SPEECH + 1                         # 4098

#: published CosyVoice2 token rate: 24000 / (mel hop 480) / (ratio 2)
TOKENS_PER_SECOND = 25.0

_T2W_SCALES: Dict[str, TokenToWavConfig] = t2w_scale_configs(SPEECH_VOCAB)


@dataclasses.dataclass(frozen=True)
class CosyVoiceConfig:
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 4096
    max_seq_len: int = 2048
    #: text embedding rows (byte frontend by default; a converted
    #: checkpoint's published tokenizer vocabulary otherwise)
    text_vocab: int = BYTE_VOCAB_SIZE
    #: speech-token codebook size (converted checkpoints bring theirs —
    #: e.g. the published 6561-code FSQ space)
    speech_vocab: int = SPEECH_VOCAB
    speaker_dim: int = 192
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
            # Qwen2 backbone: q/k/v projection biases — real checkpoints
            # convert via convert_hf_decoder_state(attn_bias=True)
            attn_bias=True,
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


def _dense(key, d_in, d_out, dtype=jnp.float32):
    import math

    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_cosyvoice_lm(key: jax.Array, cfg: CosyVoiceConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lm": init_transformer(k1, cfg.lm),
        # separate text embedding (published layout: the Qwen2 backbone's
        # embed_tokens; speech lives in the core tok_emb table)
        "text_emb": (
            jax.random.normal(k3, (cfg.text_vocab, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "spk_cond": _dense(k2, cfg.speaker_dim, cfg.d_model, cfg.dtype),
    }


def init_cfm_decoder(key: jax.Array, cfg: CosyVoiceConfig) -> Params:
    """Stage-2 params: the published flow+HiFT bundle + speaker encoder."""
    k1, k2 = jax.random.split(key)
    return {
        "t2w": init_token2wav(k1, cfg.t2w),
        "speaker": init_speaker_encoder(k2, cfg.speaker),
    }


def speech_logit_bias(cfg: Optional[CosyVoiceConfig] = None) -> jax.Array:
    """Restrict sampling to speech tokens + EOS (mask BOS)."""
    sv = cfg.speech_vocab if cfg is not None else SPEECH_VOCAB
    bias = jnp.full((sv + 2,), -1e30, jnp.float32)
    bias = bias.at[:sv].set(0.0)
    bias = bias.at[sv + 1].set(0.0)  # EOS
    return bias


def build_prompt_embeds(
    params: Params,
    cfg: CosyVoiceConfig,
    text_tokens: jax.Array,   # PROMPT-space ids: text [0, text_vocab),
    spk_emb: jax.Array,       # core (speech/BOS) at +text_vocab
) -> jax.Array:
    """[spk slot, prompt tokens..., BOS_speech].

    Prompt tokens may mix text and speech ids (zero-shot clone splices
    the reference's speech tokens — inference_zero_shot semantics), so
    embedding is a two-table gather over [text_emb ‖ core tok_emb]."""
    from vocalie_tts_tpu.models.common.ar_runtime import embed_mixed_prompt

    lm = params["lm"]
    text_emb = embed_mixed_prompt(
        params["text_emb"], lm["tok_emb"], text_tokens, cfg.text_vocab
    )
    spk_slot = jnp.dot(spk_emb.astype(text_emb.dtype), params["spk_cond"])[:, None, :]
    bos = lm["tok_emb"][jnp.full((text_tokens.shape[0], 1), cfg.bos_speech)].astype(
        text_emb.dtype
    )
    return jnp.concatenate([spk_slot, text_emb, bos], axis=1)


def tokens_to_mel(
    dec: Params,
    cfg: CosyVoiceConfig,
    speech_tokens: jax.Array,  # [b, n] in [0, SPEECH_VOCAB)
    token_mask: jax.Array,
    spk_emb: jax.Array,        # [b, speaker_dim]
    rng: jax.Array,
    prompt_feat: Optional[jax.Array] = None,  # [b, p_mel, n_mels] prompt mel
) -> jax.Array:
    """Flow inference: tokens → mel [b, n·ratio, n_mels].

    ``prompt_feat`` is the zero-shot prompt mel (published
    inference_zero_shot semantics): when the token sequence leads with
    the prompt speech tokens, the CFM sees the prompt's real mel as the
    conditioning prefix and the caller crops the prompt region."""
    mel, _ = token2mel(dec["t2w"], cfg.t2w, speech_tokens, token_mask, spk_emb, rng,
                       prompt_feat=prompt_feat)
    return mel


def mel_to_audio(
    dec: Params, cfg: CosyVoiceConfig, mel: jax.Array,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    return mel2wav(dec["t2w"], cfg.t2w, mel, rng)


__all__ = [
    "CosyVoiceConfig",
    "SPEECH_VOCAB",
    "BOS_SPEECH",
    "EOS_SPEECH",
    "VOCAB",
    "TOKENS_PER_SECOND",
    "init_cosyvoice_lm",
    "init_cfm_decoder",
    "speech_logit_bias",
    "build_prompt_embeds",
    "tokens_to_mel",
    "mel_to_audio",
]
