"""CosyVoice-class model graph (~0.5B LM + conditional flow matching).

Mirrors the reference engine's three modes (ref:
tts_backends/cosyvoice_runner.py:87-125 — inference_instruct2 /
inference_zero_shot / inference_cross_lingual) and its streaming
capability (150 ms first-packet claim, ref: cosyvoice_backend.py:9).

Pipeline: byte text (+instruction, SEP-joined) → AR LM emits speech
tokens (~23.4 Hz) → conditional flow-matching decoder (Euler ODE,
N steps) produces 80-mel at 93.75 fps conditioned on token features +
speaker embedding → HiFi-GAN at 24 kHz. Streaming runs the same
stages over token windows with a small lookahead and flushes audio
per window.
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

SPEECH_VOCAB = 4096
SPEECH_BASE = BYTE_VOCAB_SIZE                  # 260
BOS_SPEECH = SPEECH_BASE + SPEECH_VOCAB        # 4356
EOS_SPEECH = BOS_SPEECH + 1                    # 4357
VOCAB = EOS_SPEECH + 1                         # 4358

TOKENS_PER_SECOND = 24000 / 256 / 4  # 23.4375


@dataclasses.dataclass(frozen=True)
class CosyVoiceConfig:
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 4096
    max_seq_len: int = 2048
    speaker_dim: int = 192
    sample_rate: int = 24000
    n_mels: int = 80
    token_upsample: int = 4
    cfm_steps: int = 10          # Euler ODE steps at inference
    cfm_channels: int = 256
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
            # Qwen2 backbone: q/k/v projection biases — real checkpoints
            # convert via convert_hf_decoder_state(attn_bias=True)
            attn_bias=True,
            dtype=self.dtype,
        )

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(n_mels=self.n_mels, base_channels=512, dtype=jnp.float32)

    @property
    def speaker(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(sr=self.sample_rate, embed_dim=self.speaker_dim)


def _dense(key, d_in, d_out, dtype=jnp.float32):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_cosyvoice_lm(key: jax.Array, cfg: CosyVoiceConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "lm": init_transformer(k1, cfg.lm),
        "spk_cond": _dense(k2, cfg.speaker_dim, cfg.d_model, cfg.dtype),
    }


def init_cfm_decoder(key: jax.Array, cfg: CosyVoiceConfig) -> Params:
    """Flow-matching vector field + token conditioning + vocoder."""
    keys = jax.random.split(key, 12)
    ch = cfg.cfm_channels
    return {
        "tok_emb": jax.random.normal(keys[0], (SPEECH_VOCAB + 2, ch), jnp.float32) * 0.02,
        "tok_up": conv1d_init(keys[1], 8, ch, ch, jnp.float32),
        "spk_proj": _dense(keys[2], cfg.speaker_dim, ch),
        "time_proj": _dense(keys[3], 64, ch),
        # vector-field network: input [x_t ‖ cond] → velocity
        "vf_in": conv1d_init(keys[4], 3, cfg.n_mels + ch, ch, jnp.float32),
        "vf_mid1": conv1d_init(keys[5], 5, ch, ch, jnp.float32),
        "vf_mid2": conv1d_init(keys[6], 5, ch, ch, jnp.float32),
        "vf_mid3": conv1d_init(keys[7], 5, ch, ch, jnp.float32),
        "vf_out": conv1d_init(keys[8], 3, ch, cfg.n_mels, jnp.float32),
        "vocoder": init_vocoder(keys[9], cfg.vocoder),
        "speaker": init_speaker_encoder(keys[10], cfg.speaker),
    }


def speech_logit_bias() -> jax.Array:
    bias = jnp.full((VOCAB,), -1e30, jnp.float32)
    bias = bias.at[SPEECH_BASE : SPEECH_BASE + SPEECH_VOCAB].set(0.0)
    bias = bias.at[EOS_SPEECH].set(0.0)
    return bias


def build_prompt_embeds(
    params: Params,
    cfg: CosyVoiceConfig,
    text_tokens: jax.Array,
    spk_emb: jax.Array,
) -> jax.Array:
    """[spk slot, text..., BOS_speech]."""
    lm = params["lm"]
    text_emb = lm["tok_emb"][text_tokens]
    spk_slot = jnp.dot(spk_emb.astype(text_emb.dtype), params["spk_cond"])[:, None, :]
    bos = lm["tok_emb"][jnp.full((text_tokens.shape[0], 1), BOS_SPEECH)]
    return jnp.concatenate([spk_slot, text_emb, bos], axis=1)


def _time_embedding(t: jax.Array) -> jax.Array:
    """Sinusoidal embedding of the ODE time t∈[0,1] → [..., 64]."""
    half = 32
    freqs = jnp.exp(-math.log(1000.0) * jnp.arange(half) / half)
    ang = t[..., None] * freqs * 1000.0
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _vector_field(
    dec: Params, x_t: jax.Array, cond: jax.Array, t: jax.Array
) -> jax.Array:
    """v(x_t, t | cond): [b, frames, n_mels] velocity."""
    temb = jnp.dot(_time_embedding(t), dec["time_proj"])  # [b, ch]
    h = conv1d(dec["vf_in"], jnp.concatenate([x_t, cond], axis=-1))
    h = h + temb[:, None, :]
    h = leaky_relu(conv1d(dec["vf_mid1"], h, dilation=1))
    h = leaky_relu(conv1d(dec["vf_mid2"], h, dilation=2))
    h = leaky_relu(conv1d(dec["vf_mid3"], h, dilation=4))
    return conv1d(dec["vf_out"], h)


def tokens_to_mel(
    dec: Params,
    cfg: CosyVoiceConfig,
    speech_tokens: jax.Array,  # [b, n] in [0, SPEECH_VOCAB)
    token_mask: jax.Array,
    spk_emb: jax.Array,        # [b, speaker_dim]
    rng: jax.Array,
) -> jax.Array:
    """Conditional flow matching: noise → mel via Euler ODE."""
    x = dec["tok_emb"][speech_tokens] * token_mask[..., None]
    cond = leaky_relu(conv1d_transpose(dec["tok_up"], x, stride=cfg.token_upsample))
    cond = cond + jnp.dot(spk_emb, dec["spk_proj"])[:, None, :]
    b, frames, _ = cond.shape

    x_t = jax.random.normal(rng, (b, frames, cfg.n_mels), jnp.float32)
    dt = 1.0 / cfg.cfm_steps

    def euler_step(i, x_t):
        t = jnp.full((b,), i * dt, jnp.float32)
        v = _vector_field(dec, x_t, cond, t)
        return x_t + dt * v

    return jax.lax.fori_loop(0, cfg.cfm_steps, euler_step, x_t)


def mel_to_audio(dec: Params, cfg: CosyVoiceConfig, mel: jax.Array) -> jax.Array:
    return apply_vocoder(dec["vocoder"], cfg.vocoder, mel)


__all__ = [
    "CosyVoiceConfig",
    "SPEECH_VOCAB",
    "SPEECH_BASE",
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
