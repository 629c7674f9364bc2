"""Shared machinery for AR TTS runtimes (chatterbox / lmtts / xtts).

Factors the pieces every AR family needs: the jitted
prefill-then-while_loop generate program, prompt padding into
(batch, bucket) grids, and a speaker-embedding cache keyed by
reference file identity.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    decode_step,
    maybe_head_stack_qkv,
    prefill,
)
from vocalie_tts_tpu.ops.generate import GenerateConfig, generate_tokens
from vocalie_tts_tpu.ops.kv_cache import pick_bucket


def apply_runtime_env(cfg):
    """Apply decode-path env knobs to a family config dataclass:
    VOCALIE_KV_INT8 (int8 cache — the measured-fastest serving config)
    and VOCALIE_DECODE_KERNEL (Pallas decode attention; defaults ON
    with the int8 cache, where the int8-native MXU kernel measures
    3.38 vs 4.45 ms/step at b=16/T=576/0.5B — see ops/decode_attention;
    set VOCALIE_DECODE_KERNEL=0 to opt out)."""
    import dataclasses

    from vocalie_tts_tpu.utils.env import bool_env, tri_env

    kv_int8 = bool_env("VOCALIE_KV_INT8")
    if kv_int8:
        cfg = dataclasses.replace(cfg, kv_quant=True)
    kernel_env = tri_env("VOCALIE_DECODE_KERNEL")
    if kernel_env is True or (kv_int8 and kernel_env is not False):
        cfg = dataclasses.replace(cfg, decode_kernel=True)
    # int8-native dense/MLP decode kernels: default ON with int8
    # weights (where the stacked weights are {"q","s"} trees and the
    # kernel keeps them int8 into the MXU); VOCALIE_DENSE_KERNEL=0 opts
    # out, =1 forces the flag (inert without int8 weights).
    w_int8 = bool_env("VOCALIE_WEIGHT_INT8")
    dense_env = tri_env("VOCALIE_DENSE_KERNEL")
    if dense_env is True or (w_int8 and dense_env is not False):
        cfg = dataclasses.replace(cfg, dense_kernel=True)
    return cfg


def maybe_quantize_lm(bundle: Dict, key: str = "lm",
                      lm_cfg: Optional[TransformerConfig] = None) -> Dict:
    """Apply the runtime weight transforms to the transformer inside a
    param bundle:

    - VOCALIE_WEIGHT_INT8=1 — matmul weights stored int8 with
      per-channel scales, halving the HBM weight-streaming that
      dominates AR decode;
    - VOCALIE_FUSE_QKV (default ON, =0 to disable) — concatenate
      q/k/v and gate/up projections so each decode layer issues one
      dot per group instead of three/two (one kernel launch + one HBM
      stream per group; see transformer.fuse_decode_weights).
    """
    from vocalie_tts_tpu.utils.env import bool_env

    if key not in bundle:
        return bundle
    lm = bundle[key]
    if bool_env("VOCALIE_WEIGHT_INT8"):
        from vocalie_tts_tpu.models.common.transformer import quantize_weights_int8

        lm = quantize_weights_int8(lm)
    if bool_env("VOCALIE_FUSE_QKV", True):
        from vocalie_tts_tpu.models.common.transformer import fuse_decode_weights

        lm = fuse_decode_weights(lm)
    if lm_cfg is not None:
        # fused whole-step decode layout (VOCALIE_FUSED_STEP, b=1
        # serving): materialize it ONCE here — installing it inside the
        # jitted window program re-transposes ~75 MB per dispatch,
        # measured +25 ms on the streaming first packet
        lm = maybe_head_stack_qkv(lm, lm_cfg, 1)
    return {**bundle, key: lm}


def maybe_unfuse_lm(bundle: Dict, lm_cfg: TransformerConfig, key: str = "lm") -> Dict:
    """Reverse ``fuse_decode_weights`` on a bundle's transformer for
    persistence (fusion is a lossless concat; int8 quantization is not
    reversible and still refuses to save)."""
    if key not in bundle:
        return bundle
    from vocalie_tts_tpu.models.common.transformer import unfuse_decode_weights

    return {**bundle, key: unfuse_decode_weights(bundle[key], lm_cfg)}


def make_generate_fn(lm_cfg: TransformerConfig, logit_bias: Optional[jax.Array] = None):
    """Build the jitted (prefill + decode loop) program for an AR LM.

    Returned signature:
        fn(lm_params, embeds, prompt_lengths, rng, *, cache_len,
           max_new, eos_token_id, temperature, top_k, top_p,
           cfg_weight, repetition_penalty) -> (tokens, lengths)
    """

    def _step(lm_params, tok, caches, cond_vec):
        logits, caches = decode_step(lm_params, lm_cfg, tok, caches)
        if logit_bias is not None:
            logits = logits + logit_bias[None, :]
        return logits, caches

    @functools.partial(
        jax.jit,
        static_argnames=(
            "cache_len", "max_new", "eos_token_id", "temperature",
            "top_k", "top_p", "cfg_weight", "repetition_penalty",
        ),
    )
    def _generate(
        lm_params, embeds, prompt_lengths, rng,
        *, cache_len: int, max_new: int, eos_token_id: int,
        temperature: float, top_k: int = 0, top_p: float = 1.0,
        cfg_weight: float = 0.0, repetition_penalty: float = 1.0,
        first_token: int = 0,
    ):
        b2 = embeds.shape[0]
        lm_params = maybe_head_stack_qkv(lm_params, lm_cfg, b2)
        dummy = jnp.zeros(embeds.shape[:2], jnp.int32)
        _logits, caches = prefill(
            lm_params, lm_cfg, dummy, prompt_lengths,
            inputs_embeds=embeds, cache_len=cache_len,
        )
        logical_b = b2 // 2 if cfg_weight > 0 else b2
        first = jnp.full((logical_b,), first_token, jnp.int32)
        gen = GenerateConfig(
            max_new_tokens=max_new,
            eos_token_id=eos_token_id,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            cfg_weight=cfg_weight,
            vocab_size=lm_cfg.vocab_size,
        )
        return generate_tokens(lm_params, _step, caches, first, rng, gen)

    return _generate


def make_generate_latents_fn(lm_cfg: TransformerConfig,
                             logit_bias: Optional[jax.Array] = None):
    """Like ``make_generate_fn`` but also collects the per-step
    post-final-norm hidden states ("GPT latents") the XTTS-v2 waveform
    decoder consumes. Returns (tokens, lengths, hidden) where
    ``hidden[:, i+1]`` is token i's latent (see generate_tokens).

    The decode loop runs one extra step, so the KV cache must hold
    prompt + max_new + 1 positions — callers size ``cache_len``
    accordingly (round_cache_len absorbs it except at exact fill).
    """

    def _step(lm_params, tok, caches, cond_vec):
        logits, caches, h = decode_step(lm_params, lm_cfg, tok, caches,
                                        return_hidden=True)
        if logit_bias is not None:
            logits = logits + logit_bias[None, :]
        return logits, caches, h

    @functools.partial(
        jax.jit,
        static_argnames=(
            "cache_len", "max_new", "eos_token_id", "temperature",
            "top_k", "top_p", "repetition_penalty",
        ),
    )
    def _generate(
        lm_params, embeds, prompt_lengths, rng,
        *, cache_len: int, max_new: int, eos_token_id: int,
        temperature: float, top_k: int = 0, top_p: float = 1.0,
        repetition_penalty: float = 1.0, first_token: int = 0,
    ):
        lm_params = maybe_head_stack_qkv(lm_params, lm_cfg, embeds.shape[0])
        dummy = jnp.zeros(embeds.shape[:2], jnp.int32)
        _logits, caches = prefill(
            lm_params, lm_cfg, dummy, prompt_lengths,
            inputs_embeds=embeds, cache_len=cache_len,
        )
        first = jnp.full((embeds.shape[0],), first_token, jnp.int32)
        gen = GenerateConfig(
            max_new_tokens=max_new,
            eos_token_id=eos_token_id,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            vocab_size=lm_cfg.vocab_size,
        )
        return generate_tokens(lm_params, _step, caches, first, rng, gen,
                               collect_hidden_dim=lm_cfg.d_model)

    return _generate


def pad_token_batch(
    seqs: List[List[int]],
    *,
    prompt_buckets: Tuple[int, ...],
    batch_buckets: Tuple[int, ...],
    extra_positions: int = 0,
    pad_id: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Pad ragged token lists into a (batch_bucket, prompt_bucket) grid.

    ``extra_positions`` reserves room for conditioning slots the caller
    prepends. Returns (tokens, lengths, prompt_bucket, batch_bucket)
    where lengths already include the extra positions.
    """
    max_len = max((len(s) for s in seqs), default=0) + extra_positions
    prompt_bucket = pick_bucket(max_len, prompt_buckets)
    batch_bucket = pick_bucket(len(seqs), batch_buckets)
    room = prompt_bucket - extra_positions
    tokens = np.full((batch_bucket, room), pad_id, np.int32)
    lengths = np.full((batch_bucket,), extra_positions, np.int32)
    for i, s in enumerate(seqs):
        s = s[:room]
        tokens[i, : len(s)] = s
        lengths[i] = len(s) + extra_positions
    return tokens, lengths, prompt_bucket, batch_bucket


def embed_mixed_prompt(text_emb, tok_emb, tokens, text_vocab: int):
    """Prompt-space embedding over two tables.

    Prompt token ids live in [0, text_vocab) for text (separate
    ``text_emb`` table — the published T3/CosyVoice layout, where text
    reaches the LM only through inputs_embeds) and
    [text_vocab, text_vocab + core_vocab) for LM-core ids (speech
    tokens spliced into clone prompts, BOS). Two gathers + a select;
    prefill-side only — the decode loop never mixes spaces."""
    import jax.numpy as jnp

    is_text = tokens < text_vocab
    text_rows = text_emb[jnp.minimum(tokens, text_vocab - 1)]
    core_ids = jnp.clip(tokens - text_vocab, 0, tok_emb.shape[0] - 1)
    core_rows = tok_emb[core_ids]
    return jnp.where(is_text[..., None], text_rows, core_rows.astype(text_rows.dtype))


def make_streaming_fns(lm_cfg: TransformerConfig, logit_bias: Optional[jax.Array] = None):
    """(prefill_fn, window_fn) for incremental window decode.

    prefill_fn(lm_params, embeds, prompt_lengths, *, cache_len) → caches
    window_fn(lm_params, caches, prev_token, done, rng, *, window,
              eos_token_id, temperature, top_k, top_p)
        → (tokens, n_valid, next_token, done, caches)
    """
    from vocalie_tts_tpu.ops.generate import GenerateConfig, generate_window

    def _step(lm_params, tok, caches, cond_vec):
        logits, caches = decode_step(lm_params, lm_cfg, tok, caches)
        if logit_bias is not None:
            logits = logits + logit_bias[None, :]
        return logits, caches

    @functools.partial(jax.jit, static_argnames=("cache_len",))
    def prefill_fn(lm_params, embeds, prompt_lengths, *, cache_len: int):
        dummy = jnp.zeros(embeds.shape[:2], jnp.int32)
        _logits, caches = prefill(
            lm_params, lm_cfg, dummy, prompt_lengths,
            inputs_embeds=embeds, cache_len=cache_len,
        )
        return caches

    @functools.partial(
        jax.jit,
        static_argnames=("window", "eos_token_id", "temperature", "top_k", "top_p"),
    )
    def window_fn(
        lm_params, caches, prev_token, done, rng,
        *, window: int, eos_token_id: int, temperature: float,
        top_k: int = 0, top_p: float = 1.0,
    ):
        # fused whole-step decode layout (b=1 streaming): installed at
        # the top of the jitted window so the transpose traces once per
        # dispatch, outside the decode while_loop (ops/decode_step)
        lm_params = maybe_head_stack_qkv(lm_params, lm_cfg, prev_token.shape[0])
        gen = GenerateConfig(
            max_new_tokens=window,
            eos_token_id=eos_token_id,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            vocab_size=lm_cfg.vocab_size,
        )
        return generate_window(
            lm_params, _step, caches, prev_token, done, rng, gen, window=window
        )

    return prefill_fn, window_fn


class SpeakerEmbedCache:
    """x-vector cache keyed by (path, mtime) — reference voices are
    reused across every chunk of a session."""

    def __init__(self, embed_fn: Callable[[np.ndarray, int], np.ndarray], dim: int):
        self._embed_fn = embed_fn
        self._dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    def get(self, voice_ref_path: Optional[str]) -> np.ndarray:
        if not voice_ref_path:
            return np.zeros((self._dim,), np.float32)
        key = f"{voice_ref_path}:{os.path.getmtime(voice_ref_path)}"
        if key not in self._cache:
            from vocalie_tts_tpu.io.refs import normalize_ref_audio

            # mono + 24 kHz + loudness-normalized so the x-vector sees
            # a consistent level whatever the user's file was
            # (ref: qwen3_backend.py:40-69 ffmpeg loudnorm equivalent)
            audio, sr = normalize_ref_audio(voice_ref_path)
            self._cache[key] = np.asarray(self._embed_fn(audio, sr))
        return self._cache[key]


__all__ = [
    "make_generate_fn",
    "make_generate_latents_fn",
    "pad_token_batch",
    "SpeakerEmbedCache",
]


def to_pcm16_wire(audio):
    """In-graph device→host wire format: int16 PCM.

    Every engine's final artifact is a PCM_16 WAV, and the axon tunnel
    moves ~20 MB/s — shipping f32 audio across it costs ~0.5 s per
    ~100 s session. Quantizing on device halves the bytes at exactly
    the precision of the output file (≤1 LSB double-rounding through
    the host-side gap/fade stitching, ≈0.0003 dB).
    """
    import jax.numpy as jnp

    return jnp.round(jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)


def from_pcm16_wire(arr):
    """Host-side inverse of to_pcm16_wire → float32 in [-1, 1]."""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype == np.int16:
        return a.astype(np.float32) / 32767.0
    return a.astype(np.float32)
