"""Generic autoregressive generation: prefill + jitted while_loop decode.

The whole sampling loop (decode step → repetition penalty → CFG →
sampling → stop tracking) is one compiled program per (batch, prompt
bucket, max-new-tokens bucket); no per-token Python. This is the
structural replacement for the reference's per-chunk subprocess decode
(ref: tts_backends/base_runner.py:278: model reload per chunk).

Supports classifier-free guidance by running a doubled batch
[cond; uncond] through the same caches and combining logits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.ops.kv_cache import KVCache
from vocalie_tts_tpu.ops.sampling import (
    apply_repetition_penalty,
    cfg_combine,
    sample_logits,
)

# decode_step(params, token[batch], caches, cond_vec?) -> (logits, caches)
DecodeStepFn = Callable[..., Tuple[jax.Array, Tuple[KVCache, ...]]]


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int
    eos_token_id: int
    temperature: float = 0.7
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    cfg_weight: float = 0.0  # 0 → no CFG
    vocab_size: int = 0  # required if repetition_penalty != 1


def generate_tokens(
    params,
    decode_step: DecodeStepFn,
    caches: Tuple[KVCache, ...],
    first_token: jax.Array,  # [batch] int32 — token that starts decode
    rng: jax.Array,
    gen: GenerateConfig,
    cond_vec: Optional[jax.Array] = None,
    collect_hidden_dim: Optional[int] = None,
):
    """Decode up to ``gen.max_new_tokens`` tokens per row.

    Returns (tokens [batch, max_new_tokens], lengths [batch]) where
    ``lengths`` counts tokens emitted before (and excluding) EOS.

    With CFG, the caller passes doubled-batch caches ([cond; uncond])
    and ``first_token`` of the *logical* batch; tokens are mirrored to
    both halves each step.

    ``collect_hidden_dim`` (the XTTS latent path): ``decode_step`` must
    then return a third value — the post-final-norm hidden state
    [batch, dim] for this step's INPUT token — and the return becomes
    (tokens, lengths, hidden [batch, max_new+1, dim]). ``hidden[:, s]``
    is the latent of the token that ENTERED step s (s=0 is the BOS
    input), so token i's latent is ``hidden[:, i+1]``; the loop runs
    one extra step past the last sampled token so the final token's
    latent exists even when no EOS fires within ``max_new``.
    """
    use_cfg = gen.cfg_weight and gen.cfg_weight > 0.0
    batch = int(first_token.shape[0])
    track_rep = gen.repetition_penalty != 1.0
    vocab = gen.vocab_size
    if track_rep and not vocab:
        raise ValueError("vocab_size required for repetition penalty")
    collect = collect_hidden_dim is not None
    n_steps = gen.max_new_tokens + 1 if collect else gen.max_new_tokens

    tokens0 = jnp.zeros((batch, gen.max_new_tokens), jnp.int32)
    counts0 = (
        jnp.zeros((batch, vocab), jnp.int32) if track_rep else jnp.zeros((batch, 1), jnp.int32)
    )
    done0 = jnp.zeros((batch,), bool)
    lengths0 = jnp.zeros((batch,), jnp.int32)
    hidden0 = (
        jnp.zeros((batch, n_steps, collect_hidden_dim), jnp.float32)
        if collect else jnp.zeros((batch, 1, 1), jnp.float32)
    )

    def cond_fun(state):
        step, _tok, _caches, _rng, _out, _counts, done, _lengths, _hid = state
        return jnp.logical_and(step < n_steps, ~jnp.all(done))

    def body_fun(state):
        step, tok, caches, rng, out, counts, done, lengths, hid = state
        step_tok = jnp.concatenate([tok, tok]) if use_cfg else tok
        if collect:
            logits, caches, h = decode_step(params, step_tok, caches, cond_vec)
            hid = hid.at[:, step].set(h[:batch].astype(hid.dtype))
        else:
            logits, caches = decode_step(params, step_tok, caches, cond_vec)
        if use_cfg:
            logits = cfg_combine(logits[:batch], logits[batch:], gen.cfg_weight)
        if track_rep:
            logits = apply_repetition_penalty(logits, counts, gen.repetition_penalty)
        rng, sub = jax.random.split(rng)
        next_tok = sample_logits(
            sub,
            logits,
            temperature=gen.temperature,
            top_k=gen.top_k,
            top_p=gen.top_p,
        )
        in_range = step < gen.max_new_tokens
        is_eos = (next_tok == gen.eos_token_id) | ~in_range
        newly_done = jnp.logical_or(done, is_eos)
        # freeze rows that already finished on EOS so caches stay consistent
        next_tok = jnp.where(done | ~in_range, gen.eos_token_id, next_tok)
        # the extra latent-collection step writes no token (scatter at
        # step == max_new would be OOB-dropped anyway; keep it explicit)
        write_idx = jnp.minimum(step, gen.max_new_tokens - 1)
        out = out.at[:, write_idx].set(
            jnp.where(in_range, next_tok, out[:, write_idx])
        )
        lengths = jnp.where(~done & ~is_eos, lengths + 1, lengths)
        if track_rep:
            inc = jax.nn.one_hot(next_tok, vocab, dtype=jnp.int32)
            counts = counts + jnp.where(done[:, None], 0, inc)
        return step + 1, next_tok, caches, rng, out, counts, newly_done, lengths, hid

    state = (0, first_token, caches, rng, tokens0, counts0, done0, lengths0, hidden0)
    _, _, _, _, out, _, _, lengths, hid = jax.lax.while_loop(cond_fun, body_fun, state)
    if collect:
        return out, lengths, hid
    return out, lengths


def generate_window(
    params,
    decode_step: DecodeStepFn,
    caches,
    prev_token: jax.Array,   # [batch] — last emitted (or BOS) token
    done: jax.Array,         # [batch] bool — rows already finished
    rng: jax.Array,
    gen: GenerateConfig,
    *,
    window: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Tuple]:
    """Decode exactly ``window`` tokens (masked once a row hits EOS).

    The streaming building block: the caller jits this per (batch,
    window) and loops on the host, flushing audio per window while the
    cache persists on device. Returns
    (tokens [batch, window], n_valid [batch], next_prev_token, done,
    caches).
    """
    use_cfg = gen.cfg_weight and gen.cfg_weight > 0.0
    batch = prev_token.shape[0]

    def body(carry, _):
        tok, caches, rng, done = carry
        step_tok = jnp.concatenate([tok, tok]) if use_cfg else tok
        logits, caches = decode_step(params, step_tok, caches, None)
        if use_cfg:
            logits = cfg_combine(logits[:batch], logits[batch:], gen.cfg_weight)
        rng, sub = jax.random.split(rng)
        nxt = sample_logits(
            sub, logits, temperature=gen.temperature,
            top_k=gen.top_k, top_p=gen.top_p,
        )
        is_eos = nxt == gen.eos_token_id
        nxt = jnp.where(done, gen.eos_token_id, nxt)
        emitted_valid = ~done & ~is_eos
        done = done | is_eos
        return (nxt, caches, rng, done), (nxt, emitted_valid)

    (last_tok, caches, _rng, done), (tokens, valid) = jax.lax.scan(
        body, (prev_token, caches, rng, done), None, length=window
    )
    tokens = tokens.T  # [batch, window]
    n_valid = jnp.sum(valid.T.astype(jnp.int32), axis=1)
    return tokens, n_valid, last_tok, done, caches


__all__ = ["GenerateConfig", "generate_tokens", "generate_window"]
