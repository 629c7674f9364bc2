"""Jit-compatible token sampling: temperature, top-k, top-p,
repetition penalty, classifier-free guidance.

Semantics follow the torch implementations the reference engines rely
on (HF `RepetitionPenaltyLogitsProcessor`, nucleus sampling), so that
with converted weights the sampled token streams remain comparable:
- repetition penalty divides positive logits by the penalty and
  multiplies negative logits (ref behavior of chatterbox/xtts decode;
  SURVEY §7 "sampling parity").
- CFG: logits = uncond + w * (cond - uncond).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def apply_repetition_penalty(
    logits: jax.Array,  # [batch, vocab]
    token_counts: jax.Array,  # [batch, vocab] — #occurrences of each token so far
    penalty: float | jax.Array,
) -> jax.Array:
    """HF-style repetition penalty on already-emitted tokens."""
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def cfg_combine(cond_logits: jax.Array, uncond_logits: jax.Array, weight) -> jax.Array:
    """Classifier-free guidance: uncond + w * (cond - uncond)."""
    return uncond_logits + weight * (cond_logits - uncond_logits)


def _top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG, logits)


def _top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], dtype=bool), cum[..., :-1] < p], axis=-1
    )
    # threshold = smallest kept logit
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, _NEG, logits)


def sample_logits(
    key: jax.Array,
    logits: jax.Array,  # [batch, vocab]
    *,
    temperature: float | jax.Array = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    greedy_if_zero_temp: bool = True,
) -> jax.Array:
    """Sample one token id per row. temperature == 0 → argmax."""
    logits = logits.astype(jnp.float32)
    filtered = _top_k_mask(logits, top_k)
    filtered = _top_p_mask(filtered, top_p)
    if isinstance(temperature, (int, float)):
        if temperature <= 0 and greedy_if_zero_temp:
            return jnp.argmax(filtered, axis=-1).astype(jnp.int32)
        scaled = filtered / max(float(temperature), 1e-6)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    # traced temperature: branchless
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    sampled = jax.random.categorical(key, filtered / temp, axis=-1)
    greedy = jnp.argmax(filtered, axis=-1)
    use_greedy = jnp.asarray(temperature) <= 0
    return jnp.where(use_greedy, greedy, sampled).astype(jnp.int32)


__all__ = ["apply_repetition_penalty", "cfg_combine", "sample_logits"]
