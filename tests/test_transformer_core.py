"""Transformer core invariants: prefill/decode consistency, shapes."""

import jax
import jax.numpy as jnp
import pytest

from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    decode_step,
    init_params,
    param_count,
    prefill,
)
pytestmark = pytest.mark.device

TINY = TransformerConfig(
    vocab_size=64,
    d_model=32,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    d_head=8,
    d_ff=64,
    max_seq_len=64,
    dtype=jnp.float32,
)


def test_param_count_scales():
    params = init_params(jax.random.PRNGKey(0), TINY)
    n = param_count(params)
    assert n > 10_000


def test_prefill_then_decode_matches_incremental():
    """Teacher-forced decode must reproduce prefill's next-token logits."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, TINY.vocab_size)
    lengths = jnp.array([7, 7])

    # prefill over the first 6 tokens, then decode token 7
    logits_full, _ = prefill(params, TINY, tokens, lengths)

    logits_6, caches = prefill(params, TINY, tokens[:, :6], jnp.array([6, 6]))
    logits_step, caches = decode_step(params, TINY, tokens[:, 6], caches)
    assert float(jnp.max(jnp.abs(logits_step - logits_full))) < 1e-3


def test_incremental_decode_chain():
    """Decoding token-by-token equals prefilling the whole prompt."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, TINY.vocab_size)

    logits_ref, _ = prefill(params, TINY, tokens, jnp.array([5]))

    # seed with first token, then decode the remaining 4 step by step
    _, caches = prefill(params, TINY, tokens[:, :1], jnp.array([1]))
    logits = None
    for i in range(1, 5):
        logits, caches = decode_step(params, TINY, tokens[:, i], caches)
    assert float(jnp.max(jnp.abs(logits - logits_ref))) < 1e-3


def test_caches_length_tracking():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, TINY.vocab_size)
    _, cache = prefill(params, TINY, tokens, jnp.array([4, 3]))
    assert cache.length.tolist() == [4, 3]
    assert cache.k.shape[0] == TINY.n_layers  # stacked layer axis
    _, cache = decode_step(params, TINY, tokens[:, 0], cache)
    assert cache.length.tolist() == [5, 4]


def test_ragged_prefill_lengths():
    """Row with shorter valid length ignores the padded tail."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    t1 = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, TINY.vocab_size)
    # same prompt padded with garbage to length 9
    garbage = jax.random.randint(jax.random.PRNGKey(5), (1, 3), 0, TINY.vocab_size)
    t2 = jnp.concatenate([t1, garbage], axis=1)

    logits1, caches1 = prefill(params, TINY, t1, jnp.array([6]))
    logits2, caches2 = prefill(params, TINY, t2, jnp.array([6]))
    assert float(jnp.max(jnp.abs(logits1 - logits2))) < 1e-3

    # and the next decode step agrees too (cache length masks the tail)
    nxt = jnp.array([11])
    step1, _ = decode_step(params, TINY, nxt, caches1)
    step2, _ = decode_step(params, TINY, nxt, caches2)
    assert float(jnp.max(jnp.abs(step1 - step2))) < 1e-3


def test_int8_kv_cache_close_to_bf16():
    """Quantized cache decode tracks the full-precision path."""
    import dataclasses

    cfg_q = dataclasses.replace(TINY, kv_quant=True)
    params = init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(9), (2, 6), 0, TINY.vocab_size)
    lengths = jnp.array([6, 6])

    logits_f, cache_f = prefill(params, TINY, tokens, lengths, cache_len=32)
    logits_q, cache_q = prefill(params, cfg_q, tokens, lengths, cache_len=32)
    assert cache_q.k.dtype.name == "int8"
    # prefill logits identical (quantization only affects the cache)
    assert float(jnp.max(jnp.abs(logits_f - logits_q))) < 1e-4

    nxt = tokens[:, 0]
    step_f, cache_f = decode_step(params, TINY, nxt, cache_f)
    step_q, cache_q = decode_step(params, cfg_q, nxt, cache_q)
    # int8 cache: small quantization noise, same distribution
    rel = float(jnp.max(jnp.abs(step_f - step_q))) / (
        float(jnp.max(jnp.abs(step_f))) + 1e-6
    )
    assert rel < 0.05, rel
    # a second step keeps tracking
    step_f2, _ = decode_step(params, TINY, nxt, cache_f)
    step_q2, _ = decode_step(params, cfg_q, nxt, cache_q)
    rel2 = float(jnp.max(jnp.abs(step_f2 - step_q2))) / (
        float(jnp.max(jnp.abs(step_f2))) + 1e-6
    )
    assert rel2 < 0.08, rel2


def test_int8_weights_close_to_full():
    """Weight-only int8 params track full precision through
    prefill + decode (per-output-channel scales)."""
    from vocalie_tts_tpu.models.common.transformer import quantize_weights_int8

    params = init_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_weights_int8(params)
    assert qparams["lm_head"]["q"].dtype.name == "int8"
    assert qparams["layers"]["wq"]["q"].shape == params["layers"]["wq"].shape

    tokens = jax.random.randint(jax.random.PRNGKey(6), (2, 6), 0, TINY.vocab_size)
    lengths = jnp.array([6, 6])
    logits_f, cache_f = prefill(params, TINY, tokens, lengths, cache_len=32)
    logits_q, cache_q = prefill(qparams, TINY, tokens, lengths, cache_len=32)
    rel = float(jnp.max(jnp.abs(logits_f - logits_q))) / (
        float(jnp.max(jnp.abs(logits_f))) + 1e-6
    )
    assert rel < 0.05, rel

    step_f, _ = decode_step(params, TINY, tokens[:, 0], cache_f)
    step_q, _ = decode_step(qparams, TINY, tokens[:, 0], cache_q)
    rel2 = float(jnp.max(jnp.abs(step_f - step_q))) / (
        float(jnp.max(jnp.abs(step_f))) + 1e-6
    )
    assert rel2 < 0.06, rel2
