"""Device-op tests: flash attention parity, KV cache, sampling, generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.ops.flash_attention import flash_attention, reference_attention
from vocalie_tts_tpu.ops.generate import GenerateConfig, generate_tokens
from vocalie_tts_tpu.ops.kv_cache import KVCache, decode_attention, pick_bucket
from vocalie_tts_tpu.ops.sampling import (
    apply_repetition_penalty,
    cfg_combine,
    sample_logits,
)

pytestmark = pytest.mark.device


@pytest.mark.parametrize(
    "b,h,hk,s,d", [(2, 4, 4, 256, 64), (1, 8, 2, 130, 64), (2, 4, 4, 37, 32)]
)
@pytest.mark.parametrize("causal", [True, False])
def test_flash_attention_matches_reference(b, h, hk, s, d, causal):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, hk, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, hk, s, d), jnp.float32)
    out = flash_attention(q, k, v, causal=causal)
    ref = reference_attention(q, k, v, causal=causal)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_kv_cache_append_and_decode_matches_full_attention():
    key = jax.random.PRNGKey(1)
    b, h, d, steps = 2, 4, 32, 6
    cache = KVCache.create(b, h, 16, d, jnp.float32)
    ks = jax.random.normal(key, (steps, b, h, 1, d))
    vs = jax.random.normal(jax.random.PRNGKey(2), (steps, b, h, 1, d))
    for i in range(steps):
        cache = cache.append(ks[i], vs[i])
    assert cache.length.tolist() == [steps, steps]
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, 1, d))
    out = decode_attention(q, cache)
    # oracle: attention over the concatenated K/V
    k_full = jnp.concatenate([ks[i] for i in range(steps)], axis=2)
    v_full = jnp.concatenate([vs[i] for i in range(steps)], axis=2)
    ref = reference_attention(q, k_full, v_full, causal=False)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_kv_cache_prefill_respects_lengths():
    b, h, d = 2, 2, 16
    cache = KVCache.create(b, h, 8, d, jnp.float32)
    k = jnp.ones((b, h, 4, d))
    v = 2 * jnp.ones((b, h, 4, d))
    cache = cache.write_prefill(k, v, jnp.array([4, 2]))
    q = jnp.ones((b, h, 1, d))
    out = decode_attention(q, cache)
    # all values identical → attention output = value
    assert np.allclose(np.asarray(out), 2.0, atol=1e-6)


def test_gqa_decode_attention():
    key = jax.random.PRNGKey(4)
    b, h, hk, d = 1, 8, 2, 16
    cache = KVCache.create(b, hk, 8, d, jnp.float32)
    cache = cache.write_prefill(
        jax.random.normal(key, (b, hk, 8, d)),
        jax.random.normal(jax.random.PRNGKey(5), (b, hk, 8, d)),
        jnp.array([8]),
    )
    q = jax.random.normal(jax.random.PRNGKey(6), (b, h, 1, d))
    out = decode_attention(q, cache)
    ref = reference_attention(q, cache.k, cache.v, causal=False)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_pick_bucket():
    assert pick_bucket(10, (64, 128, 256)) == 64
    assert pick_bucket(65, (64, 128, 256)) == 128
    assert pick_bucket(1000, (64, 128, 256)) == 256


def test_repetition_penalty_semantics():
    logits = jnp.array([[2.0, -2.0, 1.0]])
    counts = jnp.array([[1, 1, 0]])
    out = apply_repetition_penalty(logits, counts, 2.0)
    assert np.allclose(np.asarray(out), [[1.0, -4.0, 1.0]])


def test_cfg_combine():
    cond = jnp.array([[1.0, 2.0]])
    uncond = jnp.array([[0.0, 0.0]])
    out = cfg_combine(cond, uncond, 0.5)
    assert np.allclose(np.asarray(out), [[0.5, 1.0]])


def test_sampling_greedy_and_topk():
    logits = jnp.array([[0.1, 5.0, 0.2, 0.3]])
    key = jax.random.PRNGKey(0)
    assert sample_logits(key, logits, temperature=0.0).tolist() == [1]
    # top_k=1 forces the argmax even at high temperature
    for seed in range(5):
        tok = sample_logits(jax.random.PRNGKey(seed), logits, temperature=2.0, top_k=1)
        assert tok.tolist() == [1]


def test_sampling_top_p_keeps_top1():
    logits = jnp.array([[10.0, 0.0, -10.0, -10.0]])
    for seed in range(5):
        tok = sample_logits(
            jax.random.PRNGKey(seed), logits, temperature=1.0, top_p=0.01
        )
        assert tok.tolist() == [0]


def test_generate_tokens_stops_at_eos():
    # decode_step emits token (step count) deterministically; EOS=3
    def fake_step(params, tok, caches, cond_vec):
        (cache,) = caches
        step = cache.length[0]
        logits = jax.nn.one_hot(jnp.full((tok.shape[0],), step + 1), 10) * 100.0
        new_cache = cache.append(
            jnp.zeros((tok.shape[0], 1, 1, 4)), jnp.zeros((tok.shape[0], 1, 1, 4))
        )
        return logits, (new_cache,)

    caches = (KVCache.create(2, 1, 16, 4, jnp.float32),)
    tokens, lengths = generate_tokens(
        {},
        fake_step,
        caches,
        first_token=jnp.zeros((2,), jnp.int32),
        rng=jax.random.PRNGKey(0),
        gen=GenerateConfig(max_new_tokens=8, eos_token_id=3, temperature=0.0),
    )
    # emits 1, 2, then 3=EOS → length 2
    assert lengths.tolist() == [2, 2]
    assert tokens[0, :3].tolist() == [1, 2, 3]


def test_generate_window_incremental_matches_eos_semantics():
    """Windowed decode emits the same deterministic stream and stops at EOS."""
    from vocalie_tts_tpu.ops.generate import generate_window

    def fake_step(params, tok, caches, cond_vec):
        (cache,) = caches
        step = cache.length[0]
        logits = jax.nn.one_hot(jnp.full((tok.shape[0],), step + 1), 10) * 100.0
        new_cache = cache.append(
            jnp.zeros((tok.shape[0], 1, 1, 4)), jnp.zeros((tok.shape[0], 1, 1, 4))
        )
        return logits, (new_cache,)

    caches = (KVCache.create(1, 1, 16, 4, jnp.float32),)
    gen = GenerateConfig(max_new_tokens=4, eos_token_id=5, temperature=0.0)
    prev = jnp.zeros((1,), jnp.int32)
    done = jnp.zeros((1,), bool)
    collected = []
    for _ in range(3):  # 3 windows of 4 → tokens 1..12, EOS=5 at step 5
        toks, n_valid, prev, done, caches = generate_window(
            {}, fake_step, caches, prev, done, jax.random.PRNGKey(0), gen, window=4
        )
        collected.append((toks.tolist()[0], int(n_valid[0]), bool(done[0])))
        if bool(done[0]):
            break
    # window 1: tokens 1,2,3,4 all valid; window 2: 5=EOS → 0 valid after
    assert collected[0] == ([1, 2, 3, 4], 4, False)
    assert collected[1][2] is True  # done after hitting EOS
    assert collected[1][1] == 0 or collected[1][0][0] == 5


def test_flash_attention_kv_lens_masking():
    """Per-row KV-length masking (the CFM variable-length batches)."""
    import math

    rng = np.random.RandomState(42)
    b, h, s, d = 2, 2, 320, 64
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    lens = jnp.asarray([200, 320], jnp.int32)

    out = flash_attention(q, k, v, causal=False, kv_lens=lens)

    sm = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
    keep = jnp.arange(s)[None, None, None, :] < lens[:, None, None, None]
    logits = jnp.where(keep, logits, -1e30)
    want = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
