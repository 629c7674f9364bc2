"""int8-native decode dense/MLP kernel parity (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.ops.decode_dense import (
    dense_int8_stacked,
    mlp_swiglu_int8_stacked,
)

pytestmark = pytest.mark.device


def _quant_cols(rng, d_in, d_out, L):
    """Per-output-channel int8 weights + scales, like quantize_weights_int8."""
    w = rng.randn(L, d_in, d_out).astype(np.float32)
    s = np.abs(w).max(axis=1, keepdims=True) / 127.0 + 1e-8  # [L, 1, d_out]
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s), q.astype(np.float32) * s


def test_dense_int8_stacked_matches_dequant_dot():
    rng = np.random.RandomState(0)
    L, b, d_in, d_out = 3, 8, 256, 384
    x = rng.randn(b, d_in).astype(np.float32)
    q, s, w_deq = _quant_cols(rng, d_in, d_out, L)
    qn, sn = np.asarray(q), np.asarray(s)
    for l in (0, 2):
        out = np.asarray(dense_int8_stacked(jnp.asarray(x), q, s, l))
        # EXACT reference for the kernel's integer math (per-row ~7-bit
        # activation quantization is the kernel's contract, not noise)
        xs = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-8)
        xi = np.round(x / xs).astype(np.int32)
        exact = (xi @ qn[l].astype(np.int32)).astype(np.float32) * xs * sn[l]
        assert np.max(np.abs(out - exact)) < 1e-4 * np.abs(exact).max()
        # and the quantization noise vs the plain dequant dot is small
        want = x @ w_deq[l]
        assert np.max(np.abs(out - want)) < 0.06 * np.sqrt((want ** 2).mean())


def test_dense_int8_rejects_untileable():
    rng = np.random.RandomState(1)
    q, s, _ = _quant_cols(rng, 256, 384, 1)
    with pytest.raises(ValueError):
        dense_int8_stacked(jnp.zeros((4, 256)), q[:, :, :300], s[:, :, :300], 0)


def test_mlp_swiglu_int8_stacked_matches_reference():
    rng = np.random.RandomState(2)
    L, b, d, F = 2, 8, 256, 512
    x = rng.randn(b, d).astype(np.float32) * 0.5
    gq, gs, g_deq = _quant_cols(rng, d, 2 * F, L)   # [gate | up]
    dq, ds, d_deq = _quant_cols(rng, F, d, L)
    for l in (0, 1):
        out = np.asarray(
            mlp_swiglu_int8_stacked(jnp.asarray(x), gq, gs, dq, ds, l)
        )
        gate = x @ g_deq[l][:, :F]
        up = x @ g_deq[l][:, F:]
        hidden = (gate / (1.0 + np.exp(-gate))) * up
        want = hidden @ d_deq[l]
        # two ~7-bit activation quantizations (x and the hidden) — bound
        # the noise against the output RMS, not elementwise near zeros
        assert np.max(np.abs(out - want)) < 0.1 * np.sqrt((want ** 2).mean())


def test_qkv_norm_int8_stacked_matches_reference():
    from vocalie_tts_tpu.ops.decode_dense import qkv_norm_int8_stacked

    rng = np.random.RandomState(4)
    L, b, d, dq = 2, 8, 256, 384
    eps = 1e-5
    x = rng.randn(b, d).astype(np.float32)
    nw = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    q, s, w_deq = _quant_cols(rng, d, dq, L)
    for l in (0, 1):
        out = np.asarray(
            qkv_norm_int8_stacked(jnp.asarray(x), jnp.asarray(nw), q, s, l, eps=eps)
        )
        h = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * nw[l]
        want = h @ w_deq[l]
        assert np.max(np.abs(out - want)) < 0.06 * np.sqrt((want ** 2).mean())


def test_tail_swiglu_int8_stacked_matches_reference():
    from vocalie_tts_tpu.ops.decode_dense import tail_swiglu_int8_stacked

    rng = np.random.RandomState(5)
    L, b, d, F = 2, 4, 128, 256
    eps = 1e-5
    attn = rng.randn(b, d).astype(np.float32) * 0.3
    x = rng.randn(b, d).astype(np.float32)
    woq, wos, wo_deq = _quant_cols(rng, d, d, L)
    mw = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    gq, gs, g_deq = _quant_cols(rng, d, 2 * F, L)
    dq, ds, d_deq = _quant_cols(rng, F, d, L)
    for l in (0, 1):
        out = np.asarray(
            tail_swiglu_int8_stacked(
                jnp.asarray(attn), jnp.asarray(x), woq, wos, jnp.asarray(mw),
                gq, gs, dq, ds, l, eps=eps,
            )
        )
        x2 = x + attn @ wo_deq[l]
        h2 = x2 / np.sqrt((x2 ** 2).mean(-1, keepdims=True) + eps) * mw[l]
        gate = h2 @ g_deq[l][:, :F]
        up = h2 @ g_deq[l][:, F:]
        hidden = (gate / (1.0 + np.exp(-gate))) * up
        want = x2 + hidden @ d_deq[l]
        assert np.max(np.abs(out - want)) < 0.1 * np.sqrt((want ** 2).mean())


def test_tail_swiglu_qkv_matches_tail_plus_qkv():
    """The megakernel == tail_swiglu followed by qkv_norm of l+1
    (clamped at the last layer)."""
    from vocalie_tts_tpu.ops.decode_dense import (
        qkv_norm_int8_stacked,
        tail_swiglu_int8_stacked,
        tail_swiglu_qkv_int8_stacked,
    )

    rng = np.random.RandomState(11)
    L, b, d, F, Q = 3, 4, 128, 256, 384
    eps = 1e-5
    attn = rng.randn(b, d).astype(np.float32) * 0.3
    x = rng.randn(b, d).astype(np.float32)
    woq, wos, _ = _quant_cols(rng, d, d, L)
    mw = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    gq, gs, _ = _quant_cols(rng, d, 2 * F, L)
    dq, ds, _ = _quant_cols(rng, F, d, L)
    nw = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    qq, qs, _ = _quant_cols(rng, d, Q, L)
    for l in range(L):
        x2, qkv = tail_swiglu_qkv_int8_stacked(
            jnp.asarray(attn), jnp.asarray(x), woq, wos, jnp.asarray(mw),
            gq, gs, dq, ds, jnp.asarray(nw), qq, qs, l, eps=eps,
        )
        want_x2 = tail_swiglu_int8_stacked(
            jnp.asarray(attn), jnp.asarray(x), woq, wos, jnp.asarray(mw),
            gq, gs, dq, ds, l, eps=eps,
        )
        nxt = min(l + 1, L - 1)
        want_qkv = qkv_norm_int8_stacked(
            want_x2, jnp.asarray(nw), qq, qs, nxt, eps=eps,
        )
        np.testing.assert_allclose(np.asarray(x2), np.asarray(want_x2), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qkv), np.asarray(want_qkv), rtol=0, atol=1e-4)


def test_tail_gelu_qkv_matches_tail_plus_qkv():
    """The GPT-2 megakernel == tail_gelu followed by lnorm-qkv of l+1
    (clamped at the last layer)."""
    from vocalie_tts_tpu.ops.decode_dense import (
        qkv_lnorm_int8_stacked,
        tail_gelu_int8_stacked,
        tail_gelu_qkv_int8_stacked,
    )

    rng = np.random.RandomState(13)
    L, b, d, F, Q = 3, 4, 128, 256, 384
    eps = 1e-5
    attn = rng.randn(b, d).astype(np.float32) * 0.3
    x = rng.randn(b, d).astype(np.float32)
    woq, wos, _ = _quant_cols(rng, d, d, L)
    bo = (0.1 * rng.randn(L, d)).astype(np.float32)
    lg = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    lb = (0.1 * rng.randn(L, d)).astype(np.float32)
    uq, us, _ = _quant_cols(rng, d, F, L)
    bu = (0.1 * rng.randn(L, F)).astype(np.float32)
    dq, ds, _ = _quant_cols(rng, F, d, L)
    bd = (0.1 * rng.randn(L, d)).astype(np.float32)
    ng = (1.0 + 0.1 * rng.randn(L, d)).astype(np.float32)
    nb = (0.1 * rng.randn(L, d)).astype(np.float32)
    qq, qs, _ = _quant_cols(rng, d, Q, L)
    for l in range(L):
        x2, qkv = tail_gelu_qkv_int8_stacked(
            jnp.asarray(attn), jnp.asarray(x), woq, wos, jnp.asarray(bo),
            jnp.asarray(lg), jnp.asarray(lb), uq, us, jnp.asarray(bu),
            dq, ds, jnp.asarray(bd), jnp.asarray(ng), jnp.asarray(nb),
            qq, qs, l, eps=eps,
        )
        want_x2 = tail_gelu_int8_stacked(
            jnp.asarray(attn), jnp.asarray(x), woq, wos, jnp.asarray(bo),
            jnp.asarray(lg), jnp.asarray(lb), uq, us, jnp.asarray(bu),
            dq, ds, jnp.asarray(bd), l, eps=eps,
        )
        nxt = min(l + 1, L - 1)
        want_qkv = qkv_lnorm_int8_stacked(
            want_x2, jnp.asarray(ng), jnp.asarray(nb), qq, qs, nxt, eps=eps,
        )
        np.testing.assert_allclose(np.asarray(x2), np.asarray(want_x2), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qkv), np.asarray(want_qkv), rtol=0, atol=1e-4)


@pytest.mark.parametrize("megatail", ["1", "0"])
def test_decode_step_dense_kernel_parity(megatail, monkeypatch):
    """decode_step with dense_kernel ≈ the XLA int8 path (same weights),
    in both the megakernel-tail and separate tail+qkv configurations."""
    monkeypatch.setenv("VOCALIE_MEGATAIL", megatail)
    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        fuse_decode_weights,
        init_params,
        prefill,
        quantize_weights_int8,
    )

    cfg = TransformerConfig(
        vocab_size=96, d_model=128, n_layers=2, n_heads=2, n_kv_heads=2,
        d_head=64, d_ff=256, max_seq_len=64, kv_quant=True,
        dtype=jnp.float32,
    )
    params = fuse_decode_weights(
        quantize_weights_int8(init_params(jax.random.PRNGKey(0), cfg))
    )
    tokens = jnp.zeros((2, 8), jnp.int32)
    lengths = jnp.full((2,), 8, jnp.int32)
    _, cache = prefill(params, cfg, tokens, lengths, cache_len=32)
    tok = jnp.array([3, 5], jnp.int32)

    logits_xla, _ = decode_step(params, cfg, tok, cache)
    cfg_k = dataclasses.replace(cfg, dense_kernel=True)
    logits_ker, _ = decode_step(params, cfg_k, tok, cache)

    a, b_ = np.asarray(logits_xla), np.asarray(logits_ker)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b_)) / scale < 0.05
    # rankings survive the ~7-bit activation quantization
    assert (np.argmax(a, -1) == np.argmax(b_, -1)).all()


@pytest.mark.parametrize("megatail", ["1", "0"])
def test_decode_step_dense_kernel_parity_gpt2(megatail, monkeypatch):
    """The gelu/bias (GPT-2 / XTTS) variant of the same parity check."""
    monkeypatch.setenv("VOCALIE_MEGATAIL", megatail)
    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        fuse_decode_weights,
        init_params,
        prefill,
        quantize_weights_int8,
    )

    cfg = TransformerConfig(
        vocab_size=96, d_model=128, n_layers=2, n_heads=2, n_kv_heads=2,
        d_head=64, d_ff=256, max_seq_len=64, kv_quant=True,
        norm_type="layer", mlp_type="gelu", bias=True, attn_bias=True,
        pos_type="learned", dtype=jnp.float32,
    )
    params = fuse_decode_weights(
        quantize_weights_int8(init_params(jax.random.PRNGKey(1), cfg))
    )
    tokens = jnp.zeros((2, 8), jnp.int32)
    lengths = jnp.full((2,), 8, jnp.int32)
    _, cache = prefill(params, cfg, tokens, lengths, cache_len=32)
    tok = jnp.array([7, 2], jnp.int32)

    logits_xla, _ = decode_step(params, cfg, tok, cache)
    cfg_k = dataclasses.replace(cfg, dense_kernel=True)
    logits_ker, _ = decode_step(params, cfg_k, tok, cache)

    a, b_ = np.asarray(logits_xla), np.asarray(logits_ker)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b_)) / scale < 0.05
    # tie-aware argmax: the kernel's pick must be within noise of the
    # XLA max (random-init logits can be near-exactly tied)
    picked = a[np.arange(a.shape[0]), np.argmax(b_, -1)]
    assert (picked >= a.max(-1) - 0.05 * scale).all()


@pytest.mark.parametrize("packed", [True, False])
def test_decode_step_megalayer_parity(packed, monkeypatch):
    """VOCALIE_MEGALAYER=1 (whole-layer single-launch kernel,
    ops/decode_layer.py) ≈ the two-kernel attention+megatail path. The
    only numeric delta is the o-proj's per-head-chunk activation scales
    (finer than the pair's whole-row scale) — logits must stay within
    the usual ~7-bit envelope and preserve rankings."""
    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        fuse_decode_weights,
        init_params,
        prefill,
        quantize_weights_int8,
    )

    monkeypatch.setenv("VOCALIE_MEGATAIL", "1")
    cfg = TransformerConfig(
        vocab_size=96, d_model=128, n_layers=2,
        n_heads=2, n_kv_heads=2 if packed else 1,
        d_head=64 if packed else 128,  # 64 → lane-packed cache (property)
        d_ff=256, max_seq_len=256, kv_quant=True,
        decode_kernel=True, dense_kernel=True, dtype=jnp.float32,
    )
    assert cfg.kv_packed == packed
    params = fuse_decode_weights(
        quantize_weights_int8(init_params(jax.random.PRNGKey(1), cfg))
    )
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 96, (2, 16)), jnp.int32
    )
    lengths = jnp.full((2,), 16, jnp.int32)
    _, cache = prefill(params, cfg, tokens, lengths, cache_len=256)
    tok = jnp.array([3, 5], jnp.int32)

    monkeypatch.setenv("VOCALIE_MEGALAYER", "0")
    logits_pair, cache_pair = decode_step(params, cfg, tok, cache)
    monkeypatch.setenv("VOCALIE_MEGALAYER", "1")
    logits_mega, cache_mega = decode_step(params, cfg, tok, cache)

    a, b_ = np.asarray(logits_pair), np.asarray(logits_mega)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b_)) / scale < 0.05
    assert (np.argmax(a, -1) == np.argmax(b_, -1)).all()
    # layer 0's appended k/v derive from identical inputs → identical;
    # later layers may differ by one quantization step (the merged
    # kernel's o-proj uses finer per-head-chunk activation scales)
    np.testing.assert_array_equal(
        np.asarray(cache_pair.k[0]), np.asarray(cache_mega.k[0])
    )
    assert int(cache_mega.n_decoded) == int(cache_pair.n_decoded)
