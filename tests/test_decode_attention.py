"""Fused decode-attention kernel parity (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_stacked,
)

pytestmark = pytest.mark.device


def _reference(q, k, v, bias, ks=None, vs=None, sm_scale=1.0):
    s = jnp.einsum(
        "bhgd,bhtd->bhgt", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    if ks is not None:
        s = s * ks[:, :, None, :]
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if vs is not None:
        p = p * vs[:, :, None, :]
    return jnp.einsum("bhgt,bhtd->bhgd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("quant", [False, True])
def test_decode_attention_matches_reference(quant):
    rng = np.random.RandomState(0)
    b, kv, g, d, T = 4, 4, 2, 64, 320
    q = jnp.asarray(rng.randn(b, kv, g, d).astype(np.float32))
    bias = jnp.asarray(np.where(rng.rand(b, T) > 0.3, 0.0, -1e30).astype(np.float32))
    sm = 1.0 / np.sqrt(d)
    if quant:
        k = jnp.asarray(rng.randint(-127, 127, (b, kv, T, d)).astype(np.int8))
        v = jnp.asarray(rng.randint(-127, 127, (b, kv, T, d)).astype(np.int8))
        ks = jnp.asarray(rng.rand(b, kv, T).astype(np.float32) * 0.1 + 0.01)
        vs = jnp.asarray(rng.rand(b, kv, T).astype(np.float32) * 0.1 + 0.01)
        out = decode_attention(q, k, v, bias, ks, vs, sm_scale=sm)
        want = _reference(q, k, v, bias, ks, vs, sm_scale=sm)
    else:
        k = jnp.asarray(rng.randn(b, kv, T, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, kv, T, d).astype(np.float32))
        out = decode_attention(q, k, v, bias, sm_scale=sm)
        want = _reference(q, k, v, bias, sm_scale=sm)
    assert float(jnp.max(jnp.abs(out - want))) < 1e-4


def test_decode_attention_stacked_int8_dots_close():
    """The int8-MXU kernel is a ~7-bit q/p quantization of the exact
    path — bound its relative error on worst-case (uniform) data."""
    from vocalie_tts_tpu.models.common.transformer import StackedKVCache  # noqa: F401

    rng = np.random.RandomState(1)
    L, b, kv, g, d, T = 2, 4, 4, 1, 64, 320
    q = jnp.asarray(rng.randn(b, kv, g, d).astype(np.float32))
    bias = jnp.asarray(np.where(rng.rand(b, T) > 0.3, 0.0, -1e30).astype(np.float32))
    sm = 1.0 / np.sqrt(d)
    k = jnp.asarray(rng.randint(-127, 127, (L, b, kv, T, d)).astype(np.int8))
    v = jnp.asarray(rng.randint(-127, 127, (L, b, kv, T, d)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)
    vs = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)

    got = decode_attention_stacked(
        q, k, v, bias, 1, ks, vs, sm_scale=sm, int8_dots=True
    )
    want = _reference(q, k[1], v[1], bias, ks[1], vs[1], sm_scale=sm)
    rel = float(jnp.mean(jnp.abs(got - want)) / jnp.mean(jnp.abs(want)))
    assert rel < 0.05, rel

    # exact-path kernel still matches tightly
    exact = decode_attention_stacked(q, k, v, bias, 1, ks, vs, sm_scale=sm)
    assert float(jnp.max(jnp.abs(exact - want))) < 1e-4

    # int8_dots demands a quantized cache
    with pytest.raises(ValueError):
        decode_attention_stacked(
            q, k.astype(jnp.float32), v.astype(jnp.float32), bias, 1,
            sm_scale=sm, int8_dots=True,
        )


@pytest.mark.parametrize("valid_len", [1, 100, 128, 129, 255, 256])
def test_decode_attention_packed_tblk_matches_unblocked(valid_len):
    """The T-blocked (valid-length clamped) packed kernel == the
    whole-row packed kernel when the bias masks the same region."""
    rng = np.random.RandomState(7)
    L, b, kv, g, d, T = 2, 2, 8, 1, 64, 256
    q = jnp.asarray(rng.randn(b, kv, g, d).astype(np.float32))
    # mask everything at/after valid_len (plus a few random holes)
    col = np.arange(T)[None, :]
    masked = (col >= valid_len) | (rng.rand(b, T) < 0.2)
    bias = jnp.asarray(np.where(masked, -1e30, 0.0).astype(np.float32))
    sm = 1.0 / np.sqrt(d)
    kv2 = jnp.asarray(rng.randint(-127, 127, (L, b, kv, T, 2 * d)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)
    vs = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)
    kn = jnp.asarray(rng.randn(b, kv, d).astype(np.float32))
    vn = jnp.asarray(rng.randn(b, kv, d).astype(np.float32))

    def exact(l):
        k = kv2[l, ..., :d]
        v = kv2[l, ..., d:]
        s = jnp.einsum(
            "bhgd,bhtd->bhgt", q, k.astype(jnp.float32)
        ) * sm * ks[l][:, :, None, :] + bias[:, None, None, :]
        s_new = jnp.einsum("bhgd,bhd->bhg", q, kn)[..., None] * sm
        p = jax.nn.softmax(jnp.concatenate([s, s_new], -1), axis=-1)
        v_all = jnp.concatenate(
            [v.astype(jnp.float32) * vs[l][:, :, :, None], vn[:, :, None, :]], 2
        )
        return jnp.einsum("bhgt,bhtd->bhgd", p, v_all)

    for l in range(L):
        want = exact(l)
        scale = float(jnp.mean(jnp.abs(want)))
        got_blk = decode_attention_stacked(
            q, kv2, None, bias, l, ks, vs, kn, vn,
            valid_len=jnp.int32(valid_len),
            sm_scale=sm, int8_dots=True, packed=True,
        )
        got_row = decode_attention_stacked(
            q, kv2, None, bias, l, ks, vs, kn, vn,
            sm_scale=sm, int8_dots=True, packed=True,
        )
        # both kernels are ~7-bit q/p quantizations of the exact path;
        # the blocked kernel quantizes p per 128-block so it differs
        # from the whole-row kernel at the quantization level only
        assert float(jnp.mean(jnp.abs(got_blk - want))) / scale < 0.05
        assert float(jnp.mean(jnp.abs(got_blk - got_row))) / scale < 0.05


@pytest.mark.parametrize("quant", [False, True])
def test_decode_step_kernel_path_matches_xla(quant):
    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        init_params,
        prefill,
    )

    cfg0 = TransformerConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=8, d_ff=64, max_seq_len=64, dtype=jnp.float32, kv_quant=quant,
    )
    cfgk = dataclasses.replace(cfg0, decode_kernel=True)
    params = init_params(jax.random.PRNGKey(0), cfg0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 64)
    lengths = jnp.array([7, 6])
    _, c0 = prefill(params, cfg0, tokens, lengths, cache_len=32)
    _, ck = prefill(params, cfgk, tokens, lengths, cache_len=32)
    t = tokens[:, 0]
    for _ in range(3):
        s0, c0 = decode_step(params, cfg0, t, c0)
        sk, ck = decode_step(params, cfgk, t, ck)
        if quant:
            # the int8-MXU kernel adds ~7-bit q/p quantization on top
            # of the already-quantized cache — bound relative error
            rel = float(
                jnp.mean(jnp.abs(s0 - sk)) / jnp.maximum(jnp.mean(jnp.abs(s0)), 1e-9)
            )
            assert rel < 0.05, rel
        else:
            assert float(jnp.max(jnp.abs(s0 - sk))) < 1e-4


def test_decode_step_packed_kv_parity():
    """kv_packed (lane-interleaved k|v + packed kernel + packed writer)
    ≈ the XLA einsum path at d_head=64."""
    import dataclasses

    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        init_params,
        prefill,
    )

    cfg = TransformerConfig(
        vocab_size=96, d_model=128, n_layers=2, n_heads=2, n_kv_heads=2,
        d_head=64, d_ff=256, max_seq_len=64, kv_quant=True,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(2), cfg)
    tokens = jnp.zeros((2, 8), jnp.int32)
    lengths = jnp.full((2,), 8, jnp.int32)
    tok = jnp.array([1, 4], jnp.int32)

    cfg_p = dataclasses.replace(cfg, decode_kernel=True)
    assert cfg_p.kv_packed
    _, cache_x = prefill(params, cfg, tokens, lengths, cache_len=32)
    _, cache_p = prefill(params, cfg_p, tokens, lengths, cache_len=32)
    assert cache_p.v is None
    assert cache_p.k.shape[-1] == 128

    logits_x, cx = decode_step(params, cfg, tok, cache_x)
    logits_p, cp = decode_step(params, cfg_p, tok, cache_p)
    a, b_ = np.asarray(logits_x), np.asarray(logits_p)
    assert np.max(np.abs(a - b_)) / np.abs(a).max() < 0.05
    # a second step exercises the packed in-place writer
    logits_x2, _ = decode_step(params, cfg, tok, cx)
    logits_p2, _ = decode_step(params, cfg_p, tok, cp)
    a2, b2 = np.asarray(logits_x2), np.asarray(logits_p2)
    assert np.max(np.abs(a2 - b2)) / np.abs(a2).max() < 0.05


@pytest.mark.parametrize("valid_len", [1, 100, 128, 129, 255, 256])
def test_decode_attention_unpacked_tblk_matches_unblocked(valid_len):
    """The T-blocked (valid-length clamped) UNPACKED int8 kernel — the
    d_head-128 families' path — == the whole-row kernel when the bias
    masks the same region."""
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.ops.decode_attention import decode_attention_stacked

    rng = np.random.RandomState(11)
    L, b, kv, g, d, T = 2, 2, 4, 2, 128, 256
    q = jnp.asarray(rng.randn(b, kv, g, d).astype(np.float32))
    col = np.arange(T)[None, :]
    masked = (col >= valid_len) | (rng.rand(b, T) < 0.2)
    bias = jnp.asarray(np.where(masked, -1e30, 0.0).astype(np.float32))
    sm = 1.0 / np.sqrt(d)
    k8 = jnp.asarray(rng.randint(-127, 127, (L, b, kv, T, d)).astype(np.int8))
    v8 = jnp.asarray(rng.randint(-127, 127, (L, b, kv, T, d)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)
    vs = jnp.asarray(rng.rand(L, b, kv, T).astype(np.float32) * 0.1 + 0.01)
    kn = jnp.asarray(rng.randn(b, kv, d).astype(np.float32))
    vn = jnp.asarray(rng.randn(b, kv, d).astype(np.float32))

    def exact(l):
        s = jnp.einsum(
            "bhgd,bhtd->bhgt", q, k8[l].astype(jnp.float32)
        ) * sm * ks[l][:, :, None, :] + bias[:, None, None, :]
        s_new = jnp.einsum("bhgd,bhd->bhg", q, kn)[..., None] * sm
        p = jax.nn.softmax(jnp.concatenate([s, s_new], -1), axis=-1)
        v_all = jnp.concatenate(
            [v8[l].astype(jnp.float32) * vs[l][:, :, :, None], vn[:, :, None, :]], 2
        )
        return jnp.einsum("bhgt,bhtd->bhgd", p, v_all)

    for l in range(L):
        want = exact(l)
        scale = float(jnp.mean(jnp.abs(want)))
        got_blk = decode_attention_stacked(
            q, k8, v8, bias, l, ks, vs, kn, vn,
            valid_len=jnp.int32(valid_len),
            sm_scale=sm, int8_dots=True,
        )
        got_row = decode_attention_stacked(
            q, k8, v8, bias, l, ks, vs, kn, vn,
            sm_scale=sm, int8_dots=True,
        )
        assert float(jnp.mean(jnp.abs(got_blk - want))) / scale < 0.05
        assert float(jnp.mean(jnp.abs(got_blk - got_row))) / scale < 0.05
