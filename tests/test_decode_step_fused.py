"""Fused whole-step decode kernel (ops/decode_step) equivalence.

The ONE-launch step must match the per-layer kernel paths it replaces:
- vs the megalayer path (identical quantization scheme: per-row qkv
  activation quant, per-head-chunk o-proj rows) → tight tolerance;
- vs the plain-XLA float decode (dense kernels off) → the usual ~7-bit
  activation-quantization tolerance.

Runs in pallas interpret mode on CPU (tests/conftest.py forces the cpu
backend).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.models.common.transformer import (
    StackedKVCache,
    TransformerConfig,
    decode_step,
    fuse_decode_weights,
    init_params,
    maybe_head_stack_qkv,
    prefill,
    quantize_weights_int8,
)

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _cfg(attn_bias: bool) -> TransformerConfig:
    return TransformerConfig(
        vocab_size=160,
        d_model=256,
        n_layers=3,
        n_heads=4,
        n_kv_heads=4,
        d_head=64,
        d_ff=512,
        max_seq_len=256,
        kv_quant=True,
        decode_kernel=True,
        dense_kernel=True,
        attn_bias=attn_bias,
        dtype=jnp.float32,
    )


def _setup(cfg: TransformerConfig, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    params = init_params(key, cfg)
    qparams = fuse_decode_weights(quantize_weights_int8(params))
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (1, 40), 0,
                                cfg.vocab_size)
    lengths = jnp.asarray([37], jnp.int32)
    _logits, cache = prefill(qparams, cfg, tokens, lengths, cache_len=128)
    tok = jnp.asarray([7], jnp.int32)
    return qparams, cache, tok


def _run_steps(params, cfg, tok, cache, n_steps=3):
    """A few chained decode steps over a FIXED token sequence (argmax
    chaining would let a near-tie turn a quantization-level difference
    into a divergent token path)."""
    del tok
    outs = []
    for t in (7, 12, 3)[:n_steps]:
        logits, cache = decode_step(params, cfg, jnp.asarray([t], jnp.int32),
                                    cache)
        outs.append(logits)
    return jnp.stack(outs), cache


@pytest.mark.parametrize("attn_bias", [False, True])
def test_fused_step_matches_megalayer(monkeypatch, attn_bias):
    cfg = _cfg(attn_bias)
    qparams, cache, tok = _setup(cfg)
    assert cfg.kv_packed

    monkeypatch.setenv("VOCALIE_MEGALAYER", "1")
    monkeypatch.delenv("VOCALIE_FUSED_STEP", raising=False)
    ref_logits, ref_cache = _run_steps(qparams, cfg, tok, cache)

    monkeypatch.delenv("VOCALIE_MEGALAYER", raising=False)
    monkeypatch.setenv("VOCALIE_FUSED_STEP", "1")
    fparams = maybe_head_stack_qkv(qparams, cfg, 1)
    assert "wqkv_h" in fparams["layers"], "head-stacked layout not installed"
    got_logits, got_cache = _run_steps(fparams, cfg, tok, cache)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=2e-3, rtol=2e-3
    )
    # identical token path → identical int8 cache contents
    np.testing.assert_array_equal(
        np.asarray(got_cache.k), np.asarray(ref_cache.k)
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.k_scale, dtype=np.float32),
        np.asarray(ref_cache.k_scale, dtype=np.float32),
        atol=1e-6,
    )


def test_fused_step_close_to_float_reference(monkeypatch):
    cfg = _cfg(True)
    qparams, cache, tok = _setup(cfg)

    # float reference: same int8 weights, but the XLA (non-pallas)
    # decode path — no in-kernel activation quantization
    ref_cfg = TransformerConfig(**{
        **{f.name: getattr(cfg, f.name) for f in
           __import__("dataclasses").fields(cfg)},
        "dense_kernel": False, "decode_kernel": False,
    })
    # the XLA path needs an UNPACKED cache — rebuild it
    k2 = jax.random.PRNGKey(9)
    tokens = jax.random.randint(k2, (1, 40), 0, cfg.vocab_size)
    lengths = jnp.asarray([37], jnp.int32)
    _l, ref_cache = prefill(qparams, ref_cfg, tokens, lengths, cache_len=128)
    _l, pk_cache = prefill(qparams, cfg, tokens, lengths, cache_len=128)

    ref_logits, _ = decode_step(qparams, ref_cfg, tok, ref_cache)

    monkeypatch.setenv("VOCALIE_FUSED_STEP", "1")
    fparams = maybe_head_stack_qkv(qparams, cfg, 1)
    got_logits, _ = decode_step(fparams, cfg, tok, pk_cache)

    ref = np.asarray(ref_logits)
    got = np.asarray(got_logits)
    # ~7-bit activation quantization: a few % relative on logits
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, f"fused-step logits off by {err:.3f} rel"


def test_head_stack_requires_full_config():
    cfg = _cfg(False)
    qparams, _cache, _tok = _setup(cfg)
    os.environ["VOCALIE_FUSED_STEP"] = "0"
    try:
        # explicit opt-out → no-op
        assert "wqkv_h" not in maybe_head_stack_qkv(qparams, cfg, 1)["layers"]
    finally:
        os.environ.pop("VOCALIE_FUSED_STEP", None)
    os.environ["VOCALIE_FUSED_STEP"] = "1"
    try:
        # batch != 1 → no-op
        assert "wqkv_h" not in maybe_head_stack_qkv(qparams, cfg, 2)["layers"]
        # unquantized tree → no-op
        plain = fuse_decode_weights(init_params(jax.random.PRNGKey(0), cfg))
        import dataclasses

        gcfg = dataclasses.replace(cfg, norm_type="layer")
        assert "wqkv_h" not in maybe_head_stack_qkv(plain, gcfg, 1)["layers"]
    finally:
        os.environ.pop("VOCALIE_FUSED_STEP", None)
