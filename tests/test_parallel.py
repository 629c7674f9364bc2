"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    decode_step,
    init_params,
    prefill,
)
from vocalie_tts_tpu.parallel.mesh import make_mesh, shard_params
from vocalie_tts_tpu.parallel.serve import make_sharded_decode, place_for_serving
from vocalie_tts_tpu.parallel.train import (
    create_train_state,
    make_sharded_train_step,
)

pytestmark = pytest.mark.device

CFG = TransformerConfig(
    vocab_size=128,
    d_model=64,
    n_layers=2,
    n_heads=4,
    n_kv_heads=4,
    d_head=16,
    d_ff=128,
    max_seq_len=64,
    dtype=jnp.float32,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_decode_matches_single_device():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, CFG.vocab_size)
    lengths = jnp.full((4,), 8, jnp.int32)

    # single-device reference
    ref_logits, ref_cache = prefill(params, CFG, tokens, lengths, cache_len=32)
    step_tok = jnp.zeros((4,), jnp.int32)
    ref_step, _ = decode_step(params, CFG, step_tok, ref_cache)

    mesh = make_mesh(4, tp=2)
    with mesh:
        sharded = place_for_serving(params, mesh)
        prefill_jit, step_jit = make_sharded_decode(CFG, mesh)
        logits, cache = prefill_jit(sharded, tokens, lengths, cache_len=32)
        step_logits, cache = step_jit(sharded, step_tok, cache)

    assert float(jnp.max(jnp.abs(logits - ref_logits))) < 1e-3
    assert float(jnp.max(jnp.abs(step_logits - ref_step))) < 1e-3


def test_sharded_train_step_loss_matches_mesh_shapes():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.zeros((4, 16), jnp.int32)
    targets = jnp.ones((4, 16), jnp.int32)

    losses = []
    for n, tp in ((2, 1), (4, 2), (8, 2)):
        mesh = make_mesh(n, tp=tp)
        with mesh:
            # NB: the train step donates its state (in-place update on
            # device) — re-materialize params per mesh, device_put may
            # alias buffers that donation would delete
            fresh = jax.tree_util.tree_map(jnp.copy, params)
            sharded = shard_params(fresh, mesh)
            state = create_train_state(sharded)
            jit_step = make_sharded_train_step(CFG, mesh)(state)
            _state, loss = jit_step(state, tokens, targets)
            losses.append(float(loss))
    assert np.allclose(losses, losses[0], atol=1e-4), losses


def test_param_sharding_divisibility_fallback():
    # vocab 127 is indivisible by tp=2 → lm_head/tok_emb replicate
    cfg = TransformerConfig(
        vocab_size=127, d_model=64, n_layers=1, n_heads=4, n_kv_heads=4,
        d_head=16, d_ff=128, dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, tp=2)
    sharded = shard_params(params, mesh)
    # placement must succeed and values stay intact
    assert np.allclose(
        np.asarray(sharded["lm_head"], np.float32),
        np.asarray(params["lm_head"], np.float32),
    )


def test_training_loss_decreases():
    """The sharded fine-tuning step actually learns a toy mapping."""
    params = init_params(jax.random.PRNGKey(3), CFG)
    mesh = make_mesh(4, tp=2)
    tokens = jnp.tile(jnp.arange(16)[None, :], (4, 1))
    targets = jnp.roll(tokens, -1, axis=1)
    from vocalie_tts_tpu.parallel.train import make_optimizer

    with mesh:
        sharded = shard_params(jax.tree_util.tree_map(jnp.copy, params), mesh)
        state = create_train_state(sharded, make_optimizer(learning_rate=1e-2))
        jit_step = make_sharded_train_step(CFG, mesh, make_optimizer(1e-2))(state)
        losses = []
        for _ in range(12):
            state, loss = jit_step(state, tokens, targets)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses


def test_sharded_decode_with_int8_weights():
    """TP sharding rules apply cleanly to int8-quantized param trees
    (q shards like its float twin, scales replicate/shard consistently)."""
    from vocalie_tts_tpu.models.common.transformer import quantize_weights_int8

    params = quantize_weights_int8(init_params(jax.random.PRNGKey(0), CFG))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, CFG.vocab_size)
    lengths = jnp.full((4,), 8, jnp.int32)

    ref_logits, ref_cache = prefill(params, CFG, tokens, lengths, cache_len=32)
    step_tok = jnp.zeros((4,), jnp.int32)
    ref_step, _ = decode_step(params, CFG, step_tok, ref_cache)

    mesh = make_mesh(4, tp=2)
    with mesh:
        sharded = place_for_serving(params, mesh)
        prefill_jit, step_jit = make_sharded_decode(CFG, mesh)
        logits, cache = prefill_jit(sharded, tokens, lengths, cache_len=32)
        step_logits, _ = step_jit(sharded, step_tok, cache)

    assert float(jnp.max(jnp.abs(logits - ref_logits))) < 1e-3
    assert float(jnp.max(jnp.abs(step_logits - ref_step))) < 1e-3


def test_sharded_flash_train_step_matches_xla_attention():
    """use_flash=True on the mesh (shard_map'd Pallas fwd+bwd) must
    reproduce the XLA-attention train loss — the TP fine-tune path no
    longer falls back silently."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, CFG.vocab_size)
    targets = jnp.ones((4, 16), jnp.int32)

    losses = {}
    for use_flash in (False, True):
        mesh = make_mesh(4, tp=2)
        with mesh:
            fresh = jax.tree_util.tree_map(jnp.copy, params)
            sharded = shard_params(fresh, mesh)
            state = create_train_state(sharded)
            jit_step = make_sharded_train_step(CFG, mesh, use_flash=use_flash)(state)
            state, loss = jit_step(state, tokens, targets)
            # take one more step so the BACKWARD pass (grads) also has
            # to match, not just the forward loss
            state, loss2 = jit_step(state, tokens, targets)
            losses[use_flash] = (float(loss), float(loss2))
    assert np.allclose(losses[False], losses[True], atol=2e-3), losses


def test_sharded_audiosr_enhance_matches_single_device():
    """Window-sharded AudioSR enhancement == the single-device dispatch
    (embarrassingly parallel over windows; gather only at the end)."""
    import os

    from vocalie_tts_tpu.models.audiosr.model import (
        enhance_window,
        init_audiosr,
    )
    from vocalie_tts_tpu.models.audiosr.runtime import SCALES
    from vocalie_tts_tpu.parallel.serve import make_sharded_enhance

    cfg = SCALES["tiny"]
    params = init_audiosr(jax.random.PRNGKey(3), cfg)
    mesh = make_mesh(4, tp=2)
    w = 8  # one window per device
    t = 2048
    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal((w, t))).astype(np.float32)

    want = np.asarray(enhance_window(
        params, cfg, jnp.asarray(audio), jax.random.PRNGKey(7),
        ddim_steps=3, guidance_scale=2.0,
    ))
    enhance = make_sharded_enhance(cfg, mesh)
    got = np.asarray(enhance(
        params, jnp.asarray(audio), jax.random.PRNGKey(7), 3, 2.0
    ))
    np.testing.assert_allclose(got, want, atol=2e-5)
