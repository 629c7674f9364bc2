"""int8 UNet conv path (models/common/unet2d.py).

The AudioSR DDIM loop is conv-bound at the bf16 MXU peak; the int8
path (VOCALIE_AUDIOSR_INT8=1, off by default) targets the ~2× int8
MXU rate. These tests pin the quantization math on CPU: per-channel
symmetric weight quant, dynamic per-sample activation quant, the
attention qkv column-permutation carrying its scales, and the
quantized full-UNet forward staying close to f32.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.device


def test_conv2d_int8_matches_float():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.unet2d import (
        conv2d,
        conv2d_init,
        conv_quantize_int8,
    )

    key = jax.random.PRNGKey(0)
    p = conv2d_init(key, 3, 16, 24)
    p = {"w": p["w"], "b": jnp.asarray(np.random.RandomState(1).randn(24), jnp.float32)}
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 16), jnp.float32)

    want = np.asarray(conv2d(p, x))
    got = np.asarray(conv2d(conv_quantize_int8(p), x))

    assert got.shape == want.shape
    # two int8 roundings (weights + activations): ~1% rms error; bound
    # the max error against the output scale (per-element relative error
    # is meaningless at near-zero outputs)
    scale = np.max(np.abs(want))
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 0.02
    assert np.max(np.abs(got - want)) < 0.02 * scale
    # bias must pass through exactly where the conv input is zero
    z = np.asarray(conv2d(conv_quantize_int8(p), jnp.zeros_like(x)))
    np.testing.assert_allclose(z, np.broadcast_to(p["b"], z.shape), atol=1e-6)


def test_conv2d_int8_per_sample_scales():
    """Dynamic activation quant: scaling one sample must not change
    the other's output (scales are per-sample, not per-batch)."""
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.unet2d import conv2d, conv_quantize_int8, conv2d_init

    p = conv_quantize_int8(conv2d_init(jax.random.PRNGKey(3), 3, 8, 8))
    x = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 8), jnp.float32)
    base = np.asarray(conv2d(p, x))
    x2 = x.at[1].multiply(100.0)
    mixed = np.asarray(conv2d(p, x2))
    np.testing.assert_allclose(mixed[0], base[0], atol=1e-6)


def test_quantize_unet_tree_and_forward():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.unet2d import (
        UNet2DConfig,
        apply_unet2d,
        init_unet2d,
        quantize_unet_convs,
    )

    cfg = UNet2DConfig(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
    )
    params = init_unet2d(jax.random.PRNGKey(7), cfg)
    qparams = quantize_unet_convs(params)

    # the FINAL out_conv stays full precision; interior convs are int8
    assert "w" in qparams["out_conv"] and "w_q" not in qparams["out_conv"]
    first = qparams["input_blocks"][0]["conv"]
    assert first["w_q"].dtype == jnp.int8 and first["w_s"].shape == (32,)
    # attention qkv/proj quantized too (exercises the scale permutation)
    assert "w_q" in qparams["middle_block"]["attn"]["qkv"]
    # dense (2-D) layers untouched
    assert "w" in qparams["input_blocks"][1]["res"]["emb"]

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6), np.float32)
    t = jnp.asarray([3.0, 700.0], np.float32)
    want = np.asarray(apply_unet2d(params, cfg, x, t))
    got = np.asarray(apply_unet2d(qparams, cfg, x, t))
    assert got.shape == want.shape
    assert np.all(np.isfinite(got))
    # eps estimates stay close in an rms sense (per-element tolerance is
    # meaningless through 10+ quantized layers)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.15, rel


def test_audiosr_int8_runtime_saves_float_tree(tmp_path, monkeypatch):
    """VOCALIE_AUDIOSR_INT8 serving view must not leak into checkpoints."""
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_AUDIOSR_BF16", "1")
    monkeypatch.setenv("VOCALIE_AUDIOSR_INT8", "1")
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    rt = AudioSRRuntime.create(tmp_path, force_init=True)

    def leaves_with(node, key):
        if isinstance(node, dict):
            return (key in node) or any(leaves_with(v, key) for v in node.values())
        if isinstance(node, (list, tuple)):
            return any(leaves_with(v, key) for v in node)
        return False

    assert leaves_with(rt.params["unet"], "w_q")
    rt.save_weights()
    rt2 = AudioSRRuntime.create(tmp_path)  # reload from the checkpoint
    assert leaves_with(rt2.params["unet"], "w_q")  # re-quantized view
    assert not leaves_with(rt2._save_params["unet"], "w_q")  # float store
