"""Fused Pallas GroupNorm (ops/groupnorm) vs the exact XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.models.common.unet2d import _norm_act, group_norm, norm_init
from vocalie_tts_tpu.ops.groupnorm import group_norm_fused


def _ref(x, g, b, *, groups, eps=1e-5, silu=False, pre_add=None):
    xf = x.astype(np.float32)
    if pre_add is not None:
        bc = (1,) * (x.ndim - 2)
        xf = xf + pre_add.astype(np.float32).reshape(x.shape[0], *bc, x.shape[-1])
    y = np.asarray(
        group_norm(jnp.asarray(xf), jnp.asarray(g), jnp.asarray(b),
                   groups=groups, eps=eps)
    )
    if silu:
        y = y * (1.0 / (1.0 + np.exp(-y)))
    return y


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("pre_add", [False, True])
@pytest.mark.parametrize("shape,groups", [
    ((4, 5, 8, 128), 32),     # UNet level shape (non-pow2 spatial)
    ((2, 16, 256), 32),       # pre-flattened 3D
    ((8, 3, 3, 16), 4),       # tiny scale
])
def test_group_norm_fused_matches_reference(shape, groups, silu, pre_add):
    rng = np.random.RandomState(3)
    c = shape[-1]
    x = rng.randn(*shape).astype(np.float32) * 2.0 + 0.5
    g = (1.0 + 0.2 * rng.randn(c)).astype(np.float32)
    b = (0.1 * rng.randn(c)).astype(np.float32)
    e = (0.3 * rng.randn(shape[0], c)).astype(np.float32) if pre_add else None

    got = group_norm_fused(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(g), jnp.asarray(b),
        groups=groups, silu=silu,
        pre_add=jnp.asarray(e, jnp.bfloat16) if pre_add else None,
    )
    assert got.dtype == jnp.bfloat16
    want = _ref(x, g, b, groups=groups, silu=silu, pre_add=e)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, atol=0.15,
        err_msg="fused kernel diverges beyond bf16 rounding",
    )


def test_norm_act_f32_path_unchanged():
    """The f32 helper path is bit-identical to the original chain."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 4, 6, 32).astype(np.float32))
    p = norm_init(32)
    e = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    got = _norm_act(x, p, silu=True, pre_add=e)
    want = jax.nn.silu(
        group_norm(x + e[:, None, None, :], p["g"], p["b"], groups=32)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
