"""In-place Pallas KV-cache appender (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.ops.cache_update import cache_append_stacked

pytestmark = pytest.mark.device


@pytest.mark.parametrize("dtype", [np.int8, np.float32])
def test_cache_append_writes_only_pos(dtype):
    rng = np.random.RandomState(0)
    L, b, kv, T, d = 2, 2, 3, 24, 64

    def mk(shape):
        a = rng.randint(-127, 127, shape)
        return a.astype(dtype)

    k, v = mk((L, b, kv, T, d)), mk((L, b, kv, T, d))
    kn, vn = mk((L, b, kv, d)), mk((L, b, kv, d))
    for pos in (0, 7, 8, 13, 23):
        k2, v2 = cache_append_stacked(
            jnp.asarray(k), jnp.asarray(v), jnp.asarray(kn), jnp.asarray(vn), pos
        )
        wk, wv = k.copy(), v.copy()
        wk[:, :, :, pos, :] = kn
        wv[:, :, :, pos, :] = vn
        assert (np.asarray(k2) == wk).all()
        assert (np.asarray(v2) == wv).all()


def test_cache_append_rejects_unaligned_len():
    z = jnp.zeros((1, 1, 1, 12, 64), jnp.int8)
    n = jnp.zeros((1, 1, 1, 64), jnp.int8)
    with pytest.raises(ValueError):
        cache_append_stacked(z, z, n, n, 3)
