"""One-jit weight materialization (models/common/weights.py).

Cold-start path (round-4 verdict #3): runtimes must materialize their
whole param bundle — init → checkpoint overlay → quantize/fuse — as ONE
jitted program, with checkpoints loaded host-side against eval_shape
templates. These tests pin the semantics the runtimes rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocalie_tts_tpu.models.common.weights import (
    load_params_host,
    materialize_bundle,
    materialize_params,
    save_params,
)


def _init_tree(key):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (4, 8), jnp.float32),
        "emb": (jax.random.normal(k2, (16, 4), jnp.float32) * 0.02).astype(
            jnp.bfloat16
        ),
    }


def test_materialize_params_matches_eager():
    k = jax.random.PRNGKey(3)
    eager = _init_tree(k)
    jitted = materialize_params(_init_tree, k)
    for a, b in zip(jax.tree_util.tree_leaves(eager),
                    jax.tree_util.tree_leaves(jitted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_params_host_from_eval_shape_template(tmp_path):
    k = jax.random.PRNGKey(5)
    tree = _init_tree(k)
    save_params(tmp_path, "m", tree)
    tpl = jax.eval_shape(_init_tree, k)
    host = load_params_host(tmp_path, "m", tpl)
    # host leaves are numpy, cast back to template dtypes (incl. bf16)
    assert isinstance(host["w"], np.ndarray)
    assert host["emb"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(host["w"], np.asarray(tree["w"]))
    np.testing.assert_array_equal(
        host["emb"].astype(np.float32), np.asarray(tree["emb"], np.float32)
    )


def test_materialize_bundle_overlay_and_transform(tmp_path):
    k = jax.random.PRNGKey(7)
    saved = _init_tree(k)
    save_params(tmp_path, "a", saved)

    calls = []

    def transform(parts):
        calls.append(sorted(parts))
        return {name: {**p, "w": p["w"] * 2.0} for name, p in parts.items()}

    out = materialize_bundle(
        tmp_path,
        [
            ("a", "a", lambda: _init_tree(jax.random.PRNGKey(99))),  # ckpt wins
            ("b", "missing", lambda: _init_tree(jax.random.fold_in(k, 1))),
        ],
        transform=transform,
    )
    assert calls == [["a", "b"]]
    # "a" came from the checkpoint (not the PRNGKey(99) init), transformed
    np.testing.assert_allclose(
        np.asarray(out["a"]["w"]), np.asarray(saved["w"]) * 2.0, rtol=1e-6
    )
    # "b" had no checkpoint: inited inside the jit, transformed
    expect_b = _init_tree(jax.random.fold_in(k, 1))
    np.testing.assert_allclose(
        np.asarray(out["b"]["w"]), np.asarray(expect_b["w"]) * 2.0, rtol=1e-6
    )
    # outputs are device arrays, ready to feed jitted programs
    assert isinstance(out["a"]["w"], jax.Array)


def test_materialize_bundle_force_init_ignores_checkpoint(tmp_path):
    k = jax.random.PRNGKey(11)
    save_params(tmp_path, "a", _init_tree(k))
    out = materialize_bundle(
        tmp_path,
        [("a", "a", lambda: _init_tree(jax.random.PRNGKey(99)))],
        force_init=True,
    )
    expect = _init_tree(jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), np.asarray(expect["w"]))


def test_load_params_host_missing_key_raises(tmp_path):
    k = jax.random.PRNGKey(13)
    tree = _init_tree(k)
    save_params(tmp_path, "m", {"w": tree["w"]})  # missing "emb"
    with pytest.raises(ValueError, match="missing keys"):
        load_params_host(tmp_path, "m", jax.eval_shape(_init_tree, k))
