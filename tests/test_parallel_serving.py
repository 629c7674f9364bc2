"""Engine-path multi-chip serving (VOCALIE_SERVE_MESH) on the virtual
8-device CPU mesh.

Round-4 verdict #2: the sharded path must run the engine's ACTUAL
generate program — bucketed prompt padding, prefill, the sampling
while_loop over the bucketed KV cache, and the stage-2 codec decode —
not raw transformer.prefill/decode_step. These tests create the
Qwen3-class LMTTSRuntime with a dp×tp serving mesh and check its
synthesize_batch output against the single-device runtime (same init
seed, greedy temperature → bit-identical token choices).
"""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.device

TEXTS = [
    "Bonjour le maillage.",
    "Deuxième phrase du lot.",
    "Troisième exemple court.",
    "Quatrième et dernier texte.",
]


@pytest.fixture()
def tiny_env(tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.delenv("VOCALIE_SERVE_MESH", raising=False)
    monkeypatch.delenv("VOCALIE_KV_INT8", raising=False)
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    return tmp_path


def _make_runtime(assets_dir):
    from vocalie_tts_tpu.models.lmtts.runtime import LMTTSRuntime

    return LMTTSRuntime.create(assets_dir, force_init=True)


def test_serve_mesh_from_env_parses_and_validates(monkeypatch):
    from vocalie_tts_tpu.parallel.serve import serve_mesh_from_env

    monkeypatch.delenv("VOCALIE_SERVE_MESH", raising=False)
    assert serve_mesh_from_env() is None

    monkeypatch.setenv("VOCALIE_SERVE_MESH", "4x2")
    mesh = serve_mesh_from_env()
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2

    monkeypatch.setenv("VOCALIE_SERVE_MESH", "8")
    mesh = serve_mesh_from_env()
    assert mesh.shape["dp"] == 8 and mesh.shape["tp"] == 1

    monkeypatch.setenv("VOCALIE_SERVE_MESH", "64x2")
    with pytest.raises(ValueError, match="needs 128 devices"):
        serve_mesh_from_env()

    monkeypatch.setenv("VOCALIE_SERVE_MESH", "banana")
    with pytest.raises(ValueError, match="DPxTP"):
        serve_mesh_from_env()


def test_shard_generate_inputs_places_batch_on_dp(monkeypatch):
    from vocalie_tts_tpu.parallel.mesh import make_mesh
    from vocalie_tts_tpu.parallel.serve import shard_generate_inputs

    mesh = make_mesh(8, tp=2)
    embeds = np.zeros((8, 16, 32), np.float32)
    lengths = np.full((8,), 16, np.int32)
    rng = jax.random.PRNGKey(0)
    (e, l), (r,) = shard_generate_inputs(mesh, (embeds, lengths), (rng,))
    assert e.sharding.spec[0] == "dp" and l.sharding.spec[0] == "dp"
    assert len(e.sharding.device_set) == 8
    # replicated leaf: no partitioned axes
    assert all(p is None for p in r.sharding.spec)


def test_runtime_sharded_generate_matches_single_device(tiny_env, monkeypatch):
    # single-device reference (greedy → deterministic token path)
    ref_rt = _make_runtime(tiny_env / "a")
    ref_out = ref_rt.synthesize_batch(TEXTS, temperature=0.0)

    monkeypatch.setenv("VOCALIE_SERVE_MESH", "4x2")
    mesh_rt = _make_runtime(tiny_env / "b")
    assert mesh_rt.mesh is not None
    mesh_out = mesh_rt.synthesize_batch(TEXTS, temperature=0.0)

    for (a0, sr0, m0), (a1, sr1, m1) in zip(ref_out, mesh_out):
        assert m0["codec_tokens"] == m1["codec_tokens"]
        assert m1["serve_mesh"] == "4dp x 2tp"
        assert a0.shape == a1.shape and sr0 == sr1
        if a0.size:
            np.testing.assert_allclose(a0, a1, atol=1e-3)


def test_runtime_pure_dp_mesh(tiny_env, monkeypatch):
    monkeypatch.setenv("VOCALIE_SERVE_MESH", "8")
    rt = _make_runtime(tiny_env / "dp")
    out = rt.synthesize_batch(TEXTS[:2], temperature=0.0)
    assert len(out) == 2
    for audio, sr, meta in out:
        assert meta["serve_mesh"] == "8dp x 1tp"
        assert audio.size > 0


def test_engine_synthesize_batch_on_mesh(tiny_env, monkeypatch):
    """The public engine surface (Qwen3Engine.synthesize_batch) over
    the mesh — the integration SURVEY §5.8 sketches."""
    monkeypatch.setenv("VOCALIE_SERVE_MESH", "4x2")
    monkeypatch.setenv("VOCALIE_ASSETS_DIR", str(tiny_env / "assets"))

    from vocalie_tts_tpu.engines.qwen3 import Qwen3Engine

    engine = Qwen3Engine()
    engine._runtime = None  # fresh instance; don't reuse a singleton
    if not engine.is_available():
        pytest.skip(engine.unavailable_reason() or "qwen3 unavailable")
    results = engine.synthesize_batch(
        TEXTS, lang="fr", qwen3_mode="custom_voice", voice="Vivian"
    )
    assert len(results) == len(TEXTS)
    for audio, sr, meta in results:
        assert meta["serve_mesh"] == "4dp x 2tp"
        assert sr == 24000
        assert audio.ndim == 1 and audio.size > 0
