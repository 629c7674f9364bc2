"""Test bootstrap: force JAX onto a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py / the driver; the suite must
run anywhere. Setting the env vars here (before any jax import) gives
every test 8 virtual CPU devices for multi-chip sharding tests.
"""

import os
import sys
from pathlib import Path

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must not write CPU executables into the on-disk TPU compile
# cache (engines/__init__ enables it for serving processes).
os.environ.setdefault("VOCALIE_JIT_CACHE", "0")

# The environment's TPU plugin force-appends itself to jax_platforms, so
# the env var alone is not enough — override the config after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import json

import pytest


@pytest.fixture
def api_client(tmp_path, monkeypatch):
    """Full HTTP test server with isolated dirs and the fake engine.

    Mirrors the reference's central fixture (ref: conftest.py:22-60):
    tmp work/output/presets/refs dirs, a planted fake voice ref, API
    key auth enforced (localhost trust disabled), no real model loaded.
    """
    from vocalie_tts_tpu.engines import enable_fake_engine
    from vocalie_tts_tpu.server import config as server_config
    from vocalie_tts_tpu.server import rate_limit
    from vocalie_tts_tpu.server.routes import refs as refs_routes
    from vocalie_tts_tpu.server.services.job_service import JOB_STORE

    enable_fake_engine()

    work_dir = tmp_path / "work"
    output_dir = tmp_path / "output"
    presets_dir = tmp_path / "presets"
    assets_meta_dir = output_dir / ".assets"
    ref_dir = tmp_path / "Ref_audio"
    for d in (work_dir, output_dir, presets_dir, assets_meta_dir, ref_dir):
        d.mkdir(parents=True, exist_ok=True)

    # Plant a real (tiny) WAV voice reference.
    import numpy as np

    from vocalie_tts_tpu.io.wavio import write_wav

    t = np.arange(24000 * 4) / 24000.0
    write_wav(ref_dir / "voice.wav", (0.3 * np.sin(2 * np.pi * 220 * t)).astype("float32"), 24000)

    lexique_path = tmp_path / "lexique_tts_fr.json"
    lexique_path.write_text(
        json.dumps({"meta": {}, "exceptions": {}, "letters": {"A": "a", "B": "bé", "C": "cé"}}),
        encoding="utf-8",
    )

    monkeypatch.setenv("VOCALIE_API_KEY", "test-api-key")
    # Isolate the weight/asset store: backend install/uninstall routes
    # mutate it (the API fuzz test once rmtree'd the repo's real
    # .assets/piper and left a half-written vits.npz behind)
    monkeypatch.setenv("VOCALIE_ASSETS_DIR", str(tmp_path / "assets"))
    monkeypatch.setattr(server_config, "VOCALIE_TRUST_LOCALHOST", False)
    monkeypatch.setattr(server_config, "WORK_DIR", work_dir)
    monkeypatch.setattr(server_config, "OUTPUT_DIR", output_dir)
    monkeypatch.setattr(server_config, "PRESETS_DIR", presets_dir)
    monkeypatch.setattr(server_config, "ASSETS_META_DIR", assets_meta_dir)
    monkeypatch.setattr(server_config, "LEXIQUE_PATH", lexique_path)
    monkeypatch.setattr(refs_routes, "_current_ref_dir", str(ref_dir))
    monkeypatch.setenv("VOCALIE_REF_DIR", str(ref_dir))
    import vocalie_tts_tpu.io.refs as io_refs

    monkeypatch.setattr(io_refs, "_runtime_ref_dir", None)
    JOB_STORE.reset()
    rate_limit.reset_buckets()

    from vocalie_tts_tpu.server.app import create_app
    from vocalie_tts_tpu.server.testing import SyncTestServer

    server = SyncTestServer(create_app(), api_key="test-api-key")
    server.ref_dir = ref_dir
    server.work_dir = work_dir
    server.output_dir = output_dir
    try:
        yield server
    finally:
        server.close()
