"""Real-engine (VITS tiny) end-to-end through the HTTP API: install →
catalog availability → job → asset. The only suite test that runs an
actual model graph behind the API (the reference's equivalent tier is
env-gated venv tests — ref: tests/test_chatterbox_runner_venv.py)."""

import time

import pytest


@pytest.fixture
def piper_installed(api_client, tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ASSETS_DIR", str(tmp_path / "assets"))
    monkeypatch.delenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", raising=False)

    import vocalie_tts_tpu.engines as engines
    from vocalie_tts_tpu.engines.piper import PiperEngine

    # reset the runtime singleton so the tiny scale takes effect
    engines.TTSEngine._INSTANCES.pop("piper", None)
    engines.invalidate_availability_cache()
    yield api_client
    engines.TTSEngine._INSTANCES.pop("piper", None)
    engines.invalidate_availability_cache()
    del PiperEngine


def test_piper_install_and_generate(piper_installed):
    api = piper_installed
    # not installed → catalog shows unavailable
    engines_body = api.get("/v1/tts/engines").json()
    piper_row = next(e for e in engines_body["engines"] if e["id"] == "piper")
    assert piper_row["available"] is False

    # install (materializes tiny random-init weights). Explicit generous
    # timeout: install AOT-warms the jitted graph, and a tiny-VITS
    # compile can exceed the client's 30 s default under a loaded host.
    resp = api.post("/v1/backends/piper/install", timeout=300.0)
    assert resp.status_code == 200, resp.text
    assert resp.json()["status"] == "installed"
    status = api.get("/v1/backends/piper/status").json()
    assert status["installed"] is True

    engines_body = api.get("/v1/tts/engines").json()
    piper_row = next(e for e in engines_body["engines"] if e["id"] == "piper")
    assert piper_row["available"] is True

    # generate through the job API with an internal voice
    resp = api.post(
        "/v1/tts/jobs",
        json={
            "engine_id": "piper",
            "text": "Bonjour le monde.",
            "voice_id": "fr_FR-siwis-medium",
        },
    )
    assert resp.status_code == 200, resp.text
    job_id = resp.json()["job_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        body = api.get(f"/v1/jobs/{job_id}", timeout=300.0).json()
        if body["status"] in {"done", "error"}:
            break
        time.sleep(0.2)
    assert body["status"] == "done", body
    meta = api.get(f"/v1/assets/{body['asset_id']}/meta").json()
    assert meta["engine"] == "piper"
    assert meta["sample_rate"] == 24000  # pipeline resamples 22050 → 24000
    wav = api.get(f"/v1/assets/{body['asset_id']}")
    assert wav.content[:4] == b"RIFF"

    # uninstall works (piper is not protected)
    resp = api.delete("/v1/backends/piper/uninstall")
    assert resp.status_code == 200
    status = api.get("/v1/backends/piper/status").json()
    assert status["installed"] is False
