"""Real-engine (tiny scale) end-to-end through the HTTP API for every
remaining AR family: install → catalog availability → job → asset.
Extends the Piper-only tier-3 coverage (test_api_piper_e2e.py) to
xtts / qwen3 / cosyvoice per the round-2 test-strategy gap (the
reference's equivalent tier is env-gated venv tests — ref:
tests/test_chatterbox_runner_venv.py)."""

import time

import pytest

# install id → (job-API engine id, extra job-request fields)
CASES = {
    "chatterbox": {
        # the flagship, FR-overlay variant (ref analog:
        # tests/test_chatterbox_runner_venv.py:9-32)
        "job_id": "chatterbox_finetune_fr",
        "needs_ref": True,
        "params": {"cfg_weight": 0.6, "temperature": 0.5},
    },
    "xtts": {"job_id": "xtts", "needs_ref": True, "params": {}},
    "qwen3": {"job_id": "qwen3_custom", "needs_ref": False,
              "params": {"qwen3_speaker": "Vivian"}},
    "cosyvoice": {
        "job_id": "cosyvoice_instruct",
        "needs_ref": False,
        "params": {"cosyvoice_instruct": "Parle calmement."},
    },
}


@pytest.fixture
def engines_env(api_client, tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ASSETS_DIR", str(tmp_path / "assets"))
    monkeypatch.delenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", raising=False)

    import vocalie_tts_tpu.engines as engines

    for eid in CASES:
        engines.TTSEngine._INSTANCES.pop(eid, None)
    engines.invalidate_availability_cache()
    yield api_client
    for eid in CASES:
        engines.TTSEngine._INSTANCES.pop(eid, None)
    engines.invalidate_availability_cache()


@pytest.mark.parametrize("engine_id", sorted(CASES))
def test_engine_install_and_generate(engines_env, engine_id):
    api = engines_env
    case = CASES[engine_id]

    # install materializes tiny weights + AOT-warms; generous timeout
    # (first tiny compile can exceed the 30 s client default under load)
    resp = api.post(f"/v1/backends/{engine_id}/install", timeout=900.0)
    assert resp.status_code == 200, resp.text
    assert resp.json()["status"] == "installed"
    status = api.get(f"/v1/backends/{engine_id}/status").json()
    assert status["installed"] is True

    body = {"engine_id": case["job_id"], "text": "Bonjour le monde.",
            "engine_params": case["params"]}
    if case["needs_ref"]:
        body["voice_id"] = "voice.wav"   # planted by the api_client fixture
    resp = api.post("/v1/tts/jobs", json=body)
    assert resp.status_code == 200, resp.text
    job_id = resp.json()["job_id"]

    deadline = time.time() + 600
    while time.time() < deadline:
        status = api.get(f"/v1/jobs/{job_id}", timeout=600.0).json()
        if status["status"] in {"done", "error"}:
            break
        time.sleep(0.3)
    assert status["status"] == "done", status

    meta = api.get(f"/v1/assets/{status['asset_id']}/meta").json()
    assert meta["engine"] == case["job_id"]
    assert meta["sample_rate"] == 24000
    wav = api.get(f"/v1/assets/{status['asset_id']}")
    assert wav.content[:4] == b"RIFF"


def test_stream_route_real_cosyvoice_incremental(engines_env):
    """/v1/tts/stream against the real (tiny) cosyvoice engine must
    deliver audio incrementally over chunked transfer — more than one
    raw HTTP chunk, valid streaming-WAV framing, PCM16 payload."""
    import struct

    api = engines_env
    resp = api.post("/v1/backends/cosyvoice/install", timeout=900.0)
    assert resp.status_code == 200, resp.text

    raw_chunks = []
    with api._client.stream(
        "POST",
        "/v1/tts/stream",
        json={
            "engine": "cosyvoice_instruct",
            "text": "Bonjour, ceci est un flux incrémental de synthèse vocale.",
            "engine_params": {"cosyvoice_instruct": "Parle calmement."},
        },
        headers={"X-API-Key": "test-api-key"},
        timeout=600.0,
    ) as resp:
        assert resp.status_code == 200, resp.read()
        assert resp.headers["Content-Type"].startswith("audio/wav")
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        for piece in resp.iter_raw():
            if piece:
                raw_chunks.append(piece)

    # incremental arrival: the body came in several raw pieces, not one
    assert len(raw_chunks) >= 2, [len(c) for c in raw_chunks]
    data = b"".join(raw_chunks)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack("<I", data[4:8])[0] == 0xFFFFFFFF
    sr = struct.unpack("<I", data[24:28])[0]
    assert sr == int(resp.headers["X-Sample-Rate"])
    pcm = data[44:]
    assert len(pcm) % 2 == 0 and len(pcm) > sr // 2  # ≥0.25 s of s16 audio
