"""Full HTTP→thread→asset job lifecycle with the fake engine
(modeled on ref: tests/test_api_jobs.py)."""

import time

import pytest

pytestmark = pytest.mark.unit


def _wait_done(api_client, job_id, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        resp = api_client.get(f"/v1/jobs/{job_id}")
        assert resp.status_code == 200
        body = resp.json()
        if body["status"] in {"done", "error", "canceled"}:
            return body
        time.sleep(0.05)
    raise AssertionError("job did not finish in time")


def test_job_lifecycle_to_asset(api_client):
    resp = api_client.post(
        "/v1/tts/jobs",
        json={"engine_id": "fake", "text": "Bonjour tout le monde, ceci est un test."},
    )
    assert resp.status_code == 200, resp.text
    job_id = resp.json()["job_id"]
    assert resp.json()["status"] == "queued"

    body = _wait_done(api_client, job_id)
    assert body["status"] == "done", body
    assert body["progress"] == 1.0
    asset_id = body["asset_id"]
    assert asset_id

    meta = api_client.get(f"/v1/assets/{asset_id}/meta")
    assert meta.status_code == 200
    meta_body = meta.json()
    assert meta_body["engine"] == "fake"
    assert meta_body["file_name"].endswith(".wav")
    assert meta_body["duration_s"] > 0

    wav = api_client.get(f"/v1/assets/{asset_id}")
    assert wav.status_code == 200
    assert wav.headers["Content-Type"].startswith("audio/wav")
    assert wav.content[:4] == b"RIFF"


def test_job_with_snapshot_and_markers(api_client):
    snapshot = "Premiere partie ici. Deuxieme partie la."
    resp = api_client.post(
        "/v1/tts/jobs",
        json={
            "engine_id": "fake",
            "text_source": "snapshot",
            "text_snapshot": snapshot,
            "chunk_markers": [21],
            "post_params": {"chunk_gap_ms": 250},
        },
    )
    assert resp.status_code == 200, resp.text
    body = _wait_done(api_client, resp.json()["job_id"])
    assert body["status"] == "done", body


def test_job_missing_engine_400(api_client):
    resp = api_client.post("/v1/tts/jobs", json={"text": "Bonjour"})
    assert resp.status_code == 400


def test_job_unknown_engine_404(api_client):
    resp = api_client.post("/v1/tts/jobs", json={"engine_id": "nope", "text": "x"})
    assert resp.status_code == 404


def test_job_text_too_large_413(api_client):
    resp = api_client.post(
        "/v1/tts/jobs", json={"engine_id": "fake", "text": "x" * 50001}
    )
    assert resp.status_code == 413


def test_job_non_wav_export_rejected(api_client):
    resp = api_client.post(
        "/v1/tts/jobs",
        json={"engine_id": "fake", "text": "x", "export": {"format": "mp3"}},
    )
    assert resp.status_code == 422  # Literal["wav"] fails validation


def test_job_unknown_id_404(api_client):
    assert api_client.get("/v1/jobs/job_doesnotexist").status_code == 404
    assert api_client.delete("/v1/jobs/job_doesnotexist").status_code == 404


def test_job_cancel(api_client):
    resp = api_client.post(
        "/v1/tts/jobs", json={"engine_id": "fake", "text": "Texte a annuler."}
    )
    job_id = resp.json()["job_id"]
    cancel = api_client.delete(f"/v1/jobs/{job_id}")
    assert cancel.status_code == 200
    assert cancel.json()["status"] in {"canceled", "done"}


def test_legacy_engine_alias_resolves(api_client):
    # "chatterbox" is a legacy alias → canonical chatterbox_finetune_fr;
    # engine exists but has no weights → job errors with unavailable.
    resp = api_client.post(
        "/v1/tts/jobs", json={"engine_id": "chatterbox", "text": "Bonjour"}
    )
    assert resp.status_code == 200
    body = _wait_done(api_client, resp.json()["job_id"])
    assert body["status"] == "error"
    assert "indisponible" in body["error"]


def test_ref_voice_defaulting(api_client):
    # fake engine supports_ref → voice defaults to the first ref file
    resp = api_client.post("/v1/tts/jobs", json={"engine_id": "fake", "text": "Bonjour."})
    body = _wait_done(api_client, resp.json()["job_id"])
    assert body["status"] == "done"
    meta = api_client.get(f"/v1/assets/{body['asset_id']}/meta").json()
    assert meta["voice"] == "voice.wav"


def test_unknown_ref_voice_rejected(api_client):
    resp = api_client.post(
        "/v1/tts/jobs",
        json={"engine_id": "fake", "text": "Bonjour.", "voice_id": "ghost.wav"},
    )
    assert resp.status_code == 400


def test_concurrent_job_cap(api_client):
    # Saturate the 2-job cap with slow jobs (long text = longer fake synth)
    long_text = " ".join(["mot"] * 400)
    r1 = api_client.post("/v1/tts/jobs", json={"engine_id": "fake", "text": long_text})
    r2 = api_client.post("/v1/tts/jobs", json={"engine_id": "fake", "text": long_text})
    assert r1.status_code == 200 and r2.status_code == 200
    r3 = api_client.post("/v1/tts/jobs", json={"engine_id": "fake", "text": "court"})
    assert r3.status_code == 429
    _wait_done(api_client, r1.json()["job_id"])
    _wait_done(api_client, r2.json()["job_id"])


def test_concurrent_job_submission_race(api_client):
    """Hammer job creation from many threads: the 2-job cap must hold
    exactly (no lost updates in the store lock), every accepted job
    completes, every rejection is a clean 429 (ref §5.2: concurrency
    safety by convention — this is the convention's regression test)."""
    import threading

    results = []
    lock = threading.Lock()

    def submit():
        resp = api_client.post(
            "/v1/tts/jobs",
            json={"engine": "fake", "text": "Bonjour concurrence."},
        )
        with lock:
            results.append(resp)

    import os

    os.environ["VOCALIE_FAKE_DELAY_S"] = "0.5"
    threads = [threading.Thread(target=submit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    os.environ.pop("VOCALIE_FAKE_DELAY_S", None)
    accepted = [r for r in results if r.status_code == 200]
    rejected = [r for r in results if r.status_code == 429]
    assert len(accepted) + len(rejected) == 8
    assert 1 <= len(accepted) <= 2, [r.status_code for r in results]
    for r in accepted:
        body = _wait_done(api_client, r.json()["job_id"])
        assert body["status"] == "done"


def test_cancel_running_job_is_cooperative(api_client):
    """DELETE marks the job canceled immediately; the worker thread's
    late result is dropped, not surfaced (ref: job_service.py:62-71)."""
    import os

    os.environ["VOCALIE_FAKE_DELAY_S"] = "1.0"
    try:
        resp = api_client.post(
            "/v1/tts/jobs", json={"engine": "fake", "text": "Annulation en vol."}
        )
        assert resp.status_code == 200
        job_id = resp.json()["job_id"]
        del_resp = api_client.delete(f"/v1/jobs/{job_id}")
    finally:
        os.environ.pop("VOCALIE_FAKE_DELAY_S", None)
    assert del_resp.status_code == 200
    body = _wait_done(api_client, job_id)
    assert body["status"] == "canceled"
    assert not body.get("asset_id")


def test_job_honors_configured_ref_dir(api_client, tmp_path, monkeypatch):
    """PUT /v1/refs/dir must apply to the job thread's voice resolution,
    not just route-side listing/validation. The reference keeps the
    configured dir in routes-module state only, so its job thread
    resolves against the env/default dir and the job errors with
    'Reference file not found' (ref: backend/services/tts_service.py:123
    vs backend/routes/refs.py:18) — deliberately fixed here via
    io.refs.set_runtime_ref_dir."""
    import numpy as np

    from vocalie_tts_tpu.io.wavio import write_wav

    new_dir = tmp_path / "ref_elsewhere"
    new_dir.mkdir()
    t = np.arange(24000) / 24000.0
    write_wav(new_dir / "alt_voice.wav",
              (0.2 * np.sin(2 * np.pi * 330 * t)).astype("float32"), 24000)
    # the job must not fall back to the env-configured dir
    monkeypatch.delenv("VOCALIE_REF_DIR", raising=False)

    resp = api_client.put("/v1/refs/dir", json={"directory": str(new_dir)})
    assert resp.status_code == 200
    assert api_client.get("/v1/refs").json()["files"] == ["alt_voice.wav"]

    resp = api_client.post(
        "/v1/tts/jobs",
        json={"engine_id": "fake", "text": "Bonjour.", "voice_id": "alt_voice.wav"},
    )
    assert resp.status_code == 200, resp.text
    body = _wait_done(api_client, resp.json()["job_id"])
    assert body["status"] == "done", body
