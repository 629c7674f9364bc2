"""AudioSR enhancement over the HTTP API (tiny scale, random weights)."""

import io

import numpy as np
import pytest


@pytest.fixture
def enhance_env(monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
    # drop the cached runtime so the tiny scale takes effect
    from vocalie_tts_tpu.server.services import audiosr_service

    audiosr_service._RUNTIME = None
    yield
    audiosr_service._RUNTIME = None


def _wav_bytes(seconds=1.0, sr=24000):
    from vocalie_tts_tpu.io.wavio import write_wav
    import tempfile, pathlib

    t = np.arange(int(sr * seconds)) / sr
    tmp = pathlib.Path(tempfile.mkdtemp()) / "in.wav"
    write_wav(tmp, (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    return tmp.read_bytes()


def test_enhance_endpoint_full_flow(enhance_env, api_client):
    files = {"file": ("clip.wav", io.BytesIO(_wav_bytes()), "audio/wav")}
    data = {"ddim_steps": "20", "guidance_scale": "2.5", "seed": "3"}
    # generous explicit timeout: the first call compiles the tiny
    # diffusion UNet, which can exceed the 30 s client default on a
    # loaded host
    resp = api_client.post(
        "/v1/audio/enhance", files=files, data=data, timeout=600.0
    )
    assert resp.status_code == 200, resp.text
    body = resp.json()
    assert body["engine"] == "audiosr"
    assert body["sample_rate"] == 48000
    assert body["duration_s"] == pytest.approx(1.0, abs=0.02)
    # output is downloadable as an asset
    wav = api_client.get(f"/v1/assets/{body['asset_id']}")
    assert wav.status_code == 200
    assert wav.content[:4] == b"RIFF"
    # sidecar meta exists next to the output (dated audiosr folder)
    out = api_client.output_dir
    sidecars = list(out.rglob("*.audiosr.wav.meta.json"))
    assert len(sidecars) == 1


def test_enhance_rejects_non_audio_upload(enhance_env, api_client):
    files = {"file": ("evil.sh", io.BytesIO(b"#!/bin/sh"), "text/plain")}
    resp = api_client.post("/v1/audio/enhance", files=files)
    assert resp.status_code == 415


def test_enhance_unknown_engine_rejected(enhance_env, api_client):
    files = {"file": ("a.wav", io.BytesIO(_wav_bytes(0.2)), "audio/wav")}
    resp = api_client.post("/v1/audio/enhance", files=files, data={"engine": "other"})
    assert resp.status_code == 400


def test_enhance_disabled_flag(enhance_env, api_client, monkeypatch):
    from vocalie_tts_tpu.server import config as server_config

    monkeypatch.setattr(server_config, "VOCALIE_ENABLE_AUDIOSR", False)
    files = {"file": ("a.wav", io.BytesIO(_wav_bytes(0.2)), "audio/wav")}
    resp = api_client.post("/v1/audio/enhance", files=files)
    assert resp.status_code == 409


def test_enhance_not_installed_501(api_client, monkeypatch):
    monkeypatch.delenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", raising=False)
    monkeypatch.setenv("VOCALIE_ASSETS_DIR", str(api_client.work_dir / "empty_assets"))
    files = {"file": ("a.wav", io.BytesIO(_wav_bytes(0.2)), "audio/wav")}
    resp = api_client.post("/v1/audio/enhance", files=files)
    assert resp.status_code == 501
