"""Contract tests for discovery, prep, chunks, presets, refs, glossary,
audio edit, backends (modeled on the reference API suite)."""

import io

import pytest

pytestmark = pytest.mark.unit


# ── engines / schema / models ───────────────────────────────────────────


def test_engines_catalog(api_client):
    resp = api_client.get("/v1/tts/engines")
    assert resp.status_code == 200
    engines = {e["id"]: e for e in resp.json()["engines"]}
    assert "chatterbox_native" in engines
    assert "qwen3_custom" in engines
    assert "fake" in engines
    assert engines["fake"]["available"] is True
    assert engines["fake"]["supports_ref"] is True
    assert engines["qwen3_custom"]["supports_ref"] is False


def test_voices_listing(api_client):
    resp = api_client.get("/v1/tts/voices", params={"engine": "fake"})
    assert resp.status_code == 200
    body = resp.json()
    assert body["engine"] == "fake"
    assert [v["id"] for v in body["voices"]] == ["voice.wav"]

    # engine without ref support → empty voices (unless internal bank)
    resp = api_client.get("/v1/tts/voices", params={"engine": "qwen3_custom"})
    assert resp.json()["voices"] == []

    # piper has internal voices
    resp = api_client.get("/v1/tts/voices", params={"engine": "piper"})
    assert len(resp.json()["voices"]) == 3


def test_voices_error_paths(api_client):
    assert api_client.get("/v1/tts/voices").status_code == 400
    assert (
        api_client.get("/v1/tts/voices", params={"engine": "ghost"}).status_code == 404
    )


def test_engine_schema_includes_gap_slider(api_client):
    resp = api_client.get("/v1/tts/engine_schema", params={"engine": "chatterbox_native"})
    assert resp.status_code == 200
    body = resp.json()
    keys = {f["key"] for f in body["fields"]}
    assert "cfg_weight" in keys and "exaggeration" in keys
    gap = next(f for f in body["fields"] if f["key"] == "chunk_gap_ms")
    assert gap["type"] == "slider" and gap["max"] == 2000
    assert gap["serialize_scope"] == "post"
    assert body["capabilities"]["supports_ref"] is True
    assert body["constraints"]["required"] == ["voice_id"]
    assert "chatterbox_mode" in body["capabilities"]["auto_resolved_keys"]


def test_engine_schema_unknown_engine_404(api_client):
    resp = api_client.get("/v1/tts/engine_schema", params={"engine": "ghost"})
    assert resp.status_code == 404


def test_models_listing(api_client):
    resp = api_client.get("/v1/tts/models", params={"engine": "qwen3_custom"})
    assert resp.status_code == 200
    ids = [m["id"] for m in resp.json()["models"]]
    assert "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice" in ids


# ── info / capabilities / metrics ───────────────────────────────────────


def test_info_hides_system_by_default(api_client):
    body = api_client.get("/v1/info").json()
    assert body["python"] == "hidden"
    assert body["work_dir"] == "hidden"


def test_capabilities(api_client):
    body = api_client.get("/v1/capabilities").json()
    assert "fake" in body["engines"]
    assert body["features"]["export_formats"] == ["wav"]
    assert body["audiosr"] is not None
    assert set(body["audiosr"].keys()) == {"enabled", "available"}


def test_metrics_counts_jobs(api_client):
    body = api_client.get("/v1/metrics").json()
    assert body["jobs_total"] == 0
    api_client.post("/v1/tts/jobs", json={"engine_id": "fake", "text": "Bonjour."})
    body = api_client.get("/v1/metrics").json()
    assert body["jobs_total"] == 1


# ── prep / chunks round-trip ────────────────────────────────────────────


def test_prep_adjust_applies_lexique(api_client):
    resp = api_client.post("/v1/prep/adjust", json={"text_raw": "Salut  ABC ..."})
    assert resp.status_code == 200
    adjusted = resp.json()["text_adjusted"]
    assert "abécé" in adjusted
    assert "…" in adjusted


def test_prep_interpret_pass_through(api_client):
    resp = api_client.post("/v1/prep/interpret", json={"text_adjusted": "Texte."})
    assert resp.json()["text_interpreted"] == "Texte."


def test_chunks_snapshot_normalizes(api_client):
    resp = api_client.post(
        "/v1/chunks/snapshot", json={"text_interpreted": "Un.Deux,trois"}
    )
    assert resp.json()["snapshot_text"] == "Un. Deux, trois"


def test_chunks_preview_with_markers(api_client):
    text = "Premiere partie ici. Deuxieme partie la."
    resp = api_client.post(
        "/v1/chunks/preview", json={"snapshot_text": text, "markers": [21]}
    )
    chunks = resp.json()["chunks"]
    assert len(chunks) == 2
    assert chunks[0]["text"].startswith("Premiere")
    assert chunks[1]["text"].startswith("Deuxieme")
    assert chunks[0]["word_count"] == 3


def test_chunks_preview_single_without_markers(api_client):
    resp = api_client.post("/v1/chunks/preview", json={"snapshot_text": "Une phrase."})
    assert len(resp.json()["chunks"]) == 1


def test_chunks_preview_ranges(api_client):
    text = "abcdef"
    resp = api_client.post(
        "/v1/chunks/preview",
        json={"snapshot_text": text, "ranges": [{"start": 0, "end": 3}, {"start": 3, "end": 6}]},
    )
    assert len(resp.json()["chunks"]) == 2
    bad = api_client.post(
        "/v1/chunks/preview",
        json={"snapshot_text": text, "ranges": [{"start": 4, "end": 2}]},
    )
    assert bad.status_code == 400


def test_chunks_marker_insert_remove_roundtrip(api_client):
    text = "Un deux trois"
    ins = api_client.post(
        "/v1/chunks/apply_marker",
        json={"snapshot_text": text, "action": "insert", "position": 7},
    ).json()
    assert "[[CHUNK]]" in ins["snapshot_text_updated"]
    assert len(ins["markers_updated"]) == 1
    rem = api_client.post(
        "/v1/chunks/apply_marker",
        json={
            "snapshot_text": ins["snapshot_text_updated"],
            "action": "remove",
            "position": ins["markers_updated"][0],
        },
    ).json()
    assert rem["snapshot_text_updated"] == text
    assert rem["markers_updated"] == []


# ── presets ─────────────────────────────────────────────────────────────


def test_preset_crud_roundtrip(api_client):
    state = {
        "engine": {"engine_id": "fake", "voice_id": "voice.wav", "chunk_gap_ms": 120},
        "preparation": {"text_raw": "Bonjour"},
    }
    create = api_client.post(
        "/v1/presets", json={"id": "mypreset", "label": "Mon preset", "state": state}
    )
    assert create.status_code == 200
    assert create.json() == {"id": "mypreset", "status": "created"}

    listing = api_client.get("/v1/presets").json()
    assert [p["id"] for p in listing["presets"]] == ["mypreset"]

    got = api_client.get("/v1/presets/mypreset").json()
    assert got["state"]["engine"]["engine_id"] == "fake"
    assert got["state"]["engine"]["chunk_gap_ms"] == 120

    upd = api_client.put(
        "/v1/presets/mypreset",
        json={"label": "Nouveau", "state": {"engine": {"engine_id": "piper"}}},
    )
    assert upd.json()["status"] == "updated"
    assert api_client.get("/v1/presets/mypreset").json()["state"]["engine"]["engine_id"] == "piper"

    dele = api_client.delete("/v1/presets/mypreset")
    assert dele.json()["status"] == "deleted"
    assert api_client.get("/v1/presets/mypreset").status_code == 404


def test_preset_legacy_migration(api_client):
    legacy = {
        "tts_engine": "chatterbox",
        "engines": {"chatterbox": {"voice_id": "voice.wav", "params": {"cfg_weight": 0.7}}},
        "chatterbox_gap_ms": 333,
        "post_processing_enabled": True,
        "trim_enabled": True,
        "target_dbfs": -2.0,
    }
    create = api_client.post("/v1/presets", json={"id": "legacy1", "state": legacy})
    assert create.status_code == 200
    got = api_client.get("/v1/presets/legacy1").json()
    engine = got["state"]["engine"]
    assert engine["engine_id"] == "chatterbox_finetune_fr"  # alias resolved
    assert engine["chunk_gap_ms"] == 333
    assert engine["params"]["cfg_weight"] == 0.7
    post = got["state"]["post"]
    assert post["edit_enabled"] is True and post["target_dbfs"] == -2.0


def test_preset_requires_state(api_client):
    resp = api_client.post("/v1/presets", json={"id": "x"})
    assert resp.status_code == 400


# ── refs / glossary ─────────────────────────────────────────────────────


def test_refs_listing_and_delete(api_client):
    body = api_client.get("/v1/refs").json()
    assert body["files"] == ["voice.wav"]
    resp = api_client.delete("/v1/refs/voice.wav")
    assert resp.json() == {"deleted": "voice.wav"}
    assert api_client.get("/v1/refs").json()["files"] == []
    assert api_client.delete("/v1/refs/voice.wav").status_code == 404


def test_refs_traversal_rejected(api_client):
    resp = api_client.delete("/v1/refs/..%2F..%2Fetc%2Fpasswd")
    assert resp.status_code in (400, 404)


def test_refs_upload_multipart(api_client):
    import numpy as np

    from vocalie_tts_tpu.io.wavio import write_wav

    buf_path = api_client.work_dir / "new_voice.wav"
    write_wav(buf_path, np.zeros(2400, dtype=np.float32), 24000)
    files = {"files": ("new_voice.wav", io.BytesIO(buf_path.read_bytes()), "audio/wav")}
    resp = api_client.post("/v1/refs/upload", files=files)
    assert resp.status_code == 200
    assert "new_voice.wav" in resp.json()["files"]


def test_refs_dir_change(api_client, tmp_path):
    new_dir = tmp_path / "other_refs"
    resp = api_client.put("/v1/refs/dir", json={"directory": str(new_dir)})
    assert resp.status_code == 200
    assert api_client.get("/v1/refs").json()["files"] == []


def test_glossary_crud(api_client):
    assert api_client.get("/v1/glossary").json()["entries"] == []
    up = api_client.put(
        "/v1/glossary", json={"word": "SNCF", "pronunciation": "èssènecéèf"}
    )
    assert up.json() == {"word": "SNCF", "pronunciation": "èssènecéèf"}
    entries = api_client.get("/v1/glossary").json()["entries"]
    assert entries == [{"word": "SNCF", "pronunciation": "èssènecéèf"}]
    # glossary is live: prep/adjust now uses it
    adjusted = api_client.post("/v1/prep/adjust", json={"text_raw": "La SNCF"}).json()
    assert "èssènecéèf" in adjusted["text_adjusted"]
    dele = api_client.delete("/v1/glossary", params={"word": "SNCF"})
    assert dele.json()["pronunciation"] == "èssènecéèf"
    assert api_client.get("/v1/glossary").json()["entries"] == []


# ── audio edit ──────────────────────────────────────────────────────────


def test_audio_edit_on_asset(api_client):
    import time

    resp = api_client.post(
        "/v1/tts/jobs", json={"engine_id": "fake", "text": "Bonjour tout le monde."}
    )
    job_id = resp.json()["job_id"]
    deadline = time.time() + 30
    while time.time() < deadline:
        body = api_client.get(f"/v1/jobs/{job_id}").json()
        if body["status"] in {"done", "error"}:
            break
        time.sleep(0.05)
    assert body["status"] == "done"

    edit = api_client.post(
        "/v1/audio/edit",
        json={
            "asset_id": body["asset_id"],
            "trim_enabled": True,
            "normalize_enabled": True,
            "target_dbfs": -3.0,
        },
    )
    assert edit.status_code == 200, edit.text
    payload = edit.json()
    assert payload["asset_id"]
    assert payload["metrics"]["normalized"] is True
    assert payload["metrics"]["peak_dbfs_after"] == pytest.approx(-3.0, abs=0.1)


def test_audio_edit_path_traversal_rejected(api_client):
    resp = api_client.post(
        "/v1/audio/edit", json={"input_wav_path": "/etc/passwd", "trim_enabled": True}
    )
    assert resp.status_code == 400


def test_audio_edit_unknown_asset_404(api_client):
    resp = api_client.post("/v1/audio/edit", json={"asset_id": "asset_ghost"})
    assert resp.status_code == 404


# ── backends install surface ────────────────────────────────────────────


def test_backend_status_endpoint(api_client):
    body = api_client.get("/v1/backends/piper/status").json()
    assert body["engine_id"] == "piper"
    assert body["installed"] in (True, False)
    unknown = api_client.get("/v1/backends/ghost/status").json()
    assert unknown["reason"] == "unknown_engine"


def test_backend_uninstall_protected(api_client):
    resp = api_client.delete("/v1/backends/chatterbox/uninstall")
    assert resp.status_code == 403


# ── built-in web UI ─────────────────────────────────────────────────────


def test_webui_served_at_root(api_client):
    page = api_client._client.get("/")  # UI itself is public
    assert page.status_code == 200
    assert "Vocalie" in page.text
    js = api_client._client.get("/app.js")
    assert js.status_code == 200
    assert "tts/jobs" in js.text
    css = api_client._client.get("/style.css")
    assert css.status_code == 200


def test_tts_stream_endpoint(api_client):
    """Chunked WAV streaming: RIFF streaming header + PCM16 payload."""
    import struct

    resp = api_client.post(
        "/v1/tts/stream", json={"engine": "fake", "text": "Bonjour le flux."}
    )
    assert resp.status_code == 200, resp.text
    assert resp.headers["Content-Type"].startswith("audio/wav")
    data = resp.content
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack("<I", data[4:8])[0] == 0xFFFFFFFF  # streaming size
    sr = struct.unpack("<I", data[24:28])[0]
    assert sr == int(resp.headers["X-Sample-Rate"])
    pcm = data[44:]
    assert len(pcm) > sr  # ≥0.5 s of s16 audio
    assert len(pcm) % 2 == 0


def test_tts_stream_rejects_non_streaming_engine(api_client):
    resp = api_client.post(
        "/v1/tts/stream", json={"engine": "piper", "text": "Bonjour."}
    )
    assert resp.status_code == 400
    assert "streaming" in resp.text


def test_tts_stream_validation(api_client):
    assert api_client.post("/v1/tts/stream", json={}).status_code == 422
    assert (
        api_client.post("/v1/tts/stream", json={"text": "x"}).status_code == 400
    )
    assert (
        api_client.post(
            "/v1/tts/stream", json={"engine": "ghost", "text": "x"}
        ).status_code
        == 404
    )
