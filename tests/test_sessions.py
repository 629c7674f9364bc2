"""Session folder semantics (modeled on ref: tests/test_sessions.py)."""

import datetime as dt
import json

import numpy as np
import pytest

from vocalie_tts_tpu.io.sessions import (
    build_session_payload,
    build_session_slug,
    create_session_dir,
    deliver_take_to_output,
    extract_session_texts,
    get_take_path_chunk,
    get_take_path_global,
    get_take_path_global_raw,
    load_session_json,
    next_version,
    stage_preview_copy,
    stage_take_copy,
    update_session_artifacts,
    write_session_json,
)
from vocalie_tts_tpu.io.wavio import write_wav
from vocalie_tts_tpu.text import parse_manual_chunks

pytestmark = pytest.mark.unit

NOW = dt.datetime(2026, 3, 1, 12, 30, 45)


def _make_session(tmp_path):
    session = create_session_dir(tmp_path / "work", NOW, "essai")
    return session


def test_session_layout(tmp_path):
    session = _make_session(tmp_path)
    assert session.name == "20260301_123045_essai"
    for sub in ("takes/global", "takes/chunks", "takes/processed", "meta", "preview"):
        assert (session / sub).is_dir(), sub


def test_take_paths(tmp_path):
    session = _make_session(tmp_path)
    assert get_take_path_global(session, "v2").name == "global_v2.wav"
    assert get_take_path_global_raw(session).name == "global_v1_raw.wav"
    chunk = get_take_path_chunk(session, 3, "v1")
    assert chunk.parent.name == "chunk_003"


def test_next_version():
    assert next_version([]) == "v1"
    assert next_version(["v1", "v2"]) == "v3"
    assert next_version(["v9", "junk", None]) == "v10"


def test_session_payload_and_texts(tmp_path):
    chunks, _ = parse_manual_chunks("Premier bloc ici.\n[[CHUNK]]\nSecond bloc la.")
    payload = build_session_payload(
        engine_id="chatterbox_finetune_fr",
        engine_slug="chatterbox-fr-finetune",
        ref_name="claire.wav",
        text="texte normalise",
        editorial_text="Texte editorial",
        tts_ready_text="texte normalise",
        prep_log_md="- note",
        created_at=NOW,
        chunks=chunks,
        chunk_mode="manual_marker",
        takes={"global": ["v1"], "processed": []},
        active_take={"global": "v1"},
        active_listen="raw",
    )
    assert payload["created_at"] == "2026-03-01T12:30:45"
    assert [c["index"] for c in payload["chunks"]] == [1, 2]
    assert payload["chunks"][1]["start_word"] == 4  # 3 words in chunk 1

    editorial, tts_ready, log = extract_session_texts(payload)
    assert editorial == "Texte editorial"
    assert tts_ready == "texte normalise"
    assert log == "- note"

    # legacy string-shaped text field
    legacy = {"text": "vieux format", "text_legacy": ""}
    e, t, _ = extract_session_texts(legacy)
    assert e == t == "vieux format"


def test_delivery_journal(tmp_path):
    session = _make_session(tmp_path)
    raw = get_take_path_global_raw(session)
    write_wav(raw, np.zeros(2400, np.float32), 24000)
    payload = build_session_payload(
        engine_id="piper",
        engine_slug="piper",
        ref_name=None,
        text="bonjour le monde",
        editorial_text="bonjour le monde",
        tts_ready_text="bonjour le monde",
        prep_log_md="",
        created_at=NOW,
        artifacts={"raw_global": "takes/global/global_v1_raw.wav"},
        takes={"global": ["v1"], "processed": []},
        active_take={"global": "v1"},
    )
    write_session_json(session, payload)

    out_dir = tmp_path / "output"
    exported, meta_path = deliver_take_to_output(
        session_dir=session,
        output_dir=out_dir,
        user_filename="mon-export",
        add_timestamp=False,
        include_engine_slug=True,
    )
    assert exported.exists()
    assert exported.name.startswith("mon-export")
    assert meta_path.exists()
    _path, data = load_session_json(session)
    assert len(data["deliveries"]) == 1
    assert data["deliveries"][0]["dest_path"] == str(exported)
    # second delivery appends (journal, not overwrite) and uniquifies
    exported2, _ = deliver_take_to_output(
        session_dir=session, output_dir=out_dir, user_filename="mon-export",
        add_timestamp=False, include_engine_slug=True,
    )
    assert exported2 != exported
    _path, data = load_session_json(session)
    assert len(data["deliveries"]) == 2


def test_stage_copies_and_artifacts(tmp_path):
    session = _make_session(tmp_path)
    src = tmp_path / "src.wav"
    write_wav(src, np.zeros(240, np.float32), 24000)
    take = stage_take_copy(session, src, "global_v1.wav")
    assert take.exists()
    preview = stage_preview_copy(session, src)
    assert preview.name == "current.wav"

    write_session_json(session, {"artifacts": {}})
    updated = update_session_artifacts(
        session, artifacts={"processed": "x.wav"}, active_listen="processed"
    )
    assert updated["artifacts"]["processed"] == "x.wav"
    assert updated["active_listen"] == "processed"


def test_session_slug():
    assert build_session_slug("Bonjour le monde!", None) == "bonjour-le-monde"
    assert build_session_slug("texte", "Mon Fichier") == "mon-fichier"
    assert build_session_slug("", None) == "session"
