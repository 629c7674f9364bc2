"""Non-destructive session folders and their JSON metadata.

Sessions are the resumable artifact of the product: every generation
lands in ``work/.sessions/<stamp>_<slug>/`` with takes (raw/processed,
versioned v1,v2,…), a preview area, per-take meta JSON, a delivery
journal, and a ``session.json`` capturing text tiers and chunking
(ref: backend/shared/session_manager.py — the JSON shapes here match
it field-for-field so existing tooling can read either).
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
from pathlib import Path
from typing import Iterable, Optional, Tuple

from vocalie_tts_tpu.io.outputs import ensure_unique_path, make_output_filename, slugify
from vocalie_tts_tpu.text import ChunkInfo, render_clean_text_from_segments

_SUBDIRS = (
    ("takes", "global"),
    ("takes", "chunks"),
    ("takes", "processed"),
    ("meta",),
    ("preview",),
)


def build_session_slug(text: Optional[str], user_filename: Optional[str]) -> str:
    return slugify(user_filename or text or "", fallback="session")


def _ensure_layout(session_dir: Path) -> None:
    for parts in _SUBDIRS:
        session_dir.joinpath(*parts).mkdir(parents=True, exist_ok=True)


def create_session_dir(root_dir, created_at: dt.datetime, slug: str) -> Path:
    sessions_root = Path(root_dir) / ".sessions"
    sessions_root.mkdir(parents=True, exist_ok=True)
    session_dir = sessions_root / f"{created_at.strftime('%Y%m%d_%H%M%S')}_{slug}"
    session_dir.mkdir(parents=True, exist_ok=True)
    _ensure_layout(session_dir)
    return session_dir


# ── take path helpers ───────────────────────────────────────────────────


def get_take_path_global(session_dir, v: str = "v1") -> Path:
    return Path(session_dir) / "takes" / "global" / f"global_{v}.wav"


def get_take_path_global_raw(session_dir, v: str = "v1") -> Path:
    return Path(session_dir) / "takes" / "global" / f"global_{v}_raw.wav"


def get_take_path_chunk(session_dir, chunk_idx: int, v: str = "v1") -> Path:
    chunk_dir = Path(session_dir) / "takes" / "chunks" / f"chunk_{int(chunk_idx):03d}"
    chunk_dir.mkdir(parents=True, exist_ok=True)
    return chunk_dir / f"{v}.wav"


def get_take_path_processed_global(session_dir, v: str = "v1") -> Path:
    return Path(session_dir) / "takes" / "processed" / f"processed_global_{v}.wav"


def get_processed_preview_path(session_dir) -> Path:
    return Path(session_dir) / "preview" / "processed_preview.wav"


def next_version(existing_versions: Iterable[str]) -> str:
    """v1, v2, … — one higher than the max existing version."""
    highest = 0
    for version in existing_versions:
        if isinstance(version, str) and version.startswith("v") and version[1:].isdigit():
            highest = max(highest, int(version[1:]))
    return f"v{highest + 1}"


# ── meta writers ────────────────────────────────────────────────────────


def _dump_json(path: Path, payload: dict) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2, ensure_ascii=True)
        fh.write("\n")
    return path


def write_xtts_segments(
    session_dir,
    *,
    engine_slug: str,
    take_id: str,
    segments: list,
    created_at: str,
    segment_boundaries_samples: Optional[list] = None,
    sample_rate: Optional[int] = None,
) -> Path:
    return _dump_json(
        Path(session_dir) / "meta" / "xtts_segments_global_v1.json",
        {
            "engine_slug": str(engine_slug),
            "take_id": str(take_id),
            "segments": [str(seg) for seg in segments],
            "segment_boundaries_samples": segment_boundaries_samples or [],
            "sample_rate": int(sample_rate) if sample_rate else None,
            "created_at": str(created_at),
        },
    )


def write_processed_meta(
    session_dir,
    *,
    engine_id: str,
    engine_slug: str,
    source_take: str,
    output_take: str,
    created_at: str,
    processing_meta: dict,
) -> Path:
    return _dump_json(
        Path(session_dir) / "meta" / f"{Path(output_take).stem}.json",
        {
            "kind": "processed",
            "source_take": str(source_take),
            "output_take": str(output_take),
            "engine_id": str(engine_id),
            "engine_slug": str(engine_slug),
            "created_at": str(created_at),
            "processing": {
                "post_processing_enabled": True,
                "mode": "minimal",
                "params": dict(processing_meta or {}),
            },
        },
    )


# ── session.json ────────────────────────────────────────────────────────


def _serialize_chunks(chunks: Iterable[ChunkInfo]) -> list:
    rows = []
    word_cursor = 1
    for idx, chunk in enumerate(chunks, start=1):
        rows.append(
            {
                "index": idx,
                "text": render_clean_text_from_segments(chunk.segments),
                "start_word": int(word_cursor),
                "est_seconds": float(chunk.estimated_duration),
            }
        )
        word_cursor += max(int(chunk.word_count), 0)
    return rows


def build_session_payload(
    *,
    engine_id: str,
    engine_slug: str,
    ref_name: Optional[str],
    text: str,
    editorial_text: str,
    tts_ready_text: str,
    prep_log_md: Optional[str],
    created_at: dt.datetime,
    chunks: Optional[Iterable[ChunkInfo]] = None,
    chunk_mode: Optional[str] = None,
    direction_meta: Optional[dict] = None,
    artifacts: Optional[dict] = None,
    artifacts_list: Optional[Iterable] = None,
    takes: Optional[dict] = None,
    active_take: Optional[dict] = None,
    active_listen: Optional[str] = None,
) -> dict:
    payload: dict = {
        "engine_id": str(engine_id),
        "engine_slug": str(engine_slug),
        "ref_name": ref_name,
        "text": {
            "editorial": editorial_text,
            "tts_ready": tts_ready_text,
            "prep_log_md": prep_log_md or "",
        },
        "text_legacy": text,
        "created_at": created_at.isoformat(timespec="seconds"),
        "artifacts": {},
    }
    if chunks:
        payload["chunks"] = _serialize_chunks(chunks)
    if chunk_mode:
        payload["chunk_mode"] = str(chunk_mode)
    if direction_meta:
        payload["direction"] = dict(direction_meta)
    if artifacts:
        payload["artifacts"] = dict(artifacts)
    if artifacts_list:
        payload["artifacts_list"] = [str(Path(p)) for p in artifacts_list]
    if takes is not None:
        payload["takes"] = takes
    if active_take is not None:
        payload["active_take"] = active_take
    if active_listen is not None:
        payload["active_listen"] = active_listen
    return payload


def write_session_json(session_dir, payload: dict) -> Path:
    session_dir = Path(session_dir)
    session_dir.mkdir(parents=True, exist_ok=True)
    return _dump_json(session_dir / "session.json", payload)


def load_session_json(session_dir) -> Tuple[Path, dict]:
    path = Path(session_dir) / "session.json"
    if not path.exists():
        raise FileNotFoundError(f"session.json introuvable: {path}")
    with path.open("r", encoding="utf-8") as fh:
        return path, json.load(fh)


def extract_session_texts(session_data: dict) -> Tuple[str, str, str]:
    """(editorial, tts_ready, prep_log_md) with legacy fallbacks."""
    text_field = session_data.get("text")
    editorial = tts_ready = prep_log_md = ""
    if isinstance(text_field, dict):
        editorial = str(text_field.get("editorial") or "")
        tts_ready = str(text_field.get("tts_ready") or "")
        prep_log_md = str(text_field.get("prep_log_md") or "")
    elif isinstance(text_field, str):
        editorial = tts_ready = text_field
    legacy = session_data.get("text_legacy") or session_data.get("input_text") or ""
    if not editorial:
        editorial = str(legacy)
    if not tts_ready:
        tts_ready = str(legacy or editorial)
    return editorial, tts_ready, prep_log_md


# ── staging / artifacts / delivery ──────────────────────────────────────


def stage_take_copy(session_dir, source_path, filename: str) -> Path:
    session_dir = Path(session_dir)
    session_dir.mkdir(parents=True, exist_ok=True)
    _ensure_layout(session_dir)
    takes_dir = session_dir / "takes" / "global"
    target = takes_dir / filename
    if target.exists():
        target = ensure_unique_path(takes_dir, filename)
    shutil.copy2(Path(source_path), target)
    return target


def stage_preview_copy(session_dir, source_path) -> Path:
    session_dir = Path(session_dir)
    session_dir.mkdir(parents=True, exist_ok=True)
    _ensure_layout(session_dir)
    preview = session_dir / "preview" / "current.wav"
    shutil.copy2(Path(source_path), preview)
    return preview


def update_session_artifacts(
    session_dir,
    *,
    artifacts: Optional[dict] = None,
    active_listen: Optional[str] = None,
) -> dict:
    session_path, session_data = load_session_json(Path(session_dir))
    payload = dict(session_data)
    existing = payload.get("artifacts")
    if not isinstance(existing, dict):
        existing = {}
    if artifacts:
        existing.update(artifacts)
    payload["artifacts"] = existing
    if active_listen is not None:
        payload["active_listen"] = active_listen
    _dump_json(session_path, payload)
    return payload


def deliver_take_to_output(
    *,
    session_dir,
    output_dir,
    user_filename: Optional[str],
    add_timestamp: bool,
    include_engine_slug: bool,
    cleanup_on_deliver: bool = False,
) -> Tuple[Path, Path]:
    """Export the active take into output/, append to the delivery
    journal, and write a final_<ts>.json sidecar."""
    session_dir = Path(session_dir)
    session_path, session_data = load_session_json(session_dir)

    active_take_data = session_data.get("active_take")
    active_take = "v1"
    if isinstance(active_take_data, dict):
        active_take = active_take_data.get("global") or "v1"
    elif isinstance(active_take_data, str):
        active_take = active_take_data

    take_path = None
    artifacts = session_data.get("artifacts")
    if isinstance(artifacts, dict) and artifacts.get("raw_global"):
        candidate = session_dir / str(artifacts["raw_global"])
        if candidate.exists():
            take_path = candidate
    if take_path is None:
        raw = get_take_path_global_raw(session_dir, active_take)
        clean = get_take_path_global(session_dir, active_take)
        take_path = raw if raw.exists() else clean
    if not take_path.exists():
        raise FileNotFoundError(f"take introuvable: {take_path}")

    now = dt.datetime.now()
    timestamp = now.strftime("%Y-%m-%d_%H-%M-%S")
    engine_id = session_data.get("engine_id") or "tts"
    engine_slug = session_data.get("engine_slug") or slugify(engine_id, fallback="tts")
    _editorial, tts_ready, _log = extract_session_texts(session_data)
    filename = make_output_filename(
        text=tts_ready,
        ref_name=session_data.get("ref_name"),
        user_filename=user_filename,
        add_timestamp=bool(add_timestamp),
        timestamp=timestamp,
        include_engine_slug=bool(include_engine_slug),
        engine_slug=engine_slug,
    )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    exported = ensure_unique_path(output_dir, filename)
    shutil.copy2(take_path, exported)

    delivery_info = {
        "created_at": now.isoformat(timespec="seconds"),
        "active_take": active_take,
        "src_take": str(take_path),
        "dest_path": str(exported),
        "engine_id": engine_id,
        "settings": {
            "include_engine_slug": bool(include_engine_slug),
            "add_timestamp": bool(add_timestamp),
            "user_filename": user_filename or "",
        },
    }
    deliveries = session_data.get("deliveries")
    if not isinstance(deliveries, list):
        deliveries = []
    deliveries.append(delivery_info)
    session_data["deliveries"] = deliveries
    _dump_json(session_path, session_data)

    meta_path = ensure_unique_path(session_dir / "meta", f"final_{timestamp}.json")
    _dump_json(meta_path, delivery_info)
    if cleanup_on_deliver:
        shutil.rmtree(session_dir)
    return exported, meta_path


__all__ = [
    "build_session_slug",
    "create_session_dir",
    "get_take_path_global",
    "get_take_path_global_raw",
    "get_take_path_chunk",
    "get_take_path_processed_global",
    "get_processed_preview_path",
    "next_version",
    "write_xtts_segments",
    "write_processed_meta",
    "build_session_payload",
    "write_session_json",
    "load_session_json",
    "extract_session_texts",
    "stage_take_copy",
    "stage_preview_copy",
    "update_session_artifacts",
    "deliver_take_to_output",
]
