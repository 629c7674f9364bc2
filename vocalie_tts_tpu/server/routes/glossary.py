"""Glossary (lexique exceptions) CRUD (ref: backend/routes/glossary.py)."""

from __future__ import annotations

import json
import threading

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.schemas import (
    GlossaryEntry,
    GlossaryListResponse,
    GlossaryUpsertRequest,
)
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body
from vocalie_tts_tpu.text.lexique import clear_lexique_cache

router = Router(prefix="/v1")

_write_lock = threading.Lock()


def _load_lexique() -> dict:
    try:
        with server_config.LEXIQUE_PATH.open("r", encoding="utf-8") as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"meta": {"lang": "fr", "engine": "default"}, "exceptions": {}, "letters": {}}


def _save_lexique(data: dict) -> None:
    server_config.LEXIQUE_PATH.parent.mkdir(parents=True, exist_ok=True)
    with server_config.LEXIQUE_PATH.open("w", encoding="utf-8") as fh:
        json.dump(data, fh, ensure_ascii=False, indent=2)
        fh.write("\n")
    clear_lexique_cache()


@router.get("/glossary")
def list_glossary(request) -> GlossaryListResponse:
    exceptions = _load_lexique().get("exceptions", {})
    return GlossaryListResponse(
        entries=[
            GlossaryEntry(word=k, pronunciation=v) for k, v in sorted(exceptions.items())
        ]
    )


@router.put("/glossary")
async def upsert_glossary(request) -> GlossaryEntry:
    body = await read_validated_body(request, GlossaryUpsertRequest)
    with _write_lock:
        data = _load_lexique()
        data.setdefault("exceptions", {})[body.word] = body.pronunciation
        _save_lexique(data)
    return GlossaryEntry(word=body.word, pronunciation=body.pronunciation)


@router.delete("/glossary")
def delete_glossary(request) -> GlossaryEntry:
    word = request.query.get("word")
    if not word:
        raise ApiError(422, [{"loc": ["query", "word"], "msg": "field required"}])
    with _write_lock:
        data = _load_lexique()
        pronunciation = data.get("exceptions", {}).pop(word, None)
        if pronunciation is None:
            return GlossaryEntry(word=word, pronunciation="")
        _save_lexique(data)
    return GlossaryEntry(word=word, pronunciation=pronunciation)
