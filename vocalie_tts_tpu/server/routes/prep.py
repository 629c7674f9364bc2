"""Text-preparation endpoints (ref: backend/routes/prep.py)."""

from __future__ import annotations

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.schemas import (
    PrepAdjustRequest,
    PrepAdjustResponse,
    PrepInterpretRequest,
    PrepInterpretResponse,
)
from vocalie_tts_tpu.server.web import Router, read_validated_body
from vocalie_tts_tpu.text import prepare_adjusted_text

router = Router(prefix="/v1")


@router.post("/prep/adjust")
async def prep_adjust(request) -> PrepAdjustResponse:
    body = await read_validated_body(request, PrepAdjustRequest)
    adjusted_text, _changes = prepare_adjusted_text(
        body.text_raw or "", server_config.LEXIQUE_PATH
    )
    return PrepAdjustResponse(text_adjusted=adjusted_text)


@router.post("/prep/interpret")
async def prep_interpret(request) -> PrepInterpretResponse:
    body = await read_validated_body(request, PrepInterpretRequest)
    source = body.text_adjusted if body.text_adjusted is not None else body.text_raw
    # Glossary interpretation hook point — currently pass-through,
    # matching the reference (ref: backend/routes/prep.py:30-38).
    return PrepInterpretResponse(text_interpreted=source or "", applied_rules_summary=[])
