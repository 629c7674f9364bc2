"""Preset CRUD endpoints (ref: backend/routes/presets.py)."""

from __future__ import annotations

from vocalie_tts_tpu.server.schemas import (
    PresetCreateRequest,
    PresetListResponse,
    PresetMutationResponse,
    PresetResponse,
    PresetUpdateRequest,
)
from vocalie_tts_tpu.server.services import preset_service
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body

router = Router(prefix="/v1")


@router.get("/presets")
def list_presets(request) -> PresetListResponse:
    return PresetListResponse(presets=preset_service.list_presets())


@router.get("/presets/{preset_id}")
def get_preset(request) -> PresetResponse:
    preset = preset_service.get_preset(request.match_info["preset_id"])
    if not preset:
        raise ApiError(404, "preset_not_found")
    return PresetResponse(**preset)


@router.post("/presets")
async def create_preset(request) -> PresetMutationResponse:
    body = await read_validated_body(request, PresetCreateRequest)
    if body.state is None:
        raise ApiError(400, "preset_state_required")
    try:
        result = preset_service.create_preset(body.id, body.label, body.state)
    except ValueError as exc:
        raise ApiError(400, str(exc))
    return PresetMutationResponse(**result)


@router.put("/presets/{preset_id}")
async def update_preset(request) -> PresetMutationResponse:
    body = await read_validated_body(request, PresetUpdateRequest)
    if body.state is None:
        raise ApiError(400, "preset_state_required")
    try:
        result = preset_service.update_preset(
            request.match_info["preset_id"], body.label, body.state
        )
    except ValueError as exc:
        raise ApiError(400, str(exc))
    return PresetMutationResponse(**result)


@router.delete("/presets/{preset_id}")
def delete_preset(request) -> PresetMutationResponse:
    return PresetMutationResponse(
        **preset_service.delete_preset(request.match_info["preset_id"])
    )
