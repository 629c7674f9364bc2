"""Asset download + metadata endpoints (ref: backend/routes/assets.py)."""

from __future__ import annotations

from vocalie_tts_tpu.server.schemas import AssetMetaResponse
from vocalie_tts_tpu.server.services import asset_service
from vocalie_tts_tpu.server.web import ApiError, Router, file_response

router = Router(prefix="/v1")


@router.get("/assets/{asset_id}")
def get_asset(request):
    meta = asset_service.get_asset_meta(request.match_info["asset_id"])
    if not meta:
        raise ApiError(404, "asset_not_found")
    path = asset_service.resolve_asset_path(meta)
    if not path or not path.exists():
        raise ApiError(404, "asset_missing")
    return file_response(path, media_type="audio/wav", filename=path.name)


@router.get("/assets/{asset_id}/meta")
def get_asset_meta(request) -> AssetMetaResponse:
    meta = asset_service.get_asset_meta(request.match_info["asset_id"])
    if not meta:
        raise ApiError(404, "asset_not_found")
    return AssetMetaResponse(**meta)
