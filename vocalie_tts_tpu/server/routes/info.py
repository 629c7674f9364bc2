"""Info + capabilities endpoints (ref: backend/routes/info.py)."""

from __future__ import annotations

import platform

from vocalie_tts_tpu import __version__
from vocalie_tts_tpu.engines import list_backends
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.schemas import (
    AudioSRStatus,
    CapabilitiesResponse,
    InfoResponse,
)
from vocalie_tts_tpu.server.services import audiosr_service
from vocalie_tts_tpu.server.web import Router

router = Router(prefix="/v1")


@router.get("/info")
def info(request) -> InfoResponse:
    expose = bool(server_config.VOCALIE_EXPOSE_SYSTEM_INFO)
    return InfoResponse(
        name="vocalie-tts-tpu",
        version=__version__,
        commit=None,
        python=platform.python_version() if expose else "hidden",
        os=platform.platform() if expose else "hidden",
        work_dir=str(server_config.WORK_DIR) if expose else "hidden",
        output_dir=str(server_config.OUTPUT_DIR) if expose else "hidden",
        presets_dir=str(server_config.PRESETS_DIR) if expose else "hidden",
    )


@router.get("/capabilities")
def capabilities(request) -> CapabilitiesResponse:
    engines = [backend.id for backend in list_backends()]
    features = {
        "direction_chunking": True,
        "editing_trim": True,
        "editing_normalize": True,
        "export_formats": ["wav"],
        # Delta vs the reference install flow: torch checkpoints arrive
        # via hub prefetch (or a pre-seeded offline cache) and are then
        # materialized into the npz store by convert-hf — the runtimes
        # never load torch checkpoints directly.
        "weight_acquisition": "prefetch+convert-hf",
    }
    audiosr_status = AudioSRStatus(
        enabled=server_config.VOCALIE_ENABLE_AUDIOSR,
        available=audiosr_service.audiosr_is_available(),
    )
    return CapabilitiesResponse(engines=engines, features=features, audiosr=audiosr_status)
