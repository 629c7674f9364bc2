"""Engine install lifecycle endpoints (ref: backend/routes/backends.py).

"Install" is weight materialization + compile warm, not a venv build
(see vocalie_tts_tpu/engines/install.py).
"""

from __future__ import annotations

from vocalie_tts_tpu.engines.catalog import PROTECTED_BACKENDS
from vocalie_tts_tpu.engines.install import backend_status, run_install, run_uninstall
from vocalie_tts_tpu.server.schemas import BackendInstallResponse
from vocalie_tts_tpu.server.web import ApiError, Router

router = Router(prefix="/v1/backends")


@router.post("/{engine_id}/install")
def install_backend(request) -> BackendInstallResponse:
    engine_id = request.match_info["engine_id"]
    status = backend_status(engine_id)
    if status.get("installed"):
        raise ApiError(409, f"Backend {engine_id} already installed")
    ok, logs = run_install(engine_id)
    log_text = "\n".join(logs) if isinstance(logs, list) else str(logs)
    if not ok:
        raise ApiError(500, f"Installation failed: {log_text}")
    return BackendInstallResponse(engine_id=engine_id, status="installed", logs=log_text)


@router.delete("/{engine_id}/uninstall")
def uninstall_backend(request) -> BackendInstallResponse:
    engine_id = request.match_info["engine_id"]
    if engine_id in PROTECTED_BACKENDS:
        raise ApiError(403, f"Cannot uninstall a default backend: {engine_id}")
    ok, message = run_uninstall(engine_id)
    if not ok:
        raise ApiError(404, message)
    return BackendInstallResponse(engine_id=engine_id, status="uninstalled", logs=message)


@router.get("/{engine_id}/status")
def backend_status_endpoint(request) -> dict:
    return backend_status(request.match_info["engine_id"])
