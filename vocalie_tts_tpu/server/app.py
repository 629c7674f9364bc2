"""Application composition (ref: backend/app.py).

Wires the 12 routers behind the auth dependency (health stays public),
TrustedHost + CORS + version-header middleware, and the startup
lifecycle: work-dir cleanup, AudioSR status log, background
availability-cache warm.
"""

from __future__ import annotations

import threading

from aiohttp import web

from vocalie_tts_tpu.engines import available_backend_ids
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.security import require_authorized
from vocalie_tts_tpu.server.services.work_service import clean_work_dir
from vocalie_tts_tpu.server.web import (
    build_application,
    page_security_headers,
    serve_forever,
)


def _startup() -> None:
    from vocalie_tts_tpu.utils.platform import apply_platform_preference

    apply_platform_preference()
    clean_work_dir(server_config.WORK_DIR)
    try:
        from vocalie_tts_tpu.server.services import audiosr_service

        audiosr_service.log_audiosr_status()
    except Exception:
        pass
    # Warm the availability cache off the event loop so the first
    # /v1/health is fast (ref: backend/app.py:37-51).
    threading.Thread(target=lambda: _safe_warm(), daemon=True).start()


def _safe_warm() -> None:
    try:
        available_backend_ids()
    except Exception:
        pass


def create_app() -> web.Application:
    from vocalie_tts_tpu.server.routes import (
        assets,
        audio,
        backends,
        chunks,
        glossary,
        health,
        info,
        jobs,
        prep,
        presets,
        refs,
        tts,
    )

    routers = [
        health.router,
        info.router,
        backends.router,
        tts.router,
        presets.router,
        jobs.router,
        assets.router,
        prep.router,
        chunks.router,
        audio.router,
        refs.router,
        glossary.router,
    ]
    app = build_application(
        routers,
        auth_dependency=require_authorized,
        allowed_hosts=server_config.VOCALIE_ALLOWED_HOSTS,
        cors_origins=server_config.VOCALIE_CORS_ORIGINS,
        version_header=("X-Vocalie-Version", server_config.API_VERSION),
        on_startup=[_startup],
        max_upload_bytes=max(
            int(server_config.VOCALIE_MAX_UPLOAD_BYTES) * 2, 64 * 1024 * 1024
        ),
        security_headers=page_security_headers(server_config.VOCALIE_DEV_MODE),
    )

    # built-in web UI (static, public — the API behind it stays keyed)
    from vocalie_tts_tpu.webui import WEBUI_DIR

    async def _index(_request):
        return web.FileResponse(WEBUI_DIR / "index.html")

    app.router.add_get("/", _index)
    app.router.add_static("/", WEBUI_DIR, show_index=False)
    return app


def main(host: str = "127.0.0.1", port: int = 8018) -> None:
    serve_forever(create_app(), host, port)


if __name__ == "__main__":
    main()
