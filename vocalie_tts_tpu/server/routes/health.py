"""Health and metrics endpoints (ref: backend/routes/health.py).

Note: the reference's /v1/metrics counts statuses that the job store
never emits (completed/failed/pending vs done/error/queued), so its
counters always read 0 (SURVEY §5.5); here the real statuses are
counted.
"""

from __future__ import annotations

import asyncio

from vocalie_tts_tpu.engines import available_backend_ids
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.schemas import HealthResponse, MetricsResponse
from vocalie_tts_tpu.server.state import START_TIME
from vocalie_tts_tpu.server.utils import utc_now
from vocalie_tts_tpu.server.web import Router

router = Router(prefix="/v1")


def _check_dir_writable(path) -> bool:
    try:
        probe = path / ".health_check"
        probe.write_text("ok", encoding="utf-8")
        probe.unlink(missing_ok=True)
        return True
    except Exception:
        return False


@router.get("/health", public=True)
async def health(request) -> HealthResponse:
    now = utc_now()
    uptime = int((now - START_TIME).total_seconds())
    # Disk probes are sync I/O; keep the event loop responsive for the
    # 5 s menu-bar poll cadence.
    work_writable, output_writable = await asyncio.gather(
        asyncio.to_thread(_check_dir_writable, server_config.WORK_DIR),
        asyncio.to_thread(_check_dir_writable, server_config.OUTPUT_DIR),
    )
    degraded = not work_writable or not output_writable
    backends = None
    if not degraded:
        backends = await asyncio.to_thread(available_backend_ids)
    return HealthResponse(
        status="degraded" if degraded else "ok",
        api_version=server_config.API_VERSION,
        uptime_s=uptime,
        timestamp=now,
        work_dir_writable=work_writable,
        output_dir_writable=output_writable,
        backends=backends,
    )


@router.get("/metrics")
def metrics(request) -> MetricsResponse:
    from vocalie_tts_tpu.server.services.job_service import JOB_STORE

    now = utc_now()
    jobs = JOB_STORE.snapshot()
    return MetricsResponse(
        uptime_s=int((now - START_TIME).total_seconds()),
        jobs_total=len(jobs),
        jobs_completed=sum(1 for j in jobs if j.get("status") == "done"),
        jobs_failed=sum(1 for j in jobs if j.get("status") == "error"),
        jobs_pending=sum(1 for j in jobs if j.get("status") in {"queued", "running"}),
        backends_available=available_backend_ids(),
        work_dir_writable=_check_dir_writable(server_config.WORK_DIR),
        output_dir_writable=_check_dir_writable(server_config.OUTPUT_DIR),
    )
