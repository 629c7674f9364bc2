"""Job status / cancel endpoints (ref: backend/routes/jobs.py)."""

from __future__ import annotations

from vocalie_tts_tpu.server.schemas import JobCancelResponse, JobStatusResponse
from vocalie_tts_tpu.server.services.job_service import JOB_STORE
from vocalie_tts_tpu.server.web import ApiError, Router

router = Router(prefix="/v1")


@router.get("/jobs/{job_id}")
def get_job(request) -> JobStatusResponse:
    job = JOB_STORE.get_job(request.match_info["job_id"])
    if not job:
        raise ApiError(404, "job_not_found")
    return JobStatusResponse(**{k: v for k, v in job.items() if k != "cancel_requested"})


@router.delete("/jobs/{job_id}")
def cancel_job(request) -> JobCancelResponse:
    job_id = request.match_info["job_id"]
    job = JOB_STORE.cancel_job(job_id)
    if not job:
        raise ApiError(404, "job_not_found")
    return JobCancelResponse(job_id=job_id, status=job["status"])
