"""In-memory job store: thread-per-job with a concurrency cap
(ref: backend/services/job_service.py).

State machine: queued → running → done | error | canceled.
Cancel is cooperative: the synthesis thread keeps running but its
result is dropped and progress updates stop.
"""

from __future__ import annotations

import logging
import threading
import uuid
from pathlib import Path
from typing import Any, Dict, Optional

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.services import asset_service
from vocalie_tts_tpu.server.services.tts_service import run_tts_job
from vocalie_tts_tpu.server.utils import utc_now

logger = logging.getLogger(__name__)


class JobStore:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._jobs: Dict[str, Dict[str, Any]] = {}

    def reset(self) -> None:
        with self._lock:
            self._jobs.clear()

    def snapshot(self) -> list:
        with self._lock:
            return [dict(job) for job in self._jobs.values()]

    def create_job(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        with self._lock:
            active = sum(
                1 for job in self._jobs.values() if job.get("status") in {"queued", "running"}
            )
            if active >= server_config.MAX_CONCURRENT_JOBS:
                now = utc_now()
                return {
                    "job_id": "",
                    "status": "rejected",
                    "progress": 0.0,
                    "created_at": now,
                    "started_at": None,
                    "finished_at": now,
                    "asset_id": None,
                    "error": "too_many_concurrent_jobs",
                    "cancel_requested": False,
                }
        job_id = f"job_{uuid.uuid4().hex}"
        job = {
            "job_id": job_id,
            "status": "queued",
            "progress": 0.0,
            "created_at": utc_now(),
            "started_at": None,
            "finished_at": None,
            "asset_id": None,
            "error": None,
            "cancel_requested": False,
        }
        with self._lock:
            self._jobs[job_id] = job
            snapshot = dict(job)
        threading.Thread(target=self._run_job, args=(job_id, payload), daemon=True).start()
        return snapshot

    def get_job(self, job_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            job = self._jobs.get(job_id)
            return dict(job) if job else None

    def cancel_job(self, job_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            job = self._jobs.get(job_id)
            if not job:
                return None
            job["cancel_requested"] = True
            if job["status"] in {"queued", "running"}:
                job["status"] = "canceled"
                job["finished_at"] = utc_now()
            return dict(job)

    def _update_job(self, job_id: str, **updates) -> None:
        with self._lock:
            job = self._jobs.get(job_id)
            if job:
                job.update(updates)

    def _progress_cb(self, job_id: str, value: float) -> None:
        with self._lock:
            job = self._jobs.get(job_id)
            if not job or job.get("status") == "canceled":
                return
            job["progress"] = float(max(0.0, min(1.0, value)))

    def _run_job(self, job_id: str, payload: Dict[str, Any]) -> None:
        job = self.get_job(job_id)
        if job and job.get("status") == "canceled":
            return
        self._update_job(job_id, status="running", started_at=utc_now())
        logger.info(
            "tts_job_start job=%s engine=%s voice=%s text_len=%d",
            job_id,
            payload.get("engine", ""),
            payload.get("voice"),
            len(payload.get("text", "")),
        )
        try:
            result = run_tts_job(
                job_id=job_id,
                text=payload["text"],
                engine=payload["engine"],
                voice=payload.get("voice"),
                model=payload.get("model"),
                language=payload.get("language"),
                direction_enabled=payload.get("direction_enabled", False),
                direction_marker=payload.get("direction_marker", "[[CHUNK]]"),
                options=payload.get("options") or {},
                export=payload.get("export") or {},
                editing=payload.get("editing") or {},
                progress_cb=lambda v: self._progress_cb(job_id, v),
            )

            if self.get_job(job_id).get("status") == "canceled":
                return

            output_path: Path = result["output_path"]
            try:
                rel_path = str(output_path.relative_to(server_config.OUTPUT_DIR))
            except ValueError:
                rel_path = output_path.name

            asset_id = f"asset_{uuid.uuid4().hex}"
            asset_service.write_asset_meta(
                asset_id,
                {
                    "file_name": output_path.name,
                    "relative_path": rel_path,
                    "size_bytes": int(result.get("size_bytes") or output_path.stat().st_size),
                    "duration_s": result.get("duration_s"),
                    "sample_rate": result.get("sample_rate"),
                    "engine": result.get("engine"),
                    "voice": result.get("voice"),
                    "model": result.get("model"),
                    "created_at": result.get("created_at").isoformat(timespec="seconds"),
                    "job_id": job_id,
                },
            )
            self._update_job(
                job_id,
                status="done",
                progress=1.0,
                finished_at=utc_now(),
                asset_id=asset_id,
            )
        except Exception as exc:
            self._update_job(
                job_id, status="error", finished_at=utc_now(), error=str(exc)
            )


JOB_STORE = JobStore()
