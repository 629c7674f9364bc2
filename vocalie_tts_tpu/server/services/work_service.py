"""Startup cleanup of orphaned work sessions (ref: backend/services/work_service.py)."""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from vocalie_tts_tpu.utils.env import bool_env


def clean_work_dir(work_root: Path) -> int:
    """Remove stale sessions/tmp dirs; honored opt-out VOCALIE_KEEP_WORK=1."""
    if bool_env("VOCALIE_KEEP_WORK"):
        return 0
    work_root = Path(work_root).expanduser().resolve()
    work_root.mkdir(parents=True, exist_ok=True)
    removed = 0
    sessions_dir = work_root / ".sessions"
    if sessions_dir.exists():
        for entry in sessions_dir.iterdir():
            if entry.is_dir():
                shutil.rmtree(entry, ignore_errors=True)
            else:
                entry.unlink(missing_ok=True)
            removed += 1
    for tmp_path in (work_root / ".tmp", work_root / "tmp"):
        if tmp_path.exists():
            for entry in tmp_path.iterdir():
                if entry.is_dir():
                    shutil.rmtree(entry, ignore_errors=True)
                else:
                    entry.unlink(missing_ok=True)
    return removed
