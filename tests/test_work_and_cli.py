"""Work-dir cleanup + CLI behavior (modeled on ref: tests/test_work_service.py,
test_vocalie_cli.py)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from vocalie_tts_tpu.server.services.work_service import clean_work_dir

pytestmark = pytest.mark.unit

REPO = Path(__file__).resolve().parents[1]


def test_clean_work_dir_removes_sessions(tmp_path):
    work = tmp_path / "work"
    (work / ".sessions" / "20260101_000000_a").mkdir(parents=True)
    (work / ".sessions" / "stray.txt").write_text("x")
    (work / ".tmp" / "t").mkdir(parents=True)
    (work / "tmp" / "u.wav").parent.mkdir(parents=True)
    (work / "tmp" / "u.wav").write_text("x")
    removed = clean_work_dir(work)
    assert removed == 2
    assert not any((work / ".sessions").iterdir())
    assert not any((work / ".tmp").iterdir())
    assert not any((work / "tmp").iterdir())


def test_clean_work_dir_keep_flag(tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_KEEP_WORK", "1")
    work = tmp_path / "work"
    (work / ".sessions" / "s").mkdir(parents=True)
    assert clean_work_dir(work) == 0
    assert (work / ".sessions" / "s").exists()


def _cli(*args, env=None):
    import os

    full_env = {**os.environ, "PYTHONPATH": str(REPO), **(env or {})}
    return subprocess.run(
        [sys.executable, "-m", "vocalie_tts_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=full_env,
        timeout=60,
    )


def test_cli_version():
    out = _cli("--version")
    assert out.returncode == 0
    assert out.stdout.strip()


def test_cli_status_not_running_exit_2():
    out = _cli("status", "--json")
    assert out.returncode == 2
    body = json.loads(out.stdout)
    assert body["running"] is False


def test_cli_stop_idempotent():
    out = _cli("stop")
    assert out.returncode == 0
    assert "stopped" in out.stdout


def test_cli_health_not_running_exit_2():
    out = _cli("health", "--port", "59999")
    assert out.returncode == 2


def test_cli_doctor_json():
    out = _cli("doctor", "--json", env={"JAX_PLATFORMS": "cpu"})
    checks = json.loads(out.stdout)
    names = {c["name"] for c in checks}
    assert "python" in names and "jax" in names
