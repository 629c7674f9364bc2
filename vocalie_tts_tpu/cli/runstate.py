"""Server process management: PID file, detached spawn, health wait.

(ref: vocalie_backend/process.py, config.py)
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

ROOT_DIR = Path(__file__).resolve().parents[2]
RUN_DIR = ROOT_DIR / ".run"
PID_FILE = RUN_DIR / "backend.pid"
LOG_FILE = RUN_DIR / "backend.log"

API_HOST = os.environ.get("API_HOST", "127.0.0.1")
API_PORT = int(os.environ.get("API_PORT", "8018"))

#: env defaults applied at start — explicit operator overrides win
START_ENV_DEFAULTS = {
    "VOCALIE_TRUST_LOCALHOST": "1",
    "VOCALIE_CORS_ORIGINS": "http://localhost:3018,http://127.0.0.1:3018",
    "VOCALIE_ALLOWED_HOSTS": "127.0.0.1,localhost,::1,testserver",
}


@dataclass
class BackendState:
    """Process state, JSON-shaped for the desktop client.

    Field set is the wire contract the Swift app's Codable struct
    decodes (ref: apps/macos/Sources/VocalieTTS/BackendState.swift:9-28,
    vocalie_backend/process.py BackendState) — all eight keys must be
    present; ``pid_alive``/``pid_file`` are non-optional on that side.
    """

    running: bool
    pid: Optional[int]
    pid_alive: bool
    host: str
    port: int
    started_at: Optional[float]
    log_file: str
    pid_file: str

    def to_json(self) -> str:
        return json.dumps(
            {
                "running": self.running,
                "pid": self.pid,
                "pid_alive": self.pid_alive,
                "host": self.host,
                "port": self.port,
                "started_at": self.started_at,
                "log_file": self.log_file,
                "pid_file": self.pid_file,
            },
            indent=2,
            ensure_ascii=True,
        )


def _read_pid() -> Optional[int]:
    try:
        return int(PID_FILE.read_text().strip())
    except (FileNotFoundError, ValueError):
        return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False


def _port_in_use(host: str, port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        return s.connect_ex((host, port)) == 0


def apply_start_env() -> dict:
    env = os.environ.copy()
    for k, v in START_ENV_DEFAULTS.items():
        env.setdefault(k, v)
    return env


def get_state(host: str = API_HOST, port: int = API_PORT) -> BackendState:
    pid = _read_pid()
    running = pid is not None and _pid_alive(pid)
    if not running and PID_FILE.exists() and pid is not None and not _pid_alive(pid):
        PID_FILE.unlink(missing_ok=True)  # stale PID cleanup
        pid = None
    started_at: Optional[float] = None
    if running:
        try:
            started_at = PID_FILE.stat().st_mtime
        except OSError:
            started_at = None
    return BackendState(running=running, pid=pid if running else None,
                        pid_alive=running, host=host, port=port,
                        started_at=started_at, log_file=str(LOG_FILE),
                        pid_file=str(PID_FILE))


def start(host: str = API_HOST, port: int = API_PORT) -> BackendState:
    state = get_state(host, port)
    if state.running:
        raise RuntimeError(f"backend already running (pid={state.pid})")
    if _port_in_use(host, port):
        raise RuntimeError(f"port already in use: {host}:{port}")
    RUN_DIR.mkdir(parents=True, exist_ok=True)
    log_handle = LOG_FILE.open("ab")
    proc = subprocess.Popen(
        [sys.executable, "-m", "vocalie_tts_tpu.server", "--host", host, "--port", str(port)],
        stdout=log_handle,
        stderr=log_handle,
        env=apply_start_env(),
        cwd=str(ROOT_DIR),
        start_new_session=True,  # detach from the CLI's session
    )
    PID_FILE.write_text(str(proc.pid))
    return BackendState(running=True, pid=proc.pid, pid_alive=True,
                        host=host, port=port, started_at=time.time(),
                        log_file=str(LOG_FILE), pid_file=str(PID_FILE))


def stop(timeout_s: float = 10.0, force: bool = False) -> BackendState:
    state = get_state()
    if not state.running or state.pid is None:
        PID_FILE.unlink(missing_ok=True)
        return get_state()
    os.kill(state.pid, signal.SIGTERM)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if not _pid_alive(state.pid):
            break
        time.sleep(0.1)
    if _pid_alive(state.pid) and force:
        os.kill(state.pid, signal.SIGKILL)
        time.sleep(0.2)
    if not _pid_alive(state.pid):
        PID_FILE.unlink(missing_ok=True)
    return get_state()


def probe_health(host: str = API_HOST, port: int = API_PORT, timeout_s: float = 3.0):
    """GET /v1/health → (status_code, body_dict, latency_ms) or raises."""
    url = f"http://{host}:{port}/v1/health"
    t0 = time.monotonic()
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        body = json.loads(resp.read().decode("utf-8"))
        latency_ms = round((time.monotonic() - t0) * 1000, 1)
        return resp.status, body, latency_ms


def wait_ready(host: str = API_HOST, port: int = API_PORT, timeout_s: float = 30.0) -> bool:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            status, _body, _lat = probe_health(host, port, timeout_s=2.0)
            if status == 200:
                return True
        except (urllib.error.URLError, OSError, json.JSONDecodeError):
            pass
        time.sleep(0.5)
    return False


__all__ = [
    "BackendState",
    "get_state",
    "start",
    "stop",
    "probe_health",
    "wait_ready",
    "apply_start_env",
    "PID_FILE",
    "LOG_FILE",
    "API_HOST",
    "API_PORT",
]
