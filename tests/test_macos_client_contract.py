"""macOS desktop-client contract: the Swift app shells out to this CLI
and decodes its JSON. These tests replay that decoding in Python so the
unported Swift client (ref: apps/macos/Sources/VocalieTTS/
BackendManager.swift, BackendState.swift) stays drop-in.

Contract pins:
- ``status --json`` / ``start --json`` emit exactly the eight
  BackendState keys; ``running``/``pid_alive``/``host``/``port``/
  ``log_file``/``pid_file`` are non-optional in the Swift Codable
  struct, so they must always be present AND non-null.
- ``health --json`` emits HealthResult keys; the Swift app greps
  stdout for the literal substring ``"ok": true`` (colon-space), so
  formatting matters, not just parseability.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# BackendState.swift CodingKeys → (JSON key, may_be_null)
SWIFT_BACKEND_STATE_KEYS = {
    "running": False,
    "pid": True,
    "pid_alive": False,
    "host": False,
    "port": False,
    "started_at": True,
    "log_file": False,
    "pid_file": False,
}

SWIFT_HEALTH_KEYS = {"ok", "http_status", "latency_ms", "body", "error"}


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


def _decode_like_swift(payload: str) -> dict:
    """Fail the way JSONDecoder would: every non-optional key present
    and non-null, types matching the Swift struct."""
    state = json.loads(payload)
    assert set(state) == set(SWIFT_BACKEND_STATE_KEYS), (
        f"BackendState keys drifted: {sorted(state)}"
    )
    for key, nullable in SWIFT_BACKEND_STATE_KEYS.items():
        if not nullable:
            assert state[key] is not None, f"non-optional {key} is null"
    assert isinstance(state["running"], bool)
    assert isinstance(state["pid_alive"], bool)
    assert isinstance(state["host"], str)
    assert isinstance(state["port"], int)
    assert isinstance(state["log_file"], str)
    assert isinstance(state["pid_file"], str)
    assert state["pid"] is None or isinstance(state["pid"], int)
    assert state["started_at"] is None or isinstance(
        state["started_at"], (int, float)
    )
    return state


def test_status_json_decodes_as_backend_state():
    out = _cli("status", "--json")
    state = _decode_like_swift(out.stdout)
    # not running in the test environment → exit 2, running=false
    assert out.returncode == 2
    assert state["running"] is False and state["pid_alive"] is False


def test_stop_json_decodes_as_backend_state():
    out = _cli("stop", "--json")
    assert out.returncode == 0
    _decode_like_swift(out.stdout)


def test_health_json_shape_unreachable():
    out = _cli("health", "--json", "--port", "59999")
    assert out.returncode != 0  # Swift treats non-zero exit as unhealthy
    result = json.loads(out.stdout)
    assert set(result) == SWIFT_HEALTH_KEYS
    assert result["ok"] is False
    # the grep target must NOT appear on the unhealthy path
    assert '"ok": true' not in out.stdout


def test_health_json_healthy_grep_target(capsys, monkeypatch):
    # The Swift app decides health by substring, not JSON parsing —
    # pin the exact rendering on the healthy path (in-process, with the
    # HTTP probe stubbed, so no server needs to run).
    from vocalie_tts_tpu.cli import main as cli_main
    from vocalie_tts_tpu.cli import runstate

    monkeypatch.setattr(
        runstate, "probe_health", lambda **kw: (200, {"status": "ok"}, 12.3)
    )
    rc = cli_main.main(["health", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    assert '"ok": true' in out  # BackendManager.swift refreshHealth grep
    result = json.loads(out)
    assert set(result) == SWIFT_HEALTH_KEYS
    assert result["http_status"] == 200 and result["body"] == {"status": "ok"}
