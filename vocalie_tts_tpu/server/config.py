"""Environment-driven configuration (ref: backend/config.py).

All knobs come from VOCALIE_* env vars, parsed once at import; tests
monkeypatch the module attributes directly (same pattern the reference
suite uses, ref: tests/conftest.py:39-58).
"""

from __future__ import annotations

import os
from pathlib import Path

BASE_DIR = Path(__file__).resolve().parents[2]
API_VERSION = "v1"


def _parse_csv_env(name: str, default: list) -> list:
    raw = os.environ.get(name)
    if raw is None:
        return list(default)
    value = raw.strip()
    if not value:
        return []
    return [part.strip() for part in value.split(",") if part.strip()]


def _parse_bool_env(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return bool(default)
    return raw.strip().lower() in {"1", "true", "yes", "on"}


MAX_TEXT_CHARS = int(os.environ.get("VOCALIE_MAX_TEXT_CHARS") or "50000")
MAX_CONCURRENT_JOBS = int(os.environ.get("VOCALIE_MAX_CONCURRENT_JOBS") or "2")

DEFAULT_CORS_ORIGINS = [
    "http://localhost:3018",
    "http://127.0.0.1:3018",
]

VOCALIE_CORS_ORIGINS = _parse_csv_env("VOCALIE_CORS_ORIGINS", DEFAULT_CORS_ORIGINS)
VOCALIE_ALLOWED_HOSTS = _parse_csv_env(
    "VOCALIE_ALLOWED_HOSTS",
    ["127.0.0.1", "localhost", "::1", "testserver"],
)

VOCALIE_RATE_LIMIT_RPS = float(os.environ.get("VOCALIE_RATE_LIMIT_RPS") or "5")
VOCALIE_RATE_LIMIT_BURST = int(os.environ.get("VOCALIE_RATE_LIMIT_BURST") or "10")
VOCALIE_TRUSTED_PROXIES = _parse_csv_env(
    "VOCALIE_TRUSTED_PROXIES",
    ["127.0.0.1", "::1", "localhost", "testclient"],
)
VOCALIE_MAX_UPLOAD_BYTES = int(
    os.environ.get("VOCALIE_MAX_UPLOAD_BYTES") or str(25 * 1024 * 1024)
)

VOCALIE_ENABLE_AUDIOSR = _parse_bool_env("VOCALIE_ENABLE_AUDIOSR", default=True)
VOCALIE_AUDIOSR_TIMEOUT_S = float(os.environ.get("VOCALIE_AUDIOSR_TIMEOUT_S") or "900")
VOCALIE_ENABLE_API_DOCS = _parse_bool_env("VOCALIE_ENABLE_API_DOCS", default=False)
VOCALIE_TRUST_LOCALHOST = _parse_bool_env("VOCALIE_TRUST_LOCALHOST", default=False)
VOCALIE_EXPOSE_SYSTEM_INFO = _parse_bool_env("VOCALIE_EXPOSE_SYSTEM_INFO", default=False)
# Dev mode relaxes the page CSP (adds 'unsafe-eval') and skips HSTS —
# the reference's NODE_ENV=development split (ref: frontend/src/proxy.ts)
VOCALIE_DEV_MODE = _parse_bool_env("VOCALIE_DEV_MODE", default=False)

_work_env = os.environ.get("VOCALIE_WORK_DIR")
WORK_DIR = Path(_work_env).expanduser() if _work_env else BASE_DIR / "work"
WORK_DIR.mkdir(parents=True, exist_ok=True)

_output_env = os.environ.get("VOCALIE_OUTPUT_DIR") or os.environ.get("CHATTERBOX_OUT_DIR")
OUTPUT_DIR = Path(_output_env).expanduser() if _output_env else BASE_DIR / "output"
OUTPUT_DIR.mkdir(parents=True, exist_ok=True)

PRESETS_DIR = BASE_DIR / "presets"
PRESETS_DIR.mkdir(parents=True, exist_ok=True)

ASSETS_META_DIR = OUTPUT_DIR / ".assets"
ASSETS_META_DIR.mkdir(parents=True, exist_ok=True)

LEXIQUE_PATH = Path(
    os.environ.get("VOCALIE_LEXIQUE_PATH")
    or BASE_DIR / "vocalie_tts_tpu" / "data" / "lexique_tts_fr.json"
)
