#!/usr/bin/env bash
# One-shot launcher (macOS / Linux): start the backend, wait for health,
# open the web UI.
#
# ref: scripts/start-macos.sh — the reference starts the FastAPI backend,
# waits for /healthz, then launches the separate Next.js frontend on its
# own port and opens a browser. Here the SPA is served by the backend
# itself at "/" (webui/, no node toolchain), so there is one process and
# one port to open.
set -euo pipefail

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"

export BACKEND_HOST="${BACKEND_HOST:-127.0.0.1}"
export BACKEND_PORT="${BACKEND_PORT:-8018}"
export VOCALIE_TRUST_LOCALHOST="${VOCALIE_TRUST_LOCALHOST:-1}"

PY="${VIRTUAL_ENV:-$ROOT_DIR/.venv}/bin/python"
[[ -x "$PY" ]] || PY="$(command -v python3 || command -v python)"

"$PY" -m vocalie_tts_tpu.cli start --wait --wait-timeout "${VOCALIE_HEALTH_WAIT:-120}"
"$PY" -m vocalie_tts_tpu.cli health

URL="http://${BACKEND_HOST}:${BACKEND_PORT}/"
echo "Backend healthy — web UI at $URL"
if command -v open >/dev/null 2>&1; then open "$URL"          # macOS
elif command -v xdg-open >/dev/null 2>&1; then xdg-open "$URL" # Linux
fi
