#!/usr/bin/env bash
# Stop the server — wraps `vocalie-backend stop` (PID-file based,
# idempotent; never kills by pattern). ref counterpart: scripts/stop.sh
set -euo pipefail
ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"
exec python -m vocalie_tts_tpu.cli stop "$@"
