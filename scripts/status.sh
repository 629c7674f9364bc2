#!/usr/bin/env bash
# Server status — wraps `vocalie-backend status`.
# ref counterpart: scripts/status.sh
set -euo pipefail
ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"
exec python -m vocalie_tts_tpu.cli status "$@"
