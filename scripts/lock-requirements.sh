#!/usr/bin/env bash
# Freeze the resolved Python environment into requirements.lock.txt.
#
# ref: scripts/lock-requirements.sh — the reference freezes one lockfile
# per engine venv (.venvs/chatterbox, .venvs/audiosr, ...). This framework
# runs every engine in-process on one jax environment (SURVEY §5.8 /
# docs/ARCHITECTURE.md "resident engines"), so there is exactly ONE
# environment to lock.
set -euo pipefail

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

if [[ -n "${VIRTUAL_ENV:-}" || -x "$ROOT_DIR/.venv/bin/python" ]]; then
  PY="${VIRTUAL_ENV:-$ROOT_DIR/.venv}/bin/python"
else
  PY="$(command -v python3 || command -v python)"
fi

echo "Freezing $($PY --version 2>&1) environment -> requirements.lock.txt"
"$PY" -m pip freeze --exclude-editable > "$ROOT_DIR/requirements.lock.txt"
echo "Wrote $ROOT_DIR/requirements.lock.txt ($(wc -l < "$ROOT_DIR/requirements.lock.txt") pins)"
