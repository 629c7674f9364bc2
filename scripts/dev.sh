#!/usr/bin/env bash
# Dev stack: backend on :8018 serving the webui at / (no separate
# frontend server — the SPA is zero-toolchain). Fake engine on, CPU
# platform so a dev box never attaches to the single-tenant TPU.
# ref counterpart: scripts/dev.sh + dev-backend.sh + dev-frontend.sh
set -euo pipefail

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"

export VOCALIE_API_KEY="${VOCALIE_API_KEY:-dev-key}"
export VOCALIE_TRUST_LOCALHOST="${VOCALIE_TRUST_LOCALHOST:-1}"
export VOCALIE_ENABLE_FAKE_ENGINE="${VOCALIE_ENABLE_FAKE_ENGINE:-1}"
export VOCALIE_PLATFORM="${VOCALIE_PLATFORM:-cpu}"
export VOCALIE_MODEL_SCALE="${VOCALIE_MODEL_SCALE:-tiny}"
export VOCALIE_ALLOW_RANDOM_WEIGHTS="${VOCALIE_ALLOW_RANDOM_WEIGHTS:-1}"

echo "Backend + webui: http://127.0.0.1:${VOCALIE_PORT:-8018}  (API key: $VOCALIE_API_KEY)"
exec python -m vocalie_tts_tpu.server --port "${VOCALIE_PORT:-8018}"
