#!/usr/bin/env bash
# One-shot setup: editable install + native build + smoke tests.
# The reference bootstraps three venvs (core + chatterbox + audiosr)
# because each engine pinned its own torch stack; here every engine is
# an in-process JAX graph sharing one environment, so bootstrap is one
# install. ref counterpart: scripts/bootstrap.sh
set -euo pipefail

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"

MODE="${1:-min}"
case "$MODE" in
  min)
    python -m pip install -e . --quiet
    bash scripts/build-native.sh
    ;;
  std)
    python -m pip install -e . --quiet
    bash scripts/build-native.sh
    # materialize engine weights (VOCALIE_INSTALL_MODE=download fetches
    # published checkpoints where the environment has egress)
    python -m vocalie_tts_tpu.cli install chatterbox_finetune_fr || true
    ;;
  check)
    python -m pytest tests/ -q -m "unit or security"
    ;;
  *)
    echo "Usage: ./scripts/bootstrap.sh {min|std|check}" >&2
    exit 1
    ;;
esac
echo "bootstrap $MODE: done"
