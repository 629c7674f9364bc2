#!/usr/bin/env bash
# Environment diagnosis — wraps `vocalie-backend doctor` (the CLI owns
# the checks: python/jax versions, device platform, dirs writable,
# engine weight status). ref counterpart: scripts/doctor.sh
set -euo pipefail
ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT_DIR"
exec python -m vocalie_tts_tpu.cli doctor "$@"
