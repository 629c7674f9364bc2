#!/usr/bin/env bash
# Regenerate the frozen openapi.json contract from the live route/schema
# definitions, then verify the snapshot test passes.
# (ref: scripts/update-openapi.sh — reference regenerates from FastAPI app)
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
from vocalie_tts_tpu.server.openapi import write_snapshot
print(f"wrote {write_snapshot()}")
PY
python -m pytest tests/test_openapi_snapshot.py -q
