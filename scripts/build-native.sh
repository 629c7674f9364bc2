#!/usr/bin/env bash
# Build the native host-runtime primitives (libwavcodec.so).
set -euo pipefail
cd "$(dirname "$0")/.."
python -c "from vocalie_tts_tpu.native import build_native; import sys; sys.exit(0 if build_native(verbose=True) else 1)"
echo "native build OK: vocalie_tts_tpu/native/libwavcodec.so"
