#!/usr/bin/env bash
# Live-server smoke test (ref: scripts/smoke.sh): health, engine
# catalog, voices, capabilities against a running backend.
set -euo pipefail

HOST="${SMOKE_HOST:-127.0.0.1}"
PORT="${SMOKE_PORT:-8018}"
KEY="${VOCALIE_API_KEY:-}"
BASE="http://${HOST}:${PORT}/v1"
AUTH=()
[ -n "$KEY" ] && AUTH=(-H "X-API-Key: ${KEY}")

fail() { echo "SMOKE FAIL: $1" >&2; exit 1; }

echo "→ GET /health"
HEALTH=$(curl -fsS "${BASE}/health") || fail "health unreachable"
echo "$HEALTH" | grep -q '"status"' || fail "health body malformed"

echo "→ GET /tts/engines"
ENGINES=$(curl -fsS "${AUTH[@]}" "${BASE}/tts/engines") || fail "engines unreachable"
echo "$ENGINES" | grep -q 'chatterbox_native' || fail "chatterbox_native missing from catalog"
echo "$ENGINES" | grep -q 'qwen3_custom' || fail "qwen3_custom missing from catalog"

echo "→ GET /tts/voices?engine=chatterbox_native"
curl -fsS "${AUTH[@]}" "${BASE}/tts/voices?engine=chatterbox_native" >/dev/null \
  || fail "voices unreachable"

echo "→ GET /capabilities"
CAPS=$(curl -fsS "${AUTH[@]}" "${BASE}/capabilities") || fail "capabilities unreachable"
echo "$CAPS" | grep -q '"audiosr"' || fail "audiosr status missing"

echo "SMOKE OK"
