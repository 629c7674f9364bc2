#!/usr/bin/env bash
# Validate the production env baseline (ref: scripts/check-security-baseline.sh).
# With --prod, fail when a production-unsafe configuration is detected.
set -euo pipefail

PROD=0
[ "${1:-}" = "--prod" ] && PROD=1

errors=0
note() { echo "✗ $1" >&2; errors=$((errors + 1)); }

if [ "$PROD" = "1" ]; then
  [ -n "${VOCALIE_API_KEY:-}" ] || note "VOCALIE_API_KEY must be set in production"
  case "${VOCALIE_TRUST_LOCALHOST:-0}" in
    1|true|yes|on) note "VOCALIE_TRUST_LOCALHOST must be disabled in production";;
  esac
  case "${VOCALIE_ENABLE_API_DOCS:-0}" in
    1|true|yes|on) note "VOCALIE_ENABLE_API_DOCS must be disabled in production";;
  esac
  case "${VOCALIE_EXPOSE_SYSTEM_INFO:-0}" in
    1|true|yes|on) note "VOCALIE_EXPOSE_SYSTEM_INFO must be disabled in production";;
  esac
  case "${VOCALIE_DEV_MODE:-0}" in
    1|true|yes|on) note "VOCALIE_DEV_MODE must be disabled in production (relaxes the page CSP, drops HSTS)";;
  esac
  if echo "${VOCALIE_CORS_ORIGINS:-}" | grep -q '\*'; then
    note "VOCALIE_CORS_ORIGINS must not contain a wildcard"
  fi
  if echo "${VOCALIE_ALLOWED_HOSTS:-}" | grep -q '\*'; then
    note "VOCALIE_ALLOWED_HOSTS must not contain a wildcard"
  fi
fi

if [ "$errors" -gt 0 ]; then
  echo "security baseline: $errors problem(s)" >&2
  exit 1
fi
echo "security baseline OK"
