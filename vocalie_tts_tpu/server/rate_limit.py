"""Thread-safe token-bucket rate limiting (ref: backend/rate_limit.py).

Buckets are keyed by ``ip|sha256(api-key)[:16]``; X-Forwarded-For is
honored only when the direct TCP peer is an explicitly trusted proxy.
"""

from __future__ import annotations

import hashlib
import ipaddress
import threading
import time
from dataclasses import dataclass
from typing import Mapping, Optional

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.web import ApiError


@dataclass
class _Bucket:
    tokens: float
    updated_at: float


_LOCK = threading.Lock()
_BUCKETS: dict = {}
#: evict buckets idle longer than this once the table grows past the
#: high-water mark (the reference's table grows without bound)
_EVICT_IDLE_S = 600.0
_EVICT_HIGH_WATER = 10_000


def reset_buckets() -> None:
    with _LOCK:
        _BUCKETS.clear()


def _evict_stale(now: float) -> None:
    """Caller holds _LOCK."""
    if len(_BUCKETS) < _EVICT_HIGH_WATER:
        return
    stale = [k for k, b in _BUCKETS.items() if now - b.updated_at > _EVICT_IDLE_S]
    for k in stale:
        del _BUCKETS[k]


def _trusted_proxies() -> set:
    return {str(h).strip() for h in server_config.VOCALIE_TRUSTED_PROXIES if str(h).strip()}


def _is_valid_ip(value: str) -> bool:
    try:
        ipaddress.ip_address(value)
        return True
    except ValueError:
        return False


def _forwarded_ip(headers: Mapping[str, str]) -> Optional[str]:
    xff = headers.get("X-Forwarded-For") or headers.get("x-forwarded-for")
    if xff:
        for token in xff.split(","):
            candidate = token.strip()
            if candidate and _is_valid_ip(candidate):
                return candidate
    x_real = (headers.get("X-Real-IP") or headers.get("x-real-ip") or "").strip()
    if x_real and _is_valid_ip(x_real):
        return x_real
    return None


def _effective_ip(peer_host: Optional[str], headers: Mapping[str, str]) -> str:
    peer = str(peer_host or "unknown")
    if peer in _trusted_proxies():
        forwarded = _forwarded_ip(headers)
        if forwarded:
            return forwarded
    return peer


def _api_key(headers: Mapping[str, str]) -> Optional[str]:
    auth = headers.get("Authorization") or headers.get("authorization") or ""
    parts = auth.split(None, 1)
    if len(parts) == 2 and parts[0].lower() == "bearer" and parts[1].strip():
        return parts[1].strip()
    key = (headers.get("X-API-Key") or headers.get("x-api-key") or "").strip()
    return key or None


def _bucket_key(peer_host: Optional[str], headers: Mapping[str, str]) -> str:
    client_ip = _effective_ip(peer_host, headers)
    api_key = _api_key(headers)
    if not api_key:
        return f"ip:{client_ip}|anon"
    fingerprint = hashlib.sha256(api_key.encode("utf-8")).hexdigest()[:16]
    return f"ip:{client_ip}|key:{fingerprint}"


def consume(peer_host: Optional[str], headers: Mapping[str, str], *, rps: float, burst: int) -> bool:
    if rps <= 0 or burst <= 0:
        return True
    now = time.monotonic()
    key = _bucket_key(peer_host, headers)
    with _LOCK:
        _evict_stale(now)
        bucket = _BUCKETS.get(key)
        if bucket is None:
            bucket = _Bucket(tokens=float(burst), updated_at=now)
            _BUCKETS[key] = bucket
        elapsed = max(0.0, now - bucket.updated_at)
        bucket.updated_at = now
        bucket.tokens = min(float(burst), bucket.tokens + elapsed * float(rps))
        if bucket.tokens < 1.0:
            return False
        bucket.tokens -= 1.0
        return True


def enforce_heavy(request) -> None:
    """429 gate for expensive endpoints (job creation, enhancement)."""
    ok = consume(
        getattr(request, "remote", None),
        request.headers,
        rps=float(server_config.VOCALIE_RATE_LIMIT_RPS),
        burst=int(server_config.VOCALIE_RATE_LIMIT_BURST),
    )
    if not ok:
        raise ApiError(429, {"error": "rate_limited"})


__all__ = ["consume", "enforce_heavy", "reset_buckets"]
