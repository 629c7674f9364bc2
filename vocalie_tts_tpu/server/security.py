"""Auth, path-safety and filename validation (ref: backend/security.py).

Works on a transport-agnostic view of the request: ``peer_host`` (the
TCP peer) and a headers mapping — so the same logic serves aiohttp
handlers and unit tests without a framework object.
"""

from __future__ import annotations

import hmac
import logging
import os
from pathlib import Path
from typing import Mapping, Optional

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.web import ApiError

LOCAL_HOSTS = {"127.0.0.1", "::1", "testclient"}

logger = logging.getLogger("vocalie_api")


def is_local_host(host: Optional[str]) -> bool:
    if not host:
        return False
    if host in LOCAL_HOSTS:
        return True
    # IPv4-mapped IPv6 loopback ("::ffff:127.0.0.1")
    return host.startswith("::ffff:") and host[7:] in LOCAL_HOSTS


def _bearer_token(auth_header: Optional[str]) -> Optional[str]:
    if not auth_header:
        return None
    parts = auth_header.split(None, 1)
    if len(parts) != 2 or parts[0].lower() != "bearer":
        return None
    return parts[1].strip() or None


def extract_api_key(headers: Mapping[str, str]) -> Optional[str]:
    token = _bearer_token(headers.get("Authorization") or headers.get("authorization"))
    if token:
        return token
    header_key = headers.get("X-API-Key") or headers.get("x-api-key")
    if header_key and str(header_key).strip():
        return str(header_key).strip()
    return None


def required_api_key() -> Optional[str]:
    value = os.environ.get("VOCALIE_API_KEY")
    return value.strip() if value and value.strip() else None


def is_authorized(peer_host: Optional[str], headers: Mapping[str, str]) -> bool:
    if server_config.VOCALIE_TRUST_LOCALHOST and is_local_host(peer_host):
        return True
    # Co-located proxy trust: a sidecar frontend rewrites /v1/* with
    # Host pointing at the unexposed internal backend address — that
    # header is unforgeable from outside (ref: backend/security.py:58-67).
    if server_config.VOCALIE_TRUST_LOCALHOST:
        host_header = (headers.get("Host") or headers.get("host") or "").split(":")[0]
        if host_header in ("127.0.0.1", "localhost", "::1"):
            return True
    required = required_api_key()
    if not required:
        return False
    provided = extract_api_key(headers)
    if not provided:
        return False
    return hmac.compare_digest(provided, required)


def require_authorized(request) -> None:
    """aiohttp-facing auth gate; raises 403 with diagnostics logged."""
    peer_host = getattr(request, "remote", None)
    headers = request.headers
    if not is_authorized(peer_host, headers):
        logger.warning(
            "auth_403 path=%s client=%s host_header=%s trust_localhost=%s "
            "api_key_required=%s api_key_provided=%s",
            request.path,
            peer_host,
            headers.get("Host"),
            server_config.VOCALIE_TRUST_LOCALHOST,
            bool(required_api_key()),
            bool(extract_api_key(headers)),
        )
        raise ApiError(403, "forbidden")


def safe_join_under(root: Path, user_path: str) -> Path:
    """Resolve *user_path* and require it to live under *root*."""
    resolved = Path(user_path).expanduser().resolve()
    try:
        resolved.relative_to(root.resolve())
    except ValueError as exc:
        raise ValueError("path_not_allowed") from exc
    return resolved


def safe_filename(name: str) -> str:
    """Reject path separators, traversal, NULs and over-long names.

    200 chars is comfortably under the POSIX 255 limit
    (ref: backend/security.py:103-118).
    """
    candidate = str(name or "").strip()
    if not candidate:
        raise ValueError("invalid_name")
    if "\x00" in candidate:
        raise ValueError("invalid_name")
    if candidate != Path(candidate).name:
        raise ValueError("invalid_name")
    if ".." in candidate:
        raise ValueError("invalid_name")
    if len(candidate) >= 200:
        raise ValueError("invalid_name")
    return candidate


__all__ = [
    "LOCAL_HOSTS",
    "is_local_host",
    "extract_api_key",
    "required_api_key",
    "is_authorized",
    "require_authorized",
    "safe_join_under",
    "safe_filename",
]
