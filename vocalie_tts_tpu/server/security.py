"""Request authorization and filesystem input validation.

Semantics are contract-pinned to the reference's security behavior
(ref: backend/security.py — localhost trust incl. v4-mapped v6,
bearer/X-API-Key with constant-time compare, proxy Host-header trust,
path-confinement, filename validation; exercised by
tests/test_security_unit.py and tests/test_api_auth.py), but the
implementation is organized differently: one parsed ``AuthContext``
per request and an ordered grant-rule chain, rather than per-check
free functions.
"""

from __future__ import annotations

import dataclasses
import hmac
import logging
import os
from pathlib import Path
from typing import Mapping, Optional

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.web import ApiError

LOCAL_HOSTS = {"127.0.0.1", "::1", "testclient"}
_V4_MAPPED_PREFIX = "::ffff:"
_MAX_FILENAME_LEN = 200  # comfortably under the POSIX 255 limit

logger = logging.getLogger("vocalie_api")


def is_local_host(host: Optional[str]) -> bool:
    """True when *host* is a loopback peer address (either IP family)."""
    if not host:
        return False
    if host.startswith(_V4_MAPPED_PREFIX):
        host = host[len(_V4_MAPPED_PREFIX):]
    return host in LOCAL_HOSTS


@dataclasses.dataclass(frozen=True)
class AuthContext:
    """Everything authorization needs, parsed once from the transport."""

    peer_host: Optional[str]
    host_header: str          # bare hostname, port stripped
    credential: Optional[str] # bearer token or X-API-Key value

    @classmethod
    def from_request_parts(
        cls, peer_host: Optional[str], headers: Mapping[str, str]
    ) -> "AuthContext":
        def header(name: str) -> Optional[str]:
            return headers.get(name) or headers.get(name.lower())

        credential = None
        auth = header("Authorization")
        if auth:
            scheme, _, token = auth.partition(" ")
            if scheme.lower() == "bearer":
                credential = token.strip() or None
        if credential is None:
            raw = header("X-API-Key")
            if raw and str(raw).strip():
                credential = str(raw).strip()

        return cls(
            peer_host=peer_host,
            host_header=(header("Host") or "").split(":")[0],
            credential=credential,
        )

    # ── grant rules, evaluated in order ──────────────────────────────

    def _grant_local_peer(self) -> bool:
        return server_config.VOCALIE_TRUST_LOCALHOST and is_local_host(self.peer_host)

    def _grant_colocated_proxy(self) -> bool:
        # A sidecar frontend rewrites /v1/* with Host pointing at the
        # unexposed internal backend address; that header cannot be
        # produced by an outside client because the port isn't exposed
        # (ref: backend/security.py proxy-trust rationale).
        return server_config.VOCALIE_TRUST_LOCALHOST and self.host_header in (
            "127.0.0.1",
            "localhost",
            "::1",
        )

    def _grant_api_key(self) -> bool:
        required = required_api_key()
        if not required or not self.credential:
            return False
        return hmac.compare_digest(self.credential, required)

    def grant_reason(self) -> Optional[str]:
        """Name of the first rule that admits this request, else None."""
        for reason, rule in (
            ("local-peer", self._grant_local_peer),
            ("proxy-host-header", self._grant_colocated_proxy),
            ("api-key", self._grant_api_key),
        ):
            if rule():
                return reason
        return None


def required_api_key() -> Optional[str]:
    value = os.environ.get("VOCALIE_API_KEY")
    return value.strip() if value and value.strip() else None


def extract_api_key(headers: Mapping[str, str]) -> Optional[str]:
    """The credential a client presented (bearer wins over X-API-Key)."""
    return AuthContext.from_request_parts(None, headers).credential


def is_authorized(peer_host: Optional[str], headers: Mapping[str, str]) -> bool:
    return AuthContext.from_request_parts(peer_host, headers).grant_reason() is not None


def require_authorized(request) -> None:
    """aiohttp-facing auth gate; raises 403 with diagnostics logged."""
    ctx = AuthContext.from_request_parts(getattr(request, "remote", None), request.headers)
    if ctx.grant_reason() is None:
        logger.warning(
            "403 denied: path=%s peer=%s host=%r credential=%s keyring=%s localtrust=%s",
            request.path,
            ctx.peer_host,
            ctx.host_header,
            "present" if ctx.credential else "absent",
            "set" if required_api_key() else "unset",
            server_config.VOCALIE_TRUST_LOCALHOST,
        )
        raise ApiError(403, "forbidden")


# ── filesystem input validation ──────────────────────────────────────


def safe_join_under(root: Path, user_path: str) -> Path:
    """Resolve *user_path* and require it to live under *root*."""
    resolved = Path(user_path).expanduser().resolve()
    try:
        resolved.relative_to(root.resolve())
    except ValueError as exc:
        raise ValueError("path_not_allowed") from exc
    return resolved


_FILENAME_CHECKS = (
    lambda name: bool(name),                     # non-empty after strip
    lambda name: "\x00" not in name,             # no NULs
    lambda name: name == Path(name).name,        # no separators / no dirs
    lambda name: ".." not in name,               # no traversal fragments
    lambda name: len(name) < _MAX_FILENAME_LEN,  # bounded length
)


def safe_filename(name: str) -> str:
    """A bare filename, or raise ValueError("invalid_name")."""
    candidate = str(name or "").strip()
    if not all(check(candidate) for check in _FILENAME_CHECKS):
        raise ValueError("invalid_name")
    return candidate


__all__ = [
    "LOCAL_HOSTS",
    "AuthContext",
    "is_local_host",
    "extract_api_key",
    "required_api_key",
    "is_authorized",
    "require_authorized",
    "safe_join_under",
    "safe_filename",
]
