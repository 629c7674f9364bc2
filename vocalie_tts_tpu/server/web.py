"""Minimal FastAPI-semantics layer over aiohttp.

Provides exactly what the frozen /v1/* contract needs (ref:
backend/app.py + backend/routes/*): pydantic-validated JSON bodies
(422 on validation error, FastAPI-compatible error shape), an ApiError
carrying an HTTP status + ``detail`` payload, pydantic response
serialization, per-router auth dependencies, and file responses.
"""

from __future__ import annotations

import asyncio
import inspect
import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, List, Optional, Type

from aiohttp import web
from pydantic import BaseModel, ValidationError

logger = logging.getLogger("vocalie_api")


class ApiError(Exception):
    """HTTP error with a FastAPI-shaped JSON body: {"detail": ...}."""

    def __init__(self, status_code: int, detail: Any) -> None:
        super().__init__(str(detail))
        self.status_code = status_code
        self.detail = detail


def json_response(payload: Any, status: int = 200) -> web.Response:
    if isinstance(payload, BaseModel):
        body = payload.model_dump_json()
        return web.Response(
            text=body, status=status, content_type="application/json"
        )
    return web.Response(
        text=json.dumps(payload, default=str),
        status=status,
        content_type="application/json",
    )


def file_response(path: Path, media_type: str, filename: Optional[str] = None) -> web.FileResponse:
    headers = {}
    if filename:
        headers["Content-Disposition"] = f'attachment; filename="{filename}"'
    resp = web.FileResponse(path, headers=headers)
    resp.content_type = media_type
    return resp


async def read_validated_body(request: web.Request, model: Type[BaseModel]):
    """Parse + validate the JSON body, FastAPI-style.

    Malformed JSON and schema violations both map to 422 with a
    ``detail`` list, which is what the frontend expects.
    """
    try:
        raw = await request.text()
        data = json.loads(raw) if raw else {}
    except json.JSONDecodeError:
        raise ApiError(422, [{"type": "json_invalid", "msg": "Invalid JSON body"}])
    try:
        return model.model_validate(data)
    except ValidationError as exc:
        raise ApiError(422, json.loads(exc.json()))


@dataclass
class Route:
    method: str
    path: str
    handler: Callable
    public: bool = False  # skip the auth dependency


@dataclass
class Router:
    """Route collection with an optional prefix (ref: APIRouter)."""

    prefix: str = ""
    routes: List[Route] = field(default_factory=list)

    def _add(self, method: str, path: str, public: bool = False):
        def decorator(fn):
            self.routes.append(Route(method, self.prefix + path, fn, public))
            return fn

        return decorator

    def get(self, path: str, public: bool = False):
        return self._add("GET", path, public)

    def post(self, path: str, public: bool = False):
        return self._add("POST", path, public)

    def put(self, path: str, public: bool = False):
        return self._add("PUT", path, public)

    def delete(self, path: str, public: bool = False):
        return self._add("DELETE", path, public)


def _wrap_handler(route: Route, auth_dependency: Optional[Callable]):
    # FastAPI semantics (the reference's framework): plain ``def``
    # handlers run in a worker thread, NEVER on the event loop — a
    # sync handler that blocks (e.g. backend install = minutes of
    # weight materialization + compile warm) must not freeze health
    # checks and every other request behind it. async handlers stay
    # on the loop. (Caught by tests/test_api_fuzz.py: an in-loop piper
    # install starved the whole API for ~40 s.)
    run_sync_threaded = not inspect.iscoroutinefunction(route.handler)

    async def handler(request: web.Request) -> web.StreamResponse:
        try:
            if not route.public and auth_dependency is not None:
                auth_dependency(request)
            if run_sync_threaded:
                import asyncio

                result = await asyncio.to_thread(route.handler, request)
            else:
                result = route.handler(request)
            if inspect.isawaitable(result):
                result = await result
            if isinstance(result, web.StreamResponse):
                return result
            return json_response(result)
        except ApiError as exc:
            return json_response({"detail": exc.detail}, status=exc.status_code)
        except ValidationError as exc:
            return json_response({"detail": json.loads(exc.json())}, status=422)
        except Exception:
            logger.exception("unhandled error on %s %s", route.method, route.path)
            return json_response({"detail": "internal_error"}, status=500)

    return handler


def _cors_headers(origin: str) -> dict:
    return {
        "Access-Control-Allow-Origin": origin,
        "Access-Control-Allow-Methods": "GET, POST, DELETE, PUT, OPTIONS",
        "Access-Control-Allow-Headers": "Authorization, Content-Type, X-API-Key",
    }


def page_security_headers(dev_mode: bool) -> dict:
    """CSP + standard security headers for page/static responses.

    Mirrors the reference's per-request page headers (ref:
    frontend/src/proxy.ts:36-75) adapted to the built-in SPA: the SPA
    loads only external same-origin script/style files, so script-src
    drops 'unsafe-inline' entirely (stricter than the reference, whose
    RSC inline scripts force it); inline style *attributes* in
    index.html still need 'unsafe-inline' on style-src. Dev mode adds
    'unsafe-eval' (tooling parity with the reference's HMR allowance);
    prod adds HSTS.
    """
    script_src = "'self' 'unsafe-eval'" if dev_mode else "'self'"
    csp = "; ".join(
        [
            "default-src 'self'",
            "base-uri 'self'",
            "frame-ancestors 'none'",
            "form-action 'self'",
            "img-src 'self' data: blob:",
            "media-src 'self' data: blob:",
            "font-src 'self' data:",
            f"script-src {script_src}",
            "style-src 'self' 'unsafe-inline'",
            "connect-src 'self'",
        ]
    )
    headers = {
        "Content-Security-Policy": csp,
        "X-Content-Type-Options": "nosniff",
        "X-Frame-Options": "DENY",
        "Referrer-Policy": "strict-origin-when-cross-origin",
        "Permissions-Policy": "camera=(), microphone=(), geolocation=()",
    }
    if not dev_mode:
        headers["Strict-Transport-Security"] = (
            "max-age=63072000; includeSubDomains; preload"
        )
    return headers


def build_application(
    routers: List[Router],
    *,
    auth_dependency: Optional[Callable] = None,
    allowed_hosts: Optional[List[str]] = None,
    cors_origins: Optional[List[str]] = None,
    version_header: Optional[tuple] = None,
    on_startup: Optional[List[Callable]] = None,
    max_upload_bytes: int = 100 * 1024 * 1024,
    security_headers: Optional[dict] = None,
    api_prefix: str = "/v1/",
) -> web.Application:
    """Assemble the aiohttp application with the contract middlewares."""
    allowed = [h for h in (allowed_hosts or []) if h != "*"]
    if allowed_hosts and "*" in allowed_hosts:
        logger.warning("allowed-hosts wildcard is not supported; ignoring")
    origins = [o for o in (cors_origins or []) if o != "*"]
    if cors_origins and "*" in cors_origins:
        logger.warning("CORS wildcard is not supported; ignoring")

    @web.middleware
    async def contract_middleware(request: web.Request, handler):
        # TrustedHost (ref: backend/app.py:64-68)
        if allowed:
            host = (request.headers.get("Host") or "").split(":")[0]
            if host not in allowed:
                return web.Response(
                    status=400, text="Invalid host header", content_type="text/plain"
                )
        origin = request.headers.get("Origin")
        cors_ok = origin in origins if origin else False
        # CORS preflight is exempt from auth (ref: tests/test_api_auth.py)
        if request.method == "OPTIONS":
            headers = _cors_headers(origin) if cors_ok else {}
            if version_header:
                headers[version_header[0]] = version_header[1]
            return web.Response(status=200, headers=headers)
        response = await handler(request)
        if version_header:
            response.headers[version_header[0]] = version_header[1]
        if cors_ok:
            for k, v in _cors_headers(origin).items():
                response.headers[k] = v
        # Page/static responses (the built-in SPA) get CSP + security
        # headers; API responses keep the lean contract surface, same
        # split as the reference proxy (ref: frontend/src/proxy.ts:25-33)
        if security_headers and not request.path.startswith(api_prefix):
            for k, v in security_headers.items():
                response.headers.setdefault(k, v)
        return response

    app = web.Application(
        middlewares=[contract_middleware], client_max_size=max_upload_bytes
    )
    for router in routers:
        for route in router.routes:
            app.router.add_route(
                route.method, route.path, _wrap_handler(route, auth_dependency)
            )
    for fn in on_startup or []:
        async def _startup(_app, fn=fn):
            result = fn()
            if inspect.isawaitable(result):
                await result

        app.on_startup.append(_startup)
    return app


async def run_app(app: web.Application, host: str, port: int) -> web.AppRunner:
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    return runner


def serve_forever(app: web.Application, host: str, port: int) -> None:
    async def _main():
        await run_app(app, host, port)
        while True:
            await asyncio.sleep(3600)

    asyncio.run(_main())


__all__ = [
    "ApiError",
    "Router",
    "Route",
    "json_response",
    "file_response",
    "page_security_headers",
    "read_validated_body",
    "build_application",
    "run_app",
    "serve_forever",
]
