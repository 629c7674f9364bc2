"""Synchronous test client for the aiohttp app.

Runs the real HTTP server (loopback, ephemeral port) in a background
thread with its own event loop and exposes sync request helpers via
httpx — the suite tests the actual wire protocol, not an ASGI shim.
"""

from __future__ import annotations

import asyncio
import threading
from typing import Dict, Optional

import httpx
from aiohttp import web


class SyncTestServer:
    """Run an aiohttp Application on 127.0.0.1:<ephemeral> for tests."""

    def __init__(self, app: web.Application, api_key: Optional[str] = None) -> None:
        self._app = app
        self._api_key = api_key
        self._loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self._port: Optional[int] = None
        self._runner: Optional[web.AppRunner] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        if not self._started.wait(timeout=15):
            raise RuntimeError("test server failed to start")
        self._client = httpx.Client(
            base_url=f"http://127.0.0.1:{self._port}", timeout=30.0
        )

    def _run(self) -> None:
        asyncio.set_event_loop(self._loop)

        async def _start():
            self._runner = web.AppRunner(self._app)
            await self._runner.setup()
            site = web.TCPSite(self._runner, "127.0.0.1", 0)
            await site.start()
            server = site._server
            self._port = server.sockets[0].getsockname()[1]
            self._started.set()

        self._loop.run_until_complete(_start())
        self._loop.run_forever()

    @property
    def port(self) -> int:
        return self._port

    def _headers(self, headers: Optional[Dict[str, str]]) -> Dict[str, str]:
        merged: Dict[str, str] = {}
        if self._api_key:
            merged["X-API-Key"] = self._api_key
        if headers:
            merged.update(headers)
        return merged

    def request(self, method: str, path: str, **kwargs) -> httpx.Response:
        headers = self._headers(kwargs.pop("headers", None))
        return self._client.request(method, path, headers=headers, **kwargs)

    def get(self, path: str, **kwargs) -> httpx.Response:
        return self.request("GET", path, **kwargs)

    def post(self, path: str, **kwargs) -> httpx.Response:
        return self.request("POST", path, **kwargs)

    def put(self, path: str, **kwargs) -> httpx.Response:
        return self.request("PUT", path, **kwargs)

    def delete(self, path: str, **kwargs) -> httpx.Response:
        return self.request("DELETE", path, **kwargs)

    def options(self, path: str, **kwargs) -> httpx.Response:
        return self.request("OPTIONS", path, **kwargs)

    def close(self) -> None:
        try:
            self._client.close()
        finally:
            async def _stop():
                if self._runner:
                    await self._runner.cleanup()
                self._loop.stop()

            asyncio.run_coroutine_threadsafe(_stop(), self._loop)
            self._thread.join(timeout=10)
            if not self._loop.is_closed():
                self._loop.close()


__all__ = ["SyncTestServer"]
