"""HTTP API server: the frozen /v1/* contract on aiohttp.

The reference serves this contract with FastAPI/uvicorn (ref:
backend/app.py); this environment has no FastAPI wheel, so a thin
routing/validation layer (server/web.py) provides the same semantics —
pydantic request/response models, dependency-style auth, 422
validation errors — on aiohttp.
"""
