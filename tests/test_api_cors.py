"""CORS contract (modeled on ref: tests/test_api_cors.py)."""

import pytest

pytestmark = pytest.mark.security


def test_allowed_origin_gets_cors_headers(api_client):
    resp = api_client.get(
        "/v1/health", headers={"Origin": "http://localhost:3018"}
    )
    assert resp.headers.get("Access-Control-Allow-Origin") == "http://localhost:3018"
    assert "X-API-Key" in resp.headers.get("Access-Control-Allow-Headers", "")


def test_disallowed_origin_gets_no_cors_headers(api_client):
    resp = api_client.get("/v1/health", headers={"Origin": "http://evil.example"})
    assert "Access-Control-Allow-Origin" not in resp.headers


def test_preflight_allows_methods(api_client):
    resp = api_client.options(
        "/v1/tts/jobs",
        headers={
            "Origin": "http://127.0.0.1:3018",
            "Access-Control-Request-Method": "POST",
        },
    )
    assert resp.status_code == 200
    assert "POST" in resp.headers.get("Access-Control-Allow-Methods", "")


def test_wildcard_origins_rejected_at_build(monkeypatch):
    from vocalie_tts_tpu.server import config as server_config
    from vocalie_tts_tpu.server.app import create_app

    monkeypatch.setattr(server_config, "VOCALIE_CORS_ORIGINS", ["*", "http://ok.example"])
    app = create_app()  # must not raise; wildcard ignored with a warning
    assert app is not None
