"""Auth contract: health public, everything else keyed
(modeled on ref: tests/test_api_auth.py)."""

import pytest

pytestmark = pytest.mark.security


def test_health_is_public(api_client):
    resp = api_client._client.get("/v1/health")  # no API key header
    assert resp.status_code == 200
    body = resp.json()
    assert body["status"] in ("ok", "degraded")
    assert body["api_version"] == "v1"


def test_protected_route_requires_key(api_client):
    resp = api_client._client.get("/v1/tts/engines")
    assert resp.status_code == 403
    assert resp.json()["detail"] == "forbidden"


def test_wrong_key_rejected(api_client):
    resp = api_client._client.get("/v1/tts/engines", headers={"X-API-Key": "wrong"})
    assert resp.status_code == 403


def test_correct_key_accepted(api_client):
    resp = api_client.get("/v1/tts/engines")
    assert resp.status_code == 200


def test_bearer_token_accepted(api_client):
    resp = api_client._client.get(
        "/v1/tts/engines", headers={"Authorization": "Bearer test-api-key"}
    )
    assert resp.status_code == 200


def test_options_preflight_exempt(api_client):
    resp = api_client._client.options("/v1/tts/engines")
    assert resp.status_code == 200


def test_version_header_present(api_client):
    resp = api_client.get("/v1/health")
    assert resp.headers.get("X-Vocalie-Version") == "v1"


def test_unknown_host_header_rejected(api_client):
    resp = api_client.get("/v1/health", headers={"Host": "evil.example.com"})
    assert resp.status_code == 400
