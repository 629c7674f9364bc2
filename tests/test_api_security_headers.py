"""Page security headers on the served SPA (ref: frontend/src/proxy.ts:36-75).

The reference sets CSP + standard security headers on every page
response from its Next.js proxy; this backend serves the SPA itself, so
the same headers must come from the page-serving path — and must NOT
leak onto the lean /v1 API contract surface.
"""

import pytest

from vocalie_tts_tpu.server.web import page_security_headers

pytestmark = pytest.mark.security

REQUIRED = (
    "Content-Security-Policy",
    "X-Content-Type-Options",
    "X-Frame-Options",
    "Referrer-Policy",
    "Permissions-Policy",
)


def test_spa_index_has_security_headers(api_client):
    resp = api_client._client.get("/")
    assert resp.status_code == 200
    for name in REQUIRED:
        assert resp.headers.get(name), f"missing {name} on page response"
    csp = resp.headers["Content-Security-Policy"]
    assert "default-src 'self'" in csp
    assert "frame-ancestors 'none'" in csp
    assert resp.headers["X-Content-Type-Options"] == "nosniff"
    assert resp.headers["X-Frame-Options"] == "DENY"


def test_spa_static_assets_have_security_headers(api_client):
    resp = api_client._client.get("/app.js")
    assert resp.status_code == 200
    for name in REQUIRED:
        assert resp.headers.get(name), f"missing {name} on static response"


def test_api_responses_stay_lean(api_client):
    # /v1 keeps the frozen contract surface — no page headers
    resp = api_client._client.get("/v1/health")
    assert resp.status_code == 200
    assert "Content-Security-Policy" not in resp.headers
    assert resp.headers.get("X-Vocalie-Version") == "v1"


def test_prod_csp_is_strict_and_has_hsts():
    headers = page_security_headers(dev_mode=False)
    csp = headers["Content-Security-Policy"]
    # The SPA has no inline scripts: stricter than the reference here
    assert "'unsafe-inline'" not in csp.split("style-src")[0]
    assert "'unsafe-eval'" not in csp
    assert "Strict-Transport-Security" in headers


def test_dev_csp_allows_eval_but_no_hsts():
    headers = page_security_headers(dev_mode=True)
    assert "'unsafe-eval'" in headers["Content-Security-Policy"]
    assert "Strict-Transport-Security" not in headers
