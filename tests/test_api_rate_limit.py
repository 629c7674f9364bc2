"""Rate-limit contract: per-key buckets, trusted-proxy XFF handling
(modeled on ref: tests/test_api_rate_limit.py)."""

import pytest

from vocalie_tts_tpu.server import rate_limit

pytestmark = pytest.mark.security


def test_token_bucket_exhausts_and_refills():
    rate_limit.reset_buckets()
    headers = {"X-API-Key": "k1"}
    results = [
        rate_limit.consume("1.2.3.4", headers, rps=0.0001, burst=3) for _ in range(5)
    ]
    assert results == [True, True, True, False, False]


def test_buckets_are_per_key():
    rate_limit.reset_buckets()
    assert rate_limit.consume("1.2.3.4", {"X-API-Key": "a"}, rps=0.0001, burst=1)
    assert not rate_limit.consume("1.2.3.4", {"X-API-Key": "a"}, rps=0.0001, burst=1)
    # other key same IP is a different bucket
    assert rate_limit.consume("1.2.3.4", {"X-API-Key": "b"}, rps=0.0001, burst=1)


def test_xff_honored_only_from_trusted_proxy():
    rate_limit.reset_buckets()
    trusted = "127.0.0.1"  # in default trusted proxies
    untrusted = "9.9.9.9"
    # Exhaust the bucket for forwarded IP via trusted proxy
    assert rate_limit.consume(
        trusted, {"X-Forwarded-For": "5.5.5.5"}, rps=0.0001, burst=1
    )
    assert not rate_limit.consume(
        trusted, {"X-Forwarded-For": "5.5.5.5"}, rps=0.0001, burst=1
    )
    # Same header from an untrusted peer buckets by the peer, not XFF
    assert rate_limit.consume(
        untrusted, {"X-Forwarded-For": "5.5.5.5"}, rps=0.0001, burst=1
    )


def test_invalid_xff_ignored():
    rate_limit.reset_buckets()
    assert rate_limit.consume(
        "127.0.0.1", {"X-Forwarded-For": "not-an-ip"}, rps=0.0001, burst=1
    )
    # falls back to peer bucket → second call on same peer bucket fails
    assert not rate_limit.consume("127.0.0.1", {}, rps=0.0001, burst=1)


def test_zero_limits_disable_limiting():
    rate_limit.reset_buckets()
    for _ in range(100):
        assert rate_limit.consume("1.1.1.1", {}, rps=0, burst=0)


def test_http_429_on_flood(api_client, monkeypatch):
    from vocalie_tts_tpu.server import config as server_config

    monkeypatch.setattr(server_config, "VOCALIE_RATE_LIMIT_RPS", 0.0001)
    monkeypatch.setattr(server_config, "VOCALIE_RATE_LIMIT_BURST", 2)
    rate_limit.reset_buckets()
    codes = [
        api_client.post("/v1/tts/jobs", json={"engine_id": "ghost", "text": "x"}).status_code
        for _ in range(4)
    ]
    # first two pass rate gate (404 unknown engine), rest are 429
    assert codes[:2] == [404, 404]
    assert set(codes[2:]) == {429}
