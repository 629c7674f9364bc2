"""Security helper unit tests (modeled on ref: tests/test_security_unit.py)."""

from pathlib import Path

import pytest

from vocalie_tts_tpu.server.security import (
    extract_api_key,
    is_authorized,
    is_local_host,
    safe_filename,
    safe_join_under,
)

pytestmark = pytest.mark.security


def test_is_local_host_variants():
    assert is_local_host("127.0.0.1")
    assert is_local_host("::1")
    assert is_local_host("::ffff:127.0.0.1")
    assert not is_local_host("192.168.1.10")
    assert not is_local_host(None)
    assert not is_local_host("")


def test_extract_api_key_priority():
    assert extract_api_key({"Authorization": "Bearer abc"}) == "abc"
    assert extract_api_key({"X-API-Key": " xyz "}) == "xyz"
    # bearer wins over x-api-key
    assert extract_api_key({"Authorization": "Bearer a", "X-API-Key": "b"}) == "a"
    assert extract_api_key({"Authorization": "Basic zzz"}) is None
    assert extract_api_key({}) is None


def test_is_authorized_matrix(monkeypatch):
    from vocalie_tts_tpu.server import config as server_config

    monkeypatch.setattr(server_config, "VOCALIE_TRUST_LOCALHOST", False)
    monkeypatch.setenv("VOCALIE_API_KEY", "secret")
    assert is_authorized("1.2.3.4", {"X-API-Key": "secret"})
    assert not is_authorized("1.2.3.4", {"X-API-Key": "wrong"})
    assert not is_authorized("127.0.0.1", {})  # localhost not trusted
    # no key configured → nothing is authorized
    monkeypatch.delenv("VOCALIE_API_KEY")
    assert not is_authorized("1.2.3.4", {"X-API-Key": "anything"})


def test_trust_localhost_mode(monkeypatch):
    from vocalie_tts_tpu.server import config as server_config

    monkeypatch.setattr(server_config, "VOCALIE_TRUST_LOCALHOST", True)
    monkeypatch.delenv("VOCALIE_API_KEY", raising=False)
    assert is_authorized("127.0.0.1", {})
    assert not is_authorized("10.0.0.5", {"Host": "example.com"})
    # co-located proxy: Host header pinned to internal address
    assert is_authorized("10.0.0.5", {"Host": "127.0.0.1:8018"})


def test_safe_join_under(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    inside = root / "a" / "b.wav"
    inside.parent.mkdir(parents=True)
    inside.write_text("x")
    assert safe_join_under(root, str(inside)) == inside.resolve()
    with pytest.raises(ValueError):
        safe_join_under(root, str(tmp_path / "outside.wav"))
    with pytest.raises(ValueError):
        safe_join_under(root, str(root / ".." / "escape"))


def test_safe_filename_rules():
    assert safe_filename("voice.wav") == "voice.wav"
    assert safe_filename("  spaced.wav  ") == "spaced.wav"
    for bad in ("", "a/b.wav", "..", "a..b", "nul\x00.wav", "x" * 200, Path("a/b").name + "/c"):
        with pytest.raises(ValueError):
            safe_filename(bad)
