"""Language mapping policy per engine (modeled on ref:
tests/test_language_policy.py)."""

import pytest

import vocalie_tts_tpu.engines as engines

pytestmark = pytest.mark.unit


def test_chatterbox_language_map():
    cb = engines.get_backend("chatterbox")
    assert cb.map_language("fr-FR") == "fr"
    assert cb.map_language("en-GB") == "en"
    assert cb.map_language(None) == "fr"  # French-first default
    assert cb.map_language("xx-XX") == "xx"  # graceful prefix fallback


def test_qwen3_language_map():
    q = engines.get_backend("qwen3")
    assert q.map_language("fr-FR") == "French"
    assert q.map_language("zh-TW") == "Chinese"
    assert q.map_language(None) == "French"
    assert q.map_language("xx-XX") == "Auto"


def test_cosyvoice_language_map():
    cv = engines.get_backend("cosyvoice")
    assert cv.map_language("fr-CA") == "French"
    assert cv.map_language("pt-BR") == "Portuguese"
    assert cv.map_language(None) == "French"
    assert cv.map_language("xx") == "Auto"


def test_xtts_language_map():
    x = engines.get_backend("xtts")
    assert x.map_language("fr-FR") == "fr"
    assert x.map_language(None) == "fr"


def test_supported_language_lists_nonempty():
    for engine_id in ("chatterbox", "qwen3", "cosyvoice", "xtts", "piper"):
        backend = engines.get_backend(engine_id)
        langs = backend.supported_languages()
        assert langs, engine_id
        assert "fr-FR" in langs, engine_id
