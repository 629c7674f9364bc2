"""Engine registry / catalog / schema contract tests
(modeled on ref: tests/test_tts_backends.py)."""

import pytest

import vocalie_tts_tpu.engines as engines
from vocalie_tts_tpu.engines.base import validate_param_schema

pytestmark = pytest.mark.unit

EXPECTED_ENGINE_IDS = {
    "piper",
    "chatterbox_native",
    "chatterbox_finetune_fr",
    "qwen3_custom",
    "qwen3_clone",
    "cosyvoice_instruct",
    "cosyvoice_clone",
    "cosyvoice_cross",
    "xtts",
}

REMOVED_LEGACY_IDS = {"bark"}


def test_catalog_contains_expected_engines():
    ids = {e["id"] for e in engines.get_engine_catalog()}
    assert EXPECTED_ENGINE_IDS <= ids
    assert not (REMOVED_LEGACY_IDS & ids)


def test_catalog_entries_have_backend_id():
    for entry in engines.get_engine_catalog():
        assert entry["backend_id"]
        assert engines.get_backend(entry["id"]) is not None


def test_alias_resolution():
    assert engines.canonical_engine_id("chatterbox") == "chatterbox_finetune_fr"
    assert engines.canonical_engine_id("qwen3_custom") == "qwen3_custom"
    assert engines.is_legacy_alias("chatterbox")
    assert not engines.is_legacy_alias("qwen3_custom")


def test_backend_resolution_by_prefix():
    assert engines.get_backend("chatterbox_native").id == "chatterbox"
    assert engines.get_backend("cosyvoice_cross").id == "cosyvoice"
    assert engines.get_backend("unknown_engine") is None


def test_param_schemas_validate():
    for backend in engines.list_backends():
        errors = validate_param_schema(backend.params_schema())
        assert not errors, (backend.id, errors)


def test_availability_map_is_booleans():
    for engine_id, available in engines.available_backend_ids().items():
        assert available in (True, False), engine_id


def test_ref_support_matrix():
    cb = engines.get_backend("chatterbox")
    assert cb.supports_ref_for_engine("chatterbox_native") is True
    q = engines.get_backend("qwen3")
    assert q.supports_ref_for_engine("qwen3_clone") is True
    assert q.supports_ref_for_engine("qwen3_custom") is False
    cv = engines.get_backend("cosyvoice")
    assert cv.supports_ref_for_engine("cosyvoice_clone") is True
    piper = engines.get_backend("piper")
    assert piper.supports_ref_for_engine("piper") is False


def test_mode_auto_resolution():
    cb = engines.get_backend("chatterbox")
    params = cb.resolve_engine_params("chatterbox_native", {})
    assert params["chatterbox_mode"] == "multilang"
    params = cb.resolve_engine_params("chatterbox_finetune_fr", {})
    assert params["chatterbox_mode"] == "fr_finetune"
    # explicit value wins
    params = cb.resolve_engine_params("chatterbox_native", {"chatterbox_mode": "fr_finetune"})
    assert params["chatterbox_mode"] == "fr_finetune"

    q = engines.get_backend("qwen3")
    assert q.resolve_engine_params("qwen3_clone", {})["qwen3_mode"] == "voice_clone"
    assert (
        q.resolve_engine_params("qwen3_custom", {"qwen3_mode": "voice_design"})["qwen3_mode"]
        == "voice_design"
    )

    cv = engines.get_backend("cosyvoice")
    assert cv.resolve_engine_params("cosyvoice_cross", {})["cosyvoice_mode"] == "cross_lingual"


def test_capabilities_shape():
    for entry in engines.get_engine_catalog():
        backend = engines.get_backend(entry["id"])
        caps = backend.capabilities(entry["id"])
        assert "uses_voice_reference" in caps
        assert "uses_internal_voices" in caps
        assert isinstance(caps["auto_resolved_keys"], list)


def test_cosyvoice_streaming_capability():
    cv = engines.get_backend("cosyvoice")
    assert cv.capabilities("cosyvoice_instruct")["supports_streaming"] is True
    assert cv.capabilities("cosyvoice_instruct")["supports_emotion"] is True
    assert cv.capabilities("cosyvoice_clone")["supports_emotion"] is False


def test_language_defaults_are_french_first():
    for backend in engines.list_backends():
        if backend.supported_languages():
            assert backend.default_language() == "fr-FR", backend.id


def test_singleton_instances():
    a = engines.get_backend("chatterbox")
    b = engines.get_backend("chatterbox_native")
    assert a is b
