"""Output naming semantics (modeled on ref: tests/test_output_naming.py,
test_paths.py)."""

import pytest

from vocalie_tts_tpu.io.outputs import (
    ensure_unique_path,
    get_engine_slug,
    make_output_filename,
    prepare_output_paths,
    sanitize_filename,
    slugify,
)

pytestmark = pytest.mark.unit


def test_slugify_ascii_only():
    assert slugify("Voix Démo — Été!") == "voix-demo-ete"
    assert slugify("") == "voix"
    assert slugify(None, fallback="x") == "x"
    assert len(slugify("a" * 300)) <= 80


def test_sanitize_filename_strips_forbidden():
    assert sanitize_filename('mon/fichier:éte*.wav') == "monfichierete.wav"
    assert sanitize_filename("  plusieurs   mots  ") == "plusieurs-mots"
    assert sanitize_filename(None) == ""


def test_engine_slug_includes_mode():
    assert get_engine_slug("chatterbox", {"chatterbox_mode": "fr_finetune"}) == (
        "chatterbox-fr-finetune"
    )
    assert get_engine_slug("qwen3", {"qwen3_mode": "voice_clone"}) == "qwen3-voice-clone"
    assert get_engine_slug("cosyvoice", {}) == "cosyvoice"
    assert get_engine_slug("piper", None) == "piper"


def test_make_output_filename_shapes():
    name = make_output_filename(
        text="Bonjour le monde", ref_name="claire.wav", user_filename=None,
        timestamp="2026-03-01_12-00-00",
    )
    assert name == "bonjour-le-monde__claire-wav__2026-03-01_12-00-00.wav"
    name = make_output_filename(
        text="ignored", ref_name=None, user_filename="Mon Export",
        add_timestamp=False, include_engine_slug=True, engine_slug="piper",
    )
    assert name == "Mon-Export__piper.wav"


def test_ensure_unique_path_suffixing(tmp_path):
    first = ensure_unique_path(tmp_path, "out.wav")
    first.write_text("x")
    second = ensure_unique_path(tmp_path, "out.wav")
    assert second.name == "out_01.wav"
    second.write_text("y")
    third = ensure_unique_path(tmp_path, "out.wav")
    assert third.name == "out_02.wav"


def test_prepare_output_paths(tmp_path):
    preview, user = prepare_output_paths(tmp_path / "p", tmp_path / "u", "a.wav")
    assert preview.name == user.name == "a.wav"
    preview.write_text("x")
    (tmp_path / "u" / "a.wav").write_text("y")
    _p2, user2 = prepare_output_paths(tmp_path / "p", tmp_path / "u", "a.wav")
    assert user2.name != "a.wav"  # collision avoided
