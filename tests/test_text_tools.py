"""Normalization / duration / lexique behavioral specs."""

import pytest

from vocalie_tts_tpu.text import (
    adjust_text_to_duration,
    estimate_duration,
    normalize_paste_fr,
    normalize_text,
    render_clean_text,
    strip_legacy_tokens,
)
from vocalie_tts_tpu.text.lexique import (
    clear_lexique_cache,
    load_lexique_json,
    normalize_for_engine,
    prepare_adjusted_text,
)

pytestmark = pytest.mark.unit


def test_strip_legacy_tokens():
    assert strip_legacy_tokens("Salut {breath} toi {pause:500} ok {beat}.") == "Salut  toi  ok ."


def test_strip_legacy_tokens_case_insensitive():
    assert strip_legacy_tokens("a {BREATH} b {Pause: 10} c") == "a  b  c"


def test_render_clean_text_removes_tokens():
    assert render_clean_text("Texte {pause:200} inspiré") == "Texte inspiré"


def test_normalize_text_fixes_ocr_ii():
    assert normalize_text("II me manquait.").startswith("Il ")
    assert "Il y a" in normalize_text("Oui. II y a un souci.")


def test_normalize_text_spaces_after_punctuation():
    assert normalize_text("Bonjour,monde.Oui") == "Bonjour, monde. Oui"


def test_normalize_text_collapses_blank_lines():
    out = normalize_text("a\n\n\n\nb")
    assert out == "a\n\nb"


def test_normalize_paste_fr_reports_changes():
    text = "Bonjour monde ... et  encore .."
    cleaned, tags = normalize_paste_fr(text)
    assert " " not in cleaned
    assert "…" in cleaned
    assert tags[0] == "paste_norm_applied: true"
    assert any(t.startswith("paste_norm_counts:") for t in tags)


def test_normalize_paste_fr_noop_reports_false():
    cleaned, tags = normalize_paste_fr("Rien à changer")
    assert cleaned == "Rien à changer"
    assert tags == ["paste_norm_applied: false"]


def test_estimate_duration_scale():
    assert estimate_duration("un deux trois quatre cinq") == pytest.approx(5 / 2.6)
    assert estimate_duration("") == 0.0


def test_adjust_text_shortens_with_warning():
    text = " ".join(["mot"] * 52)  # ~20s at 2.6 wps
    adj = adjust_text_to_duration(text, target_seconds=5.0)
    assert adj.warning is not None
    assert adj.estimated_duration < 20.0 / 2.6 * 2.6 + 1


def test_adjust_text_within_tolerance_untouched():
    text = " ".join(["mot"] * 26)  # 10s
    adj = adjust_text_to_duration(text, target_seconds=10.0)
    assert adj.text == text
    assert adj.warning is None


def test_lexique_auto_spelling_and_exceptions(tmp_path):
    clear_lexique_cache()
    lex_path = tmp_path / "lex.json"
    lex_path.write_text(
        '{"exceptions": {"MJC": "èmjicé"}, "letters": {"A": "a", "B": "bé", "C": "cé"}}',
        encoding="utf-8",
    )
    lex = load_lexique_json(lex_path)
    out, tags = normalize_for_engine("La MJC et le CAB.", lex)
    assert "èmjicé" in out
    assert "céabé" in out  # C A B → cé a bé
    assert any(t.startswith("lexicon_hit: MJC") for t in tags)
    assert any(t.startswith("sigle_auto: CAB") for t in tags)


def test_lexique_dotted_sigle_compaction(tmp_path):
    clear_lexique_cache()
    lex_path = tmp_path / "lex.json"
    lex_path.write_text('{"letters": {"A": "a", "B": "bé", "C": "cé"}}', encoding="utf-8")
    lex = load_lexique_json(lex_path)
    out, tags = normalize_for_engine("Voici A.B.C.", lex)
    assert any(t.startswith("sigle_undot:") for t in tags)
    # compacted then auto-spelled
    assert "abécé" in out
    # quirk kept from the reference: the undot pass consumes trailing
    # whitespace, gluing the sigle to the next word and suppressing
    # auto-spelling (ref: backend/shared/text_lexique.py:45-53)
    out2, _ = normalize_for_engine("Voici A.B.C. ok", lex)
    assert out2 == "Voici ABCok"


def test_lexique_skips_tokens_with_digits_or_unknown_letters(tmp_path):
    clear_lexique_cache()
    lex_path = tmp_path / "lex.json"
    lex_path.write_text('{"letters": {"A": "a", "B": "bé"}}', encoding="utf-8")
    lex = load_lexique_json(lex_path)
    out, _ = normalize_for_engine("AB12 et XYZ", lex)
    assert "AB12" in out  # digits → untouched
    assert "XYZ" in out  # unknown letters → untouched


def test_lexique_missing_file_is_empty(tmp_path):
    clear_lexique_cache()
    assert load_lexique_json(tmp_path / "absent.json") == {}
