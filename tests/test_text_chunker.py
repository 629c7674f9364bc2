"""Behavioral spec of the chunker (mirrors reference invariants)."""

import pytest

from vocalie_tts_tpu.text import (
    ChunkInfo,
    chunk_script,
    parse_manual_chunks,
)

pytestmark = pytest.mark.unit


def test_newline_split_produces_one_chunk_per_line():
    text = (
        "Premiere ligne assez longue pour durer un peu\n"
        "Deuxieme ligne avec plusieurs mots pour eviter merge\n"
        "Troisieme ligne encore plus longue pour stabiliser"
    )
    chunks = chunk_script(text, min_words_per_chunk=2, max_words_without_terminator=40)
    assert len(chunks) == 3
    assert chunks[0].reason == "newline"
    assert chunks[0].boundary_kind == "newline"


def test_newline_split_can_be_disabled():
    text = "Une ligne courte mais correcte\nUne autre ligne pour tester"
    chunks = chunk_script(
        text, min_words_per_chunk=2, max_words_without_terminator=40, split_on_newline=False
    )
    assert len(chunks) == 1


def test_min_words_blocks_newline_split_with_warning():
    chunks = chunk_script(
        "Bonjour\nMerci beaucoup", min_words_per_chunk=16, max_words_without_terminator=40
    )
    assert len(chunks) == 1
    assert "newline_boundary_skipped_min_words" in chunks[0].warnings


def test_terminator_boundary_preferred_over_mid_sentence():
    text = "Mot mot mot mot mot. Suite suite suite suite suite."
    chunks = chunk_script(
        text,
        min_words_per_chunk=1,
        max_words_without_terminator=50,
        max_est_seconds_per_chunk=2.5,
    )
    assert len(chunks) >= 2
    assert chunks[0].reason == "terminator"
    assert chunks[0].segments[0].content.endswith(".")


def test_fallback_punctuation_priority_order():
    text = "Un bloc long: suite longue; encore long — suite encore, encore encore fin"
    chunks = chunk_script(
        text,
        min_words_per_chunk=1,
        max_words_without_terminator=3,
        max_est_seconds_per_chunk=20.0,
    )
    reasons = [c.reason for c in chunks]
    for punct in (":", ";", "—", ","):
        assert any(r == f"fallback({punct})" for r in reasons), (punct, reasons)
    # fallback splits carry the explaining warning
    assert any(
        any(w.startswith("fallback_split_used:") for w in c.warnings) for c in chunks
    )


def test_hard_split_when_no_punctuation_available():
    chunks = chunk_script(
        "Mot mot mot mot mot mot mot mot mot",
        min_words_per_chunk=1,
        max_words_without_terminator=3,
        max_est_seconds_per_chunk=20.0,
    )
    assert any(c.reason == "hard" for c in chunks)
    assert any("hard_split_no_punct" in c.warnings for c in chunks)


def test_forced_split_stub_tail_merges_into_previous_chunk():
    chunks = chunk_script(
        "Un deux trois: fin",
        min_words_per_chunk=3,
        max_words_without_terminator=3,
        max_est_seconds_per_chunk=20.0,
    )
    assert len(chunks) == 1
    assert chunks[0].word_count >= 3


def test_min_words_clamped_to_twenty():
    text = " ".join(["Mot"] * 21) + "\nfin fin"
    chunks = chunk_script(
        text,
        min_words_per_chunk=25,
        max_words_without_terminator=40,
        max_est_seconds_per_chunk=20.0,
    )
    assert len(chunks) == 2
    assert chunks[0].word_count == 21


def test_hard_split_avoids_stranding_a_determiner():
    # Target word lands on "le" → the split extends one word so the
    # article stays with its noun.
    text = "mot mot mot le chat mot mot mot mot mot mot mot"
    chunks = chunk_script(
        text,
        min_words_per_chunk=1,
        max_words_without_terminator=4,
        max_est_seconds_per_chunk=100.0,
    )
    for c in chunks:
        last_word = c.segments[0].content.split()[-1].lower()
        assert last_word not in {"le", "la", "les", "un", "une", "des"}, chunks


def test_empty_and_whitespace_scripts_yield_no_chunks():
    assert chunk_script("") == []
    assert chunk_script("   \n  \n") == []


def test_chunk_metadata_fields():
    chunks = chunk_script(
        "Bonjour tout le monde, ceci est un test. Une autre phrase ici aussi."
    )
    assert len(chunks) == 1
    c = chunks[0]
    assert isinstance(c, ChunkInfo)
    assert c.sentence_count == 2
    assert c.comma_count == 1
    assert c.word_count == 13
    assert c.estimated_duration == pytest.approx(13 / 2.6)
    assert c.reason == "end"


def test_manual_markers_override_everything():
    snapshot = "Premiere partie ici.\n[[CHUNK]]\nDeuxieme partie la.\n[[CHUNK]]\nTroisieme."
    chunks, marker_count = parse_manual_chunks(snapshot)
    assert marker_count == 2
    assert len(chunks) == 3
    assert all(c.reason == "manual_marker" for c in chunks)
    assert chunks[0].segments[0].content == "Premiere partie ici."


def test_manual_markers_absent_returns_empty():
    chunks, count = parse_manual_chunks("Pas de marqueurs ici.")
    assert chunks == [] and count == 0


def test_manual_markers_skip_empty_parts():
    chunks, count = parse_manual_chunks("[[CHUNK]]Seul bloc[[CHUNK]]")
    assert count == 2
    assert len(chunks) == 1
