"""Differential fuzz: our chunker vs the reference chunker, field-for-field.

Chunk boundaries are audible product behavior (SURVEY §7: "port
behavior exactly"), so equivalence is proven mechanically: generate
>=1200 French-ish scripts covering every code path the reference
chunker has (newlines, pivots, run-on sentences, oversize sentences,
markers, legacy tokens, weird punctuation), run BOTH implementations —
`chunk_script`, `parse_manual_chunks`, and all three refinement passes
(ref: backend/shared/text_chunk.py:132-269, 272-307, 361-564) — and
assert every ChunkInfo field matches.

Env-gated: skipped when /root/reference is not present (e.g. a user
checkout); always runs in the build image.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")

if not (REFERENCE_ROOT / "backend" / "shared" / "text_chunk.py").exists():
    pytest.skip(
        "reference repo not available for differential fuzzing",
        allow_module_level=True,
    )

sys.path.insert(0, str(REFERENCE_ROOT))
ref_chunk = pytest.importorskip("backend.shared.text_chunk")

from vocalie_tts_tpu.text.chunk import (  # noqa: E402
    apply_pivot_splits,
    chunk_script,
    merge_short_chunks,
    parse_manual_chunks,
    split_oversize_chunks,
)

# ── script generator ────────────────────────────────────────────────────

WORDS = (
    "bonjour voix production studio projet matin lumière ville histoire "
    "musique silence couleur montagne rivière chemin maison fenêtre hiver "
    "été automne printemps café livre page chapitre texte phrase mot "
    "découverte aventure mystère secret horizon voyage départ arrivée "
    "qualité naturel rendu diction français créer nouvelle façon maîtrisée"
).split()

DETERMINERS = "le la les un une des du de mon ma mes ce cette au aux".split()
PIVOTS = ["Cependant", "Pourtant", "Or", "Alors", "Néanmoins", "Toutefois"]
TERMINATORS = [".", "!", "?", "…", ".", ".", "!"]
FALLBACKS = [":", ";", "—", "-", ","]
LEGACY = ["{pause:300}", "{breath}", "{beat}", "{PAUSE: 120}"]


def _sentence(rng: random.Random, n_words: int, terminator: bool = True) -> str:
    words = []
    for i in range(n_words):
        if rng.random() < 0.25:
            words.append(rng.choice(DETERMINERS))
        words.append(rng.choice(WORDS))
        if i and rng.random() < 0.12:
            words[-1] += rng.choice(FALLBACKS)
    s = " ".join(words)
    s = s[0].upper() + s[1:]
    if terminator:
        s += rng.choice(TERMINATORS)
    return s


def _make_script(rng: random.Random) -> str:
    parts: list[str] = []
    n_blocks = rng.randint(1, 6)
    for _ in range(n_blocks):
        style = rng.random()
        if style < 0.15:
            # run-on monster: no terminators, forces fallback/hard splits
            parts.append(_sentence(rng, rng.randint(40, 120), terminator=False))
        elif style < 0.25:
            # oversize single sentence (> 380 chars) for the oversize pass
            parts.append(_sentence(rng, rng.randint(70, 110)))
        elif style < 0.40:
            # pivot-led comma-heavy sentence
            s = rng.choice(PIVOTS) + ", " + _sentence(rng, rng.randint(8, 30))
            parts.append(s)
        else:
            parts.append(
                " ".join(_sentence(rng, rng.randint(2, 18)) for _ in range(rng.randint(1, 4)))
            )
        if rng.random() < 0.3:
            parts.append(rng.choice(LEGACY))
        if rng.random() < 0.25:
            parts.append("[[CHUNK]]")
        parts.append("\n" if rng.random() < 0.6 else "\n\n")
    text = " ".join(parts)
    # sprinkle OCR/paste noise the normalizer handles
    if rng.random() < 0.3:
        text = text.replace(" ", " ", 1)
    if rng.random() < 0.2:
        text = "II " + text
    if rng.random() < 0.2:
        text += " .."
    return text


# ── comparison helpers ──────────────────────────────────────────────────


def _snap(chunk) -> dict:
    """Implementation-independent snapshot of one ChunkInfo."""
    return {
        "segments": [
            (seg.kind, seg.content, int(getattr(seg, "duration_ms", 0)))
            for seg in chunk.segments
        ],
        "sentence_count": int(chunk.sentence_count),
        "char_count": int(chunk.char_count),
        "word_count": int(chunk.word_count),
        "comma_count": int(chunk.comma_count),
        "estimated_duration": round(float(chunk.estimated_duration), 6),
        "reason": chunk.reason,
        "boundary_kind": chunk.boundary_kind,
        "pivot": bool(chunk.pivot),
        "ends_with_suspended": bool(chunk.ends_with_suspended),
        "oversize_sentence": bool(chunk.oversize_sentence),
        "warnings": list(chunk.warnings),
    }


def _assert_equal(ours, theirs, label: str, script: str) -> None:
    ours_s = [_snap(c) for c in ours]
    theirs_s = [_snap(c) for c in theirs]
    assert ours_s == theirs_s, (
        f"{label} diverged on script ({len(script)} chars):\n{script!r}\n"
        f"ours ({len(ours_s)}): {ours_s}\ntheirs ({len(theirs_s)}): {theirs_s}"
    )


def _kwargs_for(rng: random.Random) -> dict:
    return {
        "min_words_per_chunk": rng.choice([0, 3, 8, 16, 20, 25]),
        "max_words_without_terminator": rng.choice([8, 20, 35, 60]),
        "max_est_seconds_per_chunk": rng.choice([0.0, 3.0, 6.5, 10.0]),
        "split_on_newline": rng.random() < 0.8,
    }


# ── the fuzz tiers ──────────────────────────────────────────────────────

N_CASES = 1200


@pytest.mark.parametrize("seed_block", range(12))
def test_chunk_script_differential(seed_block: int) -> None:
    """chunk_script + the three refinement passes, 100 cases per block."""
    per_block = N_CASES // 12
    for case in range(per_block):
        rng = random.Random(seed_block * 10_000 + case)
        script = _make_script(rng)
        kwargs = _kwargs_for(rng)

        ours = chunk_script(script, **kwargs)
        theirs = ref_chunk.chunk_script(script, **kwargs)
        _assert_equal(ours, theirs, f"chunk_script{kwargs}", script)

        # the three refinement passes, chained exactly alike on each side
        max_est = kwargs["max_est_seconds_per_chunk"] or 10.0
        min_words = kwargs["min_words_per_chunk"]

        ours_r = split_oversize_chunks(ours, max_est, 380)
        theirs_r = ref_chunk._split_oversize_chunks(theirs, max_est, 380)
        _assert_equal(ours_r, theirs_r, "split_oversize_chunks", script)

        ours_r = merge_short_chunks(ours_r, min_words, max_est)
        theirs_r = ref_chunk._merge_short_chunks(theirs_r, min_words, max_est)
        _assert_equal(ours_r, theirs_r, "merge_short_chunks", script)

        ours_r = apply_pivot_splits(ours_r, max_est, min_words)
        theirs_r = ref_chunk._apply_pivot_splits(theirs_r, max_est, min_words)
        _assert_equal(ours_r, theirs_r, "apply_pivot_splits", script)


@pytest.mark.parametrize("seed", range(200))
def test_parse_manual_chunks_differential(seed: int) -> None:
    rng = random.Random(77_000 + seed)
    script = _make_script(rng)
    ours, ours_n = parse_manual_chunks(script)
    theirs, theirs_n = ref_chunk.parse_manual_chunks(script)
    assert ours_n == theirs_n
    _assert_equal(ours, theirs, "parse_manual_chunks", script)


@pytest.mark.parametrize("seed", range(200))
def test_normalize_differential(seed: int) -> None:
    """normalize_text / normalize_paste_fr / count_words, field-for-field
    (ref: backend/shared/text_normalize.py:17-89)."""
    from backend.shared import text_normalize as ref_norm

    from vocalie_tts_tpu.text import normalize as our_norm

    rng = random.Random(55_000 + seed)
    script = _make_script(rng)
    # paste noise the paste normalizer targets
    noisy = script.replace(" ", " ", 3).replace("…", "...", 1) + " .."
    for text in (script, noisy):
        assert our_norm.normalize_text(text) == ref_norm.normalize_text(text)
        assert our_norm.normalize_whitespace(text) == ref_norm.normalize_whitespace(text)
        assert our_norm.strip_legacy_tokens(text) == ref_norm.strip_legacy_tokens(text)
        assert our_norm.count_words(text) == ref_norm.count_words(text)
        ours_t, ours_changes = our_norm.normalize_paste_fr(text)
        theirs_t, theirs_changes = ref_norm.normalize_paste_fr(text)
        assert ours_t == theirs_t
        assert list(ours_changes) == list(theirs_changes)


def test_edge_scripts_differential() -> None:
    """Hand-picked boundary inputs the generator may not hit."""
    edges = [
        "",
        "   \n\n  ",
        "[[CHUNK]]",
        "[[CHUNK]][[CHUNK]]",
        "Un.",
        "a",
        ". . . .",
        ",,,;;;:::",
        "Mot " * 500,
        ("Cependant, " + "mot " * 50 + ". ") * 4,
        "Le.\nLa!\nLes?\n",
        "x" * 2000,
        "Bonjour — au revoir — encore — toujours",
        "Phrase avec {pause:100} directive {breath} héritée {beat}.",
        "A.B.C. est un sigle. N.A.S.A. aussi.",
        "Une… deux… trois…",
        "\n".join("Ligne %d" % i for i in range(40)),
    ]
    for script in edges:
        for kwargs in (
            {},
            {"min_words_per_chunk": 0},
            {"split_on_newline": False},
            {"max_est_seconds_per_chunk": 0.0},
            {"max_words_without_terminator": 5, "min_words_per_chunk": 2},
        ):
            ours = chunk_script(script, **kwargs)
            theirs = ref_chunk.chunk_script(script, **kwargs)
            _assert_equal(ours, theirs, f"edge chunk_script{kwargs}", script)
            ours_m, n1 = parse_manual_chunks(script)
            theirs_m, n2 = ref_chunk.parse_manual_chunks(script)
            assert n1 == n2
            _assert_equal(ours_m, theirs_m, "edge parse_manual_chunks", script)
