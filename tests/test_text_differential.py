"""Differential fuzz: normalize/duration/render/lexique vs the reference.

Companion to tests/test_text_chunker_differential.py — the same
mechanical-equivalence bar, extended to the rest of the deterministic
text layer (ref: backend/shared/text_normalize.py, text_duration.py,
text_render.py, text_lexique.py). Every public function runs on ≥800
generated inputs covering numbers, unicode punctuation, legacy tokens,
acronym undotting, lexique hits, whitespace pathologies, and empty/
degenerate strings; outputs must match field-for-field.

Env-gated: skipped when /root/reference is not present.
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")

if not (REFERENCE_ROOT / "backend" / "shared" / "text_normalize.py").exists():
    pytest.skip(
        "reference repo not available for differential fuzzing",
        allow_module_level=True,
    )

sys.path.insert(0, str(REFERENCE_ROOT))
ref_norm = pytest.importorskip("backend.shared.text_normalize")
ref_dur = pytest.importorskip("backend.shared.text_duration")
ref_render = pytest.importorskip("backend.shared.text_render")
ref_lex = pytest.importorskip("backend.shared.text_lexique")
ref_models = pytest.importorskip("backend.shared.text_models")

from vocalie_tts_tpu.text import duration as our_dur  # noqa: E402
from vocalie_tts_tpu.text import lexique as our_lex  # noqa: E402
from vocalie_tts_tpu.text import normalize as our_norm  # noqa: E402
from vocalie_tts_tpu.text import render as our_render  # noqa: E402
from vocalie_tts_tpu.text import types as our_types  # noqa: E402

WORDS = (
    "bonjour voix studio projet lumière ville musique silence couleur "
    "montagne rivière chemin maison hiver été café livre page chapitre "
    "texte phrase mot aventure mystère horizon voyage départ arrivée "
    "SNCF TGV A.B.C. M. Mme n°12 42 3,14 10% l'ami aujourd'hui"
).split()

PUNCT = [".", "!", "?", "…", ",", ";", ":", "—", "«", "»", '"', "'", "(", ")"]
LEGACY = ["{pause:300}", "{breath}", "{beat}", "{PAUSE: 120}", "{pause}"]
WEIRD_WS = [" ", " ", "\t", "  ", "\n", "\r\n", " \n ", " "]


def _gen_text(rng: random.Random) -> str:
    n = rng.randint(0, 40)
    parts = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.72:
            parts.append(rng.choice(WORDS))
        elif roll < 0.82:
            parts.append(rng.choice(PUNCT))
        elif roll < 0.90:
            parts.append(rng.choice(LEGACY))
        else:
            parts.append(rng.choice(WEIRD_WS))
    sep = rng.choice([" ", " ", " ", ""])
    text = sep.join(parts)
    if rng.random() < 0.1:
        text = rng.choice(["", " ", "\n", "...", "A.B. C.D. E.F."]) + text
    return text


CASES = [_gen_text(random.Random(seed)) for seed in range(800)]
CASES += ["", " ", "\n\n", "A.B.C.", "{pause:100}", "un. deux! trois?",
          "SNCF et TGV.", "12,5 % de plus", " « Oui »"]


def test_normalize_differential():
    for text in CASES:
        assert our_norm.normalize_whitespace(text) == ref_norm.normalize_whitespace(text)
        assert our_norm.count_words(text) == ref_norm.count_words(text)
        assert our_norm.strip_legacy_tokens(text) == ref_norm.strip_legacy_tokens(text)
        assert our_norm.normalize_text(text) == ref_norm.normalize_text(text)
        ours = our_norm.normalize_paste_fr(text)
        refs = ref_norm.normalize_paste_fr(text)
        assert ours[0] == refs[0]
        assert list(ours[1]) == list(refs[1])


def test_duration_differential():
    rng = random.Random(99)
    for text in CASES:
        assert our_dur.estimate_duration(text) == ref_dur.estimate_duration(text)
        wps = rng.choice([-1.0, 0.0, 1.3, 2.6, 4.0])
        assert our_dur.estimate_duration(text, wps) == ref_dur.estimate_duration(text, wps)
    for text in CASES[:200]:
        target = rng.choice([0.0, 1.5, 5.0, 30.0])
        ours = our_dur.adjust_text_to_duration(text, target)
        refs = ref_dur.adjust_text_to_duration(text, target)
        assert ours.text == refs.text
        assert ours.estimated_duration == refs.estimated_duration
        assert ours.target_duration == refs.target_duration
        assert ours.warning == refs.warning


def test_render_differential():
    rng = random.Random(7)
    for text in CASES:
        assert our_render.render_clean_text(text) == ref_render.render_clean_text(text)
    for seed in range(200):
        rng2 = random.Random(seed)
        segs_ref, segs_ours = [], []
        for _ in range(rng2.randint(0, 6)):
            if rng2.random() < 0.3:
                ms = rng2.choice([0, -5, 120, 450])
                segs_ref.append(ref_models.SpeechSegment(kind="silence", content="", duration_ms=ms))
                segs_ours.append(our_types.SpeechSegment(kind="silence", content="", duration_ms=ms))
            else:
                t = _gen_text(rng2)
                segs_ref.append(ref_models.SpeechSegment(kind="text", content=t))
                segs_ours.append(our_types.SpeechSegment(kind="text", content=t))
        assert (our_render.render_clean_text_from_segments(segs_ours)
                == ref_render.render_clean_text_from_segments(segs_ref))

        def synth(text: str) -> np.ndarray:
            # deterministic pseudo-audio keyed on the text
            n = (len(text) % 7) + 1
            return np.full(n, float(len(text)), np.float32)

        got = our_render.stitch_segments(segs_ours, 100, synth)
        want = ref_render.stitch_segments(segs_ref, 100, synth)
        np.testing.assert_array_equal(got, want)


def test_lexique_differential(tmp_path):
    lex = {
        "exceptions": {"SNCF": "S.N.C.F expansion", "TGV": "té gé vé"},
        "letters": {"A": "a", "B": "bé", "C": "cé"},
    }
    lex_path = tmp_path / "lex.json"
    lex_path.write_text(json.dumps(lex), encoding="utf-8")
    ref_loaded = ref_lex.load_lexique_json(lex_path)
    our_loaded = our_lex.load_lexique_json(lex_path)
    assert ref_loaded == our_loaded
    for text in CASES:
        ours = our_lex.normalize_for_engine(text, our_loaded)
        refs = ref_lex.normalize_for_chatterbox(text, ref_loaded)
        assert ours[0] == refs[0]
        assert list(ours[1]) == list(refs[1])
    our_lex.clear_lexique_cache()
    for text in CASES[:100]:
        ours = our_lex.prepare_adjusted_text(text, lex_path)
        refs = ref_lex.prepare_adjusted_text(text, lex_path)
        assert ours[0] == refs[0]
        assert list(ours[1]) == list(refs[1])
