"""Differential: session/output on-disk contract vs the reference.

Sessions are the compat surface users (and the macOS app) navigate on
disk — slugs, directory layout, take paths, version strings, session
JSON payloads, output filenames. This runs both implementations over
generated inputs and asserts identical paths/JSON (ref:
backend/shared/session_manager.py, output_paths.py).

Env-gated: skipped when /root/reference is not present.
"""

from __future__ import annotations

import datetime as dt
import random
import sys
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")

if not (REFERENCE_ROOT / "backend" / "shared" / "session_manager.py").exists():
    pytest.skip(
        "reference repo not available for differential fuzzing",
        allow_module_level=True,
    )

sys.path.insert(0, str(REFERENCE_ROOT))
ref_sm = pytest.importorskip("backend.shared.session_manager")
ref_paths = pytest.importorskip("backend.shared.output_paths")

from vocalie_tts_tpu.io import outputs as our_paths  # noqa: E402
from vocalie_tts_tpu.io import sessions as our_sm  # noqa: E402

TEXTS = [
    None, "", "  ", "Bonjour le monde", "Voix Off — Épisode 12!",
    "à l'école : été", "x" * 300, "Projet_Final.v2", "12345",
    "Ün îlot çà et là", "notre/chemin\\retour", "...", "démo   espaces",
]
FILENAMES = [None, "", "final.wav", "Ma Voix.WAV", "weird/../name.wav",
             "é p i s o d e .wav", "x" * 260 + ".wav"]


def test_slug_and_filenames_differential():
    for text in TEXTS:
        assert our_paths.slugify(text) == ref_paths.slugify(text), text
    for name in FILENAMES:
        assert (our_paths.sanitize_filename(name)
                == ref_paths.sanitize_filename(name)), name
    rng = random.Random(3)
    slugs = ["chatterbox-fr", "piper", "qwen3", None]
    for _ in range(300):
        text = rng.choice([t for t in TEXTS if t])
        ref_name = rng.choice(TEXTS)
        user_filename = rng.choice(FILENAMES)
        ts = f"2026-0{rng.randint(1, 9)}-17_14-30-{rng.randint(10, 59)}"
        kwargs = dict(
            add_timestamp=rng.random() < 0.8,
            timestamp=ts,
            ext=rng.choice(["wav", ".flac", ""]),
            include_engine_slug=rng.random() < 0.5,
            engine_slug=rng.choice(slugs),
        )
        ours = our_paths.make_output_filename(text, ref_name, user_filename, **kwargs)
        refs = ref_paths.make_output_filename(text, ref_name, user_filename, **kwargs)
        assert ours == refs


def test_session_layout_differential(tmp_path):
    created = dt.datetime(2026, 8, 17, 14, 30, 12)
    for text, fname in [("Bonjour le monde", None), (None, "final.wav"),
                        ("", ""), ("Épisode — 12", "Épisode.wav")]:
        slug_ours = our_sm.build_session_slug(text, fname)
        slug_refs = ref_sm.build_session_slug(text, fname)
        assert slug_ours == slug_refs, (text, fname)
        d_ours = our_sm.create_session_dir(tmp_path / "ours", created, slug_ours)
        d_refs = ref_sm.create_session_dir(tmp_path / "refs", created, slug_refs)
        assert d_ours.name == d_refs.name
        rel_ours = sorted(p.relative_to(d_ours).as_posix()
                          for p in d_ours.rglob("*"))
        rel_refs = sorted(p.relative_to(d_refs).as_posix()
                          for p in d_refs.rglob("*"))
        assert rel_ours == rel_refs

        for v in ("v1", "v7"):
            for fn_ours, fn_refs in [
                (our_sm.get_take_path_global, ref_sm.get_take_path_global),
                (our_sm.get_take_path_global_raw, ref_sm.get_take_path_global_raw),
                (our_sm.get_take_path_processed_global,
                 ref_sm.get_take_path_processed_global),
            ]:
                assert (fn_ours(d_ours, v).relative_to(d_ours)
                        == fn_refs(d_refs, v).relative_to(d_refs))
        for idx in (0, 3, 12):
            assert (our_sm.get_take_path_chunk(d_ours, idx).relative_to(d_ours)
                    == ref_sm.get_take_path_chunk(d_refs, idx).relative_to(d_refs))
        assert (our_sm.get_processed_preview_path(d_ours).relative_to(d_ours)
                == ref_sm.get_processed_preview_path(d_refs).relative_to(d_refs))


def test_next_version_differential():
    cases = [[], ["v1"], ["v1", "v2"], ["v3", "v1"], ["v9"], ["x", "v2"],
             ["v10", "v2"], ["V3"], ["v1", "v1"]]
    for versions in cases:
        assert our_sm.next_version(versions) == ref_sm.next_version(versions), versions


def test_session_payload_differential(tmp_path):
    # chunks come from each side's own chunker on the same script —
    # guaranteed-valid ChunkInfos (equivalence of the chunkers is
    # pinned separately by test_text_chunker_differential)
    from backend.shared.text_chunk import chunk_script as ref_chunk_script

    from vocalie_tts_tpu.text.chunk import chunk_script as our_chunk_script

    script = "Bonjour le monde. La suite arrive bientôt ! Et une fin."
    chunks_ours = our_chunk_script(script)
    chunks_refs = ref_chunk_script(script)
    created = dt.datetime(2026, 8, 17, 14, 30, 12)
    kwargs = dict(
        engine_id="chatterbox_finetune_fr",
        engine_slug="chatterbox-fr",
        ref_name="voix-temoin",
        text=script,
        editorial_text=script,
        tts_ready_text=script,
        prep_log_md="- note",
        created_at=created,
    )
    ours = our_sm.build_session_payload(chunks=chunks_ours, **kwargs)
    refs = ref_sm.build_session_payload(chunks=chunks_refs, **kwargs)

    def _strip_volatile(d):
        d = dict(d)
        for k in list(d):
            if "time" in k or "date" in k or k in ("created_at", "updated_at"):
                d.pop(k)
        return d

    assert _strip_volatile(ours) == _strip_volatile(refs)

    d_ours = tmp_path / "s_ours"
    d_refs = tmp_path / "s_refs"
    for d in (d_ours, d_refs):
        d.mkdir(parents=True, exist_ok=True)
    p_ours = our_sm.write_session_json(d_ours, ours)
    p_refs = ref_sm.write_session_json(d_refs, refs)
    assert p_ours.name == p_refs.name
    assert (our_sm.extract_session_texts(ours)
            == ref_sm.extract_session_texts(refs))
