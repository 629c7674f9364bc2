"""Differential: voice-reference library behavior vs the reference.

`list_refs` ordering/filtering and `import_refs` collision naming are
user-visible (the refs dropdown and on-disk names). Both
implementations run against identical directory states (ref:
backend/shared/refs.py:16-88).

Env-gated: skipped when /root/reference is not present.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")

if not (REFERENCE_ROOT / "backend" / "shared" / "refs.py").exists():
    pytest.skip(
        "reference repo not available for differential fuzzing",
        allow_module_level=True,
    )

sys.path.insert(0, str(REFERENCE_ROOT))
ref_refs = pytest.importorskip("backend.shared.refs")

from vocalie_tts_tpu.io import refs as our_refs  # noqa: E402

NAMES = [
    "voix.wav", "Voix Témoin.WAV", "b.mp3", "a.flac", "notes.txt",
    "UPPER.WAV", "sample.ogg", "dotted.name.wav", ".hidden.wav",
    "zz_last.wav", "01_first.wav",
]


def _seed(d: Path) -> None:
    d.mkdir(parents=True, exist_ok=True)
    for name in NAMES:
        (d / name).write_bytes(b"RIFF0000WAVE")
    (d / "subdir").mkdir(exist_ok=True)


def test_list_refs_differential(tmp_path):
    d_ours = tmp_path / "ours"
    d_refs = tmp_path / "refs"
    _seed(d_ours)
    _seed(d_refs)
    assert our_refs.list_refs(d_ours) == ref_refs.list_refs(d_refs)


def test_import_refs_collision_naming_differential(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    files = []
    for name in ["clip.wav", "Thème.wav", "x.mp3", "skip.txt"]:
        p = src / name
        p.write_bytes(b"RIFF0000WAVE")
        files.append(p)

    d_ours = tmp_path / "lib_ours"
    d_refs = tmp_path / "lib_refs"
    for d in (d_ours, d_refs):
        d.mkdir()
        (d / "clip.wav").write_bytes(b"RIFF0000WAVE")  # force a collision

    got_ours = our_refs.import_refs(files, directory=d_ours)
    got_refs = ref_refs.import_refs(files, directory=d_refs)
    assert [Path(p).name for p in got_ours] == [Path(p).name for p in got_refs]
    assert (sorted(p.name for p in d_ours.iterdir())
            == sorted(p.name for p in d_refs.iterdir()))
