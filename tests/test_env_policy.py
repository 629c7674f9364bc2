"""ENV_POLICY.md must stay the exhaustive registry of VOCALIE_* knobs.

The reference scatters its configuration across README prose and
`backend/config.py` comments; our single-source policy (docs/
ENV_POLICY.md, ref: backend/config.py:1-60 for the variables it
covers) only holds if it can't silently rot. This test scans the
source tree for every `VOCALIE_*` token and asserts each one has
documentation in ENV_POLICY.md.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TOKEN = re.compile(r"VOCALIE_[A-Z0-9_]+")

# Source roots whose VOCALIE_* reads must be documented.
SOURCE_ROOTS = ["vocalie_tts_tpu", "scripts", "bench.py", "__graft_entry__.py"]
SOURCE_SUFFIXES = {".py", ".sh"}


def _iter_source_files():
    for root in SOURCE_ROOTS:
        path = REPO / root
        if path.is_file():
            yield path
        else:
            for f in sorted(path.rglob("*")):
                if f.suffix in SOURCE_SUFFIXES and f.is_file():
                    yield f


def _code_tokens() -> set[str]:
    tokens: set[str] = set()
    for f in _iter_source_files():
        tokens.update(TOKEN.findall(f.read_text(encoding="utf-8", errors="ignore")))
    return tokens


def _documented_tokens(policy: str) -> set[str]:
    """Flags with a real table row (first cell), not mere prose mentions.

    A flag name-dropped in another row's description/default cell is NOT
    documentation (advisor finding, round 3) — only `| \\`VOCALIE_X\\` |`
    first cells count."""
    rows: set[str] = set()
    for line in policy.splitlines():
        if line.startswith("| `VOCALIE_"):
            rows.update(TOKEN.findall(line.split("|")[1]))
    return rows


def test_every_flag_in_code_is_documented():
    policy = (REPO / "docs" / "ENV_POLICY.md").read_text(encoding="utf-8")
    documented = _documented_tokens(policy)
    undocumented = sorted(_code_tokens() - documented)
    assert not undocumented, (
        "VOCALIE_* variables read in source but missing from docs/ENV_POLICY.md: "
        f"{undocumented} — add a table row (or delete the dead flag)."
    )


def test_every_documented_table_row_exists_in_code():
    """Table rows must not advertise knobs the code no longer reads."""
    policy = (REPO / "docs" / "ENV_POLICY.md").read_text(encoding="utf-8")
    rows = _documented_tokens(policy)
    code = _code_tokens()
    stale = sorted(rows - code)
    assert not stale, (
        f"ENV_POLICY.md documents flags no source file reads: {stale} — "
        "remove the row or restore the knob."
    )
