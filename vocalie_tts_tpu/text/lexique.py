"""Lexique (pronunciation glossary) loading and acronym expansion.

The lexique JSON maps acronyms to spelled-out French letter phonetics
("RATP" → "ÈRE A TÉ PÉ") plus explicit exception replacements, so a
voice-over script reads naturally (ref: backend/shared/text_lexique.py).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Tuple

from vocalie_tts_tpu.text.normalize import normalize_paste_fr

# Per-process cache keyed by absolute path string.
_LEXIQUE_CACHE: Dict[str, Dict] = {}

_DOTTED_SIGLE_RE = re.compile(r"(?:[A-Z]\.\s*){2,10}")
_AUTO_SIGLE_RE = re.compile(r"\b[A-Z]{2,6}\b")


def clear_lexique_cache() -> None:
    _LEXIQUE_CACHE.clear()


def load_lexique_json(path: str | Path) -> Dict:
    """Load (and cache) a lexique JSON file; missing/invalid → {}."""
    key = str(path)
    if key in _LEXIQUE_CACHE:
        return _LEXIQUE_CACHE[key]
    try:
        with Path(path).expanduser().open("r", encoding="utf-8") as fh:
            data = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        data = {}
    _LEXIQUE_CACHE[key] = data
    return data


def normalize_for_engine(text: str, lex: Dict) -> Tuple[str, List[str]]:
    """Apply the lexique: compact dotted sigles, replace exceptions,
    auto-spell unknown 2-6-letter capital acronyms.

    Returns (text, change_tags). Tags use the same vocabulary as the
    reference so UIs and tests can rely on them:
    ``sigle_undot``, ``lexicon_hit``, ``sigle_auto``.
    """
    if not text:
        return "", []
    exceptions: Dict[str, str] = lex.get("exceptions", {}) if lex else {}
    letters: Dict[str, str] = lex.get("letters", {}) if lex else {}
    changes: List[str] = []

    # "A.B.C." → "ABC" so the acronym pass can handle it.
    def compact_dotted(match: re.Match) -> str:
        original = match.group(0)
        compact = re.sub(r"[.\s]+", "", original)
        if compact != original:
            changes.append(f"sigle_undot: {original} -> {compact}")
        return compact

    content = _DOTTED_SIGLE_RE.sub(compact_dotted, text)

    for key, replacement in exceptions.items():
        content, hits = re.subn(rf"\b{re.escape(key)}\b", replacement, content)
        if hits:
            changes.append(f"lexicon_hit: {key} -> {replacement}")

    auto_hits: Dict[str, int] = {}

    def spell_acronym(match: re.Match) -> str:
        token = match.group(0)
        if token in exceptions or any(ch.isdigit() for ch in token):
            return token
        spelled: List[str] = []
        for ch in token:
            phon = letters.get(ch)
            if phon is None:
                return token
            spelled.append(phon)
        auto_hits[token] = auto_hits.get(token, 0) + 1
        return "".join(spelled)

    content = _AUTO_SIGLE_RE.sub(spell_acronym, content)
    for token in auto_hits:
        assembled = "".join(letters.get(ch, "") for ch in token)
        changes.append(f"sigle_auto: {token} -> {assembled}")
    return content, changes


def prepare_adjusted_text(user_text: str, lex_path: str | Path) -> Tuple[str, List[str]]:
    """Full preparation: paste normalization, then lexique expansion."""
    text, tags = normalize_paste_fr(user_text)
    expanded, more_tags = normalize_for_engine(text, load_lexique_json(lex_path))
    return expanded, tags + more_tags


__all__ = [
    "clear_lexique_cache",
    "load_lexique_json",
    "normalize_for_engine",
    "prepare_adjusted_text",
]
