"""Deterministic output-file naming (ref: backend/shared/output_paths.py).

The naming scheme ``<base>__<ref>__<engine>__<timestamp>.wav`` is part
of the product contract — sessions and delivery journals reference
these names.
"""

from __future__ import annotations

import datetime as dt
import re
import unicodedata
from pathlib import Path
from typing import Optional, Tuple

FORBIDDEN_CHARS = set('\0\n\r\t\\/:*?"<>|')
MAX_FILENAME_LENGTH = 80


def slugify(value: Optional[str], fallback: str = "voix") -> str:
    """ASCII-only slug for filename fallbacks."""
    value = "" if value is None else str(value)
    ascii_text = (
        unicodedata.normalize("NFKD", value).encode("ascii", "ignore").decode("ascii")
    ).lower()
    ascii_text = re.sub(r"[^a-z0-9]+", "-", ascii_text).strip("-")
    ascii_text = ascii_text[:MAX_FILENAME_LENGTH].strip("-")
    return ascii_text or fallback


def sanitize_filename(name: Optional[str], max_length: int = MAX_FILENAME_LENGTH) -> str:
    if not name:
        return ""
    ascii_text = (
        unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    )
    kept = "".join(ch for ch in ascii_text if ch not in FORBIDDEN_CHARS)
    kept = re.sub(r"\s+", "-", kept)
    kept = re.sub(r"-+", "-", kept).strip("-")
    return kept[:max_length]


def get_engine_slug(engine_id: str, engine_meta: Optional[dict] = None) -> str:
    """Engine slug including its mode, for output filenames."""
    engine_meta = engine_meta or {}
    engine_id = "" if engine_id is None else str(engine_id)
    for base in ("chatterbox", "cosyvoice", "qwen3"):
        if engine_id == base:
            mode = engine_meta.get(f"{base}_mode")
            if mode:
                return slugify(f"{base}_{mode}", fallback=base)
            return base
    return slugify(engine_id, fallback="tts")


def make_output_filename(
    text: str,
    ref_name: Optional[str],
    user_filename: Optional[str],
    add_timestamp: bool = True,
    timestamp: Optional[str] = None,
    ext: str = "wav",
    include_engine_slug: bool = False,
    engine_slug: Optional[str] = None,
) -> str:
    """``<base>__<ref>__<engine>__<timestamp>.<ext>`` with sanitized parts."""
    ext = ext.lstrip(".") or "wav"
    timestamp = timestamp or dt.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    user_base = sanitize_filename(user_filename)
    base = user_base if user_base else f"{slugify(text)}__{slugify(ref_name or 'ref')}"
    if include_engine_slug and engine_slug:
        base = f"{base}__{sanitize_filename(engine_slug)}"
    if add_timestamp:
        base = f"{base}__{timestamp}"
    return f"{base}.{ext}"


def ensure_unique_path(directory, filename: str) -> Path:
    """Non-clobbering path inside *directory* (``_01`` suffixing)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    stem, ext = Path(filename).stem, Path(filename).suffix
    candidate = directory / f"{stem}{ext}"
    counter = 1
    while candidate.exists():
        candidate = directory / f"{stem}_{counter:02d}{ext}"
        counter += 1
    return candidate


def prepare_output_paths(preview_dir, user_dir, filename: str) -> Tuple[Path, Path]:
    """Matched (preview, user) paths sharing one base filename."""
    preview_path = ensure_unique_path(Path(preview_dir), filename)
    user_dir = Path(user_dir)
    user_dir.mkdir(parents=True, exist_ok=True)
    user_path = user_dir / preview_path.name
    if user_path.exists() and user_path.resolve() != preview_path.resolve():
        user_path = ensure_unique_path(user_dir, preview_path.name)
    return preview_path, user_path


__all__ = [
    "FORBIDDEN_CHARS",
    "MAX_FILENAME_LENGTH",
    "slugify",
    "sanitize_filename",
    "get_engine_slug",
    "make_output_filename",
    "ensure_unique_path",
    "prepare_output_paths",
]
