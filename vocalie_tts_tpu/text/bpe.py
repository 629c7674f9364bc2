"""BPE tokenizer loader for published tokenizer.json vocabularies.

The XTTS-v2 checkpoint ships a HuggingFace-format ``tokenizer.json``
(the VoiceBpeTokenizer vocabulary, ~6681 merges with ``[fr]``-style
language tags as single tokens). When a user supplies it (copied next
to the engine weights by ``convert-hf xtts``), the XTTS runtime encodes
text with it so imported GPT text embeddings see the token ids they
were trained with; without it the byte frontend
(``text/phonemes.text_to_byte_ids``) keeps the engine self-contained.
Ref: SURVEY §2.4 XTTS re-support mandate (docs/PARITY.md "BPE
tokenizer (supply tokenizer.json)" delta).

Uses the ``tokenizers`` wheel (a transformers dependency present in
this image); import is deferred and failure is loud but gated so the
byte fallback keeps working without it.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional


class BpeTextTokenizer:
    """Thin wrapper over tokenizers.Tokenizer with the published XTTS
    encode conventions: lowercase, ``[lang]`` prefix, and ``[SPACE]``
    substitution when (and only when) the vocabulary defines it."""

    def __init__(self, tokenizer_json: str | Path):
        try:
            from tokenizers import Tokenizer
        except ImportError as e:  # pragma: no cover - present in this image
            raise RuntimeError(
                "tokenizer.json supplied but the 'tokenizers' package is "
                "not importable; remove the file to use the byte frontend"
            ) from e
        self._tok = Tokenizer.from_file(str(tokenizer_json))
        self._space_id = self._tok.token_to_id("[SPACE]")
        self._stop_id = self._tok.token_to_id("[STOP]")

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, lang: Optional[str] = "fr") -> List[int]:
        txt = text.strip().lower()
        txt = f"[{lang or 'fr'}]{txt}"
        if self._space_id is not None:
            txt = txt.replace(" ", "[SPACE]")
        return list(self._tok.encode(txt).ids)


def load_bpe_if_present(assets_dir: str | Path) -> Optional[BpeTextTokenizer]:
    """tokenizer.json discovery: <assets>/tokenizer.json or
    <assets>/weights/tokenizer.json."""
    for cand in (Path(assets_dir) / "tokenizer.json",
                 Path(assets_dir) / "weights" / "tokenizer.json"):
        if cand.exists():
            return BpeTextTokenizer(cand)
    return None


__all__ = ["BpeTextTokenizer", "load_bpe_if_present"]
