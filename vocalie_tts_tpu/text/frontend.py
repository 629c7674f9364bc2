"""Text frontends for the LM-TTS families: published tokenizer or bytes.

The reference hands raw text to models that apply their own published
tokenizers internally (ref: tts_backends/chatterbox_impl.py:154-201,
cosyvoice_runner.py:87-125, qwen3_runner.py:113-144). Here each family
runtime owns a frontend object:

- ``ByteFrontend`` — the self-contained UTF-8 byte tokenizer
  (text/phonemes.py byte ids), the random-weights dev default;
- ``PublishedFrontend`` — a HF-format ``tokenizer.json`` staged beside
  the converted weights (``convert-hf`` copies it, like XTTS's
  vocab.json), so converted checkpoints see exactly the token ids their
  text embedding rows were trained with.

Two published encode styles cover the three families:

- ``voicebpe`` (Chatterbox): the Tortoise-lineage voice BPE — spaces
  substituted with the ``[SPACE]`` token when the vocabulary defines
  it, optional ``[lang]`` prefix when the vocabulary defines that
  language token (the multilingual checkpoint's convention). No forced
  lowercase (XTTS's lowercasing variant lives in text/bpe.py).
- ``raw`` (CosyVoice 3 / Qwen3-TTS): byte-level BPE applied to the
  text as-is (the Qwen2/Qwen3 tokenizer convention); prompt segments
  join on the ``<|endofprompt|>`` special token when the vocabulary
  defines it (CosyVoice's instruct separator), else on an encoded
  newline.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

from vocalie_tts_tpu.text.phonemes import (
    BYTE_BOS,
    BYTE_SEP,
    BYTE_VOCAB_SIZE,
    text_to_byte_ids,
)

STYLES = ("voicebpe", "raw")


class ByteFrontend:
    """UTF-8 byte ids with explicit BOS/SEP control tokens (< 260)."""

    published = False
    vocab_size = BYTE_VOCAB_SIZE

    def encode(self, text: str, lang: Optional[str] = None) -> List[int]:
        return text_to_byte_ids(text, add_bos=False, add_eos=False)

    @property
    def bos_ids(self) -> List[int]:
        return [BYTE_BOS]

    @property
    def sep_ids(self) -> List[int]:
        return [BYTE_SEP]


class PublishedFrontend:
    """HF tokenizer.json with a family encode style (see module doc)."""

    published = True

    def __init__(self, tokenizer_json: str | Path, style: str):
        if style not in STYLES:
            raise ValueError(f"unknown frontend style {style!r} (choose from {STYLES})")
        try:
            from tokenizers import Tokenizer
        except ImportError as e:  # pragma: no cover - wheel is in this image
            raise RuntimeError(
                "tokenizer.json supplied but the 'tokenizers' package is "
                "not importable; remove the file to use the byte frontend"
            ) from e
        self.style = style
        self.path = str(tokenizer_json)
        self._tok = Tokenizer.from_file(str(tokenizer_json))
        self._space_id = self._tok.token_to_id("[SPACE]")
        self._eop_id = self._tok.token_to_id("<|endofprompt|>")

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, lang: Optional[str] = None) -> List[int]:
        txt = text
        if self.style == "voicebpe":
            if lang is not None and self._tok.token_to_id(f"[{lang}]") is not None:
                txt = f"[{lang}]{txt}"
            if self._space_id is not None:
                txt = txt.replace(" ", "[SPACE]")
        return list(self._tok.encode(txt).ids)

    @property
    def bos_ids(self) -> List[int]:
        return []  # BOS-less: published LM-TTS prompts start at the text

    @property
    def sep_ids(self) -> List[int]:
        if self._eop_id is not None:
            return [self._eop_id]
        return list(self._tok.encode("\n").ids)


def build_prompt_ids(
    frontend,
    text: str,
    *,
    preamble: str = "",
    lang: Optional[str] = None,
) -> List[int]:
    """Standard two-segment prompt: [BOS?] preamble [SEP] text.

    ``preamble`` is the mode-dependent leading segment (instruct text,
    clone transcript, …); empty → just [BOS?] text."""
    ids: List[int] = []
    if preamble:
        ids += frontend.bos_ids
        ids += frontend.encode(preamble, lang)
        ids += frontend.sep_ids
        ids += frontend.encode(text, lang)
    else:
        ids += frontend.bos_ids
        ids += frontend.encode(text, lang)
    return ids


def load_frontend(
    assets_dir: str | Path,
    *,
    style: str,
    text_vocab: int,
    log=None,
):
    """Frontend discovery: ``<assets>/tokenizer.json`` or
    ``<assets>/weights/tokenizer.json`` → PublishedFrontend (validated
    against the model's text embedding rows), else ByteFrontend.

    ``text_vocab`` is the model's text-embedding row count; a tokenizer
    whose ids could index past it is rejected loudly (wrong rows would
    silently produce garbage prosody)."""
    import logging

    log = log or logging.getLogger("vocalie_api").warning
    for cand in (Path(assets_dir) / "tokenizer.json",
                 Path(assets_dir) / "weights" / "tokenizer.json"):
        if cand.exists():
            front = PublishedFrontend(cand, style)
            if front.vocab_size > text_vocab:
                log(
                    "tokenizer.json vocab %d exceeds text embedding rows %d "
                    "— falling back to the byte frontend (re-run convert-hf "
                    "so text_vocab matches the tokenizer)",
                    front.vocab_size, text_vocab,
                )
                return ByteFrontend()
            return front
    if text_vocab != BYTE_VOCAB_SIZE:
        log(
            "weights carry a %d-row text embedding but no tokenizer.json is "
            "staged beside them — byte frontend ids will index the wrong "
            "rows; copy the checkpoint's tokenizer.json into the assets dir",
            text_vocab,
        )
    return ByteFrontend()


__all__ = [
    "ByteFrontend",
    "PublishedFrontend",
    "build_prompt_ids",
    "load_frontend",
    "STYLES",
]
