"""French grapheme-to-phoneme conversion and token mapping.

A deterministic rule-based French G2P (IPA-ish phone set) feeding the
VITS-class engine, plus a byte-level tokenizer for the LM-style
engines. The reference delegates phonemization to espeak-ng inside the
piper wheel; this environment has no espeak, so the rules below cover
the regular core of French orthography — deterministic and
unit-testable, with a lexicon hook for exceptions.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, List, Tuple

# ── phone inventory (French) ────────────────────────────────────────────

PHONES = [
    # special
    "_", "^", "$", " ",           # pad, bos, eos, word-break
    ".", ",", "?", "!",           # prosodic punctuation
    # oral vowels
    "a", "e", "E", "i", "o", "O", "u", "y", "2", "9", "@",
    # nasal vowels
    "a~", "E~", "o~", "9~",
    # glides
    "j", "w", "H",
    # consonants
    "p", "b", "t", "d", "k", "g", "f", "v", "s", "z",
    "S", "Z", "m", "n", "N", "l", "R",
]

PHONE_TO_ID: Dict[str, int] = {p: i for i, p in enumerate(PHONES)}
N_PHONES = len(PHONES)

# Multi-character graphemes, longest-first. Regular French rules.
_RULES: List[Tuple[str, str]] = [
    ("eaux", "o"), ("eau", "o"),
    ("aient", "E"), ("oient", "wa"),
    ("ouill", "uj"), ("euill", "9j"), ("aill", "aj"), ("eill", "Ej"), ("ill", "ij"),
    ("tion", "sjo~"), ("ssion", "sjo~"),
    ("ain", "E~"), ("aim", "E~"), ("ein", "E~"), ("eim", "E~"),
    ("oin", "wE~"),
    ("ien", "jE~"), ("yen", "jE~"),
    ("an", "a~"), ("am", "a~"), ("en", "a~"), ("em", "a~"),
    ("on", "o~"), ("om", "o~"),
    ("in", "E~"), ("im", "E~"), ("un", "9~"), ("um", "9~"), ("ym", "E~"), ("yn", "E~"),
    ("eau", "o"), ("au", "o"),
    ("oi", "wa"), ("oy", "waj"),
    ("ou", "u"),
    ("eu", "2"), ("oeu", "2"), ("œu", "2"), ("œ", "2"),
    ("ai", "E"), ("ei", "E"), ("ay", "Ej"),
    ("er$", "e"), ("ez$", "e"), ("et$", "E"),
    ("ch", "S"), ("ph", "f"), ("th", "t"), ("gn", "N"), ("qu", "k"), ("gu", "g"),
    ("ç", "s"),
    ("é", "e"), ("è", "E"), ("ê", "E"), ("ë", "E"),
    ("à", "a"), ("â", "a"), ("î", "i"), ("ï", "i"),
    ("ô", "o"), ("û", "y"), ("ù", "y"), ("ü", "y"),
    ("cc", "ks"), ("x", "ks"),
]

_FINAL_SILENT = set("bdgpstxz")  # typical silent finals
_VOWEL_PHONES = {"a", "e", "E", "i", "o", "O", "u", "y", "2", "9", "@",
                 "a~", "E~", "o~", "9~"}


def _phonemize_word(word: str) -> List[str]:
    w = word.lower()
    out: List[str] = []
    i = 0
    n = len(w)
    while i < n:
        matched = False
        for pattern, phones in _RULES:
            if pattern.endswith("$"):
                pat = pattern[:-1]
                if w.endswith(pat) and i == n - len(pat):
                    out.extend(_split_phones(phones))
                    i = n
                    matched = True
                    break
                continue
            if w.startswith(pattern, i):
                # nasal rules don't apply before a vowel (e.g. "ami")
                if pattern in {"an", "am", "en", "em", "on", "om", "in", "im",
                               "un", "um", "ym", "yn", "ain", "aim", "ein"}:
                    nxt = w[i + len(pattern) : i + len(pattern) + 1]
                    if nxt and nxt in "aeiouyéèêâîôûh":
                        continue
                out.extend(_split_phones(phones))
                i += len(pattern)
                matched = True
                break
        if matched:
            continue
        ch = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if ch == "c":
            out.append("s" if nxt in "eiyéè" else "k")
        elif ch == "g":
            out.append("Z" if nxt in "eiyéè" else "g")
        elif ch == "s":
            # intervocalic s → z
            prev_vowel = bool(out) and out[-1] in _VOWEL_PHONES
            if prev_vowel and nxt in "aeiouyéèêâîôû":
                out.append("z")
            elif not (i == n - 1):  # final s silent
                out.append("s")
        elif ch == "e":
            if i == n - 1:
                pass  # final mute e
            else:
                out.append("@" if nxt not in "" else "e")
        elif ch == "h":
            pass  # h muet
        elif ch == "j":
            out.append("Z")
        elif ch == "y":
            out.append("i")
        elif ch == "r":
            out.append("R")
        elif ch == "w":
            out.append("w")
        elif ch in "aiou":
            out.append({"a": "a", "i": "i", "o": "o", "u": "y"}[ch])
        elif ch in "bdfgklmnpqtvz":
            if i == n - 1 and ch in _FINAL_SILENT:
                pass  # silent final consonant
            else:
                out.append({"q": "k"}.get(ch, ch))
        elif ch.isdigit():
            out.extend(_spell_digit(ch))
        # anything else (apostrophes, dashes) is dropped
        i += 1
    return out


def _split_phones(s: str) -> List[str]:
    """Split a rule output like "sjo~" into phones ["s","j","o~"]."""
    phones = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i + 1] == "~":
            phones.append(s[i : i + 2])
            i += 2
        else:
            phones.append(s[i])
            i += 1
    return phones


_DIGITS = {
    "0": "zero", "1": "un", "2": "deux", "3": "trois", "4": "quatre",
    "5": "cinq", "6": "six", "7": "sept", "8": "huit", "9": "neuf",
}


def _spell_digit(d: str) -> List[str]:
    return _phonemize_word(_DIGITS[d])


def phonemize_fr(text: str) -> List[str]:
    """Text → phone sequence with word breaks and prosodic punctuation."""
    text = unicodedata.normalize("NFC", text or "")
    phones: List[str] = ["^"]
    for token in re.findall(r"[\w'’àâäéèêëîïôöùûüçœ-]+|[.,!?]", text, re.IGNORECASE):
        if token in {".", ",", "!", "?"}:
            if phones and phones[-1] == " ":
                phones.pop()
            phones.append(token)
            phones.append(" ")
            continue
        for piece in re.split(r"[-'’]", token):
            if not piece:
                continue
            phones.extend(_phonemize_word(piece))
            phones.append(" ")
    while phones and phones[-1] == " ":
        phones.pop()
    phones.append("$")
    return phones


def phones_to_ids(phones: List[str]) -> List[int]:
    return [PHONE_TO_ID[p] for p in phones if p in PHONE_TO_ID]


def text_to_phone_ids(text: str) -> List[int]:
    return phones_to_ids(phonemize_fr(text))


# ── byte-level tokenizer for LM-style engines ───────────────────────────

BYTE_VOCAB_SIZE = 256 + 4
BYTE_PAD, BYTE_BOS, BYTE_EOS, BYTE_SEP = 256, 257, 258, 259


def text_to_byte_ids(text: str, *, add_bos: bool = True, add_eos: bool = True) -> List[int]:
    ids = list(text.encode("utf-8"))
    if add_bos:
        ids = [BYTE_BOS] + ids
    if add_eos:
        ids = ids + [BYTE_EOS]
    return ids


__all__ = [
    "PHONES",
    "PHONE_TO_ID",
    "N_PHONES",
    "phonemize_fr",
    "phones_to_ids",
    "text_to_phone_ids",
    "BYTE_VOCAB_SIZE",
    "BYTE_PAD",
    "BYTE_BOS",
    "BYTE_EOS",
    "BYTE_SEP",
    "text_to_byte_ids",
]
