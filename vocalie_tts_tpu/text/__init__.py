"""Deterministic text-preparation pipeline.

Pure-Python, side-effect free. This is audible product behavior: the
constants and algorithms here decide where a voice-over breathes, so
they reproduce the reference semantics exactly
(ref: backend/shared/text_{constants,normalize,chunk,render,duration,lexique}.py).
"""

from vocalie_tts_tpu.text.constants import (
    AVERAGE_WPS,
    DEFAULT_MAX_CHARS_PER_CHUNK,
    DEFAULT_MAX_EST_SECONDS_PER_CHUNK,
    DEFAULT_MAX_PHRASES_PER_CHUNK,
    DEFAULT_MAX_WORDS_WITHOUT_TERMINATOR,
    DEFAULT_MIN_WORDS_PER_CHUNK,
    DETERMINERS,
    FALLBACK_PUNCTUATION,
    FINAL_MERGE_EST_SECONDS,
    MANUAL_CHUNK_MARKER,
    PIVOT_WORDS,
    TERMINATOR_CHARS,
)
from vocalie_tts_tpu.text.types import (
    ChunkInfo,
    DurationAdjustment,
    SpeechSegment,
    TextUnit,
)
from vocalie_tts_tpu.text.normalize import (
    count_words,
    first_word,
    normalize_paste_fr,
    normalize_text,
    normalize_whitespace,
    strip_legacy_tokens,
)
from vocalie_tts_tpu.text.duration import adjust_text_to_duration, estimate_duration
from vocalie_tts_tpu.text.chunk import (
    apply_pivot_splits,
    chunk_script,
    merge_short_chunks,
    parse_manual_chunks,
    split_oversize_chunks,
)
from vocalie_tts_tpu.text.render import (
    render_clean_text,
    render_clean_text_from_segments,
    stitch_segments,
)
from vocalie_tts_tpu.text.lexique import (
    load_lexique_json,
    normalize_for_engine,
    prepare_adjusted_text,
)

__all__ = [
    "AVERAGE_WPS",
    "DEFAULT_MAX_CHARS_PER_CHUNK",
    "DEFAULT_MAX_EST_SECONDS_PER_CHUNK",
    "DEFAULT_MAX_PHRASES_PER_CHUNK",
    "DEFAULT_MAX_WORDS_WITHOUT_TERMINATOR",
    "DEFAULT_MIN_WORDS_PER_CHUNK",
    "DETERMINERS",
    "FALLBACK_PUNCTUATION",
    "FINAL_MERGE_EST_SECONDS",
    "MANUAL_CHUNK_MARKER",
    "PIVOT_WORDS",
    "TERMINATOR_CHARS",
    "ChunkInfo",
    "DurationAdjustment",
    "SpeechSegment",
    "TextUnit",
    "count_words",
    "first_word",
    "normalize_paste_fr",
    "normalize_text",
    "normalize_whitespace",
    "strip_legacy_tokens",
    "adjust_text_to_duration",
    "estimate_duration",
    "apply_pivot_splits",
    "chunk_script",
    "merge_short_chunks",
    "parse_manual_chunks",
    "split_oversize_chunks",
    "render_clean_text",
    "render_clean_text_from_segments",
    "stitch_segments",
    "load_lexique_json",
    "normalize_for_engine",
    "prepare_adjusted_text",
]
