"""Compatibility shim — canonical location is vocalie_tts_tpu.text.

The reference exposes root-level modules for legacy imports
(ref: root text_tools.py); kept so downstream scripts keep working.
"""

from vocalie_tts_tpu.text import *  # noqa: F401,F403
from vocalie_tts_tpu.text import (  # noqa: F401
    ChunkInfo,
    SpeechSegment,
    chunk_script,
    count_words,
    estimate_duration,
    normalize_text,
    parse_manual_chunks,
    render_clean_text,
    render_clean_text_from_segments,
    strip_legacy_tokens,
)
from vocalie_tts_tpu.text.constants import LEGACY_TOKEN_PATTERN  # noqa: F401
