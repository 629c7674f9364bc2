"""Compatibility shim — canonical location is vocalie_tts_tpu.pipeline."""

from vocalie_tts_tpu.pipeline import (  # noqa: F401
    MIN_WORDS_FOR_SYNTHESIS,
    TARGET_SR,
    PipelineResult,
    generate_raw_wav,
    minimal_post_process,
    pad_short_text,
    run_tts_pipeline,
)
