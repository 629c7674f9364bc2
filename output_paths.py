"""Compatibility shim — canonical location is vocalie_tts_tpu.io.outputs."""

from vocalie_tts_tpu.io.outputs import (  # noqa: F401
    FORBIDDEN_CHARS,
    MAX_FILENAME_LENGTH,
    ensure_unique_path,
    get_engine_slug,
    make_output_filename,
    prepare_output_paths,
    sanitize_filename,
    slugify,
)
