"""Compatibility shim — canonical location is vocalie_tts_tpu.io.refs."""

from vocalie_tts_tpu.io.refs import (  # noqa: F401
    ALLOWED_EXTENSIONS,
    DEFAULT_REF_DIR,
    import_refs,
    list_refs,
    resolve_ref_path,
)
