"""Compatibility shim — canonical location is vocalie_tts_tpu.io.edit."""

from vocalie_tts_tpu.io.edit import SILENCE_MIN_MS, SILENCE_THRESHOLD  # noqa: F401
