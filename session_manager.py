"""Compatibility shim — canonical location is vocalie_tts_tpu.io.sessions."""

from vocalie_tts_tpu.io.sessions import *  # noqa: F401,F403
