"""Small shared utilities: profiling/tracing, timers."""

from vocalie_tts_tpu.utils.trace import device_trace, Timer

__all__ = ["device_trace", "Timer"]
