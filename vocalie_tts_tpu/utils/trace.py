"""Profiling and tracing helpers.

The reference has no tracer (SURVEY §5.1 — only ad-hoc elapsed_ms
logging). Here the device path is observable: ``device_trace`` wraps a
region in a ``jax.profiler`` trace (viewable in XProf/TensorBoard or
Perfetto), and ``Timer`` provides the host-side elapsed/RTF metrics
that engine runtimes put into pipeline meta.

Enable by env: ``VOCALIE_TRACE_DIR=/path`` activates tracing for every
``device_trace`` region.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax
from vocalie_tts_tpu.utils.env import bool_env


# VOCALIE_PHASE_TIMING=1 → stderr wall marks from serving-path phases
# (VO prep/decode/stage2, pipeline stitch) for attributing session wall
# between device compute, tunnel reads and host work. Sibling of the
# AudioSR-specific VOCALIE_AUDIOSR_TIMING knob.
_PHASE_TIMING = bool_env("VOCALIE_PHASE_TIMING")


def mark_phase(label: str, t0: float) -> float:
    """Print ``label: <now-t0>s`` to stderr when phase timing is on.

    Returns the current monotonic clock so call sites chain marks:
    ``t = mark_phase("decode", t)``. Zero overhead when disabled beyond
    one module-load env lookup — safe to leave in production paths.
    Wall marks only; does NOT force device syncs, so a phase's time is
    attributed to wherever the host actually blocks (the tunnel read).
    """
    now = time.monotonic()
    if _PHASE_TIMING:
        import sys

        print(f"[phase] {label}: {now - t0:.3f}s", file=sys.stderr, flush=True)
    return now


@contextlib.contextmanager
def device_trace(name: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Trace a region with jax.profiler when a trace dir is configured.

    No-op (zero overhead beyond one env lookup) when disabled, so it is
    safe to leave in production paths.
    """
    trace_dir = trace_dir or os.environ.get("VOCALIE_TRACE_DIR")
    if not trace_dir:
        yield
        return
    target = os.path.join(trace_dir, name)
    os.makedirs(target, exist_ok=True)
    with jax.profiler.trace(target):
        with jax.profiler.TraceAnnotation(name):
            yield


class Timer:
    """Wall-clock timer with audio RTF accounting."""

    def __init__(self) -> None:
        self._t0 = time.monotonic()
        self.audio_seconds = 0.0

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += float(seconds)

    @property
    def elapsed_s(self) -> float:
        return time.monotonic() - self._t0

    @property
    def rtf(self) -> float:
        """Generated-audio-seconds per wall-second (higher is faster)."""
        elapsed = self.elapsed_s
        return self.audio_seconds / elapsed if elapsed > 0 else 0.0

    def meta(self) -> dict:
        return {
            "elapsed_ms": round(self.elapsed_s * 1000, 1),
            "audio_s": round(self.audio_seconds, 3),
            "rtf": round(self.rtf, 2),
        }


__all__ = ["device_trace", "Timer"]
