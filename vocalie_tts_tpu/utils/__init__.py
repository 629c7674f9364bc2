"""Small shared utilities: profiling/tracing, timers, env parsing.

``device_trace``/``Timer`` load lazily: ``utils.trace`` imports jax at
module level, and early-bootstrap importers (bench.py, scripts) must be
able to pull ``utils.env`` BEFORE configuring the jax environment.
"""

__all__ = ["device_trace", "Timer"]


def __getattr__(name):
    if name in __all__:
        from vocalie_tts_tpu.utils import trace

        return getattr(trace, name)
    raise AttributeError(name)
