"""Every engine with a batched runtime must OVERRIDE synthesize_batch.

The base-class fallback silently loops chunk-by-chunk — each chunk
paying its own prefill, full decode and a ~90 ms host read through the
tunnel. When qwen3/xtts/cosyvoice ran the fallback it cost 3-5× wall
time on 8-chunk sessions (qwen3: 21× vs 117.8× RT). This pins the
override so the regression cannot come back unnoticed.
"""

import pytest

pytestmark = pytest.mark.unit

BATCHED_ENGINES = ["chatterbox", "piper", "qwen3", "xtts", "cosyvoice"]


@pytest.mark.parametrize("name", BATCHED_ENGINES)
def test_engine_overrides_synthesize_batch(name):
    import vocalie_tts_tpu.engines as engines
    from vocalie_tts_tpu.engines import base

    cls = {
        "chatterbox": engines.ChatterboxEngine,
        "piper": engines.PiperEngine,
        "qwen3": engines.Qwen3Engine,
        "xtts": engines.XTTSEngine,
        "cosyvoice": engines.CosyVoiceEngine,
    }[name]
    assert cls.synthesize_batch is not base.TTSEngine.synthesize_batch, (
        f"{name} inherits the sequential per-chunk fallback — override "
        "synthesize_batch to delegate to the runtime's bucketed batch path"
    )


def test_stream_window_schedule_covers_buckets_with_few_shapes():
    """Every decode bucket is exactly covered, and the whole bucket set
    compiles at most 3 distinct window shapes (first + sustain +
    one remainder size per bucket)."""
    from vocalie_tts_tpu.models.cosyvoice.runtime import (
        DECODE_BUCKETS,
        STREAM_WINDOW_TOKENS,
        stream_window_schedule,
    )

    shapes = set()
    for bucket in DECODE_BUCKETS:
        sched = stream_window_schedule(bucket)
        assert sum(sched) == bucket
        assert sched[0] == STREAM_WINDOW_TOKENS
        assert all(w > 0 for w in sched)
        shapes |= set(sched)
    assert len(shapes) <= 4, shapes
