"""Device compute primitives: Pallas kernels and AR decode infrastructure."""

from vocalie_tts_tpu.ops.flash_attention import flash_attention
from vocalie_tts_tpu.ops.kv_cache import KVCache
from vocalie_tts_tpu.ops.sampling import (
    apply_repetition_penalty,
    cfg_combine,
    sample_logits,
)

__all__ = [
    "flash_attention",
    "KVCache",
    "apply_repetition_penalty",
    "cfg_combine",
    "sample_logits",
]
