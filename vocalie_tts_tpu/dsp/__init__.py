"""Audio DSP.

Two implementations with identical semantics:

- ``dsp.host``   — numpy, used by the host-side pipeline and as the
                   golden reference in parity tests.
- ``dsp.device`` — JAX, jit-compatible, used when audio is already
                   resident on the TPU (engine output post-processing,
                   batched stitching).
"""

from vocalie_tts_tpu.dsp.host import (
    apply_inter_chunk_gap,
    fade_in,
    fade_out,
    find_active_range,
    peak_normalize,
    resample,
    snap_zero_crossing,
    trim_audio_to_expected_duration,
)

__all__ = [
    "apply_inter_chunk_gap",
    "fade_in",
    "fade_out",
    "find_active_range",
    "peak_normalize",
    "resample",
    "snap_zero_crossing",
    "trim_audio_to_expected_duration",
]
