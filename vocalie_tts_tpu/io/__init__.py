"""Host-side I/O: WAV codec, sessions, output naming, voice references."""

from vocalie_tts_tpu.io.wavio import (
    read_wav,
    wav_duration_s,
    wav_info,
    write_wav,
)

__all__ = ["read_wav", "write_wav", "wav_info", "wav_duration_s"]
