"""Audio editing: trim + normalize, and audio metadata.

Canonical implementation used by the /v1/audio/edit route and the
post-generation editing step (ref: backend/shared/audio_edit.py).
Output is PCM_16, clipped — the delivery format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from vocalie_tts_tpu.dsp.host import find_active_range, peak_normalize
from vocalie_tts_tpu.io.wavio import read_wav, wav_info, write_wav

# Shared defaults (ref: backend/shared/audio_defaults.py)
SILENCE_THRESHOLD = 0.002
SILENCE_MIN_MS = 20


def apply_minimal_edit(
    raw_path: Path,
    output_path: Path,
    *,
    trim_enabled: bool,
    normalize_enabled: bool,
    target_dbfs: float,
    silence_threshold: float = SILENCE_THRESHOLD,
    silence_min_ms: int = SILENCE_MIN_MS,
    zero_cross_radius_ms: int = 10,
    fade_ms: int = 10,
) -> Dict[str, Any]:
    """Optional edge-silence trim + peak normalize, non-destructive."""
    raw_path = Path(raw_path)
    output_path = Path(output_path)
    if raw_path.resolve() == output_path.resolve():
        raise ValueError("Output must be different from input.")

    audio, sr = read_wav(raw_path)
    audio = np.asarray(audio, dtype=np.float32)

    trimmed = False
    if trim_enabled:
        mono = np.mean(audio, axis=1) if audio.ndim > 1 else audio
        min_silence_frames = int(sr * (int(silence_min_ms) / 1000.0))
        start_idx, end_idx = find_active_range(
            mono,
            threshold=float(silence_threshold),
            min_silence_frames=min_silence_frames,
        )
        if 0 <= start_idx < end_idx <= len(audio):
            audio = audio[start_idx:end_idx]
            trimmed = True

    normalized = False
    peak_before = float(np.max(np.abs(audio))) if audio.size else 0.0
    gain = 1.0
    if normalize_enabled:
        audio, gain, peak_before = peak_normalize(audio, target_dbfs)
        normalized = gain != 1.0 or peak_before > 0.0

    audio = np.clip(audio, -1.0, 1.0)
    write_wav(output_path, audio, sr, subtype="PCM_16")

    return {
        "trimmed": trimmed,
        "normalized": normalized,
        "target_dbfs": float(target_dbfs),
        "peak_before": peak_before,
        "peak_after": float(np.max(np.abs(audio))) if audio.size else 0.0,
        "gain": gain,
    }


def audio_meta(path: Path) -> Dict[str, Any]:
    """Duration / sample-rate / size probe without decoding samples."""
    info = wav_info(path)
    duration = info.frames / info.samplerate if info.samplerate else 0.0
    return {
        "duration_s": duration,
        "sample_rate": int(info.samplerate) if info.samplerate else None,
        "size_bytes": int(Path(path).stat().st_size),
    }


__all__ = ["SILENCE_THRESHOLD", "SILENCE_MIN_MS", "apply_minimal_edit", "audio_meta"]
