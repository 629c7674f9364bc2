"""Synthesis pipeline: chunks → engine decode → stitch → WAV.

Semantics mirror the reference hot loop (ref: backend/shared/
tts_pipeline.py:292-430): per-chunk clean render, short-text padding,
resample to 24 kHz, inter-chunk gap with 10 ms crossfades, identical
meta dictionary. The structural difference is the decode call: chunks
go to the engine's ``synthesize_batch`` (bucketed batched decode on
resident device state) instead of one venv subprocess per chunk.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from vocalie_tts_tpu.dsp.host import apply_inter_chunk_gap, find_active_range, fade_in, fade_out, peak_normalize, resample, snap_zero_crossing
from vocalie_tts_tpu.engines import get_backend
from vocalie_tts_tpu.engines.base import BackendUnavailableError
from vocalie_tts_tpu.io.wavio import read_wav, write_wav
from vocalie_tts_tpu.text import (
    DEFAULT_MAX_EST_SECONDS_PER_CHUNK,
    DEFAULT_MAX_WORDS_WITHOUT_TERMINATOR,
    DEFAULT_MIN_WORDS_PER_CHUNK,
    ChunkInfo,
    chunk_script,
    render_clean_text_from_segments,
    strip_legacy_tokens,
)

TARGET_SR = 24000
MIN_WORDS_FOR_SYNTHESIS = 3  # shorter inputs are repetition-padded
# Note: the reference also defines MIN_EST_SECONDS_FOR_SYNTHESIS = 2.0
# (ref: backend/shared/tts_pipeline.py:28) but never consumes it and its
# own root shim does not re-export it — dead weight, not reproduced.


@dataclass(frozen=True)
class PipelineResult:
    out_path: str
    meta: Dict[str, Any]


def pad_short_text(text: str, min_words: int = MIN_WORDS_FOR_SYNTHESIS) -> tuple[str, int]:
    """Repeat very short text so the model has prosodic context.

    AR TTS models hallucinate filler on 1-2 word inputs; repeating the
    text (with sentence punctuation between repeats) stabilizes them
    (ref: tts_pipeline.py:31-57). Returns (padded_text, repetitions).
    """
    if not text or not text.strip():
        return text, 1
    words = text.split()
    if len(words) >= min_words:
        return text, 1
    reps = -(-min_words // len(words))  # ceil
    separator = " " if text.rstrip().endswith((".", "!", "?")) else ". "
    return (separator.join([text] * reps) if reps > 1 else text), reps


def _coerce_audio_result(result, default_sr: Optional[int] = None):
    if isinstance(result, tuple) and len(result) >= 2:
        return result[0], int(result[1])
    if isinstance(result, dict) and "audio" in result:
        sr = result.get("sr", default_sr)
        return result["audio"], int(sr) if sr is not None else None
    raise TypeError(f"Unsupported audio result: {type(result)}")


def generate_raw_wav(request: dict, progress_cb=None) -> PipelineResult:
    return run_tts_pipeline(dict(request), progress_cb=progress_cb)


def run_tts_pipeline(request: dict, progress_cb=None) -> PipelineResult:
    backend_id = request.get("tts_backend")
    backend = get_backend(backend_id)
    if backend is None:
        raise BackendUnavailableError(f"Backend introuvable: {backend_id}")
    if not backend.is_available():
        reason = backend.unavailable_reason() or "Dépendances manquantes."
        raise BackendUnavailableError(f"Backend indisponible: {backend_id}. {reason}")

    from vocalie_tts_tpu.utils.trace import Timer, device_trace, mark_phase

    timer = Timer()
    tp = time.monotonic()

    script = request.get("script") or ""
    if not script.strip():
        raise ValueError("Le texte est vide.")

    chunks = request.get("chunks") or []
    if chunks and not isinstance(chunks[0], ChunkInfo):
        raise ValueError("chunks must be ChunkInfo list")
    if not chunks:
        settings = request.get("chunk_settings") or {}
        chunks = list(
            chunk_script(
                script,
                min_words_per_chunk=int(
                    settings.get("min_words_per_chunk", DEFAULT_MIN_WORDS_PER_CHUNK)
                ),
                max_words_without_terminator=int(
                    settings.get(
                        "max_words_without_terminator", DEFAULT_MAX_WORDS_WITHOUT_TERMINATOR
                    )
                ),
                max_est_seconds_per_chunk=float(
                    settings.get(
                        "max_est_seconds_per_chunk", DEFAULT_MAX_EST_SECONDS_PER_CHUNK
                    )
                ),
            )
        )
    if not chunks:
        raise ValueError("Aucun chunk généré.")

    target_sr = int(request.get("target_sr") or TARGET_SR)
    engine_params = request.get("engine_params") or {}
    lang = request.get("lang_code") or request.get("lang")
    voice_ref_path = request.get("voice_ref_path")
    out_path = request.get("out_path")
    if not out_path:
        raise ValueError("out_path must be provided")

    if progress_cb:
        progress_cb(0.0)

    # Render + pad every chunk up front so the engine can batch them.
    texts: List[str] = []
    kept_indices: List[int] = []
    for idx, chunk in enumerate(chunks):
        clean = render_clean_text_from_segments(list(chunk.segments))
        clean = strip_legacy_tokens(clean)
        clean, _reps = pad_short_text(clean)
        if clean.strip():
            texts.append(clean)
            kept_indices.append(idx)

    durations: List[float] = []
    retries: List[bool] = []
    audio_chunks: List[np.ndarray] = []
    backend_meta_last: Dict[str, Any] = {}
    backend_logs: List[str] = []

    def batch_progress(frac: float) -> None:
        if progress_cb:
            progress_cb(frac)

    tp = mark_phase("pipeline-prep", tp)
    with device_trace("tts_pipeline.synthesize_batch"):
        results = backend.synthesize_batch(
            texts,
            voice_ref_path=voice_ref_path,
            lang=lang,
            progress_cb=batch_progress,
            **engine_params,
        )

    tp = mark_phase("pipeline-synthesize_batch", tp)
    for result in results:
        meta: Dict[str, Any] = {}
        if isinstance(result, tuple) and len(result) >= 3 and isinstance(result[2], dict):
            meta = result[2]
        elif isinstance(result, dict) and isinstance(result.get("meta"), dict):
            meta = result["meta"]
        if meta:
            backend_meta_last = dict(meta)
            if meta.get("stdout"):
                backend_logs.append(f"stdout: {meta['stdout']}")
            if meta.get("stderr"):
                backend_logs.append(f"stderr: {meta['stderr']}")
        audio, sr = _coerce_audio_result(result, default_sr=target_sr)
        if sr is None:
            sr = target_sr
        audio = np.asarray(audio, dtype=np.float32)
        if sr != target_sr:
            audio = resample(audio, sr, target_sr)
        durations.append(len(audio) / float(target_sr) if target_sr else 0.0)
        retries.append(bool(meta.get("retry")))
        audio_chunks.append(audio)

    if progress_cb:
        progress_cb(1.0)

    inter_chunk_gap_ms = int(request.get("inter_chunk_gap_ms") or 0)
    if not backend.supports_inter_chunk_gap:
        inter_chunk_gap_ms = 0
    gap_applied = bool(
        backend.supports_inter_chunk_gap and len(audio_chunks) > 1 and inter_chunk_gap_ms > 0
    )
    if gap_applied:
        final_audio = apply_inter_chunk_gap(
            audio_chunks, sr=target_sr, gap_ms=inter_chunk_gap_ms
        )
    else:
        final_audio = (
            np.concatenate(audio_chunks) if audio_chunks else np.zeros(0, dtype=np.float32)
        )

    tp = mark_phase("pipeline-coerce+gap-stitch", tp)
    out_path = str(Path(out_path).expanduser().resolve())
    write_wav(out_path, final_audio, target_sr)
    tp = mark_phase("pipeline-write-wav", tp)

    meta = {
        "backend_id": backend_id,
        "backend_lang": lang,
        "chunks": len(chunks),
        "durations": durations,
        "retries": retries,
        "total_duration": len(final_audio) / float(target_sr) if target_sr else 0.0,
        "duration_sec": len(final_audio) / float(target_sr) if target_sr else 0.0,
        "sr": target_sr,
        "segments_count_total": len(chunks),
        "num_subunits": len(chunks),
        "backend_meta": backend_meta_last,
        "backend_logs": backend_logs,
        "warnings": [],
        "inter_chunk_gap_ms": inter_chunk_gap_ms,
        "inter_chunk_gap_applied": gap_applied,
        "inter_chunk_gap_engine": backend_id,
        "inter_chunk_gap_chunks": len(chunks),
    }
    timer.add_audio(meta["total_duration"])
    meta["perf"] = timer.meta()
    return PipelineResult(out_path=out_path, meta=meta)


def minimal_post_process(
    raw_path,
    processed_path,
    *,
    zero_cross_radius_ms: int = 10,
    fade_ms: int = 10,
    silence_threshold: float = 0.002,
    silence_min_ms: int = 20,
    normalize_peak_db: float = -1.0,
) -> Dict[str, Any]:
    """Edge-silence trim (zero-cross snapped) + fades + peak normalize
    (ref: tts_pipeline.py:212-274)."""
    raw_path = Path(raw_path)
    processed_path = Path(processed_path)
    if raw_path.resolve() == processed_path.resolve():
        raise ValueError("Le traitement doit écrire dans un fichier différent du raw.")
    audio, sr = read_wav(raw_path)
    audio = np.asarray(audio, dtype=np.float32)
    mono = np.mean(audio, axis=1) if audio.ndim > 1 else audio
    min_silence_frames = int(sr * (int(silence_min_ms) / 1000.0))
    start_idx, end_idx = find_active_range(
        mono, threshold=float(silence_threshold), min_silence_frames=min_silence_frames
    )
    radius = int(sr * (int(zero_cross_radius_ms) / 1000.0))
    if mono.size:
        start_idx = snap_zero_crossing(mono, start_idx, radius_samples=radius)
        end_idx = snap_zero_crossing(mono, max(end_idx - 1, start_idx), radius_samples=radius) + 1
    if end_idx <= start_idx:
        start_idx, end_idx = 0, audio.shape[0]
    trimmed = audio[start_idx:end_idx].copy()
    fade_frames = int(sr * (int(fade_ms) / 1000.0))
    if trimmed.ndim == 1:
        fade_in(trimmed, fade_frames)
        fade_out(trimmed, fade_frames)
    else:
        for c in range(trimmed.shape[1]):
            trimmed[:, c] = fade_in(trimmed[:, c].copy(), fade_frames)
            trimmed[:, c] = fade_out(trimmed[:, c], fade_frames)
    trimmed, scale, peak_before = peak_normalize(trimmed, normalize_peak_db)
    write_wav(processed_path, trimmed, sr, subtype="FLOAT")
    return {
        "trim": {"start_sample": int(start_idx), "end_sample": int(end_idx)},
        "fade_ms": int(fade_ms),
        "zero_cross_radius_ms": int(zero_cross_radius_ms),
        "silence_threshold": float(silence_threshold),
        "silence_min_ms": int(silence_min_ms),
        "normalize_peak_db": float(normalize_peak_db),
        "normalize_scale": float(scale),
        "peak_before": float(peak_before),
    }


__all__ = [
    "TARGET_SR",
    "MIN_WORDS_FOR_SYNTHESIS",
    "PipelineResult",
    "pad_short_text",
    "generate_raw_wav",
    "run_tts_pipeline",
    "minimal_post_process",
]
