"""Voice-reference library: list / import / resolve (traversal-guarded).

(ref: backend/shared/refs.py)
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path
from typing import Iterable, List, Optional

DEFAULT_REF_DIR = Path(__file__).resolve().parents[2] / "Ref_audio"
ALLOWED_EXTENSIONS = {".wav", ".mp3", ".m4a", ".aiff", ".flac"}

# Runtime-configured directory (PUT /v1/refs/dir). Deliberate divergence
# from the reference, which keeps this state in routes/refs.py only, so
# its job thread resolves voices against the env/default dir and a job
# created after changing the directory fails with "Reference file not
# found" (ref: backend/services/tts_service.py:123 resolve_ref_path with
# no directory vs backend/routes/refs.py:18 _current_ref_dir). Holding
# it here makes every resolver — routes AND the job thread — see the
# configured directory.
_runtime_ref_dir: Optional[str] = None


def set_runtime_ref_dir(directory: Optional[os.PathLike | str]) -> None:
    global _runtime_ref_dir
    _runtime_ref_dir = str(directory) if directory else None


def _ref_dir(directory: Optional[os.PathLike | str] = None) -> Path:
    ref_dir = Path(
        directory or _runtime_ref_dir
        or os.environ.get("VOCALIE_REF_DIR")
        or os.environ.get("CHATTERBOX_REF_DIR")
        or DEFAULT_REF_DIR
    ).expanduser()
    ref_dir.mkdir(parents=True, exist_ok=True)
    return ref_dir


def list_refs(directory: Optional[os.PathLike | str] = None) -> List[str]:
    """Sorted reference filenames with allowed audio extensions."""
    ref_dir = _ref_dir(directory)
    return sorted(
        entry.name
        for entry in ref_dir.iterdir()
        if entry.is_file() and entry.suffix.lower() in ALLOWED_EXTENSIONS
    )


def _collision_free_name(target_dir: Path, original_name: str) -> str:
    stem = Path(original_name).stem or "ref"
    suffix = Path(original_name).suffix
    if suffix.lower() not in ALLOWED_EXTENSIONS:
        suffix = ".wav"
    candidate = f"{stem}{suffix}"
    if not (target_dir / candidate).exists():
        return candidate
    counter = 1
    stamp = int(time.time())
    while True:
        candidate = f"{stem}_{counter:02d}_{stamp}{suffix}"
        if not (target_dir / candidate).exists():
            return candidate
        counter += 1


def import_refs(
    files: Iterable,
    directory: Optional[os.PathLike | str] = None,
) -> List[str]:
    """Copy files into the reference library; returns stored names."""
    ref_dir = _ref_dir(directory)
    saved: List[str] = []
    for file_obj in files or []:
        if file_obj is None:
            continue
        if isinstance(file_obj, (str, os.PathLike)):
            source = Path(file_obj)
        elif hasattr(file_obj, "name"):
            source = Path(str(file_obj.name))
        else:
            continue
        if not source.exists() or source.suffix.lower() not in ALLOWED_EXTENSIONS:
            continue
        dest = ref_dir / _collision_free_name(ref_dir, source.name)
        shutil.copy2(source, dest)
        saved.append(dest.name)
    return saved


def resolve_ref_path(
    filename: str,
    directory: Optional[os.PathLike | str] = None,
) -> str:
    """Absolute path of a reference file; rejects traversal attempts."""
    ref_dir = _ref_dir(directory)
    name = Path(str(filename)).name
    if name != str(filename) or ".." in name:
        raise ValueError("invalid_reference_name")
    candidate = (ref_dir / name).resolve()
    try:
        candidate.relative_to(ref_dir.resolve())
    except ValueError as exc:
        raise ValueError("reference_path_not_allowed") from exc
    if not candidate.exists():
        raise FileNotFoundError(f"Reference file not found: {candidate}")
    return str(candidate)


def normalize_ref_audio(
    path: os.PathLike | str,
    *,
    target_sr: int = 24000,
    target_dbfs: float = -20.0,
    peak_ceiling: float = 0.97,
):
    """Load a reference voice as a conditioning-ready array: mono
    downmix, resample to ``target_sr``, loudness-normalize to
    ``target_dbfs`` RMS with a hard peak ceiling.

    The reference shells out to ffmpeg for the same preparation
    (mono + 24 kHz + loudnorm, ref: tts_backends/qwen3_backend.py:40-69
    and cosyvoice_backend.py:65-108); here it is a host-side numpy
    transform so every engine conditions on a consistent level and
    rate regardless of how the user's file was mastered.

    Returns ``(audio_f32_mono, target_sr)``.
    """
    import numpy as np

    from vocalie_tts_tpu.dsp.host import resample
    from vocalie_tts_tpu.io.wavio import read_wav

    audio, sr = read_wav(path)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    audio = np.asarray(audio, np.float32)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    rms = float(np.sqrt(np.mean(np.square(audio, dtype=np.float64)))) or 0.0
    if rms > 1e-8:
        gain = (10.0 ** (target_dbfs / 20.0)) / rms
        peak = float(np.max(np.abs(audio))) * gain
        if peak > peak_ceiling:
            gain *= peak_ceiling / peak
        audio = audio * np.float32(gain)
    return audio, target_sr


__all__ = [
    "ALLOWED_EXTENSIONS",
    "DEFAULT_REF_DIR",
    "set_runtime_ref_dir",
    "list_refs",
    "import_refs",
    "resolve_ref_path",
    "normalize_ref_audio",
]
