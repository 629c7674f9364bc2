"""Audio edit + AudioSR enhancement endpoints (ref: backend/routes/audio.py)."""

from __future__ import annotations

import math
import uuid
from pathlib import Path

from vocalie_tts_tpu.io.edit import (
    SILENCE_MIN_MS,
    SILENCE_THRESHOLD,
    apply_minimal_edit,
    audio_meta,
)
from vocalie_tts_tpu.io.outputs import ensure_unique_path
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.rate_limit import enforce_heavy
from vocalie_tts_tpu.server.schemas import (
    AudioEditRequest,
    AudioEditResponse,
    AudioEnhanceResponse,
)
from vocalie_tts_tpu.server.security import safe_filename
from vocalie_tts_tpu.server.services import asset_service, audiosr_service
from vocalie_tts_tpu.server.utils import utc_now
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body

router = Router(prefix="/v1")

_ALLOWED_UPLOAD_SUFFIXES = {".wav", ".mp3", ".flac", ".ogg", ".m4a", ".aac", ".opus"}


def _resolve_safe_path(path_value: str) -> Path:
    resolved = Path(path_value).expanduser().resolve()
    for root in (server_config.OUTPUT_DIR, server_config.WORK_DIR):
        try:
            resolved.relative_to(root.resolve())
            return resolved
        except ValueError:
            continue
    raise ApiError(400, "path_not_allowed")


def _peak_dbfs(peak: float) -> float:
    if peak <= 0.0:
        return float("-inf")
    return 20.0 * math.log10(peak)


@router.post("/audio/edit")
async def edit_audio(request) -> AudioEditResponse:
    enforce_heavy(request)
    body = await read_validated_body(request, AudioEditRequest)
    input_path = None
    if body.input_wav_path:
        input_path = _resolve_safe_path(body.input_wav_path)
    elif body.asset_id:
        meta = asset_service.get_asset_meta(body.asset_id)
        if not meta:
            raise ApiError(404, "asset_not_found")
        resolved = asset_service.resolve_asset_path(meta)
        if not resolved:
            raise ApiError(404, "asset_path_not_found")
        input_path = resolved
    if input_path is None or not input_path.exists():
        raise ApiError(404, "input_audio_not_found")

    output_dir = server_config.OUTPUT_DIR
    output_dir.mkdir(parents=True, exist_ok=True)
    output_path = ensure_unique_path(
        output_dir, f"{input_path.stem}_edit{input_path.suffix}"
    )

    before_meta = audio_meta(input_path)
    meta = apply_minimal_edit(
        input_path,
        output_path,
        trim_enabled=bool(body.trim_enabled),
        normalize_enabled=bool(body.normalize_enabled),
        target_dbfs=float(body.target_dbfs),
        silence_threshold=float(SILENCE_THRESHOLD),
        silence_min_ms=int(SILENCE_MIN_MS),
    )
    after_meta = audio_meta(output_path)
    trim_s = max(
        0.0,
        float(before_meta.get("duration_s", 0.0)) - float(after_meta.get("duration_s", 0.0)),
    )

    metrics = {
        "trim_s": trim_s,
        "duration_before_s": before_meta.get("duration_s"),
        "duration_after_s": after_meta.get("duration_s"),
        "peak_dbfs_before": _peak_dbfs(float(meta.get("peak_before", 0.0))),
        "peak_dbfs_after": _peak_dbfs(float(meta.get("peak_after", 0.0))),
        "normalized": meta.get("normalized"),
        "trimmed": meta.get("trimmed"),
        "target_dbfs": meta.get("target_dbfs"),
    }
    try:
        rel_path = str(output_path.relative_to(server_config.OUTPUT_DIR))
    except ValueError:
        rel_path = output_path.name
    asset_id = f"asset_{uuid.uuid4().hex}"
    asset_service.write_asset_meta(
        asset_id,
        {
            "file_name": output_path.name,
            "relative_path": rel_path,
            "size_bytes": int(after_meta.get("size_bytes") or output_path.stat().st_size),
            "duration_s": after_meta.get("duration_s"),
            "sample_rate": after_meta.get("sample_rate"),
            "engine": "edit",
            "voice": None,
            "model": None,
        },
    )
    return AudioEditResponse(
        edited_wav_path=str(output_path), asset_id=asset_id, metrics=metrics
    )


async def _save_upload_part(part, *, max_bytes: int) -> Path:
    try:
        safe_name = safe_filename(part.filename or "")
    except ValueError:
        raise ApiError(415, "unsupported_media_type")
    suffix = Path(safe_name).suffix.lower()
    if suffix not in _ALLOWED_UPLOAD_SUFFIXES:
        raise ApiError(415, "unsupported_media_type")
    upload_dir = server_config.WORK_DIR / "uploads" / "audiosr"
    upload_dir.mkdir(parents=True, exist_ok=True)
    path = upload_dir / f"audiosr_{uuid.uuid4().hex}{suffix}"
    written = 0
    try:
        with path.open("wb") as handle:
            while True:
                chunk = await part.read_chunk(1024 * 1024)
                if not chunk:
                    break
                written += len(chunk)
                if written > max_bytes:
                    raise ApiError(413, "file_too_large")
                handle.write(chunk)
    except Exception:
        path.unlink(missing_ok=True)
        raise
    return path


@router.post("/audio/enhance")
async def enhance_audio(request) -> AudioEnhanceResponse:
    enforce_heavy(request)
    form = {
        "engine": "audiosr",
        "ddim_steps": 100,
        "guidance_scale": 2.5,
        "seed": 0,
        "chunk_size": 32768,
        "overlap": 1024,
        "multiband_ensemble": False,
        "input_cutoff": 8000,
    }
    upload_path = None
    content_type = request.headers.get("Content-Type", "")
    if not content_type.lower().startswith("multipart/"):
        # FastAPI answers a non-multipart upload with a 422 validation
        # error (missing `file` field) — match that, never 500
        raise ApiError(422, "file field required (multipart/form-data)")
    reader = await request.multipart()
    async for part in reader:
        if part.name == "file":
            upload_path = await _save_upload_part(
                part, max_bytes=int(server_config.VOCALIE_MAX_UPLOAD_BYTES)
            )
        elif part.name in form:
            value = (await part.read(decode=False)).decode("utf-8", "replace").strip()
            if part.name == "engine":
                form["engine"] = value
            elif part.name == "multiband_ensemble":
                form["multiband_ensemble"] = value.lower() in {"1", "true", "yes", "on"}
            elif part.name == "guidance_scale":
                form["guidance_scale"] = float(value)
            else:
                form[part.name] = int(float(value))

    if form["engine"] != "audiosr":
        if upload_path:
            upload_path.unlink(missing_ok=True)
        raise ApiError(400, "engine_not_supported")
    if not server_config.VOCALIE_ENABLE_AUDIOSR:
        if upload_path:
            upload_path.unlink(missing_ok=True)
        raise ApiError(409, "audiosr_disabled")
    if not audiosr_service.audiosr_is_available():
        if upload_path:
            upload_path.unlink(missing_ok=True)
        raise ApiError(501, "audiosr_not_installed")
    if upload_path is None:
        raise ApiError(422, [{"loc": ["body", "file"], "msg": "field required"}])

    params = {
        "ddim_steps": max(20, min(int(form["ddim_steps"]), 250)),
        "guidance_scale": max(1.0, min(float(form["guidance_scale"]), 4.0)),
        "seed": max(0, int(form["seed"])),
        "chunk_size": max(0, int(form["chunk_size"])),
        "overlap": max(0, int(form["overlap"])),
        "multiband_ensemble": bool(form["multiband_ensemble"]),
        "input_cutoff": max(0, int(form["input_cutoff"])),
    }

    try:
        output_path, meta_path = audiosr_service.build_output_paths(upload_path.stem)
        result = audiosr_service.run_audiosr(str(upload_path), str(output_path), params)
    except audiosr_service.FeatureDisabledError as exc:
        status = 501 if str(exc) == "audiosr_not_installed" else 409
        raise ApiError(status, str(exc))
    except ApiError:
        raise
    except Exception as exc:
        detail = str(exc) or "audiosr_failed"
        if len(detail) > 300:
            detail = detail[:300] + "..."
        raise ApiError(500, f"AudioSR runner failed: {detail}")
    finally:
        upload_path.unlink(missing_ok=True)

    try:
        rel_path = str(output_path.relative_to(server_config.OUTPUT_DIR))
    except ValueError:
        rel_path = output_path.name
    asset_id = f"asset_{uuid.uuid4().hex}"
    asset_service.write_asset_meta(
        asset_id,
        {
            "file_name": output_path.name,
            "relative_path": rel_path,
            "size_bytes": int(output_path.stat().st_size),
            "duration_s": result.get("duration_s"),
            "sample_rate": result.get("sample_rate"),
            "engine": "audiosr",
            "voice": None,
            "model": None,
        },
    )
    audiosr_service.write_sidecar(
        meta_path,
        {
            "engine": "audiosr",
            "params": params,
            "created_at": utc_now().isoformat(timespec="seconds"),
            "output_file": output_path.name,
            "sample_rate": result.get("sample_rate"),
            "duration_s": result.get("duration_s"),
        },
    )
    return AudioEnhanceResponse(
        output_file=str(output_path),
        sample_rate=int(result.get("sample_rate") or 48000),
        duration_s=float(result.get("duration_s") or 0.0),
        asset_id=asset_id,
        engine="audiosr",
    )
