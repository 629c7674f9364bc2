"""Voice reference endpoints (ref: backend/routes/refs.py)."""

from __future__ import annotations

import os
from pathlib import Path

from vocalie_tts_tpu.io.refs import ALLOWED_EXTENSIONS, _ref_dir, list_refs
from vocalie_tts_tpu.server.schemas import RefDirConfig, RefListResponse
from vocalie_tts_tpu.server.security import safe_filename
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body

router = Router(prefix="/v1")

# Mutable, process-level configured reference directory.
_current_ref_dir: str = os.environ.get(
    "VOCALIE_REF_DIR", os.environ.get("CHATTERBOX_REF_DIR", "")
)


def get_current_ref_dir() -> Path:
    return _ref_dir(_current_ref_dir or None)


@router.get("/refs")
def list_references(request) -> RefListResponse:
    ref_dir = get_current_ref_dir()
    return RefListResponse(directory=str(ref_dir), files=list_refs(str(ref_dir)))


@router.put("/refs/dir")
async def set_ref_directory(request) -> RefDirConfig:
    global _current_ref_dir
    body = await read_validated_body(request, RefDirConfig)
    target = Path(body.directory).expanduser()
    if not target.is_absolute():
        target = Path.cwd() / target
    try:
        target.mkdir(parents=True, exist_ok=True)
    except OSError as exc:
        raise ApiError(400, f"Cannot create directory: {exc}")
    _current_ref_dir = str(target)
    # propagate to io.refs so the job thread's voice resolution honors
    # the configured directory (see io/refs.py set_runtime_ref_dir)
    from vocalie_tts_tpu.io.refs import set_runtime_ref_dir

    set_runtime_ref_dir(str(target))
    return RefDirConfig(directory=str(target))


@router.post("/refs/upload")
async def upload_references(request) -> RefListResponse:
    content_type = request.headers.get("Content-Type", "")
    if not content_type.lower().startswith("multipart/"):
        raise ApiError(422, "files field required (multipart/form-data)")
    reader = await request.multipart()
    ref_dir = get_current_ref_dir()
    saved = 0
    async for part in reader:
        filename = part.filename
        if not filename:
            continue
        ext = Path(filename).suffix.lower()
        if ext not in ALLOWED_EXTENSIONS:
            continue
        content = await part.read(decode=False)
        if not content:
            continue
        stem = Path(filename).stem
        candidate = ref_dir / Path(filename).name
        counter = 1
        while candidate.exists():
            candidate = ref_dir / f"{stem}_{counter:02d}{ext}"
            counter += 1
        candidate.write_bytes(content)
        saved += 1
    if saved == 0 and not list_refs(str(ref_dir)):
        pass  # empty uploads are tolerated; response reflects directory state
    return RefListResponse(directory=str(ref_dir), files=list_refs(str(ref_dir)))


@router.delete("/refs/{filename}")
def delete_reference(request) -> dict:
    try:
        safe_name = safe_filename(request.match_info["filename"])
    except ValueError:
        raise ApiError(400, "invalid_name")
    target = get_current_ref_dir() / safe_name
    if not target.exists():
        raise ApiError(404, "File not found")
    target.unlink()
    return {"deleted": safe_name}
