"""TTS discovery + job creation endpoints (ref: backend/routes/tts.py)."""

from __future__ import annotations

import logging

from vocalie_tts_tpu.engines import (
    canonical_engine_id,
    engine_meta,
    get_backend,
    get_engine_catalog,
    list_backends,
)
from vocalie_tts_tpu.io.refs import list_refs
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.rate_limit import enforce_heavy
from vocalie_tts_tpu.server.routes.refs import get_current_ref_dir
from vocalie_tts_tpu.server.schemas import (
    EngineInfo,
    EngineSchemaField,
    EngineSchemaResponse,
    EnginesResponse,
    JobCreateResponse,
    ModelInfo,
    ModelsResponse,
    TTSJobRequest,
    VoiceInfo,
    VoicesResponse,
)
from vocalie_tts_tpu.server.services.job_service import JOB_STORE
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body
from vocalie_tts_tpu.text import MANUAL_CHUNK_MARKER

router = Router(prefix="/v1")
LOGGER = logging.getLogger("vocalie_api")


def _current_refs() -> list:
    return list_refs(str(get_current_ref_dir()))


def _reference_voices() -> list:
    return [
        VoiceInfo(id=name, label=name, meta={"source": "Ref_audio"})
        for name in _current_refs()
    ]


@router.get("/tts/engines")
def list_engines(request) -> EnginesResponse:
    catalog = get_engine_catalog()
    availability = {backend.id: backend.is_available() for backend in list_backends()}
    engines = []
    for entry in catalog:
        eid = entry["id"]
        backend = get_backend(eid)
        supports_ref = backend.supports_ref_for_engine(eid) if backend else False
        engines.append(
            EngineInfo(
                id=eid,
                label=entry["label"],
                available=availability.get(entry["backend_id"], False),
                supports_ref=supports_ref,
            )
        )
    return EnginesResponse(engines=engines)


@router.get("/tts/voices")
def list_voices(request) -> VoicesResponse:
    engine = request.query.get("engine")
    if not engine:
        LOGGER.warning("tts_voices_missing_engine url=%s", request.path_qs)
        raise ApiError(400, "engine_required")
    meta = engine_meta(engine)
    if meta is None:
        raise ApiError(404, "engine_not_found")
    backend = get_backend(engine)
    supports_ref = backend.supports_ref_for_engine(engine) if backend else False
    if supports_ref:
        voices = _reference_voices()
    elif backend and backend.uses_internal_voices:
        voices = [
            VoiceInfo(
                id=v.id,
                label=v.label,
                language=(v.lang_codes[0] if v.lang_codes else None),
                meta=v.meta,
            )
            for v in backend.list_voices()
        ]
    else:
        voices = []
    return VoicesResponse(engine=engine, voices=voices)


@router.get("/tts/engine_schema")
def get_engine_schema(request) -> EngineSchemaResponse:
    engine = request.query.get("engine")
    if not engine:
        raise ApiError(422, [{"loc": ["query", "engine"], "msg": "field required"}])
    meta = engine_meta(engine) or {"backend_id": engine}
    backend = get_backend(meta.get("backend_id") or engine)
    if backend is None:
        raise ApiError(404, "engine_not_found")
    fields = []
    for key, spec in backend.params_schema().items():
        fields.append(
            EngineSchemaField(
                key=key,
                type=spec.type,
                label=spec.label,
                help=spec.help,
                min=spec.min,
                max=spec.max,
                step=spec.step,
                default=spec.default,
                choices=spec.choices,
                visible_if=spec.visible_if,
                serialize_scope=spec.serialize_scope,
            )
        )
    if getattr(backend, "supports_inter_chunk_gap", False):
        fields.append(
            EngineSchemaField(
                key="chunk_gap_ms",
                type="slider",
                min=0,
                max=2000,
                step=10,
                default=0,
                label="Blanc entre chunks (ms)",
                help="Ajoute un silence entre les chunks.",
                serialize_scope="post",
            )
        )
    capabilities = dict(backend.capabilities(engine_id=engine))
    supports_ref = backend.supports_ref_for_engine(engine)
    capabilities["supports_ref"] = supports_ref
    constraints = {}
    if supports_ref:
        constraints["required"] = ["voice_id"]
    return EngineSchemaResponse(
        engine_id=engine,
        backend_id=meta.get("backend_id") if meta else backend.id,
        capabilities=capabilities,
        fields=fields,
        constraints=constraints,
    )


@router.get("/tts/models")
def list_models(request) -> ModelsResponse:
    engine = request.query.get("engine")
    if not engine:
        raise ApiError(422, [{"loc": ["query", "engine"], "msg": "field required"}])
    backend = get_backend(engine)
    if backend is None:
        raise ApiError(404, "engine_not_found")
    models = [
        ModelInfo(id=m.id, label=m.label, version=m.version, meta=m.meta)
        for m in backend.list_models()
    ]
    return ModelsResponse(engine=engine, models=models)


@router.post("/tts/stream")
async def stream_tts(request):
    """Chunked-transfer WAV streaming off the incremental decoder.

    Additive endpoint (no reference equivalent — upstream's streaming
    flag only streams runner-side). The RIFF/data sizes are the
    0xFFFFFFFF streaming convention; players and ffmpeg read to EOF.
    """
    import asyncio
    import struct

    import numpy as np
    from aiohttp import web as aioweb

    from vocalie_tts_tpu.server.schemas import TTSStreamRequest

    enforce_heavy(request)
    body = await read_validated_body(request, TTSStreamRequest)
    engine_id = body.engine_id or body.engine
    if not engine_id:
        raise ApiError(400, "engine_required")
    engine_id = canonical_engine_id(engine_id)
    backend = get_backend(engine_id)
    if backend is None or engine_meta(engine_id) is None:
        raise ApiError(404, "engine_not_found")
    # permanent incapability (400) reported before transient
    # unavailability (503)
    if not backend.capabilities(engine_id).get("supports_streaming"):
        raise ApiError(400, "engine_does_not_support_streaming")
    if not backend.is_available():
        raise ApiError(503, f"engine {engine_id} unavailable")

    voice = body.voice_id or body.voice or None
    voice_ref_path = None
    if voice and backend.supports_ref_for_engine(engine_id):
        from vocalie_tts_tpu.io.refs import resolve_ref_path

        try:
            voice_ref_path = resolve_ref_path(voice, get_current_ref_dir())
        except (ValueError, FileNotFoundError):
            raise ApiError(400, "reference voice not found")

    params = dict(body.engine_params or {})
    params["engine_id"] = engine_id
    gen = backend.synthesize_stream(
        body.text, voice_ref_path=voice_ref_path, lang=body.language, **params
    )
    sentinel = object()
    # first packet synchronously-awaited so engine errors surface as
    # clean HTTP errors instead of a broken stream
    first = await asyncio.to_thread(next, gen, sentinel)
    if first is sentinel:
        raise ApiError(500, "empty_stream")
    chunk0, sr = first

    resp = aioweb.StreamResponse(
        status=200,
        headers={
            "Content-Type": "audio/wav",
            "Cache-Control": "no-store",
            "X-Sample-Rate": str(int(sr)),
        },
    )
    resp.enable_chunked_encoding()
    await resp.prepare(request)
    # streaming WAV: PCM16 mono, RIFF/data sizes = 0xFFFFFFFF
    header = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, int(sr), int(sr) * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )
    await resp.write(header)

    def _pcm16(audio) -> bytes:
        clipped = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
        return (clipped * 32767.0).astype("<i2").tobytes()

    await resp.write(_pcm16(chunk0))
    while True:
        packet = await asyncio.to_thread(next, gen, sentinel)
        if packet is sentinel:
            break
        await resp.write(_pcm16(packet[0]))
    await resp.write_eof()
    return resp


@router.post("/tts/jobs")
async def create_job(request) -> JobCreateResponse:
    enforce_heavy(request)
    body = await read_validated_body(request, TTSJobRequest)
    engine_id = body.engine_id or body.engine
    if not engine_id:
        raise ApiError(400, "engine_required")
    LOGGER.info(
        "tts_job_request engine=%s text_source=%s", engine_id, body.text_source
    )
    engine_id = canonical_engine_id(engine_id)
    meta = engine_meta(engine_id)
    if meta is None:
        raise ApiError(404, "engine_not_found")
    backend = get_backend(engine_id)
    if backend is None:
        raise ApiError(404, "engine_not_found")
    supports_ref = backend.supports_ref_for_engine(engine_id)

    export = {
        "format": "wav",
        "filename": None,
        "include_timestamp": True,
        "include_model": False,
    }
    if body.export:
        export.update(body.export.model_dump())
    if export.get("format") != "wav":
        raise ApiError(400, "only_wav_supported")

    voice = body.voice_id or body.voice or None
    if supports_ref:
        refs = _current_refs()
        if voice is None or str(voice).strip() == "":
            if refs:
                voice = refs[0]
                LOGGER.info("default_voice_applied engine=%s voice=%s", engine_id, voice)
            else:
                raise ApiError(400, "no reference voice available")
        elif voice not in refs:
            raise ApiError(400, "reference voice not found")
    else:
        voice = None

    options = dict(body.options or {})
    if body.engine_params:
        options.update(body.engine_params)
    post_params = dict(body.post_params or {})
    gap_ms = post_params.get("chunk_gap_ms")
    if gap_ms is None:
        gap_ms = post_params.get("chatterbox_gap_ms")

    options = backend.resolve_engine_params(engine_id, options)

    if backend.supports_inter_chunk_gap and gap_ms is not None:
        options["inter_chunk_gap_ms"] = int(gap_ms)

    if body.voice_id and not supports_ref:
        options.setdefault("voice_id", body.voice_id)

    text = body.text
    if text is None:
        if body.text_source == "raw":
            text = body.text_raw
        elif body.text_source == "adjusted":
            text = body.text_adjusted or body.text_raw
        elif body.text_source == "interpreted":
            text = body.text_interpreted or body.text_adjusted or body.text_raw
        elif body.text_source == "snapshot":
            text = (
                body.text_snapshot
                or body.text_interpreted
                or body.text_adjusted
                or body.text_raw
            )
        else:
            text = body.text_interpreted or body.text_adjusted or body.text_raw

    direction_enabled = bool(body.direction.enabled) if body.direction else False
    direction_marker = body.direction.chunk_marker if body.direction else MANUAL_CHUNK_MARKER
    if body.text_snapshot:
        snapshot_text = body.text_snapshot
        if body.chunk_markers:
            for pos in sorted(set(body.chunk_markers), reverse=True):
                pos = max(0, min(int(pos), len(snapshot_text)))
                snapshot_text = (
                    f"{snapshot_text[:pos]}\n{direction_marker}\n{snapshot_text[pos:]}"
                )
        text = snapshot_text
        if direction_marker in snapshot_text:
            direction_enabled = True

    if len(text or "") > server_config.MAX_TEXT_CHARS:
        raise ApiError(413, "text_too_large")

    editing_payload = body.editing.model_dump() if body.editing else {}
    if body.edit_params:
        editing_payload = dict(body.edit_params)
    if editing_payload:
        editing_payload.setdefault("enabled", True)

    payload = {
        "text": text or "",
        "engine": engine_id,
        "voice": voice,
        "model": body.model,
        "language": body.language,
        "direction_enabled": direction_enabled,
        "direction_marker": direction_marker,
        "options": options,
        "export": export,
        "editing": editing_payload or {"enabled": False},
    }
    job = JOB_STORE.create_job(payload)
    if job.get("status") == "rejected":
        raise ApiError(429, job.get("error") or "rate_limited")
    return JobCreateResponse(job_id=job["job_id"], status=job["status"])
