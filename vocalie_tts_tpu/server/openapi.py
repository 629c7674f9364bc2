"""OpenAPI 3.1 spec generation for the /v1/* contract.

The reference freezes its API with a checked-in ``openapi.json``
contract-tested in CI (ref: tests/test_openapi_snapshot.py). This
module generates the equivalent spec from the route tables and the
pydantic models; ``tests/test_openapi_snapshot.py`` diffs it against
the committed snapshot so accidental contract drift fails CI.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Type

from pydantic import BaseModel
from pydantic.json_schema import models_json_schema

from vocalie_tts_tpu import __version__
from vocalie_tts_tpu.server import schemas as S

# (method, path) → (request model, response model, public?)
_ROUTE_MODELS: Dict[tuple, tuple] = {
    ("GET", "/v1/health"): (None, S.HealthResponse, True),
    ("GET", "/v1/metrics"): (None, S.MetricsResponse, False),
    ("GET", "/v1/info"): (None, S.InfoResponse, False),
    ("GET", "/v1/capabilities"): (None, S.CapabilitiesResponse, False),
    ("GET", "/v1/tts/engines"): (None, S.EnginesResponse, False),
    ("GET", "/v1/tts/voices"): (None, S.VoicesResponse, False),
    ("GET", "/v1/tts/engine_schema"): (None, S.EngineSchemaResponse, False),
    ("GET", "/v1/tts/models"): (None, S.ModelsResponse, False),
    ("POST", "/v1/tts/jobs"): (S.TTSJobRequest, S.JobCreateResponse, False),
    ("POST", "/v1/tts/stream"): (S.TTSStreamRequest, None, False),
    ("GET", "/v1/jobs/{job_id}"): (None, S.JobStatusResponse, False),
    ("DELETE", "/v1/jobs/{job_id}"): (None, S.JobCancelResponse, False),
    ("GET", "/v1/assets/{asset_id}"): (None, None, False),
    ("GET", "/v1/assets/{asset_id}/meta"): (None, S.AssetMetaResponse, False),
    ("GET", "/v1/presets"): (None, S.PresetListResponse, False),
    ("GET", "/v1/presets/{preset_id}"): (None, S.PresetResponse, False),
    ("POST", "/v1/presets"): (S.PresetCreateRequest, S.PresetMutationResponse, False),
    ("PUT", "/v1/presets/{preset_id}"): (S.PresetUpdateRequest, S.PresetMutationResponse, False),
    ("DELETE", "/v1/presets/{preset_id}"): (None, S.PresetMutationResponse, False),
    ("POST", "/v1/prep/adjust"): (S.PrepAdjustRequest, S.PrepAdjustResponse, False),
    ("POST", "/v1/prep/interpret"): (S.PrepInterpretRequest, S.PrepInterpretResponse, False),
    ("POST", "/v1/chunks/snapshot"): (S.ChunkSnapshotRequest, S.ChunkSnapshotResponse, False),
    ("POST", "/v1/chunks/preview"): (S.ChunkPreviewRequest, S.ChunkPreviewResponse, False),
    ("POST", "/v1/chunks/apply_marker"): (S.ChunkMarkerRequest, S.ChunkMarkerResponse, False),
    ("POST", "/v1/audio/edit"): (S.AudioEditRequest, S.AudioEditResponse, False),
    ("POST", "/v1/audio/enhance"): (None, S.AudioEnhanceResponse, False),
    ("GET", "/v1/refs"): (None, S.RefListResponse, False),
    ("PUT", "/v1/refs/dir"): (S.RefDirConfig, S.RefDirConfig, False),
    ("POST", "/v1/refs/upload"): (None, S.RefListResponse, False),
    ("DELETE", "/v1/refs/{filename}"): (None, None, False),
    ("GET", "/v1/glossary"): (None, S.GlossaryListResponse, False),
    ("PUT", "/v1/glossary"): (S.GlossaryUpsertRequest, S.GlossaryEntry, False),
    ("DELETE", "/v1/glossary"): (None, S.GlossaryEntry, False),
    ("POST", "/v1/backends/{engine_id}/install"): (None, S.BackendInstallResponse, False),
    ("DELETE", "/v1/backends/{engine_id}/uninstall"): (None, S.BackendInstallResponse, False),
    ("GET", "/v1/backends/{engine_id}/status"): (None, None, False),
}


# Query parameters per operation: (name, required, json schema, description).
# Matches the reference contract (ref: openapi.json — FastAPI emits one
# parameter entry per handler query arg).
_QUERY_PARAMS: Dict[tuple, list] = {
    ("GET", "/v1/tts/voices"): [
        ("engine", False, {"anyOf": [{"type": "string"}, {"type": "null"}], "title": "Engine"}, None)
    ],
    ("GET", "/v1/tts/engine_schema"): [
        ("engine", True, {"type": "string", "title": "Engine"}, None)
    ],
    ("GET", "/v1/tts/models"): [
        ("engine", True, {"type": "string", "title": "Engine"}, None)
    ],
    ("DELETE", "/v1/glossary"): [
        (
            "word",
            True,
            {"type": "string", "description": "Word to delete", "title": "Word"},
            "Word to delete",
        )
    ],
}

# Multipart endpoints: generated body-schema name → properties. The
# field set and defaults mirror the handlers in routes/refs.py and
# routes/audio.py (contract-matched to the reference's Body_* schemas).
_MULTIPART_BODIES: Dict[tuple, tuple] = {
    ("POST", "/v1/refs/upload"): (
        "Body_upload_references_v1_refs_upload_post",
        {
            "properties": {
                "files": {
                    "items": {"type": "string", "format": "binary"},
                    "type": "array",
                    "title": "Files",
                }
            },
            "type": "object",
            "required": ["files"],
            "title": "Body_upload_references_v1_refs_upload_post",
        },
    ),
    ("POST", "/v1/audio/enhance"): (
        "Body_enhance_audio_v1_audio_enhance_post",
        {
            "properties": {
                "file": {"type": "string", "format": "binary", "title": "File"},
                "engine": {"type": "string", "title": "Engine", "default": "audiosr"},
                "ddim_steps": {"type": "integer", "title": "Ddim Steps", "default": 100},
                "guidance_scale": {"type": "number", "title": "Guidance Scale", "default": 2.5},
                "seed": {"type": "integer", "title": "Seed", "default": 0},
                "chunk_size": {"type": "integer", "title": "Chunk Size", "default": 32768},
                "overlap": {"type": "integer", "title": "Overlap", "default": 1024},
                "multiband_ensemble": {
                    "type": "boolean",
                    "title": "Multiband Ensemble",
                    "default": False,
                },
                "input_cutoff": {"type": "integer", "title": "Input Cutoff", "default": 8000},
            },
            "type": "object",
            "required": ["file"],
            "title": "Body_enhance_audio_v1_audio_enhance_post",
        },
    ),
}

# Validation-error schemas (the 422 wire shape the handlers emit).
_VALIDATION_SCHEMAS = {
    "HTTPValidationError": {
        "properties": {
            "detail": {
                "items": {"$ref": "#/components/schemas/ValidationError"},
                "type": "array",
                "title": "Detail",
            }
        },
        "type": "object",
        "title": "HTTPValidationError",
    },
    "ValidationError": {
        "properties": {
            "loc": {
                "items": {"anyOf": [{"type": "string"}, {"type": "integer"}]},
                "type": "array",
                "title": "Location",
            },
            "msg": {"type": "string", "title": "Message"},
            "type": {"type": "string", "title": "Error Type"},
        },
        "type": "object",
        "required": ["loc", "msg", "type"],
        "title": "ValidationError",
    },
}


def _path_params(path: str) -> list:
    out = []
    for seg in path.split("/"):
        if seg.startswith("{") and seg.endswith("}"):
            name = seg[1:-1]
            title = " ".join(w.capitalize() for w in name.split("_"))
            out.append((name, True, {"type": "string", "title": title}, None))
    return out


def _ref_name(model: Type[BaseModel]) -> str:
    return model.__name__


def generate_openapi() -> dict:
    models = []
    for req, resp, _pub in _ROUTE_MODELS.values():
        for model in (req, resp):
            if model is not None and model not in models:
                models.append(model)

    _mapping, definitions = models_json_schema(
        [(m, "validation") for m in models],
        ref_template="#/components/schemas/{model}",
    )
    components = definitions.get("$defs", {})

    paths: Dict[str, dict] = {}
    for (method, path), (req, resp, public) in sorted(_ROUTE_MODELS.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        op: dict = {"responses": {"200": {"description": "OK"}}}
        if resp is not None:
            op["responses"]["200"]["content"] = {
                "application/json": {
                    "schema": {"$ref": f"#/components/schemas/{_ref_name(resp)}"}
                }
            }
        if req is not None:
            op["requestBody"] = {
                "required": True,
                "content": {
                    "application/json": {
                        "schema": {"$ref": f"#/components/schemas/{_ref_name(req)}"}
                    }
                },
            }
        body_name_schema = _MULTIPART_BODIES.get((method, path))
        if body_name_schema is not None:
            name, _schema = body_name_schema
            op["requestBody"] = {
                "required": True,
                "content": {
                    "multipart/form-data": {
                        "schema": {"$ref": f"#/components/schemas/{name}"}
                    }
                },
            }
        params = [("path", *p) for p in _path_params(path)] + [
            ("query", *q) for q in _QUERY_PARAMS.get((method, path), [])
        ]
        if params:
            op["parameters"] = [
                {
                    "name": name,
                    "in": loc,
                    "required": required,
                    "schema": schema,
                    **({"description": desc} if desc else {}),
                }
                for loc, name, required, schema, desc in params
            ]
        # Any operation that validates inputs (params or body) can emit
        # the structured 422 — declare it, matching the handlers'
        # FastAPI-shaped {"detail": [{loc, msg, type}]} error payloads.
        if params or "requestBody" in op:
            op["responses"]["422"] = {
                "description": "Validation Error",
                "content": {
                    "application/json": {
                        "schema": {"$ref": "#/components/schemas/HTTPValidationError"}
                    }
                },
            }
        if not public:
            op["security"] = [{"ApiKeyAuth": []}, {"BearerAuth": []}]
        paths.setdefault(path, {})[method.lower()] = op

    components.update(_VALIDATION_SCHEMAS)
    for _name, schema in _MULTIPART_BODIES.values():
        components[_name] = schema

    return {
        "openapi": "3.1.0",
        "info": {"title": "Vocalie TTS API (TPU)", "version": __version__},
        "paths": paths,
        "components": {
            "schemas": components,
            "securitySchemes": {
                "ApiKeyAuth": {"type": "apiKey", "in": "header", "name": "X-API-Key"},
                "BearerAuth": {"type": "http", "scheme": "bearer"},
            },
        },
    }


def write_snapshot(path: Optional[Path] = None) -> Path:
    path = path or Path(__file__).resolve().parents[2] / "openapi.json"
    spec = generate_openapi()
    path.write_text(json.dumps(spec, indent=2, sort_keys=True) + "\n", encoding="utf-8")
    return path


if __name__ == "__main__":
    print(write_snapshot())
