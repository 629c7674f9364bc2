"""API contract freeze: generated spec must match the committed snapshot
(ref: tests/test_openapi_snapshot.py). Regenerate deliberately with
``python -m vocalie_tts_tpu.server.openapi`` when the contract changes."""

import json
from pathlib import Path

import pytest

from vocalie_tts_tpu.server.openapi import generate_openapi

pytestmark = pytest.mark.unit

SNAPSHOT = Path(__file__).resolve().parents[1] / "openapi.json"


def test_openapi_snapshot_up_to_date():
    assert SNAPSHOT.exists(), "openapi.json snapshot missing"
    snapshot = json.loads(SNAPSHOT.read_text(encoding="utf-8"))
    current = json.loads(json.dumps(generate_openapi(), sort_keys=True))
    assert current == snapshot, (
        "API contract drift: regenerate openapi.json with "
        "`python -m vocalie_tts_tpu.server.openapi` if the change is intended"
    )


def test_openapi_covers_reference_surface():
    spec = json.loads(SNAPSHOT.read_text(encoding="utf-8"))
    required_paths = {
        "/v1/health", "/v1/metrics", "/v1/info", "/v1/capabilities",
        "/v1/tts/engines", "/v1/tts/voices", "/v1/tts/engine_schema",
        "/v1/tts/models", "/v1/tts/jobs", "/v1/jobs/{job_id}",
        "/v1/assets/{asset_id}", "/v1/assets/{asset_id}/meta",
        "/v1/presets", "/v1/presets/{preset_id}", "/v1/prep/adjust",
        "/v1/prep/interpret", "/v1/chunks/snapshot", "/v1/chunks/preview",
        "/v1/chunks/apply_marker", "/v1/audio/edit", "/v1/audio/enhance",
        "/v1/refs", "/v1/refs/dir", "/v1/refs/upload", "/v1/refs/{filename}",
        "/v1/glossary", "/v1/backends/{engine_id}/install",
        "/v1/backends/{engine_id}/uninstall", "/v1/backends/{engine_id}/status",
    }
    missing = required_paths - set(spec["paths"])
    assert not missing, f"missing from contract: {sorted(missing)}"


def test_openapi_matches_registered_routes():
    """Every aiohttp route is described in the spec and vice versa."""
    from vocalie_tts_tpu.server.routes import (
        assets, audio, backends, chunks, glossary, health, info,
        jobs, prep, presets, refs, tts,
    )

    registered = set()
    for mod in (assets, audio, backends, chunks, glossary, health, info,
                jobs, prep, presets, refs, tts):
        for route in mod.router.routes:
            registered.add((route.method, route.path))

    spec = json.loads(SNAPSHOT.read_text(encoding="utf-8"))
    documented = {
        (method.upper(), path)
        for path, ops in spec["paths"].items()
        for method in ops
    }
    assert registered == documented, (
        f"undocumented: {sorted(registered - documented)}; "
        f"stale: {sorted(documented - registered)}"
    )
