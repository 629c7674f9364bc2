"""Wire-compat proof: diff our openapi.json against the reference's.

The reference frontend (Next.js app) and macOS client consume the
contract frozen in the upstream ``openapi.json``; this test demonstrates
— rather than asserts — that the TPU server speaks the same wire
protocol, by diffing the two specs with an explicit whitelist of
accepted (additive-only) deltas. ref: openapi.json (3,353 lines),
tests/test_openapi_snapshot.py.
"""

import json
import os
from pathlib import Path

import pytest

REPO_SPEC = Path(__file__).resolve().parents[1] / "openapi.json"
REF_SPEC = Path(os.environ.get("VOCALIE_REF_OPENAPI", "/root/reference/openapi.json"))

# Additive deltas this framework intentionally ships on top of the
# reference contract. Anything else is a wire-compat failure.
ADDITIVE_ENDPOINTS = {("post", "/v1/tts/stream")}  # chunked-WAV streaming
ADDITIVE_SCHEMAS = {"TTSStreamRequest"}

pytestmark = pytest.mark.skipif(
    not REF_SPEC.exists(), reason="reference openapi.json not present"
)


@pytest.fixture(scope="module")
def specs():
    return (
        json.loads(REPO_SPEC.read_text(encoding="utf-8")),
        json.loads(REF_SPEC.read_text(encoding="utf-8")),
    )


def _ops(spec):
    return {
        (method, path): op
        for path, methods in spec["paths"].items()
        for method, op in methods.items()
    }


def test_endpoint_surface_is_superset_only(specs):
    ours, ref = specs
    our_ops, ref_ops = set(_ops(ours)), set(_ops(ref))
    missing = ref_ops - our_ops
    assert not missing, f"reference endpoints we do not serve: {sorted(missing)}"
    extra = our_ops - ref_ops - ADDITIVE_ENDPOINTS
    assert not extra, f"unwhitelisted additive endpoints: {sorted(extra)}"


def test_parameters_match_reference(specs):
    ours, ref = specs
    our_ops = _ops(ours)

    def norm(op):
        return sorted(
            (
                p.get("name"),
                p.get("in"),
                p.get("required", False),
                json.dumps(p.get("schema"), sort_keys=True),
            )
            for p in op.get("parameters", [])
        )

    for key, ref_op in _ops(ref).items():
        assert norm(ref_op) == norm(our_ops[key]), f"parameter mismatch on {key}"


def test_response_codes_and_body_media_match(specs):
    ours, ref = specs
    our_ops = _ops(ours)
    for key, ref_op in _ops(ref).items():
        op = our_ops[key]
        assert sorted(ref_op.get("responses", {})) == sorted(
            op.get("responses", {})
        ), f"response codes mismatch on {key}"
        ref_media = sorted(ref_op.get("requestBody", {}).get("content", {}))
        our_media = sorted(op.get("requestBody", {}).get("content", {}))
        assert ref_media == our_media, f"request media mismatch on {key}"


def test_schema_shapes_match_reference(specs):
    ours, ref = specs
    our_schemas = ours["components"]["schemas"]
    ref_schemas = ref["components"]["schemas"]

    missing = set(ref_schemas) - set(our_schemas)
    assert not missing, f"reference schemas we do not declare: {sorted(missing)}"
    extra = set(our_schemas) - set(ref_schemas) - ADDITIVE_SCHEMAS
    assert not extra, f"unwhitelisted additive schemas: {sorted(extra)}"

    for name, ref_schema in ref_schemas.items():
        schema = our_schemas[name]
        assert set(schema.get("properties", {})) == set(
            ref_schema.get("properties", {})
        ), f"property-name mismatch in schema {name}"
        assert sorted(schema.get("required", [])) == sorted(
            ref_schema.get("required", [])
        ), f"required-field mismatch in schema {name}"
