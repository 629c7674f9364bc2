"""Asset metadata store: JSON sidecars under output/.assets
(ref: backend/services/asset_service.py)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.security import safe_filename
from vocalie_tts_tpu.server.utils import utc_now

META_SUFFIX = ".json"


def _meta_path(asset_id: str) -> Path:
    return server_config.ASSETS_META_DIR / f"{safe_filename(str(asset_id))}{META_SUFFIX}"


def write_asset_meta(asset_id: str, payload: Dict[str, Any]) -> Dict[str, Any]:
    meta = dict(payload)
    meta["asset_id"] = asset_id
    meta.setdefault("created_at", utc_now().isoformat(timespec="seconds"))
    path = _meta_path(asset_id)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(meta, indent=2, ensure_ascii=True) + "\n", encoding="utf-8")
    return meta


def get_asset_meta(asset_id: str) -> Optional[Dict[str, Any]]:
    try:
        path = _meta_path(asset_id)
    except ValueError:
        return None
    if not path.exists():
        return None
    return json.loads(path.read_text(encoding="utf-8"))


def resolve_asset_path(meta: Dict[str, Any]) -> Optional[Path]:
    rel = meta.get("relative_path")
    if rel:
        candidate = server_config.OUTPUT_DIR / rel
        if candidate.exists():
            return candidate
    file_name = meta.get("file_name")
    if file_name:
        candidate = server_config.OUTPUT_DIR / file_name
        if candidate.exists():
            return candidate
    return None
