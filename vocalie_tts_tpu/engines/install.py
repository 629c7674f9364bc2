"""Engine install lifecycle: weight fetch + AOT compile warm.

Reinterprets the reference's venv-install surface (ref:
backend_install/installer.py, backend_install/status.py) for the
TPU-native stack: "installed" means the weight bundle is present under
``.assets/<engine>/weights`` and the engine's jitted programs compile.
Keeps the /v1/backends/* API meaningful for the unchanged frontend.

With no network egress (or for tests) ``VOCALIE_INSTALL_MODE=init``
materializes random-init weights via the engine runtime, which is also
how dev benchmarking works.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Tuple

from vocalie_tts_tpu.engines import assets

#: engines the install API manages (ref: backend_install/manifests.py)
INSTALLABLE_ENGINES = ("piper", "chatterbox", "qwen3", "cosyvoice", "xtts", "audiosr")

#: How each engine acquires real weights in this (no-egress) deployment.
#: The reference prefetches from the HF hub at install time (ref:
#: tts_backends/qwen3_prefetch.py:44-64 snapshot_download); here the
#: equivalent is a local-file import: `vocalie-backend convert-hf` maps
#: a downloaded checkpoint onto the engine's weight store, and install
#: otherwise materializes init weights. Surfaced through
#: /v1/backends/*/status and /v1/capabilities so clients can tell the
#: delta apart from a missing feature.
WEIGHT_ACQUISITION = {
    engine: "convert-hf (local checkpoint import); hub prefetch requires egress"
    for engine in INSTALLABLE_ENGINES
}


def backend_status(engine_id: str) -> Dict:
    """Install/availability status for one engine."""
    if engine_id not in INSTALLABLE_ENGINES:
        return {
            "engine_id": engine_id,
            "installed": False,
            "available": False,
            "reason": "unknown_engine",
        }
    installed = assets.weights_installed(engine_id)
    ready = assets.engine_ready(engine_id)
    manifest = _read_manifest(engine_id)
    return {
        "engine_id": engine_id,
        "installed": installed,
        "available": ready,
        "reason": None if ready else assets.unready_reason(engine_id),
        "weights_dir": str(assets.weights_dir(engine_id)),
        "weight_acquisition": WEIGHT_ACQUISITION[engine_id],
        "manifest": manifest,
    }


def _read_manifest(engine_id: str) -> Dict:
    path = assets.engine_assets_dir(engine_id) / "install_manifest.json"
    if path.exists():
        try:
            return json.loads(path.read_text(encoding="utf-8"))
        except json.JSONDecodeError:
            return {}
    return {}


def run_install(engine_id: str) -> Tuple[bool, List[str]]:
    """Install an engine: materialize weights, then warm the compile cache.

    Modes (VOCALIE_INSTALL_MODE):
      - "init" (default in this environment): write random-init weights
        through the engine runtime — full device pipeline works.
      - "download": fetch published checkpoints (requires network).
    """
    logs: List[str] = []
    if engine_id not in INSTALLABLE_ENGINES:
        return False, [f"unknown engine: {engine_id}"]

    mode = os.environ.get("VOCALIE_INSTALL_MODE", "init")
    t0 = time.monotonic()
    weights = assets.weights_dir(engine_id)
    weights.mkdir(parents=True, exist_ok=True)
    try:
        if mode == "download":
            logs.append("download mode requires network egress; not available")
            return False, logs
        logs.append(f"initializing weights for {engine_id} under {weights}")
        _materialize_init_weights(engine_id, logs)
    except Exception as exc:
        shutil.rmtree(weights, ignore_errors=True)
        logs.append(f"install failed: {exc}")
        return False, logs

    manifest = {
        "engine_id": engine_id,
        "mode": mode,
        "installed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "elapsed_s": round(time.monotonic() - t0, 2),
    }
    (assets.engine_assets_dir(engine_id) / "install_manifest.json").write_text(
        json.dumps(manifest, indent=2) + "\n", encoding="utf-8"
    )
    logs.append(f"installed {engine_id} in {manifest['elapsed_s']}s")

    from vocalie_tts_tpu.engines import invalidate_availability_cache

    invalidate_availability_cache()
    return True, logs


def _materialize_init_weights(engine_id: str, logs: List[str]) -> None:
    """Create and save random-init weights through the model runtime."""
    runtime_factories = {
        "piper": ("vocalie_tts_tpu.models.vits.runtime", "VITSRuntime"),
        "chatterbox": ("vocalie_tts_tpu.models.chatterbox.runtime", "ChatterboxRuntime"),
        "qwen3": ("vocalie_tts_tpu.models.lmtts.runtime", "LMTTSRuntime"),
        "cosyvoice": ("vocalie_tts_tpu.models.cosyvoice.runtime", "CosyVoiceRuntime"),
        "xtts": ("vocalie_tts_tpu.models.xtts.runtime", "XTTSRuntime"),
        "audiosr": ("vocalie_tts_tpu.models.audiosr.runtime", "AudioSRRuntime"),
    }
    module_name, class_name = runtime_factories[engine_id]
    import importlib

    module = importlib.import_module(module_name)
    runtime_cls = getattr(module, class_name)
    runtime = runtime_cls.create(
        assets_dir=assets.engine_assets_dir(engine_id), force_init=True
    )
    runtime.save_weights()
    logs.append(f"weights saved for {engine_id}")


def run_uninstall(engine_id: str) -> Tuple[bool, str]:
    target = assets.engine_assets_dir(engine_id)
    if not target.exists():
        return False, f"Backend {engine_id} not found"
    shutil.rmtree(target)
    from vocalie_tts_tpu.engines import invalidate_availability_cache

    invalidate_availability_cache()
    return True, f"Removed {target}"


__all__ = ["INSTALLABLE_ENGINES", "backend_status", "run_install", "run_uninstall"]
