"""Qwen3-TTS weight prefetch (ref: tts_backends/qwen3_prefetch.py:1-69).

Downloads HF snapshots of the Qwen3-TTS model family into the assets
dir's HF cache. Contract mirrors the reference script: same default
model set, same env vars (``VOCALIE_QWEN3_ASSETS_DIR``,
``VOCALIE_QWEN3_PREFETCH_MODELS``), same exit codes (0 ok, 2 hub
import failure, 3 no models) plus 4 for a download failure.

TPU delta: prefetch is step one of two — the downloaded torch
checkpoints still go through ``vocalie-backend convert-hf`` to become
the npz weight store the jitted runtimes load. In a no-egress image
set ``HF_HUB_OFFLINE=1`` and pre-seed the cache (or skip prefetch and
feed convert-hf a local checkout); ``snapshot_download`` then resolves
purely from the local cache.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

try:
    from vocalie_tts_tpu.engines.qwen3 import QWEN3_DEFAULT_MODELS

    DEFAULT_MODELS: list = list(QWEN3_DEFAULT_MODELS.values())
except ImportError:  # standalone execution without the package on path
    DEFAULT_MODELS = [
        "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
        "Qwen/Qwen3-TTS-12Hz-1.7B-Base",
        "Qwen/Qwen3-TTS-12Hz-1.7B-VoiceDesign",
    ]


def _parse_models(value) -> list:
    if not value:
        return list(DEFAULT_MODELS)
    return [item.strip() for item in value.split(",") if item.strip()]


def prefetch_models(models, assets_dir=None, *, local_only=None):
    """Fetch each model snapshot; returns [(model_id, snapshot_path)].

    ``local_only=None`` follows ``HF_HUB_OFFLINE``; raises on the first
    model that can neither download nor resolve from cache.
    """
    kwargs = {}
    if assets_dir:
        assets_dir = Path(assets_dir).expanduser()
        assets_dir.mkdir(parents=True, exist_ok=True)
        hub = str(assets_dir / ".hf" / "hub")
        # env for child processes (reference parity); cache_dir for this
        # process — huggingface_hub freezes the env paths at import time
        os.environ.setdefault("HF_HOME", str(assets_dir / ".hf"))
        os.environ["HUGGINGFACE_HUB_CACHE"] = hub
        kwargs["cache_dir"] = hub

    from huggingface_hub import snapshot_download

    if local_only is not None:
        kwargs["local_files_only"] = bool(local_only)
    out = []
    for model_id in models:
        path = snapshot_download(repo_id=model_id, **kwargs)
        out.append((model_id, path))
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Prefetch Qwen3-TTS model weights.")
    parser.add_argument(
        "--models", default=None,
        help="Comma-separated HF model ids (default: the qwen3 engine's model set).",
    )
    parser.add_argument(
        "--assets-dir", default=None,
        help="Override assets dir used for the HF cache.",
    )
    args = parser.parse_args(argv)

    assets_dir = args.assets_dir or os.environ.get("VOCALIE_QWEN3_ASSETS_DIR") or None

    try:
        import huggingface_hub  # noqa: F401
    except Exception as exc:
        sys.stderr.write(f"prefetch_import_failed: {exc}\n")
        return 2

    models = _parse_models(args.models or os.environ.get("VOCALIE_QWEN3_PREFETCH_MODELS"))
    if not models:
        sys.stderr.write("no_models_specified\n")
        return 3

    try:
        for model_id, path in prefetch_models(models, assets_dir):
            print(f"prefetched {model_id} -> {path}")
    except Exception as exc:
        sys.stderr.write(f"prefetch_failed: {exc}\n")
        return 4
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
