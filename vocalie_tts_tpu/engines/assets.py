"""Engine asset (weights) locations and install state.

The reference's ".venvs/<engine> installed?" notion (ref:
backend_install/status.py:38-63) maps here to "is the engine's weight
bundle present under .assets/<engine>/weights?". Installation is a
weight fetch + AOT compile warm, not a venv build.

Dev mode: ``VOCALIE_ALLOW_RANDOM_WEIGHTS=1`` lets every JAX engine
construct randomly-initialized weights on first use, so the full
device pipeline runs (and can be benchmarked) without real
checkpoints.
"""

from __future__ import annotations

import os
from pathlib import Path
from vocalie_tts_tpu.utils.env import bool_env


def base_dir() -> Path:
    env = os.environ.get("VOCALIE_ASSETS_DIR")
    if env:
        return Path(env).expanduser()
    return Path(__file__).resolve().parents[2] / ".assets"


def engine_assets_dir(engine_id: str) -> Path:
    return base_dir() / engine_id


def weights_dir(engine_id: str) -> Path:
    return engine_assets_dir(engine_id) / "weights"


def weights_installed(engine_id: str) -> bool:
    d = weights_dir(engine_id)
    return d.is_dir() and any(d.iterdir())


def random_weights_allowed() -> bool:
    return bool_env("VOCALIE_ALLOW_RANDOM_WEIGHTS")


def engine_ready(engine_id: str) -> bool:
    return weights_installed(engine_id) or random_weights_allowed()


def unready_reason(engine_id: str) -> str | None:
    if engine_ready(engine_id):
        return None
    return (
        f"Poids absents pour '{engine_id}' (attendus sous {weights_dir(engine_id)}); "
        "installez le backend ou exportez VOCALIE_ALLOW_RANDOM_WEIGHTS=1."
    )


__all__ = [
    "base_dir",
    "engine_assets_dir",
    "weights_dir",
    "weights_installed",
    "random_weights_allowed",
    "engine_ready",
    "unready_reason",
]
