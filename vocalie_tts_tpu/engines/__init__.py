"""Engine registry — auto-discovery via TTSEngine._REGISTRY.

Importing this package imports every engine module, which triggers
``__init_subclass__`` self-registration, then rebuilds the catalog
(ref: tts_backends/__init__.py:22-29). Adding an engine = one import.

Availability results are cached with a short TTL: even though the
in-process probes are far cheaper than the reference's venv-subprocess
import probes (3–8 s, ref: tts_backends/__init__.py:35-44), a probe may
still stat weight directories, and /v1/health is polled every 5 s by
the menu-bar client.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional

from vocalie_tts_tpu.engines.base import (
    BackendUnavailableError,
    EngineUnavailableError,
    ModelInfo,
    ParamSpec,
    TTSEngine,
    VoiceInfo,
)
from vocalie_tts_tpu.engines.residency import RESIDENCY  # noqa: F401
from vocalie_tts_tpu.engines.catalog import (
    ENGINE_ALIAS_MAP,
    PROTECTED_BACKENDS,
    canonical_engine_id,
    engine_meta,
    get_engine_catalog,
    is_legacy_alias,
    rebuild_engine_catalog,
)

# Every process that touches an engine gets the persistent compile
# cache — restarts must hit cached executables, not recompile
# (round-4 verdict #3: warm start was 159 s without this).
from vocalie_tts_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

# Import engine modules so they self-register.
from vocalie_tts_tpu.engines.piper import PiperEngine  # noqa: F401
from vocalie_tts_tpu.engines.chatterbox import ChatterboxEngine  # noqa: F401
from vocalie_tts_tpu.engines.qwen3 import Qwen3Engine  # noqa: F401
from vocalie_tts_tpu.engines.cosyvoice import CosyVoiceEngine  # noqa: F401
from vocalie_tts_tpu.engines.xtts import XTTSEngine  # noqa: F401
from vocalie_tts_tpu.utils.env import bool_env

if bool_env("VOCALIE_ENABLE_FAKE_ENGINE"):
    from vocalie_tts_tpu.engines.fake import FakeEngine  # noqa: F401

rebuild_engine_catalog()


_AVAILABILITY_TTL_S = 30.0
_availability_cache: Dict[str, tuple] = {}
_availability_lock = threading.Lock()


def enable_fake_engine() -> None:
    """Register the fake engine at runtime (used by the test suite)."""
    from vocalie_tts_tpu.engines.fake import FakeEngine  # noqa: F401

    rebuild_engine_catalog()
    invalidate_availability_cache()


def list_backends() -> List[TTSEngine]:
    """All registered engines (singleton instances)."""
    return [cls.instance() for cls in TTSEngine._REGISTRY.values()]


def get_backend(engine_id: str) -> Optional[TTSEngine]:
    """Resolve an engine/variant id to its engine instance."""
    for cls in TTSEngine._REGISTRY.values():
        if cls.id == engine_id:
            return cls.instance()
    for cls in TTSEngine._REGISTRY.values():
        inst = cls.instance()
        if inst.supports_engine_id(engine_id):
            return inst
    return None


def available_backend_ids() -> Dict[str, bool]:
    """Availability map for all engines, cached for a short TTL."""
    now = time.monotonic()
    with _availability_lock:
        cached = _availability_cache.get("all")
        if cached is not None:
            ts, value = cached
            if now - ts < _AVAILABILITY_TTL_S:
                return value
        value = {cls.id: cls.is_available() for cls in TTSEngine._REGISTRY.values()}
        _availability_cache["all"] = (now, value)
        return value


def invalidate_availability_cache() -> None:
    """Drop cached availability (after install/uninstall)."""
    with _availability_lock:
        _availability_cache.clear()


__all__ = [
    "TTSEngine",
    "ParamSpec",
    "ModelInfo",
    "VoiceInfo",
    "EngineUnavailableError",
    "BackendUnavailableError",
    "ENGINE_ALIAS_MAP",
    "PROTECTED_BACKENDS",
    "RESIDENCY",
    "canonical_engine_id",
    "engine_meta",
    "get_engine_catalog",
    "is_legacy_alias",
    "rebuild_engine_catalog",
    "enable_fake_engine",
    "list_backends",
    "get_backend",
    "available_backend_ids",
    "invalidate_availability_cache",
]
