"""Engine protocol: self-describing, in-process JAX TTS engines.

Mirrors the reference backend contract (ref: tts_backends/base.py:50-255
— capability flags, ParamSpec schemas, engine variants, auto-registry)
but inverts the execution model: where the reference spawns a fresh
venv subprocess per chunk and reloads the torch model every call
(ref: tts_backends/base_runner.py:278-332), an engine here owns
resident jitted model state, so ``synthesize_chunk`` is a device call
and ``synthesize_batch`` decodes a whole script's chunks in one
bucketed batch on the TPU.
"""

from __future__ import annotations

import threading
from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from vocalie_tts_tpu.engines.residency import RESIDENCY


@dataclass(frozen=True)
class ModelInfo:
    """A switchable weight set within an engine."""

    id: str
    label: str
    version: Optional[str] = None
    meta: Optional[Dict[str, Any]] = None


@dataclass(frozen=True)
class VoiceInfo:
    """A built-in voice (for engines with internal voice banks)."""

    id: str
    label: str
    lang_codes: Optional[List[str]] = None
    installed: bool = True
    meta: Optional[Dict[str, Any]] = None


@dataclass(frozen=True)
class ParamSpec:
    """Declarative engine parameter: drives the schema-driven UI."""

    key: str
    type: str  # float | int | bool | str | choice | select
    default: Any
    min: Optional[float] = None
    max: Optional[float] = None
    step: Optional[float] = None
    choices: Optional[List[Any]] = None
    label: Optional[str] = None
    help: Optional[str] = None
    visible_if: Optional[Dict[str, Any]] = None
    serialize_scope: str = "engine"


ChunkResult = Tuple[np.ndarray, int, Dict[str, Any]]


class EngineUnavailableError(RuntimeError):
    """Selected engine is not available (weights missing, not compiled)."""


# Kept as an alias so callers used to the reference taxonomy
# (ref: tts_backends/base.py:220) read naturally.
BackendUnavailableError = EngineUnavailableError


class TTSEngine(ABC):
    """Base class for TTS engines with automatic registration.

    Concrete subclasses that declare ``id`` register themselves in
    ``TTSEngine._REGISTRY`` at class-creation time; importing the
    engine module is all it takes to appear in the catalog.
    """

    _REGISTRY: Dict[str, type["TTSEngine"]] = {}
    _INSTANCES: Dict[str, "TTSEngine"] = {}

    id: str
    display_name: str
    supports_ref_audio: bool = False
    uses_internal_voices: bool = False
    supports_inter_chunk_gap: bool = False
    #: native output sample rate of the engine (informational)
    native_sr: int = 24000

    def __init_subclass__(cls, **kwargs) -> None:
        super().__init_subclass__(**kwargs)
        if getattr(cls, "id", None) and not getattr(cls, "__abstractmethods__", None):
            TTSEngine._REGISTRY[cls.id] = cls

    # ── lifecycle ───────────────────────────────────────────────────────

    @classmethod
    def instance(cls) -> "TTSEngine":
        """Singleton accessor: engines hold compiled state and model
        weights, so there is exactly one live object per engine id."""
        inst = TTSEngine._INSTANCES.get(cls.id)
        if inst is None or type(inst) is not cls:
            inst = cls()
            TTSEngine._INSTANCES[cls.id] = inst
        return inst

    @classmethod
    def is_available(cls) -> bool:
        """Weights present and model constructible. Cheap: no probes."""
        return True

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return None

    def warmup(self) -> None:
        """Pre-compile the hot paths (AOT jit warm) so the first user
        request doesn't pay compile latency. Safe to call repeatedly."""

    # ── runtime residency ───────────────────────────────────────────────
    #
    # Heavy state (device weights, jitted programs, KV caches) lives in
    # ``self._runtime``, built lazily. ``_acquire_runtime`` is the one
    # path that builds/returns it: it serializes concurrent builds (two
    # jobs hitting a cold engine must not materialize weights twice) and
    # reports the use to the shared residency LRU, which may evict OTHER
    # engines' runtimes when VOCALIE_MAX_RESIDENT_RUNTIMES is set.

    def _acquire_runtime(self, build: Callable[[], Any]) -> Any:
        lock = self.__dict__.get("_runtime_build_lock")
        if lock is None:
            lock = self.__dict__.setdefault(
                "_runtime_build_lock", threading.Lock()
            )
        with lock:
            runtime = getattr(self, "_runtime", None)
            if runtime is None:
                runtime = build()
                self._runtime = runtime
        RESIDENCY.note_use(self.id, self.release_runtime)
        return runtime

    def release_runtime(self) -> bool:
        """Drop the resident runtime (device weights/caches/programs).

        Safe while a synthesis is in flight: the active call keeps its
        own reference, so buffers free only when it returns; the next
        call rebuilds. Returns True if a runtime was resident.
        """
        lock = self.__dict__.get("_runtime_build_lock")
        if lock is not None:
            with lock:
                runtime = getattr(self, "_runtime", None)
                self._runtime = None
        else:
            runtime = getattr(self, "_runtime", None)
            self._runtime = None
        return runtime is not None

    # ── identity / catalog ──────────────────────────────────────────────

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        """Catalog rows for this engine: list of {id, label, ...}."""
        if getattr(cls, "id", None):
            return [{"id": cls.id, "label": cls.display_name}]
        return []

    def supports_engine_id(self, engine_id: str) -> bool:
        """True if *engine_id* (an engine-variant id) belongs to us."""
        return engine_id == self.id or engine_id.startswith(f"{self.id}_")

    def supports_ref_for_engine(self, engine_id: str) -> bool:
        """Per-variant reference-voice requirement (default: backend flag)."""
        return self.supports_ref_audio

    def resolve_engine_params(self, engine_id: str, params: Dict[str, Any]) -> Dict[str, Any]:
        """Apply variant-specific defaults (e.g. mode from the id)."""
        return dict(params)

    def auto_resolved_keys(self, engine_id: Optional[str] = None) -> List[str]:
        """Param keys the variant id pins — the UI hides these."""
        return []

    # ── descriptions ────────────────────────────────────────────────────

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {}

    def list_models(self) -> List[ModelInfo]:
        return []

    def list_voices(self) -> List[VoiceInfo]:
        return []

    def supported_languages(self) -> List[str]:
        return []

    def default_language(self) -> str:
        return pick_default_language(self.supported_languages(), None)

    def map_language(self, bcp47: Optional[str]) -> Optional[str]:
        if not self.supported_languages() or not bcp47:
            return None
        return bcp47

    def validate_config(self, cfg: Dict[str, Any]) -> List[str]:
        return []

    def capabilities(self, engine_id: Optional[str] = None) -> Dict[str, Any]:
        ref = (
            self.supports_ref_for_engine(engine_id)
            if engine_id
            else self.supports_ref_audio
        )
        return {
            "uses_voice_reference": bool(ref),
            "uses_internal_voices": bool(self.uses_internal_voices),
            "auto_resolved_keys": self.auto_resolved_keys(engine_id),
        }

    @property
    def supports_multilang(self) -> bool:
        return len(self.supported_languages()) > 1

    @property
    def supports_voice_selector(self) -> bool:
        return self.uses_internal_voices and len(self.list_voices()) > 1

    # ── synthesis (the compute path) ────────────────────────────────────

    @abstractmethod
    def synthesize_chunk(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ) -> ChunkResult:
        """Synthesize one chunk → (float32 audio, sample_rate, meta).

        This is a device call on resident jitted state — no process
        spawn, no model reload.
        """
        raise NotImplementedError

    def synthesize_stream(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        """Yield (float32 audio chunk, sample_rate) packets incrementally.

        Only engines whose capabilities report ``supports_streaming``
        implement this (CosyVoice-class: true incremental decode —
        first packet after one LM window). Default: unsupported.
        """
        raise NotImplementedError(f"{self.id} does not support streaming")

    def synthesize_batch(
        self,
        texts: Sequence[str],
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        progress_cb=None,
        **params: Any,
    ) -> List[ChunkResult]:
        """Synthesize several chunks.

        Default: sequential loop. Engines with batched decode override
        this to pad chunks into shape buckets and decode them together
        on the device — the key structural speedup over the reference's
        strictly sequential chunk loop (ref: tts_pipeline.py:353).
        """
        results: List[ChunkResult] = []
        total = len(texts) or 1
        for i, text in enumerate(texts, start=1):
            results.append(
                self.synthesize_chunk(
                    text, voice_ref_path=voice_ref_path, lang=lang, **params
                )
            )
            if progress_cb:
                progress_cb(i / total)
        return results

    def synthesize(
        self,
        script: str,
        out_path: str,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ) -> Dict[str, Any]:
        """File-writing convenience wrapper over ``synthesize_chunk``."""
        from vocalie_tts_tpu.io.wavio import write_wav

        audio, sr, meta = self.synthesize_chunk(
            script, voice_ref_path=voice_ref_path, lang=lang, **params
        )
        out = Path(out_path)
        write_wav(out, audio, sr)
        info = dict(meta or {})
        info.setdefault("duration_s", len(audio) / sr if sr else 0.0)
        info.setdefault("sr", sr)
        return info


# ── small shared helpers (ref: tts_backends/base.py:224-275) ────────────


def coerce_bool(value: Any, default: bool) -> bool:
    """Tolerant bool coercion for params arriving over the API."""
    if isinstance(value, bool):
        return value
    if value is None:
        return default
    if isinstance(value, (int, float)):
        return bool(value)
    text = str(value).strip().lower()
    if text in {"1", "true", "yes", "y", "on"}:
        return True
    if text in {"0", "false", "no", "n", "off"}:
        return False
    return default


def pick_default_language(
    supported_languages: List[str], default_language: Optional[str] = None
) -> str:
    """French-first default: the product is a French VO tool."""
    if "fr-FR" in supported_languages:
        return "fr-FR"
    if default_language:
        return default_language
    return supported_languages[0] if supported_languages else "fr-FR"


def coerce_language(
    requested: Optional[str],
    supported_languages: List[str],
    default_language: Optional[str] = None,
) -> Tuple[str, bool]:
    """(language, was_coerced) — falls back to the default when the
    requested language is unsupported."""
    if requested and requested in supported_languages:
        return requested, False
    return pick_default_language(supported_languages, default_language), True


def validate_param_schema(schema: Dict[str, ParamSpec]) -> List[str]:
    """Static sanity check for engine param schemas (used in tests)."""
    errors: List[str] = []
    for key, spec in schema.items():
        if spec.key != key:
            errors.append(f"{key}: key mismatch ({spec.key})")
        if spec.type not in {"float", "int", "bool", "str", "choice", "select"}:
            errors.append(f"{key}: invalid type {spec.type}")
        if spec.type in {"choice", "select"} and not spec.choices and spec.default is not None:
            errors.append(f"{key}: missing choices")
        if spec.type in {"float", "int"}:
            if spec.min is None or spec.max is None:
                errors.append(f"{key}: min/max required for numeric")
            if spec.step is None:
                errors.append(f"{key}: step required for numeric")
        if spec.serialize_scope not in {"global", "engine"}:
            errors.append(f"{key}: invalid serialize_scope {spec.serialize_scope}")
    return errors


__all__ = [
    "ModelInfo",
    "VoiceInfo",
    "ParamSpec",
    "ChunkResult",
    "TTSEngine",
    "EngineUnavailableError",
    "BackendUnavailableError",
    "coerce_bool",
    "pick_default_language",
    "coerce_language",
    "validate_param_schema",
]
