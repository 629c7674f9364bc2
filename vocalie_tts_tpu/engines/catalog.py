"""Engine catalog, legacy aliases and language maps.

Single source of truth for engine identity (ref: tts_backends/catalog.py).
``supports_ref`` deliberately lives on the engine, not here.
"""

from __future__ import annotations

from typing import Dict, List, Optional

ENGINE_CATALOG: List[Dict[str, str]] = []
_CATALOG_INDEX: Dict[str, Dict[str, str]] = {}


def rebuild_engine_catalog() -> None:
    """Rebuild the catalog from every registered engine's variants."""
    global ENGINE_CATALOG, _CATALOG_INDEX
    from vocalie_tts_tpu.engines.base import TTSEngine

    catalog: List[Dict[str, str]] = []
    for cls in TTSEngine._REGISTRY.values():
        for variant in cls.engine_variants():
            catalog.append(
                {
                    "id": variant["id"],
                    "label": variant.get("label", cls.display_name),
                    "backend_id": cls.id,
                }
            )
    ENGINE_CATALOG = catalog
    _CATALOG_INDEX = {entry["id"]: entry for entry in catalog}


def get_engine_catalog() -> List[Dict[str, str]]:
    return ENGINE_CATALOG


# Legacy engine-id aliases kept for preset migration
# (ref: tts_backends/catalog.py:68-70).
ENGINE_ALIAS_MAP: Dict[str, str] = {
    "chatterbox": "chatterbox_finetune_fr",
}

# Engines that cannot be uninstalled (ref: tts_backends/catalog.py:73).
PROTECTED_BACKENDS: frozenset = frozenset({"chatterbox"})

# BCP47 → engine-native language codes.
CHATTERBOX_LANGUAGE_MAP: Dict[str, str] = {
    "fr-FR": "fr",
    "en-US": "en",
    "en-GB": "en",
    "es-ES": "es",
    "de-DE": "de",
    "it-IT": "it",
    "pt-PT": "pt",
    "nl-NL": "nl",
}

QWEN3_LANGUAGE_MAP: Dict[str, str] = {
    "zh-CN": "Chinese",
    "zh-TW": "Chinese",
    "en-US": "English",
    "en-GB": "English",
    "ja-JP": "Japanese",
    "ko-KR": "Korean",
    "de-DE": "German",
    "fr-FR": "French",
    "ru-RU": "Russian",
    "pt-PT": "Portuguese",
    "pt-BR": "Portuguese",
    "es-ES": "Spanish",
    "it-IT": "Italian",
}


def canonical_engine_id(raw_id: str) -> str:
    """Map a legacy alias to its canonical id; unknown ids pass through."""
    return ENGINE_ALIAS_MAP.get(raw_id, raw_id)


def is_legacy_alias(engine_id: str) -> bool:
    return engine_id in ENGINE_ALIAS_MAP


def engine_meta(engine_id: str) -> Optional[Dict[str, str]]:
    entry = _CATALOG_INDEX.get(engine_id)
    return dict(entry) if entry else None


__all__ = [
    "ENGINE_CATALOG",
    "ENGINE_ALIAS_MAP",
    "PROTECTED_BACKENDS",
    "CHATTERBOX_LANGUAGE_MAP",
    "QWEN3_LANGUAGE_MAP",
    "rebuild_engine_catalog",
    "get_engine_catalog",
    "canonical_engine_id",
    "is_legacy_alias",
    "engine_meta",
]
