"""Chatterbox-class engine: AR acoustic-token decoder + neural vocoder.

Capability/parameter surface mirrors the reference backend
(ref: tts_backends/chatterbox_backend.py): two variants
(native multilang / FR fine-tune), reference-voice conditioning,
CFG weight, exaggeration, temperature, repetition penalty.

Execution is TPU-native: a resident T3-class transformer decodes
speech tokens under ``lax.while_loop`` with a Pallas KV-cache
attention kernel, and a vocoder turns tokens into 24 kHz audio — one
process, one compiled graph, no per-chunk model reload. The FR
fine-tune is a weight overlay on the base decoder, mirroring the
reference's safetensors T3 overlay (ref: tts_backends/chatterbox_impl.py:63-73).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from vocalie_tts_tpu.engines import assets
from vocalie_tts_tpu.engines.base import (
    EngineUnavailableError,
    ModelInfo,
    ParamSpec,
    TTSEngine,
)
from vocalie_tts_tpu.engines.catalog import CHATTERBOX_LANGUAGE_MAP


class ChatterboxEngine(TTSEngine):
    id = "chatterbox"
    display_name = "Chatterbox (stable long-form)"
    supports_ref_audio = True
    uses_internal_voices = False
    supports_inter_chunk_gap = True
    native_sr = 24000

    _ENGINE_MODE_MAP = {
        "chatterbox_native": "multilang",
        "chatterbox_finetune_fr": "fr_finetune",
    }

    def __init__(self) -> None:
        self._runtime = None  # lazy: built on first synthesis

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        return [
            {"id": "chatterbox_native", "label": "Chatterbox (native multilang)"},
            {"id": "chatterbox_finetune_fr", "label": "Chatterbox (FR fine-tune)"},
        ]

    @classmethod
    def is_available(cls) -> bool:
        return assets.engine_ready("chatterbox")

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return assets.unready_reason("chatterbox")

    def supported_languages(self) -> List[str]:
        return list(CHATTERBOX_LANGUAGE_MAP.keys())

    def default_language(self) -> str:
        return "fr-FR"

    def map_language(self, bcp47: Optional[str]) -> Optional[str]:
        if not bcp47:
            return "fr"
        return CHATTERBOX_LANGUAGE_MAP.get(bcp47, bcp47.split("-")[0])

    def supports_ref_for_engine(self, engine_id: str) -> bool:
        return True

    def auto_resolved_keys(self, engine_id: Optional[str] = None) -> List[str]:
        return ["chatterbox_mode"]

    def resolve_engine_params(self, engine_id: str, params: Dict[str, Any]) -> Dict[str, Any]:
        mode = self._ENGINE_MODE_MAP.get(engine_id)
        if mode:
            params.setdefault("chatterbox_mode", mode)
        return params

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {
            "chatterbox_mode": ParamSpec(
                key="chatterbox_mode", type="choice", default="fr_finetune",
                choices=[
                    ("FR fine-tuné (spécialisé)", "fr_finetune"),
                    ("Chatterbox multilangue", "multilang"),
                ],
                label="Mode Chatterbox", help="Fine-tune FR ou multilangue.",
            ),
            "multilang_cfg_weight": ParamSpec(
                key="multilang_cfg_weight", type="float", default=0.5,
                min=0.0, max=1.0, step=0.05,
                label="CFG multilangue",
                help="Réduire pour limiter l'accent bleed.",
                visible_if={"chatterbox_mode": "multilang"},
            ),
            "exaggeration": ParamSpec(
                key="exaggeration", type="float", default=0.5,
                min=0.0, max=1.0, step=0.05, label="Exaggeration",
            ),
            "cfg_weight": ParamSpec(
                key="cfg_weight", type="float", default=0.6,
                min=0.0, max=1.0, step=0.05, label="CFG",
            ),
            "temperature": ParamSpec(
                key="temperature", type="float", default=0.5,
                min=0.0, max=1.0, step=0.05, label="Température",
            ),
            "repetition_penalty": ParamSpec(
                key="repetition_penalty", type="float", default=1.35,
                min=0.5, max=2.0, step=0.05, label="Repetition penalty",
            ),
        }

    def list_models(self) -> List[ModelInfo]:
        return [
            ModelInfo(
                id="ResembleAI/chatterbox", label="Chatterbox (base)",
                meta={"mode": "multilang"},
            ),
            ModelInfo(
                id="Thomcles/Chatterbox-TTS-French", label="Chatterbox FR fine-tune",
                meta={"mode": "fr_finetune"},
            ),
        ]

    # ── synthesis ───────────────────────────────────────────────────────

    def _get_runtime(self):
        def build():
            if not self.is_available():
                raise EngineUnavailableError(
                    self.unavailable_reason() or "chatterbox indisponible"
                )
            from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

            return ChatterboxRuntime.create(
                assets_dir=assets.engine_assets_dir("chatterbox")
            )

        return self._acquire_runtime(build)

    def warmup(self) -> None:
        self._get_runtime().warmup()

    def synthesize_chunk(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        runtime = self._get_runtime()
        mode = str(
            params.get("tts_model_mode")
            or params.get("chatterbox_mode")
            or "fr_finetune"
        )
        audio, sr, meta = runtime.synthesize(
            text,
            mode=mode,
            lang=self.map_language(lang),
            voice_ref_path=voice_ref_path,
            exaggeration=float(params.get("exaggeration", 0.5)),
            cfg_weight=float(
                params.get("multilang_cfg_weight", 0.5)
                if mode == "multilang"
                else params.get("cfg_weight", 0.6)
            ),
            temperature=float(params.get("temperature", 0.5)),
            repetition_penalty=float(params.get("repetition_penalty", 1.35)),
        )
        meta.update({"backend_id": self.id, "backend_lang": lang})
        return audio, sr, meta

    def synthesize_batch(
        self,
        texts,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        progress_cb=None,
        **params: Any,
    ):
        """Bucketed batched decode of a whole script's chunks."""
        runtime = self._get_runtime()
        mode = str(
            params.get("tts_model_mode")
            or params.get("chatterbox_mode")
            or "fr_finetune"
        )
        results = runtime.synthesize_batch(
            list(texts),
            mode=mode,
            lang=self.map_language(lang),
            voice_ref_path=voice_ref_path,
            exaggeration=float(params.get("exaggeration", 0.5)),
            cfg_weight=float(
                params.get("multilang_cfg_weight", 0.5)
                if mode == "multilang"
                else params.get("cfg_weight", 0.6)
            ),
            temperature=float(params.get("temperature", 0.5)),
            repetition_penalty=float(params.get("repetition_penalty", 1.35)),
            progress_cb=progress_cb,
        )
        out = []
        for audio, sr, meta in results:
            meta.update({"backend_id": self.id, "backend_lang": lang})
            out.append((audio, sr, meta))
        return out


__all__ = ["ChatterboxEngine"]
