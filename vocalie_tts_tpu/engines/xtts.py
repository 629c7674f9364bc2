"""XTTS-v2-class engine: GPT-style AR decoder with voice cloning.

The reference removed XTTS from its active registry but BASELINE
config #2 still names it ("XTTS-v2 French voice clone from a
Ref_audio/ sample"), so it is re-supported: speaker-conditioned AR
latent decoder + HiFi-GAN, cloning from a ≥3 s reference sample.
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
from vocalie_tts_tpu.engines.qwen3 import validate_ref_audio

XTTS_LANGUAGES = [
    "fr-FR", "en-US", "en-GB", "es-ES", "de-DE", "it-IT",
    "pt-PT", "pl-PL", "tr-TR", "ru-RU", "nl-NL", "cs-CZ",
    "ar-XA", "zh-CN", "ja-JP", "ko-KR", "hu-HU", "hi-IN",
]


class XTTSEngine(TTSEngine):
    id = "xtts"
    display_name = "XTTS-v2 (voice clone)"
    supports_ref_audio = True
    uses_internal_voices = False
    supports_inter_chunk_gap = True
    native_sr = 24000

    def __init__(self) -> None:
        self._runtime = None

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        return [{"id": "xtts", "label": cls.display_name}]

    @classmethod
    def is_available(cls) -> bool:
        return assets.engine_ready("xtts")

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return assets.unready_reason("xtts")

    def supported_languages(self) -> List[str]:
        return list(XTTS_LANGUAGES)

    def default_language(self) -> str:
        return "fr-FR"

    def map_language(self, bcp47: Optional[str]) -> Optional[str]:
        if not bcp47:
            return "fr"
        return bcp47.split("-")[0]

    def supports_ref_for_engine(self, engine_id: str) -> bool:
        return True

    def list_models(self) -> List[ModelInfo]:
        return [ModelInfo(id="coqui/XTTS-v2", label="XTTS v2.0.3")]

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {
            "temperature": ParamSpec(
                key="temperature", type="float", default=0.65,
                min=0.0, max=1.5, step=0.05, label="Température",
            ),
            "repetition_penalty": ParamSpec(
                key="repetition_penalty", type="float", default=2.0,
                min=0.5, max=10.0, step=0.5, label="Repetition penalty",
            ),
            "top_k": ParamSpec(
                key="top_k", type="int", default=50,
                min=0, max=100, step=1, label="Top-k",
            ),
            "top_p": ParamSpec(
                key="top_p", type="float", default=0.85,
                min=0.0, max=1.0, step=0.05, label="Top-p",
            ),
            "speed": ParamSpec(
                key="speed", type="float", default=1.0,
                min=0.5, max=2.0, step=0.05, label="Vitesse",
            ),
        }

    # ── synthesis ───────────────────────────────────────────────────────

    def _get_runtime(self):
        def build():
            if not self.is_available():
                raise EngineUnavailableError(
                    self.unavailable_reason() or "xtts indisponible"
                )
            from vocalie_tts_tpu.models.xtts.runtime import XTTSRuntime

            return XTTSRuntime.create(
                assets_dir=assets.engine_assets_dir("xtts")
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
        if not voice_ref_path:
            raise EngineUnavailableError("XTTS requiert un audio de référence.")
        validate_ref_audio(voice_ref_path, min_duration_s=3.0)
        runtime = self._get_runtime()
        audio, sr, meta = runtime.synthesize(
            text,
            language=self.map_language(lang),
            voice_ref_path=voice_ref_path,
            temperature=float(params.get("temperature", 0.65)),
            repetition_penalty=float(params.get("repetition_penalty", 2.0)),
            top_k=int(params.get("top_k", 50)),
            top_p=float(params.get("top_p", 0.85)),
            speed=float(params.get("speed", 1.0)),
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
        """Bucketed batched decode — all chunks in ONE generate program
        (the base-class fallback loops per chunk, paying a separate
        prefill+decode+host-read per chunk through the tunnel)."""
        if not voice_ref_path:
            raise EngineUnavailableError("XTTS requiert un audio de référence.")
        validate_ref_audio(voice_ref_path, min_duration_s=3.0)
        runtime = self._get_runtime()
        results = runtime.synthesize_batch(
            list(texts),
            language=self.map_language(lang),
            voice_ref_path=voice_ref_path,
            temperature=float(params.get("temperature", 0.65)),
            repetition_penalty=float(params.get("repetition_penalty", 2.0)),
            top_k=int(params.get("top_k", 50)),
            top_p=float(params.get("top_p", 0.85)),
            speed=float(params.get("speed", 1.0)),
            progress_cb=progress_cb,
        )
        for _audio, _sr, meta in results:
            meta.update({"backend_id": self.id, "backend_lang": lang})
        return results


__all__ = ["XTTSEngine", "XTTS_LANGUAGES"]
