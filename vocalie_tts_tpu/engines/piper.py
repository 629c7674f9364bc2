"""Piper-class engine: small fr_FR VITS, fully non-autoregressive.

The reference removed Piper from its active registry but BASELINE
config #1 still names it ("Piper fr_FR small VITS — single-sentence
WAV, no ref voice"), so it is re-supported here as the simplest
engine: one jitted VITS forward (text encoder → duration predictor →
flow → HiFi-GAN) per chunk — no KV cache, no sampling loop, ideal
MXU utilization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from vocalie_tts_tpu.engines import assets
from vocalie_tts_tpu.engines.base import (
    EngineUnavailableError,
    ModelInfo,
    ParamSpec,
    TTSEngine,
    VoiceInfo,
)

PIPER_VOICES = [
    VoiceInfo(id="fr_FR-siwis-medium", label="Siwis (F, fr_FR, medium)", lang_codes=["fr-FR"]),
    VoiceInfo(id="fr_FR-upmc-medium", label="UPMC (M/F, fr_FR, medium)", lang_codes=["fr-FR"]),
    VoiceInfo(id="fr_FR-tom-medium", label="Tom (M, fr_FR, medium)", lang_codes=["fr-FR"]),
]


class PiperEngine(TTSEngine):
    id = "piper"
    display_name = "Piper (VITS fr_FR)"
    supports_ref_audio = False
    uses_internal_voices = True
    supports_inter_chunk_gap = True
    native_sr = 22050

    def __init__(self) -> None:
        self._runtime = None

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        return [{"id": "piper", "label": cls.display_name}]

    @classmethod
    def is_available(cls) -> bool:
        return assets.engine_ready("piper")

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return assets.unready_reason("piper")

    def supported_languages(self) -> List[str]:
        return ["fr-FR"]

    def default_language(self) -> str:
        return "fr-FR"

    def list_voices(self) -> List[VoiceInfo]:
        return list(PIPER_VOICES)

    def list_models(self) -> List[ModelInfo]:
        return [
            ModelInfo(id=v.id, label=v.label, meta={"quality": "medium"})
            for v in PIPER_VOICES
        ]

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {
            "length_scale": ParamSpec(
                key="length_scale", type="float", default=1.0,
                min=0.5, max=2.0, step=0.05,
                label="Vitesse (length scale)",
                help="1.0 = vitesse native; plus grand = plus lent.",
            ),
            "noise_scale": ParamSpec(
                key="noise_scale", type="float", default=0.667,
                min=0.0, max=1.5, step=0.01,
                label="Noise scale", help="Variabilité de la prosodie.",
            ),
            "noise_w": ParamSpec(
                key="noise_w", type="float", default=0.8,
                min=0.0, max=2.0, step=0.05,
                label="Noise W", help="Variabilité des durées de phonèmes.",
            ),
        }

    # ── synthesis ───────────────────────────────────────────────────────

    def _get_runtime(self):
        def build():
            if not self.is_available():
                raise EngineUnavailableError(
                    self.unavailable_reason() or "piper indisponible"
                )
            from vocalie_tts_tpu.models.vits.runtime import VITSRuntime

            return VITSRuntime.create(
                assets_dir=assets.engine_assets_dir("piper")
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
        voice = (
            params.get("voice")
            or params.get("voice_id")
            or PIPER_VOICES[0].id
        )
        audio, sr, meta = runtime.synthesize(
            text,
            voice=str(voice),
            length_scale=float(params.get("length_scale", 1.0)),
            noise_scale=float(params.get("noise_scale", 0.667)),
            noise_w=float(params.get("noise_w", 0.8)),
        )
        meta.update({"backend_id": self.id, "backend_lang": lang, "voice": voice})
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
        runtime = self._get_runtime()
        voice = params.get("voice") or params.get("voice_id") or PIPER_VOICES[0].id
        results = runtime.synthesize_batch(
            list(texts),
            voice=str(voice),
            length_scale=float(params.get("length_scale", 1.0)),
            noise_scale=float(params.get("noise_scale", 0.667)),
            noise_w=float(params.get("noise_w", 0.8)),
            progress_cb=progress_cb,
        )
        out = []
        for audio, sr, meta in results:
            meta.update({"backend_id": self.id, "backend_lang": lang, "voice": voice})
            out.append((audio, sr, meta))
        return out


__all__ = ["PiperEngine", "PIPER_VOICES"]
