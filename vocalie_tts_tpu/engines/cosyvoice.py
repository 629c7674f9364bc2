"""CosyVoice-class engine: LLM + flow-matching decoder, three modes.

Surface mirrors the reference backend (ref: tts_backends/cosyvoice_backend.py):
variants instruct / clone / cross-lingual, instruct presets, streaming
capability flag, ≥3 s reference-audio validation.

Execution is TPU-native: token LM + conditional flow matching + vocoder
run as resident jitted programs; the streaming path decodes token
windows and flushes the vocoder early for low first-packet latency.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from vocalie_tts_tpu.engines import assets
from vocalie_tts_tpu.engines.base import (
    EngineUnavailableError,
    ModelInfo,
    ParamSpec,
    TTSEngine,
    coerce_bool,
)
from vocalie_tts_tpu.engines.qwen3 import validate_ref_audio

COSYVOICE_DEFAULT_MODELS = {
    "clone": "FunAudioLLM/Fun-CosyVoice3-0.5B-2512",
    "instruct": "FunAudioLLM/Fun-CosyVoice3-0.5B-2512",
    "cross_lingual": "FunAudioLLM/Fun-CosyVoice3-0.5B-2512",
}

COSYVOICE_LANGUAGE_MAP: Dict[str, str] = {
    "fr-FR": "French",
    "fr-CA": "French",
    "en-US": "English",
    "en-GB": "English",
    "zh-CN": "Chinese",
    "zh-TW": "Chinese",
    "ja-JP": "Japanese",
    "ko-KR": "Korean",
    "de-DE": "German",
    "es-ES": "Spanish",
    "it-IT": "Italian",
    "ru-RU": "Russian",
    "pt-PT": "Portuguese",
    "pt-BR": "Portuguese",
}

INSTRUCT_CHOICES = [
    ("Aucune", ""),
    ("Joyeux", "用开心的语气说"),
    ("Triste", "用伤心的语气说"),
    ("Colère", "用生气的语气说"),
    ("Surpris", "用惊讶的语气说"),
    ("Calme", "用冷静的语气说"),
    ("Rapide", "快速"),
    ("Lent", "慢速"),
]


class CosyVoiceEngine(TTSEngine):
    id = "cosyvoice"
    display_name = "CosyVoice 3"
    supports_ref_audio = True
    supports_inter_chunk_gap = True
    uses_internal_voices = False
    native_sr = 24000

    _ENGINE_MODE_MAP = {
        "cosyvoice_instruct": "instruct",
        "cosyvoice_clone": "clone",
        "cosyvoice_cross": "cross_lingual",
    }

    def __init__(self) -> None:
        self._runtime = None

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        return [
            {"id": "cosyvoice_instruct", "label": "CosyVoice (Instruct)"},
            {"id": "cosyvoice_clone", "label": "CosyVoice (Voice Clone)"},
            {"id": "cosyvoice_cross", "label": "CosyVoice (Cross-lingual)"},
        ]

    @classmethod
    def is_available(cls) -> bool:
        return assets.engine_ready("cosyvoice")

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return assets.unready_reason("cosyvoice")

    def supported_languages(self) -> List[str]:
        return list(COSYVOICE_LANGUAGE_MAP.keys())

    def default_language(self) -> str:
        return "fr-FR"

    def map_language(self, bcp47: Optional[str]) -> Optional[str]:
        if not bcp47:
            return "French"
        return COSYVOICE_LANGUAGE_MAP.get(bcp47, "Auto")

    def list_models(self) -> List[ModelInfo]:
        return [
            ModelInfo(id="FunAudioLLM/Fun-CosyVoice3-0.5B-2512", label="CosyVoice3 0.5B (RL)"),
            ModelInfo(id="FunAudioLLM/CosyVoice2-0.5B", label="CosyVoice2 0.5B"),
        ]

    def supports_ref_for_engine(self, engine_id: str) -> bool:
        return engine_id in {"cosyvoice_clone", "cosyvoice_cross", "cosyvoice_instruct"}

    def capabilities(self, engine_id: Optional[str] = None) -> Dict[str, Any]:
        caps = super().capabilities(engine_id)
        caps["supports_instruct"] = engine_id == "cosyvoice_instruct"
        caps["supports_cross_lingual"] = engine_id == "cosyvoice_cross"
        caps["supports_streaming"] = True
        caps["supports_emotion"] = engine_id == "cosyvoice_instruct"
        caps["supports_fine_grained_control"] = engine_id == "cosyvoice_instruct"
        return caps

    def auto_resolved_keys(self, engine_id: Optional[str] = None) -> List[str]:
        return ["cosyvoice_mode"]

    def resolve_engine_params(self, engine_id: str, params: Dict[str, Any]) -> Dict[str, Any]:
        default_mode = self._ENGINE_MODE_MAP.get(engine_id)
        if default_mode:
            requested = params.get("cosyvoice_mode")
            if requested in {"instruct", "clone", "cross_lingual"}:
                params["cosyvoice_mode"] = requested
            else:
                params["cosyvoice_mode"] = default_mode
        return params

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {
            "cosyvoice_mode": ParamSpec(
                key="cosyvoice_mode", type="choice", default="instruct",
                choices=[
                    ("Instruct (émotion/style)", "instruct"),
                    ("Clone voix", "clone"),
                    ("Cross-lingual", "cross_lingual"),
                ],
                label="Mode CosyVoice",
                help="Instruct (texte + consigne), Clone (ref audio), Cross-lingual (voix FR → texte EN).",
                visible_if={"supports_ref": False},
            ),
            "instruct_text": ParamSpec(
                key="instruct_text", type="str", default="",
                label="Instruction",
                help="Émotion, style, dialecte (ex: '用开心的语气说', '快速').",
                visible_if={"cosyvoice_mode": "instruct"},
            ),
            "instruct_preset": ParamSpec(
                key="instruct_preset", type="choice", default="",
                choices=INSTRUCT_CHOICES,
                label="Émotion preset",
                help="Preset d'émotion (remplit instruction si vide).",
                visible_if={"cosyvoice_mode": "instruct"},
            ),
            "prompt_text": ParamSpec(
                key="prompt_text", type="str", default="",
                label="Texte de référence (transcript)",
                help="Transcript exact de l'audio de référence (améliore qualité clone).",
                visible_if={"cosyvoice_mode": "clone"},
            ),
            "streaming": ParamSpec(
                key="streaming", type="bool", default=False,
                label="Streaming",
                help="Activer le streaming (150ms premier paquet).",
            ),
        }

    # ── synthesis ───────────────────────────────────────────────────────

    def _get_runtime(self):
        def build():
            if not self.is_available():
                raise EngineUnavailableError(
                    self.unavailable_reason() or "cosyvoice indisponible"
                )
            from vocalie_tts_tpu.models.cosyvoice.runtime import CosyVoiceRuntime

            return CosyVoiceRuntime.create(
                assets_dir=assets.engine_assets_dir("cosyvoice")
            )

        return self._acquire_runtime(build)

    def warmup(self) -> None:
        self._get_runtime().warmup()

    def synthesize_stream(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        """Incremental packets straight off the pipelined window decode
        (first packet ≈70 ms at full scale — BASELINE.md)."""
        engine_id = params.get("engine_id") or "cosyvoice_instruct"
        mode = self._ENGINE_MODE_MAP.get(engine_id, "instruct")
        explicit_mode = params.get("cosyvoice_mode")
        if explicit_mode in {"instruct", "clone", "cross_lingual"}:
            mode = explicit_mode
        if mode in {"clone", "cross_lingual"} and not voice_ref_path:
            raise EngineUnavailableError(
                "CosyVoice clone/cross-lingual requiert un audio de référence."
            )
        if voice_ref_path:
            validate_ref_audio(voice_ref_path, min_duration_s=3.0)
        runtime = self._get_runtime()
        yield from runtime.synthesize_streaming(
            text,
            mode=mode,
            language=self.map_language(lang),
            instruct_text=params.get("instruct_text") or params.get("instruct_preset") or "",
            prompt_text=params.get("prompt_text") or "",
            voice_ref_path=voice_ref_path,
        )

    def _resolve_request(self, voice_ref_path, params):
        """(mode, model_id, instruct_text, prompt_text, streaming) from
        the public params — shared by chunk and batch entry points."""
        engine_id = params.get("engine_id") or "cosyvoice_clone"
        mode = self._ENGINE_MODE_MAP.get(engine_id, "clone")
        explicit_mode = params.get("cosyvoice_mode")
        if explicit_mode in {"instruct", "clone", "cross_lingual"}:
            mode = explicit_mode

        if mode == "clone" and not voice_ref_path:
            raise EngineUnavailableError(
                "CosyVoice clone requiert un audio de référence (≥3s)."
            )
        if mode == "cross_lingual" and not voice_ref_path:
            raise EngineUnavailableError(
                "CosyVoice cross-lingual requiert un audio de référence."
            )
        if voice_ref_path:
            validate_ref_audio(voice_ref_path, min_duration_s=3.0)

        model_id = params.get("model_id") or COSYVOICE_DEFAULT_MODELS.get(
            mode, "FunAudioLLM/Fun-CosyVoice3-0.5B-2512"
        )
        instruct_text = params.get("instruct_text") or ""
        if not instruct_text:
            instruct_text = params.get("instruct_preset") or ""
        prompt_text = params.get("prompt_text") or ""
        streaming = coerce_bool(params.get("streaming"), False)
        return mode, model_id, instruct_text, prompt_text, streaming

    def synthesize_chunk(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        mode, model_id, instruct_text, prompt_text, streaming = (
            self._resolve_request(voice_ref_path, params)
        )

        runtime = self._get_runtime()
        audio, sr, meta = runtime.synthesize(
            text,
            mode=mode,
            language=self.map_language(lang),
            instruct_text=instruct_text,
            prompt_text=prompt_text,
            streaming=streaming,
            voice_ref_path=voice_ref_path,
        )
        meta.update(
            {
                "backend_id": self.id,
                "backend_lang": lang,
                "cosyvoice_mode": mode,
                "cosyvoice_model": model_id,
                "cosyvoice_streaming": streaming,
            }
        )
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
        mode, model_id, instruct_text, prompt_text, streaming = (
            self._resolve_request(voice_ref_path, params)
        )
        runtime = self._get_runtime()
        results = runtime.synthesize_batch(
            list(texts),
            mode=mode,
            language=self.map_language(lang),
            instruct_text=instruct_text,
            prompt_text=prompt_text,
            streaming=False,  # batch mode renders whole chunks
            voice_ref_path=voice_ref_path,
            progress_cb=progress_cb,
        )
        for _audio, _sr, meta in results:
            meta.update(
                {
                    "backend_id": self.id,
                    "backend_lang": lang,
                    "cosyvoice_mode": mode,
                    "cosyvoice_model": model_id,
                    "cosyvoice_streaming": False,
                }
            )
        return results


__all__ = [
    "CosyVoiceEngine",
    "COSYVOICE_LANGUAGE_MAP",
    "COSYVOICE_DEFAULT_MODELS",
    "INSTRUCT_CHOICES",
]
