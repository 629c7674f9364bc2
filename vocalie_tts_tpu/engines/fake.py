"""Deterministic fake engine — the suite's test double.

Registered only when VOCALIE_ENABLE_FAKE_ENGINE=1 (or when imported
explicitly by tests) so the production catalog stays faithful to the
reference's engine set. Mirrors the reference test strategy of never
loading a real model in the suite (ref: tests/conftest.py:22-60).

Output is a seeded sine burst whose frequency is derived from the text
hash and whose duration follows the 2.6-wps French speech-rate model,
so pipeline duration/gap/stitch logic is exercised realistically.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from vocalie_tts_tpu.engines.base import ParamSpec, TTSEngine
from vocalie_tts_tpu.text.duration import estimate_duration


class FakeEngine(TTSEngine):
    id = "fake"
    display_name = "Fake (test double)"
    supports_ref_audio = True
    supports_inter_chunk_gap = True
    native_sr = 24000

    #: tests can flip this to simulate an unavailable engine
    available: bool = True

    @classmethod
    def is_available(cls) -> bool:
        return cls.available

    @classmethod
    def unavailable_reason(cls) -> Optional[str]:
        return None if cls.available else "fake engine disabled"

    @classmethod
    def engine_variants(cls) -> List[Dict[str, str]]:
        return [{"id": "fake", "label": cls.display_name}]

    def supported_languages(self) -> List[str]:
        return ["fr-FR", "en-US"]

    def params_schema(self) -> Dict[str, ParamSpec]:
        return {
            "speed": ParamSpec(
                key="speed", type="float", default=1.0,
                min=0.5, max=2.0, step=0.1, label="Vitesse",
            ),
            "tone_hz": ParamSpec(
                key="tone_hz", type="int", default=0,
                min=0, max=4000, step=10, label="Fréquence (0=auto)",
            ),
        }

    def synthesize_chunk(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        # optional synthesis delay so concurrency tests can hold jobs
        # in the running state deterministically
        delay = float(os.environ.get("VOCALIE_FAKE_DELAY_S", "0") or 0)
        if delay > 0:
            time.sleep(delay)
        speed = float(params.get("speed", 1.0) or 1.0)
        duration_s = max(estimate_duration(text) / speed, 0.25)
        sr = self.native_sr
        n = int(duration_s * sr)
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        freq = int(params.get("tone_hz") or 0) or (200 + digest[0] * 4)
        t = np.arange(n, dtype=np.float32) / sr
        audio = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        # taper the edges so stitch tests see realistic boundaries
        edge = min(240, n // 4)
        if edge:
            ramp = np.linspace(0.0, 1.0, edge, dtype=np.float32)
            audio[:edge] *= ramp
            audio[-edge:] *= ramp[::-1]
        meta = {
            "engine": self.id,
            "text_chars": len(text),
            "voice_ref": voice_ref_path,
            "lang": lang,
            "freq_hz": freq,
        }
        return audio, sr, meta

    def capabilities(self, engine_id=None) -> Dict[str, Any]:
        caps = super().capabilities(engine_id)
        caps["supports_streaming"] = True
        return caps

    def synthesize_stream(
        self,
        text: str,
        *,
        voice_ref_path: Optional[str] = None,
        lang: Optional[str] = None,
        **params: Any,
    ):
        """Deterministic 3-packet stream for exercising the HTTP
        streaming surface without a real model."""
        audio, sr, _meta = self.synthesize_chunk(
            text, voice_ref_path=voice_ref_path, lang=lang, **params
        )
        n = max(len(audio) // 3, 1)
        for start in range(0, len(audio), n):
            yield audio[start : start + n], sr


__all__ = ["FakeEngine"]
