"""AudioSR service: in-process JAX latent-diffusion super-resolution.

The reference shells out to a separate audiosr venv with a 900 s
timeout (ref: backend/services/audiosr_service.py:102-167); here the
model is a resident jitted diffusion loop (models/audiosr) — same
params (ddim_steps, guidance, seed, chunking, multiband ensemble),
same dated output layout ``output/YYYY-MM-DD/audiosr/NAME.audiosr.wav``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Tuple

from vocalie_tts_tpu.engines import assets as engine_assets
from vocalie_tts_tpu.io.outputs import ensure_unique_path, sanitize_filename
from vocalie_tts_tpu.server import config as server_config
from vocalie_tts_tpu.server.utils import utc_now

LOGGER = logging.getLogger("vocalie_api.audiosr")

_RUNTIME = None


class FeatureDisabledError(RuntimeError):
    pass


def audiosr_is_available() -> bool:
    if not server_config.VOCALIE_ENABLE_AUDIOSR:
        return False
    return engine_assets.engine_ready("audiosr")


def audiosr_available_details() -> dict:
    return {
        "enabled": server_config.VOCALIE_ENABLE_AUDIOSR,
        "available": audiosr_is_available(),
        "weights_dir": str(engine_assets.weights_dir("audiosr")),
        "error": engine_assets.unready_reason("audiosr"),
    }


def log_audiosr_status() -> None:
    details = audiosr_available_details()
    LOGGER.info(
        "AudioSR enabled=%s available=%s weights=%s error=%s",
        details["enabled"],
        details["available"],
        details["weights_dir"],
        details["error"],
    )


def build_output_paths(input_name: str) -> Tuple[Path, Path]:
    date_folder = utc_now().strftime("%Y-%m-%d")
    output_dir = server_config.OUTPUT_DIR / date_folder / "audiosr"
    sanitized = sanitize_filename(input_name) or "audio"
    output_path = ensure_unique_path(output_dir, f"{sanitized}.audiosr.wav")
    meta_path = output_path.with_suffix(output_path.suffix + ".meta.json")
    return output_path, meta_path


def write_sidecar(meta_path: Path, payload: dict) -> None:
    meta_path.parent.mkdir(parents=True, exist_ok=True)
    meta_path.write_text(
        json.dumps(payload, indent=2, ensure_ascii=True) + "\n", encoding="utf-8"
    )


def _release_runtime() -> None:
    """Residency-LRU releaser: drop the resident diffusion runtime
    (weights + jitted DDIM programs). In-flight enhances keep their own
    reference; the next request rebuilds."""
    global _RUNTIME
    _RUNTIME = None


def _get_runtime():
    global _RUNTIME
    if _RUNTIME is None:
        from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

        _RUNTIME = AudioSRRuntime.create(
            assets_dir=engine_assets.engine_assets_dir("audiosr")
        )
    # AudioSR shares the chip (and therefore the residency budget) with
    # the TTS engines — see engines/residency.py.
    from vocalie_tts_tpu.engines.residency import RESIDENCY

    RESIDENCY.note_use("audiosr", _release_runtime)
    return _RUNTIME


def run_audiosr(input_path: str, output_path: str, params: dict) -> dict:
    """Run super-resolution in-process. Returns {sample_rate, duration_s}."""
    if not server_config.VOCALIE_ENABLE_AUDIOSR:
        raise FeatureDisabledError("audiosr_disabled")
    if not audiosr_is_available():
        raise FeatureDisabledError("audiosr_not_installed")

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)

    runtime = _get_runtime()
    result = runtime.enhance_file(
        input_path=str(input_path),
        output_path=str(output_path),
        ddim_steps=int(params.get("ddim_steps", 100)),
        guidance_scale=float(params.get("guidance_scale", 2.5)),
        seed=int(params.get("seed", 0)),
        chunk_size=int(params.get("chunk_size", 32768)),
        overlap=int(params.get("overlap", 1024)),
        multiband_ensemble=bool(params.get("multiband_ensemble", False)),
        input_cutoff=int(params.get("input_cutoff", 8000)),
    )
    return result
