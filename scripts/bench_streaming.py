"""Streaming benchmark: first-packet latency + sustained RTF.

Runs the CosyVoice streaming path at full scale on the real device,
with the serving knobs (int8 weights/cache + decode kernel) on by
default. Prints one JSON line per run.

Usage: python scripts/bench_streaming.py [--repeats 3]
Env:   VOCALIE_STREAM_WINDOW (sustain window tokens, default 16)
       VOCALIE_STREAM_DEPTH  (in-flight window dispatches, default 2)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("VOCALIE_MODEL_SCALE", "full")
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))
for _knob in ("VOCALIE_KV_INT8", "VOCALIE_WEIGHT_INT8"):
    os.environ.setdefault(_knob, "1")

TEXT = (
    "Bienvenue dans cette démonstration de synthèse vocale en continu. "
    "Chaque fenêtre de jetons est convertie en audio dès qu'elle est "
    "prête, pour une écoute immédiate pendant que la suite se calcule."
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache_dir = REPO / ".assets" / "jit_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vocalie_tts_tpu.models.cosyvoice.runtime import (
        STREAM_PIPELINE_DEPTH,
        STREAM_WINDOW_SUSTAIN,
        STREAM_WINDOW_TOKENS,
        CosyVoiceRuntime,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rt = CosyVoiceRuntime.create(REPO / ".assets" / "cosyvoice")

    def run():
        t0 = time.monotonic()
        first_ms = None
        total_audio = 0.0
        sr = rt.cfg.sample_rate
        for audio, sr in rt.synthesize_streaming(
            TEXT, mode="instruct", instruct_text="Parle clairement."
        ):
            if first_ms is None:
                first_ms = (time.monotonic() - t0) * 1000
            total_audio += len(audio) / sr
        wall = time.monotonic() - t0
        return first_ms, total_audio, wall

    run()  # warm/compile
    results = [run() for _ in range(args.repeats)]
    best = max(results, key=lambda r: r[1] / r[2])
    print(json.dumps({
        "metric": "cosyvoice_streaming",
        "first_packet_ms": round(min(r[0] for r in results), 1),
        "sustained_rtf": round(best[1] / best[2], 2),
        "audio_s": round(best[1], 2),
        "wall_s": round(best[2], 2),
        "window_first": STREAM_WINDOW_TOKENS,
        "window_sustain": STREAM_WINDOW_SUSTAIN,
        "pipeline_depth": STREAM_PIPELINE_DEPTH,
        "all_rtf": [round(r[1] / r[2], 2) for r in results],
    }))


if __name__ == "__main__":
    main()
