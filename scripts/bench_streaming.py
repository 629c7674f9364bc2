"""Streaming benchmark: first-packet latency + sustained RTF.

Runs the CosyVoice streaming path at full scale on the real device,
with the serving knobs (int8 weights/cache + decode kernel) on by
default. Prints one JSON line per run.

Usage: python scripts/bench_streaming.py [--repeats 3] [--windows 48,64,96]
Env:   VOCALIE_STREAM_WINDOW (sustain window tokens, default 48)
       VOCALIE_STREAM_DEPTH  (in-flight window dispatches, default 2)

--windows sweeps sustain-window sizes in ONE process (weights load
once; each size costs one extra jit shape) and appends a structured
record per size to BENCH_streaming.jsonl — the committed evidence
trail behind BASELINE.md's sustain curve.
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
    ap.add_argument("--windows", type=str, default="",
                    help="comma-separated sustain-window sizes to sweep "
                         "(default: the shipping VOCALIE_STREAM_WINDOW only)")
    ap.add_argument("--profile", type=Path, default=None,
                    help="jax.profiler trace dir: trace ONE warm run at the "
                         "first window size and print the device op table "
                         "(decode scan vs CFM vs vocoder split)")
    args = ap.parse_args()

    import jax

    cache_dir = REPO / ".assets" / "jit_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vocalie_tts_tpu.models.cosyvoice import runtime as cvrt
    from vocalie_tts_tpu.models.cosyvoice.runtime import (
        STREAM_PIPELINE_DEPTH,
        STREAM_WINDOW_TOKENS,
        CosyVoiceRuntime,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rt = CosyVoiceRuntime.create(REPO / ".assets" / "cosyvoice")
    windows = ([int(w) for w in args.windows.split(",") if w.strip()]
               or [cvrt.STREAM_WINDOW_SUSTAIN])

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

    import datetime

    log_path = Path(os.environ.get("VOCALIE_BENCH_LOG",
                                   str(REPO / "BENCH_streaming.jsonl")))
    for w in windows:
        # the schedule builder reads the module global — patch it per
        # sweep point (env is only read at import); each size is one
        # extra jit shape, weights stay resident
        cvrt.STREAM_WINDOW_SUSTAIN = int(w)
        run()  # warm/compile
        if args.profile is not None:
            import jax.profiler

            args.profile.mkdir(parents=True, exist_ok=True)
            with jax.profiler.trace(str(args.profile)):
                run()
            sys.path.insert(0, str(REPO / "scripts"))
            from microbench_decode import parse_trace

            parse_trace(args.profile, top=30)
            print(
                f"NOTE: --profile traced window {w} only; the sweep over "
                f"{windows} and all {log_path.name} appends were SKIPPED",
                file=sys.stderr,
            )
            return
        results = [run() for _ in range(args.repeats)]
        # Headline = MEDIAN run / median first-packet: best-of-N bakes
        # tunnel luck into committed evidence (ADVICE r4); best kept below
        by_rtf = sorted(results, key=lambda r: r[1] / r[2])
        med = by_rtf[len(by_rtf) // 2]
        best = by_rtf[-1]
        firsts = sorted(r[0] for r in results)
        summary = {
            "metric": "cosyvoice_streaming",
            "first_packet_ms": round(firsts[len(firsts) // 2], 1),
            "first_packet_best_ms": round(firsts[0], 1),
            "sustained_rtf": round(med[1] / med[2], 2),
            "best_rtf": round(best[1] / best[2], 2),
            "audio_s": round(med[1], 2),
            "wall_s": round(med[2], 2),
            "window_first": STREAM_WINDOW_TOKENS,
            "window_sustain": int(w),
            "pipeline_depth": STREAM_PIPELINE_DEPTH,
            "all_rtf": [round(r[1] / r[2], 2) for r in results],
        }
        print(json.dumps(summary), flush=True)
        record = {
            **summary,
            "runs": [{"first_ms": round(r[0], 1), "audio_s": round(r[1], 2),
                      "wall_s": round(r[2], 3)} for r in results],
            "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"),
            "scale": os.environ.get("VOCALIE_MODEL_SCALE"),
        }
        with open(log_path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
