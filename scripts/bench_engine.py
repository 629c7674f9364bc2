"""Per-engine pipeline benchmark (BASELINE configs #1/#2/#4).

Same harness discipline as the flagship bench.py (config #3): one
warmup run compiles every bucket, then N timed repeats of the SAME
request (identical buckets — a different sentence length is a fresh
compile through the tunnel and would be timed as "steady" by mistake),
wall clock ends at the host read inside the pipeline's WAV write.

Usage:
  python scripts/bench_engine.py --engine xtts
  python scripts/bench_engine.py --engine qwen3 --chunks 8
  python scripts/bench_engine.py --engine piper
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

os.environ.setdefault("VOCALIE_MODEL_SCALE", os.environ.get("VOCALIE_BENCH_SCALE", "full"))
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))
for _knob in ("VOCALIE_KV_INT8", "VOCALIE_WEIGHT_INT8"):
    os.environ.setdefault(_knob, "1")

_SENT = (
    "La synthèse vocale sur accélérateur dédié transforme le flux de "
    "production des livres audio et des documentaires en français."
)

ENGINE_PARAMS = {
    # ref parameter surfaces: tts_backends/*_backend.py ParamSpecs
    "xtts": {"language": "fr", "temperature": 0.65},
    "qwen3": {"language": "fr"},
    "cosyvoice": {"language": "fr"},
    "piper": {},
    "chatterbox": {"chatterbox_mode": "fr_finetune", "cfg_weight": 0.6,
                   "temperature": 0.5, "repetition_penalty": 1.35},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", required=True)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax  # noqa: F401  (device init before timing)

    from vocalie_tts_tpu.pipeline import run_tts_pipeline
    from vocalie_tts_tpu.text import parse_manual_chunks

    script = "\n[[CHUNK]]\n".join([_SENT] * args.chunks)
    chunks, _ = parse_manual_chunks(script)
    out_dir = Path(os.environ.get("TMPDIR", "/tmp")) / "vocalie_bench"
    out_dir.mkdir(parents=True, exist_ok=True)

    # voice-clone engines need a reference sample; a deterministic tone
    # stands in (random weights make timbre moot — timing is the point)
    ref_path = out_dir / "bench_ref.wav"
    if not ref_path.exists():
        import numpy as np

        from vocalie_tts_tpu.io.wavio import write_wav

        t = np.arange(3 * 24000) / 24000.0
        ref = (0.2 * np.sin(2 * np.pi * 180 * t)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        write_wav(str(ref_path), ref, 24000)

    request = {
        "voice_ref_path": str(ref_path),
        "tts_backend": args.engine,
        "script": script,
        "chunks": chunks,
        "engine_params": ENGINE_PARAMS.get(args.engine, {}),
        "inter_chunk_gap_ms": 250,
        "target_sr": 24000,
        "out_path": str(out_dir / f"bench_{args.engine}.wav"),
    }

    t0 = time.monotonic()
    result = run_tts_pipeline(dict(request))
    print(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s, "
          f"audio {result.meta['total_duration']:.1f}s", file=sys.stderr)

    rtfs, walls = [], []
    for i in range(args.repeats):
        t0 = time.monotonic()
        result = run_tts_pipeline(dict(request))
        wall = time.monotonic() - t0
        audio_s = float(result.meta["total_duration"])
        rtfs.append(audio_s / wall)
        walls.append(wall)
        print(f"run {i + 1}: wall {wall:.2f}s, audio {audio_s:.2f}s, "
              f"RTF {rtfs[-1]:.1f}x", file=sys.stderr)

    # Headline = MEDIAN run (best kept as a field): tunnel variance is
    # ±20%+ and best-of-N bakes luck into committed evidence (VERDICT r4)
    summary = {
        "metric": f"audio_rtf_chunked_{args.engine}",
        "value": round(sorted(rtfs)[len(rtfs) // 2], 2),
        "unit": "x_realtime",
        "best": round(max(rtfs), 2),
        "p50_latency_s": round(sorted(walls)[len(walls) // 2], 2),
        "chunks": args.chunks,
    }
    print(json.dumps(summary))

    # committed raw evidence: every scoreboard number in BASELINE.md
    # traces to a BENCH_engines.jsonl record (per-run walls/RTFs, date,
    # config knobs) — tunnel variance is ±20%, so ranking claims need
    # the raw runs, not just a headline max
    import datetime

    record = {
        **summary,
        "runs": [
            {"wall_s": round(w, 3), "rtf": round(r, 2)}
            for w, r in zip(walls, rtfs)
        ],
        "audio_s": round(float(result.meta["total_duration"]), 2),
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "scale": os.environ.get("VOCALIE_MODEL_SCALE"),
        "kv_int8": os.environ.get("VOCALIE_KV_INT8"),
        "weight_int8": os.environ.get("VOCALIE_WEIGHT_INT8"),
        "repeats": args.repeats,
    }
    log_path = Path(os.environ.get("VOCALIE_BENCH_LOG",
                                   str(REPO / "BENCH_engines.jsonl")))
    with open(log_path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(record) + "\n")
    print(f"appended record to {log_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
