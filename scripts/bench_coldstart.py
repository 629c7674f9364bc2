"""Cold/warm start benchmark: time-to-first-audio in a FRESH process.

The reference's analogous numbers are its 8 s availability probe and
its ≤180 s model cold start (ref: backend/app.py:37-40,
tts_backends/chatterbox_backend.py:19). Here "install" pre-warms a
persistent XLA compile cache (engines/install.py), but through the
tunnel the cache "only sometimes takes" — this harness MEASURES it
instead of assuming:

- spawns N sequential fresh subprocesses (one TPU client at a time);
- each loads the engine, synthesizes ONE short chunk, and reports
  time-to-first-audio plus the persistent-cache hit/miss counts
  (parsed from jax's compilation-cache debug logging);
- appends a structured record per process to BENCH_coldstart.jsonl.

Usage:
  python scripts/bench_coldstart.py [--engine chatterbox] [--runs 2]
  VOCALIE_BENCH_SCALE=tiny VOCALIE_BENCH_CPU=1 ... (harness self-test)
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD_SRC = r"""
import logging, os, sys, time

t_start = time.monotonic()

# surface persistent-cache decisions: jax logs hits/misses from the
# compilation_cache module at DEBUG
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)

import jax
from vocalie_tts_tpu.utils.env import bool_env

if bool_env("VOCALIE_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
cache_dir = os.environ["VOCALIE_JIT_CACHE"]
jax.config.update("jax_compilation_cache_dir", cache_dir)
# 0, matching utils/jit_cache.py: through the tunnel even sub-second
# compiles cost a remote round trip, so persist everything
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)

engine_id = os.environ.get("VOCALIE_COLD_ENGINE", "chatterbox")
t_jax = time.monotonic()

from vocalie_tts_tpu.engines import get_backend

backend = get_backend(engine_id)
t_load0 = time.monotonic()
audio, sr, meta = backend.synthesize_chunk(
    "Bonjour, mesure du démarrage à froid.", lang="fr-FR")
import numpy as np

assert np.isfinite(np.asarray(audio)).all() and len(audio) > 0
t_audio = time.monotonic()
print("COLDSTART_JSON " + __import__("json").dumps({
    "time_to_first_audio_s": round(t_audio - t_start, 2),
    "import_jax_s": round(t_jax - t_start, 2),
    "engine_create_plus_synth_s": round(t_audio - t_load0, 2),
    "audio_s": round(len(audio) / sr, 2),
}))
"""


def run_once(i: int, engine: str, cache_dir: Path, env_extra) -> dict:
    env = dict(os.environ)
    env.update({
        "VOCALIE_JIT_CACHE": str(cache_dir),
        "VOCALIE_COLD_ENGINE": engine,
        # APPEND to PYTHONPATH — replacing it drops the axon TPU plugin
        # (lives on PYTHONPATH in this image, e.g. /root/.axon_site)
        "PYTHONPATH": os.pathsep.join(
            p for p in (str(REPO), env.get("PYTHONPATH", "")) if p),
        "VOCALIE_ALLOW_RANDOM_WEIGHTS": env.get("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1"),
        "VOCALIE_MODEL_SCALE": env.get(
            "VOCALIE_MODEL_SCALE", env.get("VOCALIE_BENCH_SCALE", "full")),
    })
    env.update(env_extra)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD_SRC], env=env, cwd=str(REPO),
        capture_output=True, text=True,
        timeout=int(os.environ.get("VOCALIE_COLD_TIMEOUT_S", "1800")),
    )
    wall = time.monotonic() - t0
    stderr = proc.stderr or ""
    hits = len(re.findall(r"cache hit|Getting cached|found in.*cache",
                          stderr, re.IGNORECASE))
    misses = len(re.findall(r"cache miss|Explanation: .*miss|not found in.*cache",
                            stderr, re.IGNORECASE))
    record = {
        "run": i,
        "ok": proc.returncode == 0,
        "wall_s": round(wall, 2),
        "cache_log_hits": hits,
        "cache_log_misses": misses,
    }
    m = re.search(r"COLDSTART_JSON (\{.*\})", proc.stdout or "")
    if m:
        record.update(json.loads(m.group(1)))
    if proc.returncode != 0:
        record["stderr_tail"] = stderr[-800:]
    return record


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="chatterbox")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--fresh-cache", action="store_true",
                    help="start from an EMPTY compile cache (run 1 = true "
                         "cold; later runs measure the warm path)")
    args = ap.parse_args()

    cache_dir = REPO / ".assets" / "jit_cache"
    if args.fresh_cache:
        import tempfile

        cache_dir = Path(tempfile.mkdtemp(prefix="vocalie_cold_cache_"))
    cache_dir.mkdir(parents=True, exist_ok=True)

    records = []
    for i in range(args.runs):
        rec = run_once(i, args.engine, cache_dir, {})
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    summary = {
        "metric": f"cold_start_tfa_{args.engine}",
        "unit": "s",
        "value": records[-1].get("time_to_first_audio_s"),
        "first_process_s": records[0].get("time_to_first_audio_s"),
        "warm_process_s": records[-1].get("time_to_first_audio_s"),
        "runs": records,
        "cache_dir": str(cache_dir),
        "scale": os.environ.get("VOCALIE_MODEL_SCALE",
                                os.environ.get("VOCALIE_BENCH_SCALE", "full")),
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))
    log_path = Path(os.environ.get("VOCALIE_BENCH_LOG",
                                   str(REPO / "BENCH_coldstart.jsonl")))
    with open(log_path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(f"appended record to {log_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
