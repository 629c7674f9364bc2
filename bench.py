"""Benchmark harness: 60 s chunked French voice-over on the flagship engine.

Measures the BASELINE.json headline metric — Audio RTF
(generated-audio-seconds / wall-second / chip) for a manually chunked
60 s French VO on the Chatterbox-class engine (config #3), using the
real production path: manual [[CHUNK]] markers → run_tts_pipeline →
batched CFG decode → token decoder → gap stitching → WAV.
Ref scope being measured: backend/shared/tts_pipeline.py:292-430 — the
full chunk→stitch→WAV path.

Prints ONE JSON line to stdout, ALWAYS — on success:
  {"metric": ..., "value": RTF, "unit": "x_realtime", "vs_baseline": RTF/20}
and on ANY failure (wedged device, compile hang, exception):
  {"metric": ..., "value": null, "unit": "x_realtime", "vs_baseline": null,
   "error": "<reason>"}
so a captured run can never be mistaken for a broken harness.
(vs_baseline is relative to the ≥20× real-time north star; the
reference publishes no numbers of its own — BASELINE.md).

Failure-handling contract (hard-won, round 2 lost its number to this):
  * The axon service can be wedged by an earlier killed client and
    recovers on session expiry — so the device preflight RETRIES with
    backoff across ~20 min instead of dying after one window.
  * NEVER ``sys.exit`` while a jax RPC thread is live: interpreter
    teardown aborts in C++ ("terminate called …", rc 134) and the JSON
    line is lost. All exits here flush stdio then ``os._exit``.
  * A watchdog thread bounds the whole run (VOCALIE_BENCH_BUDGET_S,
    default 3000 s) and emits the failure JSON if anything hangs past
    it (e.g. a compile that never returns).

Environment knobs:
  VOCALIE_BENCH_SCALE     model scale (default "full" = 0.5B T3)
  VOCALIE_BENCH_REPEATS   timed repetitions (default 3)
  VOCALIE_BENCH_STUDIO    default "1": run the AudioSR studio pass on
                          the generated VO and report the COMBINED
                          session RTF (the north star: ≥20× incl.
                          studio pass). "0" → VO-only flagship metric.
  VOCALIE_BENCH_BUDGET_S  total wall budget before the watchdog fires
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path
from vocalie_tts_tpu.utils.env import bool_env

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("VOCALIE_MODEL_SCALE", os.environ.get("VOCALIE_BENCH_SCALE", "full"))
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))
# Recommended serving config: int8 KV cache + int8 weights + the
# int8-native Pallas decode kernel suite (on by default with the int8
# cache) — 2.21 ms/step vs 4.45 for the round-1 XLA einsum path at
# b=16, cache 576 (scripts/microbench_decode.py; pipeline RTF varies
# ±20% with tunnel conditions, per-step timings are the authoritative
# ranking). Override with VOCALIE_KV_INT8=0 / VOCALIE_WEIGHT_INT8=0 /
# VOCALIE_DECODE_KERNEL=0.
for _knob in ("VOCALIE_KV_INT8", "VOCALIE_WEIGHT_INT8"):
    os.environ.setdefault(_knob, "1")
    if os.environ[_knob] != "1":
        os.environ.pop(_knob, None)

# The studio pass is ON by default: the BASELINE.json north star is
# "≥20× real-time with the AudioSR studio pass included", so the
# driver-captured number should be the combined config. Set
# VOCALIE_BENCH_STUDIO=0 for the VO-only flagship metric.
STUDIO = bool_env("VOCALIE_BENCH_STUDIO", True)
METRIC = (
    "audio_rtf_60s_fr_vo_chatterbox_plus_audiosr_studio"
    if STUDIO
    else "audio_rtf_60s_chunked_fr_vo_chatterbox"
)
BUDGET_S = float(os.environ.get("VOCALIE_BENCH_BUDGET_S", "3000"))

_emitted = threading.Lock()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _emit_and_exit(payload: dict, code: int) -> None:
    """Print the one JSON line and leave WITHOUT interpreter teardown.

    os._exit skips atexit/GC/C++ static destructors — mandatory here
    because abandoned jax RPC threads (wedged axon tunnel) abort the
    normal exit path with rc 134 and eat the JSON line.
    """
    if not _emitted.acquire(blocking=False):
        return  # someone already emitted (watchdog vs main race)
    print(json.dumps(payload), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


def succeed(value: float, extra: dict | None = None) -> None:
    payload = {
        "metric": METRIC,
        "value": round(value, 2),
        "unit": "x_realtime",
        "vs_baseline": round(value / 20.0, 2),
    }
    if extra:
        payload.update(extra)
    _emit_and_exit(payload, 0)


def fail(reason: str) -> None:
    log(f"FATAL: {reason}")
    _emit_and_exit(
        {
            "metric": METRIC,
            "value": None,
            "unit": "x_realtime",
            "vs_baseline": None,
            "error": reason,
        },
        0,  # rc 0: the JSON line is the result; `error` flags the failure
    )


def _start_watchdog() -> None:
    t0 = time.monotonic()

    def watch():
        while True:
            left = BUDGET_S - (time.monotonic() - t0)
            if left <= 0:
                fail(f"watchdog_timeout_after_{int(BUDGET_S)}s")
            time.sleep(min(left, 10.0))

    threading.Thread(target=watch, daemon=True, name="bench-watchdog").start()


import jax  # noqa: E402

# VOCALIE_BENCH_CPU=1: harness self-test mode — run the whole bench
# (incl. the subprocess preflight) on CPU so the capture path can be
# validated without a healthy TPU tunnel. Numbers are NOT comparable.
_CPU_MODE = bool_env("VOCALIE_BENCH_CPU")
if _CPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache so repeat bench runs skip XLA compilation
_cache_dir = REPO / ".assets" / "jit_cache"
_cache_dir.mkdir(parents=True, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


# ~60 s French VO at 2.6 wps ≈ 156 words, with explicit chunk markers
_SENT = (
    "Découvrez une nouvelle façon de créer vos voix off en français, "
    "avec un rendu naturel et une diction parfaitement maîtrisée."  # 19 words
)
N_CHUNKS = 8
SCRIPT = "\n[[CHUNK]]\n".join(" ".join([_SENT]) for _ in range(N_CHUNKS))


_PROBE_SRC = (
    "import os, jax, numpy as np\n"
    "if os.environ.get('VOCALIE_BENCH_CPU', '0') == '1':\n"
    "    jax.config.update('jax_platforms', 'cpu')\n"
    "y = jax.jit(lambda a: a * 2)(jax.numpy.ones((8, 8)))\n"
    "print('PROBE_OK' if float(np.asarray(y)[0, 0]) == 2.0 else 'PROBE_BAD')\n"
)


def _device_preflight() -> None:
    """Verify the device answers a trivial computation, retrying while
    the axon service recovers from a wedge (block_until_ready is
    unreliable on the tunnel — only a host read proves liveness).

    Hard-won shape of this loop (round 3 hit a 2 h wedge):
    * Probes run in SUBPROCESSES. An in-process probe that hangs in
      backend init holds a live tunnel connection for the rest of the
      run — and a wedged axon service recovers on SESSION EXPIRY, which
      a lingering half-open client can postpone indefinitely. The
      parent must not touch the backend until a probe succeeds.
    * Failed probe windows are followed by SILENCE (no client at all)
      so the expiry clock actually runs.
    """
    import subprocess

    # (probe window s, silence after a failed probe s) — ~30 min total
    schedule = [(120, 60), (120, 180), (120, 300), (150, 420), (180, 0)]

    for attempt, (window, silence) in enumerate(schedule, 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, timeout=window, text=True,
            )
            if "PROBE_OK" in out.stdout:
                if attempt > 1:
                    log(f"preflight recovered on attempt {attempt}")
                return
            tail = (out.stderr or out.stdout or "").strip().splitlines()
            log(f"preflight probe unhealthy: {tail[-1] if tail else 'no output'}")
        except subprocess.TimeoutExpired:
            log(
                f"preflight attempt {attempt}/{len(schedule)} did not "
                f"complete in {window}s (service wedged?)"
            )
        if silence and attempt < len(schedule):
            log(f"waiting {silence}s with no client so the session can expire")
            time.sleep(silence)
    fail("preflight_timeout_device_unreachable")


_SR_RUNTIME = None


def _run_studio_pass(vo_path: str, out_dir: Path) -> float:
    """AudioSR studio pass on the generated VO; returns wall seconds.

    Mirrors the reference studio flow (backend/workers/audiosr_runner.py:
    49-70 — chunked long-audio overlap-add) at the production default
    settings (ddim_steps=100, guidance 2.5, chunk 32768/overlap 1024).
    """
    global _SR_RUNTIME
    if _SR_RUNTIME is None:
        from vocalie_tts_tpu.engines import assets as engine_assets
        from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

        _SR_RUNTIME = AudioSRRuntime.create(
            assets_dir=engine_assets.engine_assets_dir("audiosr")
        )
    t0 = time.monotonic()
    _SR_RUNTIME.enhance_file(
        input_path=str(vo_path),
        output_path=str(out_dir / "bench_vo.audiosr.wav"),
        ddim_steps=100,
        guidance_scale=2.5,
        seed=42,
    )
    return time.monotonic() - t0


def main() -> None:
    _start_watchdog()

    from vocalie_tts_tpu.pipeline import run_tts_pipeline
    from vocalie_tts_tpu.text import parse_manual_chunks

    log(f"devices: {jax.devices()}")
    log(f"scale:   {os.environ['VOCALIE_MODEL_SCALE']}")
    log(f"studio:  {STUDIO}")
    _device_preflight()

    chunks, n_markers = parse_manual_chunks(SCRIPT)
    log(f"script:  {len(chunks)} chunks ({n_markers} markers)")

    out_dir = Path(os.environ.get("TMPDIR", "/tmp")) / "vocalie_bench"
    out_dir.mkdir(parents=True, exist_ok=True)

    request = {
        "tts_backend": "chatterbox",
        "script": SCRIPT,
        "chunks": chunks,
        "engine_params": {
            "chatterbox_mode": "fr_finetune",
            "cfg_weight": 0.6,
            "temperature": 0.5,
            "repetition_penalty": 1.35,
        },
        "inter_chunk_gap_ms": 250,
        "target_sr": 24000,
        "out_path": str(out_dir / "bench_vo.wav"),
    }

    # warm: first run compiles every bucket the run needs
    t0 = time.monotonic()
    result = run_tts_pipeline(dict(request))
    log(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s, "
        f"audio {result.meta['total_duration']:.1f}s")
    if STUDIO:
        t0 = time.monotonic()
        _run_studio_pass(request["out_path"], out_dir)
        log(f"studio warmup (incl. compile): {time.monotonic() - t0:.1f}s")

    repeats = int(os.environ.get("VOCALIE_BENCH_REPEATS", "3"))
    rtfs = []
    walls = []
    for i in range(repeats):
        t0 = time.monotonic()
        result = run_tts_pipeline(dict(request))
        wall_vo = time.monotonic() - t0
        wall_sr = _run_studio_pass(request["out_path"], out_dir) if STUDIO else 0.0
        wall = wall_vo + wall_sr
        audio_s = float(result.meta["total_duration"])
        rtfs.append(audio_s / wall)
        walls.append(wall)
        detail = f" (vo {wall_vo:.2f}s + studio {wall_sr:.2f}s)" if STUDIO else ""
        log(
            f"run {i + 1}: wall {wall:.2f}s{detail}, audio {audio_s:.2f}s, "
            f"RTF {rtfs[-1]:.1f}x"
        )

    # p50 latency for the whole 60 s VO (BASELINE.json secondary metric)
    p50 = sorted(walls)[len(walls) // 2]
    log(f"p50 latency (full session): {p50:.2f}s")

    # Headline = MEDIAN run, not best: pipeline RTF swings ±20%+ with
    # tunnel conditions (CLAUDE.md), and best-of-N bakes tunnel luck
    # into the committed evidence (round-4 verdict: max said 31.4× while
    # the median run was ~12×). Keep every run in the record.
    median_rtf = sorted(rtfs)[len(rtfs) // 2]
    succeed(
        median_rtf,
        extra={
            "p50_latency_s": round(p50, 2),
            "runs": [round(r, 2) for r in rtfs],
            "best": round(max(rtfs), 2),
            "worst": round(min(rtfs), 2),
        },
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as exc:  # noqa: BLE001 — convert to structured JSON
        fail(f"bench_exception:{type(exc).__name__}:{exc}")
