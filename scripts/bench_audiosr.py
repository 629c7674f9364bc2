"""AudioSR studio-pass benchmark (BASELINE config #5).

60 s of 48 kHz audio through the production enhance path (chunked
overlap-add windows, ddim_steps=100 + CFG) at full scale. Wall clock
ends at the host read inside enhance_audio. Prints one JSON line.

Usage: python scripts/bench_audiosr.py [--seconds 60] [--steps 100]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--multiband", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    cache_dir = REPO / ".assets" / "jit_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vocalie_tts_tpu.engines import assets as engine_assets
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rt = AudioSRRuntime.create(assets_dir=engine_assets.engine_assets_dir("audiosr"))
    print(f"dtype: {rt.cfg.dtype}", file=sys.stderr, flush=True)

    sr = rt.cfg.sample_rate
    t = np.arange(int(args.seconds * sr)) / sr
    audio = (
        0.25 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 1760 * t)
        + 0.01 * np.random.default_rng(0).standard_normal(len(t))
    ).astype(np.float32)

    kw = dict(
        ddim_steps=args.steps, guidance_scale=2.5, seed=7,
        multiband_ensemble=args.multiband,
    )
    t0 = time.monotonic()
    rt.enhance_audio(audio, sr, **kw)
    print(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s", file=sys.stderr, flush=True)

    rtfs = []
    for i in range(args.repeats):
        t0 = time.monotonic()
        out = rt.enhance_audio(audio, sr, **kw)
        wall = time.monotonic() - t0
        rtfs.append(len(out) / sr / wall)
        print(f"run {i + 1}: wall {wall:.2f}s, RTF {rtfs[-1]:.1f}x", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "audiosr_rtf_60s_studio_pass",
        "value": round(max(rtfs), 2),
        "unit": "x_realtime",
        "seconds": args.seconds,
        "ddim_steps": args.steps,
        "multiband": bool(args.multiband),
    }))


if __name__ == "__main__":
    main()
