"""Ad-hoc profiler for the AudioSR enhance path: one 32-window batched
dispatch under jax.profiler.trace, then the op-level duration table
(same parsing as scripts/microbench_decode.py --profile).

Usage: python scripts/profile_audiosr.py [--trace /tmp/asr_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("VOCALIE_MODEL_SCALE", "full")
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=Path, default=Path("/tmp/asr_trace"))
    ap.add_argument("--windows", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import numpy as np

    from vocalie_tts_tpu.engines import assets as engine_assets
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    sys.path.insert(0, str(REPO / "scripts"))
    from microbench_decode import parse_trace

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rt = AudioSRRuntime.create(assets_dir=engine_assets.engine_assets_dir("audiosr"))

    rng = np.random.default_rng(0)
    batch = (0.2 * rng.standard_normal((args.windows, 32768))).astype(np.float32)

    t0 = time.monotonic()
    out = rt._run_batch(batch, args.steps, 2.5, 7)
    print(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s", file=sys.stderr)

    for i in range(3):
        t0 = time.monotonic()
        out = rt._run_batch(batch, args.steps, 2.5, 7)
        print(f"run {i}: {time.monotonic() - t0 :.3f}s for {args.windows} windows "
              f"({args.windows * 32768 / 48000:.1f}s audio)", file=sys.stderr)

    args.trace.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(args.trace)):
        out = rt._run_batch(batch, args.steps, 2.5, 7)
    del out
    parse_trace(args.trace, top=30)


if __name__ == "__main__":
    main()
