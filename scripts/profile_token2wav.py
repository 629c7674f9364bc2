"""Ad-hoc profiler for the chatterbox/cosyvoice token2wav stage (flow
conformer + CFM ODE + HiFT) at the shipping bench shapes: batch 8,
320-token bucket, full scale. Prints per-op durations (same trace
parsing as microbench_decode --profile).

Usage: python scripts/profile_token2wav.py [--trace /tmp/t2w_trace]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--trace", type=Path, default=Path("/tmp/t2w_trace"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=320)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".assets" / "jit_cache"))

    from vocalie_tts_tpu.models.chatterbox.model import SPEECH_VOCAB, tokens_to_audio
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

    sys.path.insert(0, str(REPO / "scripts"))
    from microbench_decode import parse_trace

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rt = ChatterboxRuntime.create(REPO / ".assets" / "chatterbox")
    stage2 = jax.jit(functools.partial(tokens_to_audio, cfg=rt.cfg))

    rng = np.random.default_rng(0)
    speech = rng.integers(0, SPEECH_VOCAB, (args.batch, args.tokens)).astype(np.int32)
    mask = np.ones((args.batch, args.tokens), np.float32)
    xv = rng.standard_normal((args.batch, 192)).astype(np.float32)

    def run():
        out = stage2(
            rt.params["decoder"], speech_tokens=jnp.asarray(speech),
            token_mask=jnp.asarray(mask), xvec_emb=jnp.asarray(xv),
            rng=jax.random.PRNGKey(7),
        )
        return np.asarray(out)

    t0 = time.monotonic()
    run()
    print(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s", file=sys.stderr)
    for i in range(3):
        t0 = time.monotonic()
        run()
        print(f"run {i}: {time.monotonic() - t0:.3f}s "
              f"({args.batch}x{args.tokens} tokens)", file=sys.stderr)

    args.trace.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(args.trace)):
        run()
    parse_trace(args.trace, top=35)


if __name__ == "__main__":
    main()
