"""Dump the TPU-compiled HLO for the AudioSR enhance_window program so
profile fusion names (fusion.NNNN, convert_reduce_fusion.NNN) can be
attributed to model ops. Relies on the persistent compile cache to make
the compile cheap after a profile run.

Usage: python scripts/dump_audiosr_hlo.py [--windows 64] [--steps 100] \
          [--out /tmp/asr_hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("VOCALIE_MODEL_SCALE", "full")
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", type=Path, default=Path("/tmp/asr_hlo.txt"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = REPO / ".assets" / "jit_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vocalie_tts_tpu.engines import assets as engine_assets
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    rt = AudioSRRuntime.create(assets_dir=engine_assets.engine_assets_dir("audiosr"))
    batch = np.zeros((args.windows, 32768), np.int16)
    lowered = rt._enhance.lower(
        rt.params,
        audio_48k=jnp.asarray(batch),
        rng=jax.random.PRNGKey(0),
        ddim_steps=args.steps,
        guidance_scale=2.5,
    )
    txt = lowered.compile().as_text()
    args.out.write_text(txt)
    print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
