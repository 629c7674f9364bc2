"""Does XLA:TPU run s8×s8→s32 2-D convolutions at the int8 MXU rate?

Decision microbench for quantizing the AudioSR UNet convs (the DDIM
loop is conv-bound at the bf16 MXU peak — models/common/unet2d.py).
v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8 — if int8 convs hit
~2× bf16 at the UNet's real shapes, activation+weight quantization
is worth the precision trade; if XLA falls back to a dequantized
float path, it is not, and this file is the recorded evidence.

Shapes are the three UNet levels at the 64-window serving bucket
(batch 128 = 64 windows × 2 CFG), NHWC 3×3 SAME.

Usage: python scripts/microbench_int8conv.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

_DN2D = ("NHWC", "HWIO", "NHWC")

# (batch, H, W, C_in, C_out) — UNet levels 1/2/3 at the 64-window bucket
SHAPES = [
    (128, 16, 32, 128, 128),
    (128, 8, 16, 256, 256),
    (128, 4, 8, 512, 512),
]


def bench_conv(b, h, w, cin, cout, dtype, iters):
    """Time `iters` chained convs in ONE jit (one dispatch, one host read)."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, (b, h, w, cin), dtype=np.int8))
        wt = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout), dtype=np.int8))

        def body(i, acc):
            y = jax.lax.conv_general_dilated(
                # data dependence on the carry so XLA cannot hoist/CSE
                (x + acc[0, 0, 0, 0].astype(jnp.int8)),
                wt, (1, 1), "SAME", dimension_numbers=_DN2D,
                preferred_element_type=jnp.int32,
            )
            return (y >> 8).astype(jnp.int8)[..., :cin] if cout != cin else (
                (y >> 8).astype(jnp.int8))

        init = jnp.zeros((b, h, w, cin), jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dtype)
        wt = jnp.asarray(0.05 * rng.standard_normal((3, 3, cin, cout)), dtype)

        def body(i, acc):
            y = jax.lax.conv_general_dilated(
                x + acc[0, 0, 0, 0], wt, (1, 1), "SAME",
                dimension_numbers=_DN2D,
            )
            return y[..., :cin] if cout != cin else y

        init = jnp.zeros((b, h, w, cin), dtype)

    # return ONE element — np.asarray on the full [b,h,w,c] result would
    # download 8-16 MB through the ~20 MB/s tunnel and dominate the time
    fn = jax.jit(lambda a: jax.lax.fori_loop(0, iters, body, a)[0, 0, 0, 0])
    # warm (compile)
    _ = np.asarray(fn(init))
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        _ = np.asarray(fn(init))
        best = min(best, time.monotonic() - t0)
    flop = 2 * b * h * w * 9 * cin * cout * iters
    per_conv_us = best / iters * 1e6
    tput = flop / best / 1e12
    return per_conv_us, tput


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    for (b, h, w, cin, cout) in SHAPES:
        row = f"[{b},{h},{w},{cin}]->{cout} 3x3:"
        for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
            us, tput = bench_conv(b, h, w, cin, cout, dt, args.iters)
            row += f"  {name} {us:8.1f} us/conv {tput:6.1f} T/s"
        print(row, flush=True)


if __name__ == "__main__":
    main()
