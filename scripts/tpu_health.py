"""Axon TPU health probe with wedge-safe semantics.

Usage: python scripts/tpu_health.py [--window 120] [--attempts 1]

Probes the device in a SUBPROCESS with a hard timeout — never from the
calling process, because a client that hangs in backend init holds a
live tunnel connection and postpones the session expiry a wedged
service needs to recover (see CLAUDE.md "Environment gotchas" and
bench.py _device_preflight). Exit 0 = healthy, 1 = wedged/unreachable.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax, numpy as np\n"
    "y = jax.jit(lambda a: a * 2)(jax.numpy.ones((8, 8)))\n"
    "print('PROBE_OK' if float(np.asarray(y)[0, 0]) == 2.0 else 'PROBE_BAD')\n"
)


def probe_once(window: float) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, timeout=window, text=True,
        )
        return "PROBE_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=float, default=120.0,
                    help="seconds to wait for one probe")
    ap.add_argument("--attempts", type=int, default=1)
    ap.add_argument("--silence", type=float, default=300.0,
                    help="client-free seconds between failed attempts")
    args = ap.parse_args()

    for attempt in range(1, args.attempts + 1):
        t0 = time.monotonic()
        if probe_once(args.window):
            print(f"healthy ({time.monotonic() - t0:.1f}s)")
            return 0
        print(f"attempt {attempt}/{args.attempts}: no answer in "
              f"{args.window:.0f}s (wedged?)", file=sys.stderr)
        if attempt < args.attempts:
            print(f"silence {args.silence:.0f}s (letting the session expire)",
                  file=sys.stderr)
            time.sleep(args.silence)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
