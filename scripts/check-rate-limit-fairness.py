#!/usr/bin/env python
"""Rate-limit fairness simulation (ref: scripts/check-rate-limit-fairness.py).

Simulates concurrent clients against the token-bucket limiter and
asserts (1) per-key isolation — a greedy client cannot starve others —
and (2) sustained throughput converges to the configured rps.
"""

import sys
from pathlib import Path
from unittest import mock

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vocalie_tts_tpu.server import rate_limit


def run_simulation(duration_s: float = 4.0, rps: float = 5.0, burst: int = 10) -> int:
    rate_limit.reset_buckets()
    fake_now = [0.0]
    with mock.patch.object(rate_limit.time, "monotonic", lambda: fake_now[0]):
        granted = {"greedy": 0, "polite": 0}
        dt = 0.01
        steps = int(duration_s / dt)
        for i in range(steps):
            fake_now[0] += dt
            # greedy client hammers every tick
            if rate_limit.consume("1.1.1.1", {"X-API-Key": "greedy"}, rps=rps, burst=burst):
                granted["greedy"] += 1
            # polite client asks at exactly rps
            if i % int(1 / (rps * dt)) == 0:
                if rate_limit.consume("2.2.2.2", {"X-API-Key": "polite"}, rps=rps, burst=burst):
                    granted["polite"] += 1

    expected_sustained = duration_s * rps + burst
    problems = 0
    if granted["greedy"] > expected_sustained * 1.1:
        print(f"FAIL: greedy got {granted['greedy']} > sustained cap {expected_sustained}")
        problems += 1
    polite_expected = duration_s * rps
    if granted["polite"] < polite_expected * 0.9:
        print(f"FAIL: polite starved: {granted['polite']} < {polite_expected}")
        problems += 1
    print(f"greedy={granted['greedy']} polite={granted['polite']} "
          f"(sustained cap {expected_sustained:.0f})")
    return problems


if __name__ == "__main__":
    problems = run_simulation()
    if problems:
        sys.exit(1)
    print("rate-limit fairness OK")
