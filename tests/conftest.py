"""Test bootstrap: force JAX onto a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py / the driver; the suite must
run anywhere. Setting the env vars here (before any jax import) gives
every test 8 virtual CPU devices for multi-chip sharding tests.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
