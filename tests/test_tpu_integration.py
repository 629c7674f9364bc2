"""Opt-in real-hardware integration tier.

The suite proper runs on virtual CPU devices (conftest). This file is
the equivalent of the reference's env-gated real-engine test
(ref: tests/test_chatterbox_runner_venv.py:9-32 — skipped unless an
env flag AND the heavy runtime are present): set
``RUN_TPU_INTEGRATION=1`` to synthesize on the real chip. It runs in a
fresh subprocess so the conftest's CPU forcing does not apply.

NB: the TPU tunnel is single-tenant — do not run this while a bench or
another TPU job is active.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.integration

REPO_ROOT = Path(__file__).resolve().parents[1]

_CHILD = r"""
import os, sys, time
import numpy as np
from pathlib import Path

sys.path.insert(0, sys.argv[1])
os.environ.setdefault("VOCALIE_MODEL_SCALE", "small")
os.environ["VOCALIE_ALLOW_RANDOM_WEIGHTS"] = "1"
import jax

dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)
from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

rt = ChatterboxRuntime.create(Path(sys.argv[2]), force_init=True)
audio, sr, meta = rt.synthesize("Bonjour, ceci est un test d'integration.")
audio = np.asarray(audio)  # host read = the only real sync on the tunnel
assert audio.ndim == 1 and len(audio) > sr // 2, audio.shape
assert np.isfinite(audio).all()
print("OK", len(audio) / sr, "s", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("RUN_TPU_INTEGRATION") != "1",
    reason="opt-in: set RUN_TPU_INTEGRATION=1 (single-tenant TPU tunnel)",
)
def test_real_device_synthesis(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(REPO_ROOT), str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout
