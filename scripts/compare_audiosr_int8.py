"""Quality gate for VOCALIE_AUDIOSR_INT8: int8 vs bf16 output fidelity.

Runs the production enhance path twice on the same input/seed — once
with the bf16 UNet, once with the int8-conv UNet view — in SEQUENTIAL
subprocesses (one TPU client at a time), then compares the two outputs:
SNR (bf16 output as signal, int8−bf16 as noise), peak/RMS dBFS deltas,
and log-mel spectral distance. Prints one JSON line.

The deployment gate for flipping the int8 default on (alongside the
throughput decision in scripts/microbench_int8conv.py): SNR ≥ 30 dB
and |dBFS delta| ≤ 0.1 dB — the same tolerance the reference-parity
test uses (tests/test_audiosr_dbfs_parity.py).

Usage: python scripts/compare_audiosr_int8.py [--seconds 4] [--steps 50]
       [--scale full]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_RUN_SRC = """
import os, sys
import numpy as np
from vocalie_tts_tpu.utils.env import bool_env
if bool_env("VOCALIE_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

in_path, out_path, assets, steps = sys.argv[1:5]
if steps == "seed":
    # materialize ONE full-precision checkpoint both configs will load.
    # The LDM zero-init convention (resblock out_conv, attn proj, final
    # out_conv all start at 0) makes a random-init UNet the exact zero
    # function — eps==0, so int8 conv error would never reach the
    # output and the gate would be vacuous. Perturb every all-zero
    # float leaf so the DDIM trajectory exercises each conv.
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    rt = AudioSRRuntime.create(assets, force_init=True)
    leaves, treedef = jtu.tree_flatten(rt._save_params)
    key = jax.random.PRNGKey(123)
    out = []
    for leaf in leaves:
        if (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
                and getattr(leaf, "ndim", 0) >= 1 and not bool(jnp.any(leaf))):
            key, k = jax.random.split(key)
            leaf = jax.random.normal(k, leaf.shape, leaf.dtype) * 0.02
        out.append(leaf)
    rt._save_params = jtu.tree_unflatten(treedef, out)
    rt.save_weights()
    print("RUN_OK seed")
    raise SystemExit(0)
rt = AudioSRRuntime.create(assets)
res = rt.enhance_file(input_path=in_path, output_path=out_path,
                      ddim_steps=int(steps), guidance_scale=2.5, seed=7)
print("RUN_OK", res["duration_s"])
"""


def _run(cfg_env: dict, in_path: Path, out_path: Path, assets: Path, steps: int) -> None:
    env = dict(os.environ, **cfg_env)
    out = subprocess.run(
        [sys.executable, "-c", _RUN_SRC, str(in_path), str(out_path),
         str(assets), str(steps)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    if "RUN_OK" not in out.stdout:
        raise RuntimeError(f"enhance run failed ({cfg_env}):\n{out.stderr[-2000:]}")


def _logmel_distance(a, b, sr: int) -> float:
    """Mean |Δ| in dB over a 64-band log-mel spectrogram."""
    import numpy as np
    from scipy.signal import stft

    def logmel(x):
        f, t, z = stft(x, fs=sr, nperseg=1024, noverlap=512)
        p = np.abs(z) ** 2
        edges = np.linspace(0, len(f) - 1, 65).astype(int)
        bands = np.stack([p[lo:hi + 1].mean(axis=0)
                          for lo, hi in zip(edges[:-1], edges[1:])])
        return 10 * np.log10(bands + 1e-12)

    return float(np.mean(np.abs(logmel(a) - logmel(b))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", default=os.environ.get("VOCALIE_MODEL_SCALE", "full"))
    ap.add_argument("--cpu", action="store_true", help="force CPU (smoke)")
    args = ap.parse_args()

    import numpy as np

    from vocalie_tts_tpu.io.wavio import read_wav, write_wav

    base_env = {
        "VOCALIE_MODEL_SCALE": args.scale,
        "VOCALIE_ALLOW_RANDOM_WEIGHTS": "1",
        "VOCALIE_AUDIOSR_BF16": "1",
        "VOCALIE_FORCE_CPU": "1" if args.cpu else "0",
    }

    with tempfile.TemporaryDirectory(prefix="asr_int8_") as td:
        tmp = Path(td)
        # band-limited multitone + noise floor: exercises the Butterworth
        # split and gives the DDIM loop non-degenerate conditioning
        sr = 24000
        t = np.arange(int(sr * args.seconds)) / sr
        rng = np.random.default_rng(0)
        audio = sum(0.15 * np.sin(2 * np.pi * f * t) for f in (220, 660, 1760))
        audio = (audio + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
        in_path = tmp / "in.wav"
        write_wav(in_path, audio, sr)

        assets = tmp / "assets"  # shared weight store: both runs see
        assets.mkdir()           # the SAME random-init checkpoint
        _run(dict(base_env, VOCALIE_AUDIOSR_INT8="0"), in_path,
             tmp / "seed.wav", assets, "seed")

        _run(dict(base_env, VOCALIE_AUDIOSR_INT8="0"), in_path, tmp / "bf16.wav",
             assets, args.steps)
        _run(dict(base_env, VOCALIE_AUDIOSR_INT8="1"), in_path, tmp / "int8.wav",
             assets, args.steps)

        a, sr_a = read_wav(tmp / "bf16.wav")
        b, sr_b = read_wav(tmp / "int8.wav")
        assert sr_a == sr_b and a.shape == b.shape, (sr_a, sr_b, a.shape, b.shape)
        a = a.astype(np.float64)
        b = b.astype(np.float64)

        noise = b - a
        snr_db = 10 * np.log10(np.sum(a * a) / max(np.sum(noise * noise), 1e-20))

        def dbfs(x, f):
            return 20 * np.log10(max(float(f(np.abs(x))), 1e-12))

        rms = lambda x: np.sqrt(np.mean(x ** 2))  # noqa: E731
        peak_delta = dbfs(b, np.max) - dbfs(a, np.max)
        rms_delta = dbfs(b, rms) - dbfs(a, rms)
        result = {
            "metric": "audiosr_int8_fidelity",
            "snr_db": round(float(snr_db), 2),
            "peak_dbfs_delta": round(peak_delta, 4),
            "rms_dbfs_delta": round(rms_delta, 4),
            "logmel_dist_db": round(_logmel_distance(a, b, sr_a), 3),
            "scale": args.scale,
            "steps": args.steps,
            "gate_pass": bool(
                snr_db >= 30.0
                and abs(peak_delta) <= 0.1
                and abs(rms_delta) <= 0.1
            ),
        }
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
