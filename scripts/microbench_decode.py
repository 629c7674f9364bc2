"""In-jit decode-loop microbenchmark — the authoritative per-step timer.

Pipeline-level RTF swings ±20% with tunnel conditions; per-step decode
cost does not. This script runs N decode steps inside ONE jitted
fori_loop (no per-step dispatch — a single dispatch through the tunnel
costs ~12 ms, which would otherwise dominate) and ends with ONE host
read (block_until_ready does not synchronize on the axon relay).

Usage:
  python scripts/microbench_decode.py                 # both-int8 config
  python scripts/microbench_decode.py --kv bf16 --weights bf16
  python scripts/microbench_decode.py --profile /tmp/trace  # + op table

Shapes mirror the shipping bench config: 0.5B T3 (d1024/L30/h16),
batch 16 (8 chunks × CFG pair), cache 640 (the 128-rounded
production allocation — the T-blocked attention kernel reads only the
valid region, so allocation size is nearly free).
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build(args):
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        decode_step,
        init_params,
        prefill,
        fuse_decode_weights,
        quantize_weights_int8,
    )

    cfg = TransformerConfig(
        vocab_size=args.vocab,
        d_model=args.d_model,
        n_layers=args.layers,
        n_heads=args.heads,
        n_kv_heads=args.kv_heads,
        d_head=args.d_model // args.heads,
        d_ff=args.d_ff,
        max_seq_len=1024,
        kv_quant=args.kv == "int8",
        decode_kernel=args.kernel,
        dense_kernel=args.dense,
        dtype=jnp.bfloat16,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.weights == "int8":
        params = quantize_weights_int8(params)
    if args.fuse:
        params = fuse_decode_weights(params)
    # fused whole-step kernel A/B (b=1 only; inert unless
    # VOCALIE_FUSED_STEP=1 and the int8 packed serving config is on)
    from vocalie_tts_tpu.models.common.transformer import maybe_head_stack_qkv

    params = maybe_head_stack_qkv(params, cfg, args.batch)

    tokens = jnp.zeros((args.batch, args.prompt), jnp.int32)
    lengths = jnp.full((args.batch,), args.prompt_fill, jnp.int32)

    @jax.jit
    def make_cache(params):
        _logits, cache = prefill(params, cfg, tokens, lengths, cache_len=args.cache)
        return cache

    cache = make_cache(params)

    def loop(params, cache, tok):
        def body(i, state):
            tok, cache = state
            logits, cache = decode_step(params, cfg, tok, cache)
            # argmax keeps a data dependency between steps (sampling
            # itself is benchmarked at pipeline level)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, args.steps, body, (tok, cache))
        return tok, cache.n_decoded

    # no donation: the one jit-boundary cache copy amortizes to ~13 µs
    # per step over 100 steps and lets every rep reuse the same cache
    jit_loop = jax.jit(loop)
    tok0 = jnp.zeros((args.batch,), jnp.int32)
    return jit_loop, params, cache, tok0


def parse_trace(trace_dir: Path, top: int = 25):
    """Sum durations by op name from the Chrome-format trace."""
    files = sorted(trace_dir.rglob("*.trace.json.gz"))
    if not files:
        print("no trace files found under", trace_dir, file=sys.stderr)
        return
    events = json.loads(gzip.open(files[-1], "rt").read()).get("traceEvents", [])
    # keep device-lane complete events only
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    by_op = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        by_op[e.get("name", "?")] += e.get("dur", 0.0)
        count[e.get("name", "?")] += 1
    total = sum(by_op.values())
    print(f"\n-- device op breakdown (total {total / 1e3:.2f} ms) --")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:9.2f} ms  x{count[name]:<5d} {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=1026,
                    help="LM-core vocab (1026 = chatterbox speech core; "
                         "2050 = qwen3 codec core)")
    ap.add_argument("--cache", type=int, default=640)
    ap.add_argument("--prompt", type=int, default=192)
    ap.add_argument("--prompt-fill", type=int, default=160)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=30)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=16)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--weights", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--kernel", action="store_true", help="Pallas decode attention")
    ap.add_argument("--dense", action="store_true",
                    help="int8-native Pallas dense/MLP kernels (needs --weights int8)")
    ap.add_argument("--fuse", action=argparse.BooleanOptionalAction, default=True,
                    help="fused qkv/gateup decode dots (runtime default)")
    ap.add_argument("--profile", type=Path, help="jax.profiler trace dir")
    ap.add_argument("--cpu", action="store_true", help="force CPU (smoke test)")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}", file=sys.stderr)

    jit_loop, params, cache, tok0 = build(args)

    # warm (compile) — host read to actually synchronize
    t0 = time.monotonic()
    tok, n_dec = jit_loop(params, cache, tok0)
    np.asarray(tok)
    print(f"compile+first run: {time.monotonic() - t0:.1f}s", file=sys.stderr)

    per_step = []
    for _ in range(args.reps):
        t0 = time.monotonic()
        tok, n_dec = jit_loop(params, cache, tok0)
        np.asarray(tok)  # host read = the only real sync on axon
        per_step.append((time.monotonic() - t0) / args.steps * 1e3)
    if args.profile:
        args.profile.mkdir(parents=True, exist_ok=True)
        with jax.profiler.trace(str(args.profile)):
            tok, _ = jit_loop(params, cache, tok0)
            np.asarray(tok)

    result = {
        "config": f"kv={args.kv} w={args.weights} kernel={args.kernel} dense={args.dense}",
        "batch": args.batch,
        "cache": args.cache,
        "steps": args.steps,
        "ms_per_step": round(min(per_step), 3),
        "all_reps_ms": [round(x, 3) for x in per_step],
    }
    print(json.dumps(result))
    if args.profile:
        parse_trace(args.profile)


if __name__ == "__main__":
    main()
