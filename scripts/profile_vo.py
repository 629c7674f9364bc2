"""Stage-split profiler for the flagship Chatterbox 60 s VO session.

Round-4 verdict #5: the studio pass has a committed per-stage split but
the VO (the other half of the north star) never did. This measures, at
the exact bench shapes (8 chunks of the bench sentence, b=8 CFG decode,
fr_finetune mode):

  prep_s     host prep + prompt-embed dispatch (tokenize, bucket, numpy)
  decode_s   prefill + AR decode while_loop (host read of tok_lengths)
  chain_s    the real session: decode + stage2 queued behind it + ONE
             audio host read
  stage2_s   chain_s - decode_s  (token2wav + wire download)
  pipeline_s full run_tts_pipeline wall (adds chunk parse, gap stitch,
             wav write, retry pass)

On axon, only a host read synchronizes — decode_s forces an extra
read the production path doesn't do, so decode_s/chain_s come from
SEPARATE repeats (never subtract within one run).

Usage: python scripts/profile_vo.py [--repeats 3] [--json]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("VOCALIE_MODEL_SCALE", "full")
os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))

_SENT = (
    "Découvrez une nouvelle façon de créer vos voix off en français, "
    "avec un rendu naturel et une diction parfaitement maîtrisée."
)
N_CHUNKS = 8

BENCH_PARAMS = dict(
    mode="fr_finetune", lang="fr-FR", voice_ref_path=None,
    exaggeration=0.5, cfg_weight=0.6,
)
TEMPERATURE, REP_PEN = 0.5, 1.35


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", action="store_true", help="machine-readable only")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    if os.environ.get("VOCALIE_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from vocalie_tts_tpu.engines import assets
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rt = ChatterboxRuntime.create(assets.engine_assets_dir("chatterbox"))
    texts = [_SENT] * N_CHUNKS

    def prepare():
        t0 = time.monotonic()
        t3, embeds, prompt_lengths, buckets = rt._prepare_batch(
            texts, **BENCH_PARAMS
        )
        return (t3, embeds, prompt_lengths, buckets), time.monotonic() - t0

    def decode(prep, rng):
        (t3, embeds, prompt_lengths, buckets) = prep
        _b, _p, decode_bucket, cache_len = buckets
        return rt._generate(
            t3, embeds, prompt_lengths, rng,
            cache_len=cache_len, max_new=decode_bucket,
            temperature=TEMPERATURE, cfg_weight=BENCH_PARAMS["cfg_weight"],
            repetition_penalty=REP_PEN,
        )

    def stage2(tokens, tok_lengths, rng):
        import jax.numpy as jnp

        from vocalie_tts_tpu.models.chatterbox.model import XVECTOR_DIM

        xv_b = jnp.zeros((int(tokens.shape[0]), XVECTOR_DIM), jnp.float32)
        return rt._stage2(
            rt.params["decoder"], tokens=tokens, tok_lengths=tok_lengths,
            xvec_emb=xv_b, rng=rng,
        )

    rng = jax.random.PRNGKey(123)

    # ── warmup: compile every program the measured paths use ────────────
    t0 = time.monotonic()
    prep, _ = prepare()
    toks, lens = decode(prep, rng)
    audio = stage2(toks, lens, rng)
    _ = jax.device_get((audio, lens))
    print(f"warmup (incl. compile): {time.monotonic() - t0:.1f}s",
          file=sys.stderr, flush=True)

    prep_s, decode_s, chain_s, tok_counts = [], [], [], []
    for i in range(args.repeats):
        # decode-only run (own repeat: the extra sync perturbs)
        prep, p_s = prepare()
        t0 = time.monotonic()
        toks, lens = decode(prep, jax.random.fold_in(rng, i))
        lens_h = np.asarray(jax.device_get(lens))
        decode_s.append(time.monotonic() - t0)
        tok_counts.append(int(lens_h.sum()))
        prep_s.append(p_s)

        # full-chain run (the production shape: ONE read at the end)
        prep, _ = prepare()
        t0 = time.monotonic()
        toks, lens = decode(prep, jax.random.fold_in(rng, 1000 + i))
        audio = stage2(toks, lens, jax.random.fold_in(rng, 2000 + i))
        _audio_h, lens_h = jax.device_get((audio, lens))
        chain_s.append(time.monotonic() - t0)
        print(
            f"run {i}: prep {p_s * 1e3:.0f}ms decode {decode_s[-1]:.2f}s "
            f"chain {chain_s[-1]:.2f}s (tokens {tok_counts[-1]})",
            file=sys.stderr, flush=True,
        )

    # ── pipeline-level wall for the same session (retry, stitch, wav) ──
    from vocalie_tts_tpu.pipeline import run_tts_pipeline
    from vocalie_tts_tpu.text import parse_manual_chunks

    script = "\n[[CHUNK]]\n".join([_SENT] * N_CHUNKS)
    chunks, _ = parse_manual_chunks(script)
    out_dir = Path(os.environ.get("TMPDIR", "/tmp")) / "vocalie_profile_vo"
    out_dir.mkdir(parents=True, exist_ok=True)
    request = {
        "tts_backend": "chatterbox",
        "script": script,
        "chunks": chunks,
        "engine_params": {
            "chatterbox_mode": "fr_finetune", "cfg_weight": 0.6,
            "temperature": 0.5, "repetition_penalty": 1.35,
        },
        "inter_chunk_gap_ms": 250,
        "target_sr": 24000,
        "out_path": str(out_dir / "vo.wav"),
    }
    run_tts_pipeline(dict(request))  # warm (retry bucket shapes etc.)
    pipeline_s, audio_dur = [], 0.0
    for _ in range(args.repeats):
        t0 = time.monotonic()
        result = run_tts_pipeline(dict(request))
        pipeline_s.append(time.monotonic() - t0)
        audio_dur = float(result.meta["total_duration"])

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "metric": "vo_stage_split_chatterbox",
        "unit": "s",
        "prep_s": round(med(prep_s), 3),
        "decode_s": round(med(decode_s), 3),
        "chain_s": round(med(chain_s), 3),
        "stage2_s": round(med(chain_s) - med(decode_s), 3),
        "pipeline_s": round(med(pipeline_s), 3),
        "pipeline_minus_chain_s": round(med(pipeline_s) - med(chain_s), 3),
        "audio_s": round(audio_dur, 2),
        "pipeline_rtf": round(audio_dur / med(pipeline_s), 1),
        "tokens_decoded": med(tok_counts),
        "runs": {
            "prep": [round(x, 3) for x in prep_s],
            "decode": [round(x, 3) for x in decode_s],
            "chain": [round(x, 3) for x in chain_s],
            "pipeline": [round(x, 3) for x in pipeline_s],
        },
        "scale": os.environ.get("VOCALIE_MODEL_SCALE"),
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
    }
    print(json.dumps(summary))
    if not args.no_record:
        with open(REPO / "BENCH_vo_profile.jsonl", "a", encoding="utf-8") as fh:
            fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
