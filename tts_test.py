"""One-shot synthesis smoke script (counterpart of the reference's root
``tts_test.py`` scratch tool, ref: tts_test.py:1-39 — a standalone
"does the flagship model speak at all" check outside the server/job
stack). Runs the Chatterbox-class engine directly on whatever device
jax finds (TPU, else CPU) and writes one WAV.

Usage:
  VOCALIE_ALLOW_RANDOM_WEIGHTS=1 python tts_test.py \
      --text "Bonjour, ceci est un essai." [--out out.wav] [--scale tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser(description="Synthesize one French line.")
    p.add_argument("--text", required=True, help="Texte à synthétiser (FR).")
    p.add_argument("--out", default="tts_test.wav", help="Chemin du WAV de sortie.")
    p.add_argument("--scale", default=os.environ.get("VOCALIE_MODEL_SCALE", "full"),
                   choices=("full", "small", "tiny"))
    p.add_argument("--mode", default="fr_finetune",
                   help="chatterbox_mode engine param (fr_finetune|base)")
    args = p.parse_args()

    os.environ["VOCALIE_MODEL_SCALE"] = args.scale
    os.environ.setdefault("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
    os.environ.setdefault("VOCALIE_ASSETS_DIR", str(REPO / ".assets"))

    from vocalie_tts_tpu.utils.platform import apply_platform_preference

    apply_platform_preference()  # VOCALIE_PLATFORM=cpu → stay off the TPU

    import jax

    print(f"Device: {jax.devices()[0].platform}", file=sys.stderr)

    from vocalie_tts_tpu.pipeline import run_tts_pipeline
    from vocalie_tts_tpu.text import parse_manual_chunks

    out_path = Path(args.out).expanduser().resolve()
    out_path.parent.mkdir(parents=True, exist_ok=True)

    chunks, _ = parse_manual_chunks(args.text)
    t0 = time.monotonic()
    result = run_tts_pipeline({
        "tts_backend": "chatterbox",
        "script": args.text,
        "chunks": chunks,
        "engine_params": {"chatterbox_mode": args.mode},
        "target_sr": 24000,
        "out_path": str(out_path),
    })
    dur = result.meta.get("total_duration", 0.0)
    print(f"Saved: {out_path} ({dur:.2f}s audio in "
          f"{time.monotonic() - t0:.1f}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
