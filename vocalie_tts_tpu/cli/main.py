"""``vocalie-backend`` CLI (ref: vocalie_backend/cli.py).

Subcommands: start / stop / status / health / install / doctor / logs.
Exit codes (the macOS app switches on these):
  0 ok · 1 error · 2 not running · 3 port in use · 4 missing dep
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

from vocalie_tts_tpu import __version__
from vocalie_tts_tpu.cli import runstate

EXIT_OK = 0
EXIT_ERROR = 1
EXIT_NOT_RUNNING = 2
EXIT_PORT_IN_USE = 3
EXIT_MISSING_DEP = 4


def cmd_start(args) -> int:
    try:
        state = runstate.start(host=args.host, port=args.port)
    except RuntimeError as exc:
        msg = str(exc)
        print(f"error: {msg}", file=sys.stderr)
        if "in use" in msg:
            return EXIT_PORT_IN_USE
        if "already running" in msg:
            return EXIT_ERROR
        return EXIT_ERROR
    if args.wait and not runstate.wait_ready(
        host=args.host, port=args.port, timeout_s=args.wait_timeout
    ):
        print("warning: backend started but /v1/health not yet ready", file=sys.stderr)
    if args.json:
        print(state.to_json())
    else:
        print(f"backend started (pid={state.pid}, http://{state.host}:{state.port})")
        print(f"log: {state.log_file}")
    return EXIT_OK


def cmd_stop(args) -> int:
    state = runstate.stop(timeout_s=args.timeout, force=args.force)
    if state.running:
        print(f"warning: backend still running (pid={state.pid})", file=sys.stderr)
        return EXIT_ERROR
    if args.json:
        print(state.to_json())
    else:
        print("backend stopped")
    return EXIT_OK


def cmd_status(args) -> int:
    state = runstate.get_state()
    if args.json:
        print(state.to_json())
    else:
        if state.running:
            print(f"running: pid={state.pid} http://{state.host}:{state.port}")
        else:
            print("stopped")
    return EXIT_OK if state.running else EXIT_NOT_RUNNING


def cmd_health(args) -> int:
    """Probe /v1/health; ``--json`` output is the desktop-client contract.

    The Swift app greps stdout for ``"ok": true`` (ref:
    apps/macos/Sources/VocalieTTS/BackendManager.swift refreshHealth,
    vocalie_backend/health.py HealthResult.to_json), so the JSON shape
    and indent-2 formatting are pinned.
    """
    status: int | None
    try:
        status, body, latency_ms = runstate.probe_health(
            host=args.host, port=args.port, timeout_s=args.timeout
        )
        ok, error = status == 200, None
    except Exception as exc:
        status, body, latency_ms = None, None, None
        ok, error = False, str(exc)
    if args.json:
        print(
            json.dumps(
                {
                    "ok": ok,
                    "http_status": status,
                    "latency_ms": latency_ms,
                    "body": body,
                    "error": error,
                },
                indent=2,
                ensure_ascii=True,
            )
        )
    elif ok:
        print(f"{body.get('status', 'unknown')} (HTTP {status}, {latency_ms} ms)")
    else:
        print(f"error: health probe failed: {error or status}", file=sys.stderr)
    if ok:
        return EXIT_OK
    return EXIT_NOT_RUNNING if status is None else EXIT_ERROR


def cmd_install(args) -> int:
    from vocalie_tts_tpu.engines.install import INSTALLABLE_ENGINES, run_install

    engines = args.engines or list(INSTALLABLE_ENGINES)
    failed = []
    for engine_id in engines:
        ok, logs = run_install(engine_id)
        tag = "ok" if ok else "FAILED"
        print(f"install {engine_id}: {tag}")
        if args.verbose or not ok:
            for line in logs:
                print(f"  {line}")
        if not ok:
            failed.append(engine_id)
    return EXIT_OK if not failed else EXIT_ERROR


def cmd_convert_hf(args) -> int:
    from pathlib import Path

    from vocalie_tts_tpu.engines import assets
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_hf_checkpoint,
        import_vocoder_checkpoint,
    )

    stage = getattr(args, "stage", "lm")
    # prefix default depends on the stage: the LM stage auto-detects
    # published layouts (import_hf_checkpoint), generator checkpoints
    # are usually unprefixed
    prefix = args.prefix if args.prefix is not None else (
        None if stage == "lm" else ""
    )
    if args.family == "piper" and stage != "vocoder":
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_vits_checkpoint,
        )

        report = import_vits_checkpoint(
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir("piper"),
            prefix=prefix or "",
        )
        print(
            f"convert-hf: piper VITS ({report['vits_params']} params) "
            f"in {report['weights_dir']}"
        )
        return 0
    if args.family == "xtts" and stage != "vocoder":
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_xtts_checkpoint,
        )

        report = import_xtts_checkpoint(
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir("xtts"),
            prefix=args.prefix if args.prefix is not None else "gpt.",
        )
        print(
            f"convert-hf: xtts GPT ({report['lm_params']} params) "
            f"in {report['weights_dir']}"
        )
        return 0
    if args.family == "audiosr":
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_audiosr_checkpoint,
        )

        report = import_audiosr_checkpoint(
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir("audiosr"),
        )
        print(
            f"convert-hf: audiosr VAE+UNet ({report['ldm_params']} params) "
            f"in {report['weights_dir']}"
        )
        return 0
    if stage == "codec":
        if args.family != "qwen3":
            print("convert-hf: --stage codec applies to the qwen3 family")
            return 2
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_codec_decoder_checkpoint,
        )

        report = import_codec_decoder_checkpoint(
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir("qwen3"),
            prefix=prefix or "",
        )
        print(
            f"convert-hf: qwen3 -> codec_decoder "
            f"({report['codec_params']} params) in {report['weights_dir']}"
        )
        return 0
    if stage == "speech-tokenizer":
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_s3_tokenizer_checkpoint,
        )

        report = import_s3_tokenizer_checkpoint(
            family=args.family,
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir(args.family),
            prefix=prefix,
        )
        print(
            f"convert-hf: {report['family']} -> s3_tokenizer "
            f"({report['params']} params, {report['tokens_per_second']} Hz) "
            f"in {report['weights_dir']}"
        )
        return 0
    if stage == "token2wav":
        from vocalie_tts_tpu.models.convert.import_checkpoint import (
            import_token2wav_checkpoint,
        )

        report = import_token2wav_checkpoint(
            family=args.family,
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir(args.family),
            hift_checkpoint=(
                Path(args.hift_checkpoint) if args.hift_checkpoint else None
            ),
        )
        print(
            f"convert-hf: {report['family']} -> {report['name']}.t2w "
            f"({report['t2w_params']} params) in {report['weights_dir']}"
        )
        return 0
    if stage == "vocoder":
        report = import_vocoder_checkpoint(
            family=args.family,
            checkpoint=Path(args.checkpoint),
            assets_dir=assets.engine_assets_dir(args.family),
            prefix=prefix,
        )
        print(
            f"convert-hf: {report['family']} -> {report['name']}.vocoder "
            f"({report['vocoder_params']} params) in {report['weights_dir']}"
        )
        return 0

    report = import_hf_checkpoint(
        family=args.family,
        checkpoint=Path(args.checkpoint),
        assets_dir=assets.engine_assets_dir(args.family),
        name=args.name,
        prefix=prefix,
    )
    print(
        f"convert-hf: {report['family']} -> {report['name']} "
        f"({report['lm_params']} LM params) in {report['weights_dir']}"
    )
    return 0


def cmd_prefetch(args) -> int:
    """Hub prefetch (ref: tts_backends/qwen3_prefetch.py). The
    standalone module keeps the reference's exact exit codes; the CLI
    maps any failure onto this surface's 0/1 contract."""
    from vocalie_tts_tpu.engines import qwen3_prefetch

    argv = []
    if args.models:
        argv += ["--models", args.models]
    if args.assets_dir:
        argv += ["--assets-dir", args.assets_dir]
    rc = qwen3_prefetch.main(argv)
    return EXIT_OK if rc == 0 else EXIT_ERROR


def cmd_finetune_fr(args) -> int:
    from pathlib import Path

    from vocalie_tts_tpu.engines import assets
    from vocalie_tts_tpu.training.finetune_fr import finetune_overlay

    result = finetune_overlay(
        assets_dir=assets.engine_assets_dir("chatterbox"),
        dataset=Path(args.dataset) if args.dataset else None,
        steps=args.steps,
        batch_size=args.batch_size,
        seq_len=args.seq_len,
        learning_rate=args.lr,
        tp=args.tp,
    )
    print(
        f"finetune-fr: loss {result['first_loss']:.4f} -> "
        f"{result['final_loss']:.4f} over {result['steps']} steps; "
        "saved overlay t3_fr"
    )
    return 0


def cmd_doctor(args) -> int:
    checks = []
    checks.append(("python", sys.version.split()[0], True))
    try:
        import jax

        devices = jax.devices()
        checks.append(("jax", jax.__version__, True))
        checks.append(("devices", str(devices), len(devices) > 0))
    except Exception as exc:  # pragma: no cover
        checks.append(("jax", str(exc), False))
    try:
        import aiohttp

        checks.append(("aiohttp", aiohttp.__version__, True))
    except Exception as exc:  # pragma: no cover
        checks.append(("aiohttp", str(exc), False))
    checks.append(("ffmpeg", shutil.which("ffmpeg") or "absent (optional)", True))
    from vocalie_tts_tpu.engines.install import INSTALLABLE_ENGINES, backend_status

    for engine_id in INSTALLABLE_ENGINES:
        status = backend_status(engine_id)
        checks.append(
            (f"engine:{engine_id}", "installed" if status["installed"] else "not installed", True)
        )
    ok = all(c[2] for c in checks)
    if args.json:
        print(json.dumps([{"name": n, "value": v, "ok": o} for n, v, o in checks]))
    else:
        for name, value, good in checks:
            print(f"{'✓' if good else '✗'} {name}: {value}")
    return EXIT_OK if ok else EXIT_MISSING_DEP


def cmd_logs(args) -> int:
    log_file = Path(runstate.LOG_FILE)
    if not log_file.exists():
        print("no log file yet", file=sys.stderr)
        return EXIT_ERROR
    if not args.follow:
        lines = log_file.read_text(errors="replace").splitlines()
        for line in lines[-args.lines:]:
            print(line)
        return EXIT_OK
    with log_file.open("r", errors="replace") as fh:
        fh.seek(0, 2)
        try:
            while True:
                line = fh.readline()
                if line:
                    print(line, end="")
                else:
                    time.sleep(0.25)
        except KeyboardInterrupt:
            return EXIT_OK


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="vocalie-backend")
    parser.add_argument("--version", action="version", version=__version__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("start", help="start the backend server")
    p.add_argument("--host", default=runstate.API_HOST)
    p.add_argument("--port", type=int, default=runstate.API_PORT)
    p.add_argument("--wait", action="store_true")
    p.add_argument("--wait-timeout", type=float, default=30.0)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_start)

    p = sub.add_parser("stop", help="stop the backend server")
    p.add_argument("--timeout", type=float, default=10.0)
    p.add_argument("--force", action="store_true")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_stop)

    p = sub.add_parser("status", help="show run state")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_status)

    p = sub.add_parser("health", help="probe /v1/health")
    p.add_argument("--host", default=runstate.API_HOST)
    p.add_argument("--port", type=int, default=runstate.API_PORT)
    p.add_argument("--timeout", type=float, default=3.0)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_health)

    p = sub.add_parser("install", help="install engine weights + warm compile")
    p.add_argument("engines", nargs="*", help="engine ids (default: all)")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(func=cmd_install)

    p = sub.add_parser("doctor", help="environment sanity check")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_doctor)

    p = sub.add_parser("logs", help="show backend log")
    p.add_argument("-f", "--follow", action="store_true")
    p.add_argument("-n", "--lines", type=int, default=50)
    p.set_defaults(func=cmd_logs)

    p = sub.add_parser(
        "convert-hf",
        help="import a local HF checkpoint (.safetensors/.pt) into an engine",
    )
    p.add_argument(
        "family",
        choices=["chatterbox", "qwen3", "cosyvoice", "xtts", "piper", "audiosr"],
    )
    p.add_argument("checkpoint", help="path to the local state-dict file")
    p.add_argument("--name", help="target checkpoint name (e.g. t3_fr)")
    p.add_argument(
        "--stage",
        choices=["lm", "vocoder", "token2wav", "speech-tokenizer", "codec"],
        default="lm",
        help="which stage to import: the LM backbone, a vanilla HiFi-GAN "
             "vocoder, the S3 speech tokenizer (cosyvoice zero-shot prompt "
             "extraction), or the flow+HiFT token2wav stage (chatterbox s3gen / "
             "cosyvoice flow+hift)",
    )
    p.add_argument("--prefix", default=None, help="checkpoint key prefix")
    p.add_argument(
        "--hift-checkpoint", default=None,
        help="separate HiFT checkpoint for --stage token2wav (cosyvoice "
             "ships flow.pt + hift.pt; chatterbox bundles both)",
    )
    p.set_defaults(func=cmd_convert_hf)

    p = sub.add_parser(
        "prefetch",
        help="download Qwen3-TTS HF snapshots into the assets cache "
             "(offline-friendly: HF_HUB_OFFLINE=1 resolves a seeded cache)",
    )
    p.add_argument("--models", default=None, help="comma-separated HF model ids")
    p.add_argument("--assets-dir", default=None, help="HF cache root override")
    p.set_defaults(func=cmd_prefetch)

    p = sub.add_parser(
        "finetune-fr",
        help="train the FR overlay (t3_fr) on a JSONL dataset",
    )
    p.add_argument("--dataset", help="JSONL with {text, speech_tokens} (default: synthetic smoke corpus)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--tp", type=int, default=1)
    p.set_defaults(func=cmd_finetune_fr)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
