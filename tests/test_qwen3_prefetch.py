"""Qwen3 hub prefetch (ref: tts_backends/qwen3_prefetch.py).

No egress in this image: the download path is exercised against a
pre-seeded HF cache with ``HF_HUB_OFFLINE=1`` (snapshot_download then
resolves purely locally — the same code path a production host with
egress takes, minus the HTTP fetch).
"""

import os

import pytest

from vocalie_tts_tpu.engines import qwen3_prefetch

MODEL_ID = "Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice"


def _seed_cache(assets_dir, model_id=MODEL_ID, commit="0" * 40):
    """Lay down the hub cache structure snapshot_download resolves."""
    repo = assets_dir / ".hf" / "hub" / f"models--{model_id.replace('/', '--')}"
    (repo / "refs").mkdir(parents=True)
    (repo / "refs" / "main").write_text(commit)
    snap = repo / "snapshots" / commit
    snap.mkdir(parents=True)
    (snap / "config.json").write_text("{}")
    return snap


@pytest.fixture(autouse=True)
def _offline(monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
    monkeypatch.delenv("HF_HOME", raising=False)


def test_prefetch_resolves_seeded_cache(tmp_path, capsys):
    snap = _seed_cache(tmp_path)
    rc = qwen3_prefetch.main(["--models", MODEL_ID, "--assets-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert MODEL_ID in out and str(snap) in out


def test_prefetch_default_models_match_engine():
    from vocalie_tts_tpu.engines.qwen3 import QWEN3_DEFAULT_MODELS

    assert qwen3_prefetch._parse_models(None) == list(QWEN3_DEFAULT_MODELS.values())
    assert qwen3_prefetch._parse_models(" a , b ,") == ["a", "b"]


def test_prefetch_no_models_exit_3():
    assert qwen3_prefetch.main(["--models", " , "]) == 3


def test_prefetch_missing_model_exit_4(tmp_path, capsys):
    rc = qwen3_prefetch.main(
        ["--models", "Qwen/does-not-exist", "--assets-dir", str(tmp_path)]
    )
    assert rc == 4
    assert "prefetch_failed" in capsys.readouterr().err


def test_cli_prefetch_maps_exit_codes(tmp_path):
    from vocalie_tts_tpu.cli.main import main as cli_main

    _seed_cache(tmp_path)
    assert cli_main(["prefetch", "--models", MODEL_ID, "--assets-dir", str(tmp_path)]) == 0
    assert cli_main(["prefetch", "--models", "Qwen/nope", "--assets-dir", str(tmp_path)]) == 1


def test_env_var_model_override(tmp_path, monkeypatch, capsys):
    other = "Qwen/Qwen3-TTS-12Hz-1.7B-Base"
    _seed_cache(tmp_path, other)
    monkeypatch.setenv("VOCALIE_QWEN3_PREFETCH_MODELS", other)
    rc = qwen3_prefetch.main(["--assets-dir", str(tmp_path)])
    assert rc == 0
    assert other in capsys.readouterr().out
