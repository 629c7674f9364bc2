"""Pipeline tests with the fake engine (no real model, per reference
test strategy — ref: tests/conftest.py 'No real TTS model is ever
loaded in the suite')."""

import numpy as np
import pytest

from vocalie_tts_tpu.engines import enable_fake_engine
from vocalie_tts_tpu.io.wavio import read_wav
from vocalie_tts_tpu.pipeline import (
    PipelineResult,
    minimal_post_process,
    pad_short_text,
    run_tts_pipeline,
)
from vocalie_tts_tpu.text import parse_manual_chunks

pytestmark = pytest.mark.unit


@pytest.fixture(autouse=True)
def _fake_engine():
    enable_fake_engine()


def test_pad_short_text():
    padded, reps = pad_short_text("Oui")
    assert reps == 3
    assert padded == "Oui. Oui. Oui"
    padded, reps = pad_short_text("Oui!")
    assert padded == "Oui! Oui! Oui!"
    assert pad_short_text("Un texte assez long ici") == ("Un texte assez long ici", 1)
    assert pad_short_text("") == ("", 1)


def test_run_pipeline_single_chunk(tmp_path):
    out = tmp_path / "out.wav"
    result = run_tts_pipeline(
        {
            "tts_backend": "fake",
            "script": "Bonjour tout le monde, ceci est une phrase de test.",
            "out_path": str(out),
        }
    )
    assert isinstance(result, PipelineResult)
    audio, sr = read_wav(out)
    assert sr == 24000
    assert len(audio) > 0
    assert result.meta["chunks"] == 1
    assert result.meta["sr"] == 24000
    assert result.meta["total_duration"] == pytest.approx(len(audio) / 24000)


def test_run_pipeline_manual_chunks_with_gap(tmp_path):
    snapshot = "Premiere partie du texte ici.\n[[CHUNK]]\nDeuxieme partie du texte la."
    chunks, _ = parse_manual_chunks(snapshot)
    out = tmp_path / "gap.wav"
    result = run_tts_pipeline(
        {
            "tts_backend": "fake",
            "script": snapshot,
            "chunks": chunks,
            "inter_chunk_gap_ms": 500,
            "out_path": str(out),
        }
    )
    assert result.meta["inter_chunk_gap_applied"] is True
    audio, sr = read_wav(out)
    no_gap_len = sum(int(d * sr) for d in result.meta["durations"])
    assert len(audio) == pytest.approx(no_gap_len + int(0.5 * sr), abs=4)


def test_run_pipeline_progress_monotonic(tmp_path):
    snapshot = "Un.\n[[CHUNK]]\nDeux.\n[[CHUNK]]\nTrois."
    chunks, _ = parse_manual_chunks(snapshot)
    seen = []
    run_tts_pipeline(
        {
            "tts_backend": "fake",
            "script": snapshot,
            "chunks": chunks,
            "out_path": str(tmp_path / "p.wav"),
        },
        progress_cb=seen.append,
    )
    assert seen[0] == 0.0 and seen[-1] == 1.0
    assert all(b >= a for a, b in zip(seen, seen[1:]))


def test_run_pipeline_empty_script_raises(tmp_path):
    with pytest.raises(ValueError):
        run_tts_pipeline(
            {"tts_backend": "fake", "script": "   ", "out_path": str(tmp_path / "x.wav")}
        )


def test_run_pipeline_unknown_backend_raises(tmp_path):
    from vocalie_tts_tpu.engines.base import BackendUnavailableError

    with pytest.raises(BackendUnavailableError):
        run_tts_pipeline(
            {"tts_backend": "nope", "script": "Texte.", "out_path": str(tmp_path / "x.wav")}
        )


def test_minimal_post_process(tmp_path):
    from vocalie_tts_tpu.io.wavio import write_wav

    sr = 24000
    x = np.zeros(sr, dtype=np.float32)
    x[6000:18000] = (0.25 * np.sin(2 * np.pi * 220 * np.arange(12000) / sr)).astype(
        np.float32
    )
    raw = tmp_path / "raw.wav"
    processed = tmp_path / "proc.wav"
    write_wav(raw, x, sr, subtype="FLOAT")
    meta = minimal_post_process(raw, processed)
    back, _ = read_wav(processed)
    # trimmed the edge silence and normalized to -1 dBFS
    assert len(back) < len(x)
    assert np.max(np.abs(back)) == pytest.approx(10 ** (-1 / 20), abs=1e-3)
    assert meta["trim"]["start_sample"] > 0
    assert meta["normalize_scale"] > 1.0


def test_minimal_post_process_same_path_rejected(tmp_path):
    p = tmp_path / "a.wav"
    with pytest.raises(ValueError):
        minimal_post_process(p, p)
