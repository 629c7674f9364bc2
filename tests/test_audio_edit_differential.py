"""Differential fuzz: audio edit + silence trim vs the reference.

Covers `apply_minimal_edit` end to end (file in → PCM_16 file out, all
flag combinations), `_find_active_range` (the silence trimmer whose
boundaries are audible), and `_pad_short_text` (short-input padding) —
ref: backend/shared/audio_edit.py:16-80 and tts_pipeline.py:31-57,
192-231.

The reference imports soundfile/librosa/tts_backends, none of which
exist in this image; they are stubbed here (soundfile maps onto our
WAV codec — byte-identical PCM_16 read/write), so the MATH under test
is entirely the reference's own.

Env-gated: skipped when /root/reference is not present.
"""

from __future__ import annotations

import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")

if not (REFERENCE_ROOT / "backend" / "shared" / "audio_edit.py").exists():
    pytest.skip(
        "reference repo not available for differential fuzzing",
        allow_module_level=True,
    )

sys.path.insert(0, str(REFERENCE_ROOT))

from vocalie_tts_tpu.io.wavio import read_wav, write_wav  # noqa: E402


def _stub_module(name: str) -> types.ModuleType:
    """Importable stub with a REAL ModuleSpec — a bare ModuleType has
    ``__spec__ = None``, which makes importlib.util.find_spec (used by
    e.g. transformers' dependency probing elsewhere in the test
    session) raise ``ValueError: <name>.__spec__ is None``."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_stubs() -> None:
    if "soundfile" not in sys.modules:
        sf = _stub_module("soundfile")

        def _read(path, always_2d=False):
            return read_wav(path, always_2d=always_2d)

        def _write(path, audio, sr, subtype="PCM_16"):
            write_wav(path, np.asarray(audio), int(sr), subtype=subtype)

        sf.read = _read
        sf.write = _write
        sys.modules["soundfile"] = sf
    if "librosa" not in sys.modules:
        sys.modules["librosa"] = _stub_module("librosa")
    if "tts_backends" not in sys.modules:
        tb = _stub_module("tts_backends")
        tb.get_backend = lambda engine_id: None
        base = _stub_module("tts_backends.base")

        class BackendUnavailableError(Exception):
            pass

        base.BackendUnavailableError = BackendUnavailableError
        base.TTSBackend = object
        tb.base = base
        sys.modules["tts_backends"] = tb
        sys.modules["tts_backends.base"] = base


_install_stubs()

ref_edit = pytest.importorskip("backend.shared.audio_edit")
ref_pipe = pytest.importorskip("backend.shared.tts_pipeline")

from vocalie_tts_tpu.dsp.host import find_active_range  # noqa: E402
from vocalie_tts_tpu.io.edit import apply_minimal_edit  # noqa: E402
from vocalie_tts_tpu.pipeline import pad_short_text  # noqa: E402


def _gen_audio(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Speech-shaped test signal: silence – burst – silence – burst."""
    audio = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        seg = rng.randint(1, max(2, n // 4))
        if rng.rand() < 0.5:
            t = np.arange(seg)
            amp = rng.choice([0.001, 0.01, 0.2, 0.8])
            audio[pos : pos + seg] = (
                amp * np.sin(2 * np.pi * rng.randint(40, 400) * t / 24000)
            )[: max(0, min(seg, n - pos))]
        pos += seg
    return audio


def test_find_active_range_differential():
    rng = np.random.RandomState(0)
    for _ in range(300):
        n = rng.randint(0, 4000)
        audio = _gen_audio(rng, n)
        thr = float(rng.choice([0.002, 0.01, 0.05]))
        min_sil = int(rng.choice([0, 8, 480]))
        ours = find_active_range(audio, threshold=thr, min_silence_frames=min_sil)
        refs = ref_pipe._find_active_range(
            audio, threshold=thr, min_silence_frames=min_sil
        )
        assert tuple(ours) == tuple(refs), (n, thr, min_sil)


def test_pad_short_text_differential():
    cases = ["", "Oui", "Bonjour à tous", "Un deux trois quatre cinq",
             "Allo ?", "Très bien.", "a b", "mot"]
    for text in cases:
        assert pad_short_text(text) == ref_pipe._pad_short_text(text)


@pytest.mark.parametrize("trim", [False, True])
@pytest.mark.parametrize("normalize", [False, True])
def test_apply_minimal_edit_differential(tmp_path, trim, normalize):
    rng = np.random.RandomState(42)
    for case in range(6):
        audio = _gen_audio(rng, rng.randint(200, 24000))
        src = tmp_path / f"in_{trim}_{normalize}_{case}.wav"
        write_wav(src, audio, 24000, subtype="PCM_16")
        out_ref = tmp_path / f"ref_{trim}_{normalize}_{case}.wav"
        out_ours = tmp_path / f"ours_{trim}_{normalize}_{case}.wav"
        target_dbfs = float(rng.choice([-1.0, -3.0, -12.0]))
        kwargs = dict(
            trim_enabled=trim, normalize_enabled=normalize,
            target_dbfs=target_dbfs,
        )
        meta_ref = ref_edit.apply_minimal_edit(src, out_ref, **kwargs)
        meta_ours = apply_minimal_edit(src, out_ours, **kwargs)
        for key in ("trimmed", "normalized", "target_dbfs"):
            assert meta_ours[key] == meta_ref[key], key
        for key in ("peak_before", "peak_after", "gain"):
            assert abs(meta_ours[key] - meta_ref[key]) < 1e-6, key
        a_ref, sr_ref = read_wav(out_ref)
        a_ours, sr_ours = read_wav(out_ours)
        assert sr_ref == sr_ours
        np.testing.assert_array_equal(a_ours, a_ref)
