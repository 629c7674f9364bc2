"""AudioSR family tests (tiny scale)."""

import numpy as np
import pytest

pytestmark = pytest.mark.device


@pytest.fixture(autouse=True)
def _tiny_scale(monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")


@pytest.fixture(scope="module")
def runtime(tmp_path_factory):
    import os

    os.environ["VOCALIE_MODEL_SCALE"] = "tiny"
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    return AudioSRRuntime.create(tmp_path_factory.mktemp("asr"), force_init=True)


def _tone(path, sr=24000, seconds=1.5):
    from vocalie_tts_tpu.io.wavio import write_wav

    t = np.arange(int(sr * seconds)) / sr
    write_wav(path, (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)
    return path


def test_enhance_outputs_48k(runtime, tmp_path):
    src = _tone(tmp_path / "in.wav")
    out = tmp_path / "out.wav"
    res = runtime.enhance_file(
        input_path=str(src), output_path=str(out), ddim_steps=20, guidance_scale=2.5, seed=1
    )
    assert res["sample_rate"] == 48000
    assert res["duration_s"] == pytest.approx(1.5, abs=0.01)
    from vocalie_tts_tpu.io.wavio import wav_info

    info = wav_info(out)
    assert info.samplerate == 48000 and info.channels == 1


def test_enhance_seed_deterministic(runtime, tmp_path):
    from vocalie_tts_tpu.io.wavio import read_wav

    src = _tone(tmp_path / "in.wav")
    a_path, b_path, c_path = tmp_path / "a.wav", tmp_path / "b.wav", tmp_path / "c.wav"
    for p, seed in ((a_path, 7), (b_path, 7), (c_path, 8)):
        runtime.enhance_file(
            input_path=str(src), output_path=str(p), ddim_steps=20,
            guidance_scale=2.5, seed=seed,
        )
    a, _ = read_wav(a_path)
    b, _ = read_wav(b_path)
    c, _ = read_wav(c_path)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_enhance_chunked_long_audio(runtime, tmp_path):
    src = _tone(tmp_path / "long.wav", sr=48000, seconds=2.5)
    out = tmp_path / "out.wav"
    res = runtime.enhance_file(
        input_path=str(src), output_path=str(out), ddim_steps=20,
        guidance_scale=2.5, seed=0, chunk_size=48000, overlap=4800,
    )
    assert res["duration_s"] == pytest.approx(2.5, abs=0.01)


def test_enhance_int16_wire_format(tmp_path, monkeypatch):
    """The bf16 serving config ships int16 PCM both ways across the
    tunnel; the round trip must stay within one PCM-16 LSB of the f32
    path's final (clipped, PCM_16-written) output shape/scale."""
    monkeypatch.setenv("VOCALIE_AUDIOSR_BF16", "1")
    from vocalie_tts_tpu.models.audiosr.runtime import AudioSRRuntime

    rt = AudioSRRuntime.create(tmp_path / "asr16", force_init=True)
    import jax.numpy as jnp

    assert rt.cfg.dtype == jnp.bfloat16
    sr = rt.cfg.sample_rate
    t = np.arange(sr // 2) / sr
    audio = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    out = rt.enhance_audio(audio, sr, ddim_steps=4, guidance_scale=2.5, seed=3)
    assert out.dtype == np.float32
    assert len(out) == len(audio)
    assert np.all(np.abs(out) <= 1.0)
    # int16 wire: every sample is a multiple of 1/32767 (pre-clip)
    q = out * 32767.0
    assert np.allclose(q, np.round(q), atol=1e-3)


def test_enhance_multiband_ensemble(runtime, tmp_path):
    src = _tone(tmp_path / "in.wav")
    out = tmp_path / "mb.wav"
    res = runtime.enhance_file(
        input_path=str(src), output_path=str(out), ddim_steps=20,
        guidance_scale=2.5, seed=0, multiband_ensemble=True, input_cutoff=6000,
    )
    assert res["sample_rate"] == 48000


def test_chunked_overlap_add_identity_reconstruction(runtime, monkeypatch):
    """OLA invariant: with an identity 'enhancement', the crossfaded
    windows must reconstruct the input exactly (the fade-in/fade-out
    ramps sum to 1 in every overlap). Pins the vectorized OLA against
    the per-window definition, including the short final window."""
    rng = np.random.default_rng(42)

    def identity_dispatch(batch, ddim_steps, guidance_scale, seed):
        import jax.numpy as jnp

        return jnp.asarray(batch)

    monkeypatch.setattr(runtime, "_dispatch_batch", identity_dispatch)
    for n in (100_000, 96_768, 32_768 * 3):  # short tail, exact-chunk tail
        audio = rng.standard_normal(n).astype(np.float32) * 0.3
        out = runtime._chunked(
            audio, ddim_steps=4, guidance_scale=2.5, seed=0,
            chunk_size=32768, overlap=1024,
        )
        assert out.shape == audio.shape
        np.testing.assert_allclose(out, audio, rtol=0, atol=2e-6)


def test_chunked_overlap_add_matches_scalar_path(runtime, monkeypatch):
    """Vectorized OLA == per-window scalar OLA on a non-identity
    'enhancement' (so crossfaded window contents genuinely differ)."""
    rng = np.random.default_rng(7)

    def fake_dispatch(batch, ddim_steps, guidance_scale, seed):
        import jax.numpy as jnp

        # row-dependent transform: window index changes the content
        return jnp.asarray(batch * (1.0 + 0.01 * np.arange(len(batch))[:, None]))

    monkeypatch.setattr(runtime, "_dispatch_batch", fake_dispatch)
    audio = rng.standard_normal(150_000).astype(np.float32) * 0.3

    kw = dict(ddim_steps=4, guidance_scale=2.5, seed=0,
              chunk_size=32768, overlap=1024)
    fast = runtime._chunked(audio, **kw)

    # scalar reference: force the fallback by monkeypatching the
    # uniform-span check via a chunking that defeats vectorization is
    # brittle — instead recompute with the textbook per-window loop.
    chunk, overlap, hop = 32768, 1024, 32768 - 1024
    spans = []
    for start in range(0, len(audio), hop):
        end = min(start + chunk, len(audio))
        spans.append((start, end))
        if end >= len(audio):
            break
    n = len(audio)
    out = np.zeros(n, np.float32)
    weight = np.zeros(n, np.float32)
    for idx, (start, end) in enumerate(spans):
        piece = np.zeros(chunk, np.float32)
        piece[: end - start] = audio[start:end]
        enhanced = piece * (1.0 + 0.01 * (idx % 8))  # bucket row index
        w = np.ones(end - start, np.float32)
        ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        if start > 0:
            w[: len(ramp)] = ramp
        if end < n:
            w[-len(ramp):] = ramp[::-1]
        out[start:end] += enhanced[: end - start] * w
        weight[start:end] += w
    ref = out / np.maximum(weight, 1e-6)
    np.testing.assert_allclose(fast, ref, rtol=0, atol=1e-5)


def test_device_stitch_matches_host_stitch(runtime, monkeypatch):
    """Device-side OLA (_stitch_batch_segment, the serving default) must equal
    the host numpy OLA through the REAL tiny model — multi-window
    session incl. a short final window and a padded window-count
    bucket row."""
    from vocalie_tts_tpu.models.audiosr import runtime as R

    rng = np.random.default_rng(11)
    audio = rng.standard_normal(80_000).astype(np.float32) * 0.2
    kw = dict(ddim_steps=2, guidance_scale=2.0, seed=5,
              chunk_size=32768, overlap=1024)
    monkeypatch.setattr(R, "_DEVICE_STITCH", True)
    a = runtime._chunked(audio, **kw)
    monkeypatch.setattr(R, "_DEVICE_STITCH", False)
    b = runtime._chunked(audio, **kw)
    assert a.shape == b.shape == audio.shape
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
