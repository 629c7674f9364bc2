"""Tiny-scale tests for the AR model families (chatterbox/lmtts/xtts/cosyvoice)."""

import numpy as np
import pytest

pytestmark = [pytest.mark.device]


@pytest.fixture(autouse=True)
def _tiny_scale(monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")


@pytest.fixture(scope="session")
def ref_wav(tmp_path_factory):
    from vocalie_tts_tpu.io.wavio import write_wav

    path = tmp_path_factory.mktemp("refs") / "ref.wav"
    t = np.arange(24000 * 4) / 24000
    write_wav(path, (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), 24000)
    return str(path)


def test_chatterbox_runtime_modes(tmp_path, ref_wav):
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

    rt = ChatterboxRuntime.create(tmp_path, force_init=True)
    audio, sr, meta = rt.synthesize(
        "Bonjour tout le monde.", mode="fr_finetune", voice_ref_path=ref_wav
    )
    assert sr == 24000 and len(audio) > 0 and np.isfinite(audio).all()
    assert meta["mode"] == "fr_finetune"
    # batch decode returns one clip per chunk
    out = rt.synthesize_batch(["Un.", "Deux."], mode="multilang", cfg_weight=0.0)
    assert len(out) == 2


def test_chatterbox_weights_roundtrip(tmp_path, monkeypatch):
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

    # saving is full-precision only (int8 trees are runtime-only)
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    rt = ChatterboxRuntime.create(tmp_path, force_init=True)
    rt.save_weights()
    rt2 = ChatterboxRuntime.create(tmp_path)
    import jax

    a = jax.tree_util.tree_leaves(rt.params["t3"])[0]
    b = jax.tree_util.tree_leaves(rt2.params["t3"])[0]
    assert np.allclose(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_lmtts_runtime_modes(tmp_path, ref_wav):
    from vocalie_tts_tpu.models.lmtts.runtime import LMTTSRuntime

    rt = LMTTSRuntime.create(tmp_path, force_init=True)
    a1, sr, m1 = rt.synthesize("Bonjour.", mode="custom_voice", speaker="Vivian")
    assert sr == 24000 and len(a1) > 0
    a2, _, m2 = rt.synthesize("Bonjour.", mode="voice_design", instruct="grave")
    assert m2["mode"] == "voice_design"
    a3, _, m3 = rt.synthesize(
        "Bonjour.", mode="voice_clone", voice_ref_path=ref_wav, x_vector_only=True
    )
    assert m3["mode"] == "voice_clone"


def test_xtts_runtime_clone(tmp_path, ref_wav):
    from vocalie_tts_tpu.models.xtts.runtime import XTTSRuntime

    rt = XTTSRuntime.create(tmp_path, force_init=True)
    audio, sr, meta = rt.synthesize("Bonjour, clonage.", voice_ref_path=ref_wav)
    assert sr == 24000 and len(audio) > 0 and np.isfinite(audio).all()
    assert meta["engine"] == "xtts"


def test_cosyvoice_runtime_offline_and_streaming(tmp_path, ref_wav):
    from vocalie_tts_tpu.models.cosyvoice.runtime import CosyVoiceRuntime

    rt = CosyVoiceRuntime.create(tmp_path, force_init=True)
    audio, sr, meta = rt.synthesize(
        "Bonjour.", mode="instruct", instruct_text="voix calme"
    )
    assert sr == 24000 and len(audio) > 0
    s_audio, _, s_meta = rt.synthesize("Bonjour.", streaming=True)
    assert s_meta["streaming"] is True
    assert s_meta["first_packet_ms"] is not None
    packets = list(rt.synthesize_streaming("Encore un essai."))
    assert len(packets) >= 1
    total = sum(len(p[0]) for p in packets)
    assert total > 0


def test_cosyvoice_streaming_fused_matches_unfused(tmp_path, monkeypatch):
    """The fused single-dispatch window chain (VOCALIE_STREAM_FUSED,
    default on) must yield bit-identical packets to the 5-dispatch
    path given the same starting rng — same split tree, same graph."""
    import jax

    from vocalie_tts_tpu.models.cosyvoice.runtime import CosyVoiceRuntime

    rt = CosyVoiceRuntime.create(tmp_path, force_init=True)

    def collect():
        rt._rng = jax.random.PRNGKey(7)
        return list(rt.synthesize_streaming("Comparaison des chemins."))

    monkeypatch.setenv("VOCALIE_STREAM_FUSED", "1")
    fused = collect()
    monkeypatch.setenv("VOCALIE_STREAM_FUSED", "0")
    unfused = collect()
    assert len(fused) == len(unfused) >= 1
    for (fa, fsr), (ua, usr) in zip(fused, unfused):
        assert fsr == usr
        np.testing.assert_array_equal(fa, ua)


def test_cosyvoice_zero_shot_clone_with_s3_tokenizer(tmp_path, ref_wav):
    """With an attached S3 tokenizer, clone mode runs the published
    zero-shot path: the LM prompt carries the reference's speech tokens
    (continuation) and the flow sees the prompt mel prefix (ref:
    tts_backends/cosyvoice_runner.py:87-125 inference_zero_shot)."""
    import jax

    from vocalie_tts_tpu.models.common.s3_tokenizer import (
        S3TokenizerConfig,
        init_s3_tokenizer,
    )
    from vocalie_tts_tpu.models.cosyvoice.runtime import CosyVoiceRuntime

    rt = CosyVoiceRuntime.create(tmp_path, force_init=True)
    s3_cfg = S3TokenizerConfig(n_mels=12, d_model=64, n_heads=1, n_layers=2,
                               fsq_dims=4, fsq_levels=3)
    rt.attach_s3_tokenizer(init_s3_tokenizer(jax.random.PRNGKey(0), s3_cfg), s3_cfg)

    audio, sr, meta = rt.synthesize(
        "Bonjour.", mode="clone", voice_ref_path=ref_wav, prompt_text="référence"
    )
    assert sr == 24000 and len(audio) > 0 and np.isfinite(audio).all()
    assert meta["prompt_speech_tokens"] > 0
    # streaming clone conditions the LM the same way (x-vector CFM)
    packets = list(rt.synthesize_streaming(
        "Encore.", mode="clone", voice_ref_path=ref_wav))
    assert sum(len(p[0]) for p in packets) > 0
    # weights round-trip: a re-created runtime auto-attaches the tokenizer
    rt.save_weights()
    rt2 = CosyVoiceRuntime.create(tmp_path)
    assert rt2._s3 is not None


def test_clone_speech_prompt_crops_head_not_tail():
    """Long texts must not let pad_token_batch tail-truncate the speech
    prompt: decode continues from ptoks[-1], so the crop keeps the TAIL
    (most recent speech context) and drops the head; no-room texts skip
    the LM-side prompt entirely (x-vector fallback)."""
    from vocalie_tts_tpu.models.cosyvoice.runtime import (
        _MIN_LM_SPEECH_PROMPT,
        _fit_lm_speech_prompt,
        PROMPT_BUCKETS,
    )

    ptoks = np.arange(125, dtype=np.int32)
    cap = max(PROMPT_BUCKETS)
    # plenty of room: untouched
    fit = _fit_lm_speech_prompt(ptoks, longest_text=100, extra_positions=2)
    assert fit is not None and len(fit) == 125 and fit[-1] == 124
    # tight: head-cropped, tail preserved, total fits the bucket
    longest = cap - 2 - 40
    fit = _fit_lm_speech_prompt(ptoks, longest, extra_positions=2)
    assert fit is not None and len(fit) == 40 and fit[-1] == 124
    assert longest + len(fit) <= cap - 2
    # no room: skip (None), never a sliver below the floor
    assert _fit_lm_speech_prompt(
        ptoks, cap - 2 - (_MIN_LM_SPEECH_PROMPT - 1), extra_positions=2
    ) is None
    assert _fit_lm_speech_prompt(np.zeros(0, np.int32), 10, 2) is None


def test_speaker_embedding_cached(tmp_path, ref_wav):
    from vocalie_tts_tpu.models.xtts.runtime import XTTSRuntime

    rt = XTTSRuntime.create(tmp_path, force_init=True)
    e1 = rt._spk_cache.get(ref_wav)
    e2 = rt._spk_cache.get(ref_wav)
    assert e1 is e2  # cache hit returns the same array
    assert abs(float(np.linalg.norm(e1)) - 1.0) < 1e-3  # L2-normalized


def test_weight_int8_runtime_gate(tmp_path, monkeypatch):
    """VOCALIE_WEIGHT_INT8=1 quantizes the LM matmuls and refuses to
    persist the runtime-only int8 tree."""
    import jax
    import pytest as _pytest

    monkeypatch.setenv("VOCALIE_WEIGHT_INT8", "1")
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime

    rt = ChatterboxRuntime.create(tmp_path, force_init=True)
    dtypes = {l.dtype.name for l in jax.tree_util.tree_leaves(rt.params["t3"]["lm"])}
    assert "int8" in dtypes
    audio, sr, meta = rt.synthesize("Bonjour tout le monde.", mode="fr_finetune")
    assert len(audio) > 0 and sr == rt.cfg.sample_rate
    with _pytest.raises(RuntimeError):
        rt.save_weights()


def test_finetune_fr_overlay_end_to_end(tmp_path, monkeypatch):
    """FR overlay fine-tune: loss decreases on the synthetic corpus and
    the saved t3_fr checkpoint is picked up by ChatterboxRuntime."""
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    from vocalie_tts_tpu.models.chatterbox.runtime import ChatterboxRuntime
    from vocalie_tts_tpu.training.finetune_fr import finetune_overlay

    rt = ChatterboxRuntime.create(tmp_path, force_init=True)
    rt.save_weights()  # materialize the base t3 checkpoint
    result = finetune_overlay(
        assets_dir=tmp_path, steps=30, batch_size=4, seq_len=64,
        learning_rate=3e-3, n_devices=4, tp=2, log_every=10,
        log=lambda *_: None,
    )
    assert result["final_loss"] < result["first_loss"], result

    rt2 = ChatterboxRuntime.create(tmp_path)
    import jax

    base = jax.tree_util.tree_leaves(rt2.params["t3"]["lm"])[1]
    overlay = jax.tree_util.tree_leaves(rt2.params["t3_fr"]["lm"])[1]
    assert not np.allclose(
        np.asarray(base, np.float32), np.asarray(overlay, np.float32)
    )
    audio, sr, _ = rt2.synthesize("Bonjour après le réglage fin.", mode="fr_finetune")
    assert len(audio) > 0
