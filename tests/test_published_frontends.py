"""Published-checkpoint round-trips for the three LM-TTS families:
synthetic checkpoints in the PUBLISHED layouts (Chatterbox T3 separate
tables, CosyVoice llm.pt, Qwen-style mixed table) convert via
import_hf_checkpoint, stage their tokenizer.json, and the runtimes
then tokenize text into EXACTLY the imported embedding rows.

This is the contract the reference meets by construction (its models
apply their own tokenizers to raw text — ref:
tts_backends/chatterbox_impl.py:154-201, cosyvoice_runner.py:87-125,
qwen3_runner.py:113-144) and that a byte frontend cannot: byte ids
0..259 would index the wrong rows of a published text embedding."""

import numpy as np
import pytest

from tests.test_text_frontend import (
    make_qwen_style_tokenizer,
    make_voicebpe_tokenizer,
)

pytestmark = [pytest.mark.device]


@pytest.fixture(autouse=True)
def _tiny_scale(monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    monkeypatch.delenv("VOCALIE_KV_INT8", raising=False)


def _llama_layer_state(rng, prefix, d_model, q_dim, kv_dim, d_ff,
                       attn_bias=False, qk_norm=False, d_head=None):
    import torch

    s = {}
    for name, shape in (
        ("self_attn.q_proj.weight", (q_dim, d_model)),
        ("self_attn.k_proj.weight", (kv_dim, d_model)),
        ("self_attn.v_proj.weight", (kv_dim, d_model)),
        ("self_attn.o_proj.weight", (d_model, q_dim)),
        ("mlp.gate_proj.weight", (d_ff, d_model)),
        ("mlp.up_proj.weight", (d_ff, d_model)),
        ("mlp.down_proj.weight", (d_model, d_ff)),
    ):
        s[prefix + name] = torch.tensor(
            rng.standard_normal(shape).astype(np.float32) * 0.02
        )
    s[prefix + "input_layernorm.weight"] = torch.ones(d_model)
    s[prefix + "post_attention_layernorm.weight"] = torch.ones(d_model)
    if attn_bias:
        for name, dim in (("q_proj", q_dim), ("k_proj", kv_dim), ("v_proj", kv_dim)):
            s[prefix + f"self_attn.{name}.bias"] = torch.zeros(dim)
    if qk_norm:
        s[prefix + "self_attn.q_norm.weight"] = torch.ones(d_head)
        s[prefix + "self_attn.k_norm.weight"] = torch.ones(d_head)
    return s


def _backbone_state(rng, cfg, prefix):
    import torch

    s = {}
    for i in range(cfg.n_layers):
        s.update(_llama_layer_state(
            rng, f"{prefix}layers.{i}.", cfg.d_model, cfg.q_dim, cfg.kv_dim,
            cfg.d_ff, attn_bias=getattr(cfg, "attn_bias", False),
            qk_norm=getattr(cfg, "qk_norm", False), d_head=cfg.d_head,
        ))
    s[f"{prefix}norm.weight"] = torch.ones(cfg.d_model)
    return s


def test_chatterbox_t3_published_roundtrip(tmp_path):
    """T3-layout checkpoint + voice-BPE tokenizer.json → runtime serves
    published token ids against the imported text embedding."""
    import torch

    from vocalie_tts_tpu.models.chatterbox.model import VOCAB
    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, ChatterboxRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import import_hf_checkpoint

    cfg = SCALES["tiny"]
    rng = np.random.default_rng(0)
    vocab = make_voicebpe_tokenizer(tmp_path / "tokenizer.json")
    text_vocab = max(vocab.values()) + 1

    text_emb = rng.standard_normal((text_vocab, cfg.d_model)).astype(np.float32) * 0.02
    state = {
        "t3.text_emb.weight": torch.tensor(text_emb),
        "t3.speech_emb.weight": torch.tensor(
            rng.standard_normal((VOCAB, cfg.d_model)).astype(np.float32) * 0.02),
        "t3.speech_head.weight": torch.tensor(
            rng.standard_normal((VOCAB, cfg.d_model)).astype(np.float32) * 0.02),
        "t3.text_head.weight": torch.tensor(
            rng.standard_normal((text_vocab, cfg.d_model)).astype(np.float32)),
        "t3.cond_enc.spkr_enc.weight": torch.tensor(
            rng.standard_normal((cfg.d_model, cfg.speaker_dim)).astype(np.float32)),
    }
    state.update(_backbone_state(rng, cfg.lm, "t3.tfmr."))
    ckpt = tmp_path / "t3_cfg.pt"
    torch.save(state, ckpt)

    report = import_hf_checkpoint(
        family="chatterbox", checkpoint=ckpt, assets_dir=tmp_path, name="t3"
    )
    assert report["text_vocab"] == str(text_vocab)
    assert "tokenizer" in report  # staged beside the weights

    rt = ChatterboxRuntime.create(tmp_path)
    assert rt.cfg.text_vocab == text_vocab
    assert rt._frontend.published
    np.testing.assert_allclose(
        np.asarray(rt.params["t3"]["text_emb"], np.float32), text_emb, atol=1e-3
    )
    # text → published ids → the imported rows (the round-trip the
    # byte frontend cannot do)
    ids = rt._frontend.encode("bonjour", "fr")
    assert ids and max(ids) < text_vocab and ids[0] == vocab["[fr]"]
    audio, sr, meta = rt.synthesize("Bonjour le monde.")
    assert np.isfinite(audio).all()


def test_cosyvoice_llm_published_roundtrip(tmp_path):
    """CosyVoice llm.pt layout (Qwen2 backbone + speech_embedding +
    llm_decoder + llm_embedding) + Qwen tokenizer.json."""
    import torch

    from vocalie_tts_tpu.models.cosyvoice.model import BOS_SPEECH, VOCAB
    from vocalie_tts_tpu.models.cosyvoice.runtime import SCALES, CosyVoiceRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import import_hf_checkpoint

    cfg = SCALES["tiny"]
    rng = np.random.default_rng(1)
    text_vocab = make_qwen_style_tokenizer(tmp_path / "tokenizer.json")

    text_emb = rng.standard_normal((text_vocab, cfg.d_model)).astype(np.float32) * 0.02
    llm_embedding = rng.standard_normal((2, cfg.d_model)).astype(np.float32)
    state = {
        "llm.model.model.embed_tokens.weight": torch.tensor(text_emb),
        "speech_embedding.weight": torch.tensor(
            rng.standard_normal((VOCAB, cfg.d_model)).astype(np.float32) * 0.02),
        "llm_decoder.weight": torch.tensor(
            rng.standard_normal((VOCAB, cfg.d_model)).astype(np.float32) * 0.02),
        "llm_decoder.bias": torch.zeros(VOCAB),
        "llm_embedding.weight": torch.tensor(llm_embedding),
    }
    state.update(_backbone_state(rng, cfg.lm, "llm.model.model."))
    ckpt = tmp_path / "llm.pt"
    torch.save(state, ckpt)

    report = import_hf_checkpoint(
        family="cosyvoice", checkpoint=ckpt, assets_dir=tmp_path, name="lm"
    )
    assert report["text_vocab"] == str(text_vocab)

    rt = CosyVoiceRuntime.create(tmp_path)
    assert rt.cfg.text_vocab == text_vocab
    assert rt._frontend.published
    np.testing.assert_allclose(
        np.asarray(rt.params["lm_bundle"]["text_emb"], np.float32),
        text_emb, atol=1e-3,
    )
    # task-token row fills the BOS (decode-start) embedding slot
    np.testing.assert_allclose(
        np.asarray(rt.params["lm_bundle"]["lm"]["tok_emb"][BOS_SPEECH], np.float32),
        llm_embedding[1], atol=1e-3,
    )
    audio, sr, meta = rt.synthesize("Bonjour.", mode="instruct")
    assert np.isfinite(audio).all()


def test_qwen3_mixed_table_split_roundtrip(tmp_path):
    """Qwen-style mixed [text ‖ codec ‖ control] embed_tokens/lm_head
    split at rows − core_vocab; text rows become text_emb."""
    import torch

    from vocalie_tts_tpu.models.convert.import_checkpoint import import_hf_checkpoint
    from vocalie_tts_tpu.models.lmtts.model import VOCAB
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES, LMTTSRuntime

    cfg = SCALES["tiny"]
    rng = np.random.default_rng(2)
    text_vocab = make_qwen_style_tokenizer(tmp_path / "tokenizer.json")

    mixed = rng.standard_normal(
        (text_vocab + VOCAB, cfg.d_model)).astype(np.float32) * 0.02
    head = rng.standard_normal(
        (text_vocab + VOCAB, cfg.d_model)).astype(np.float32) * 0.02
    state = {
        "model.embed_tokens.weight": torch.tensor(mixed),
        "lm_head.weight": torch.tensor(head),
    }
    state.update(_backbone_state(rng, cfg.lm, "model."))
    ckpt = tmp_path / "qwen3_tts.pt"
    torch.save(state, ckpt)

    report = import_hf_checkpoint(
        family="qwen3", checkpoint=ckpt, assets_dir=tmp_path, name="lm"
    )
    assert report["text_vocab"] == str(text_vocab)

    rt = LMTTSRuntime.create(tmp_path)
    assert rt.cfg.text_vocab == text_vocab
    assert rt._frontend.published
    np.testing.assert_allclose(
        np.asarray(rt.params["lm_bundle"]["text_emb"], np.float32),
        mixed[:text_vocab], atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(rt.params["lm_bundle"]["lm"]["tok_emb"], np.float32),
        mixed[text_vocab:], atol=1e-3,
    )
    audio, sr, meta = rt.synthesize("Bonjour.", mode="custom_voice",
                                    language="French")
    assert np.isfinite(audio).all()


def test_published_speech_space_roundtrip(tmp_path):
    """A checkpoint with a NON-default speech token space (the published
    6561-code FSQ size) defines the whole engine's core vocabulary:
    decode config, logit bias, stage-2 template and meta all rebuild at
    the checkpoint's size and the runtime serves."""
    import torch

    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, ChatterboxRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import import_hf_checkpoint

    cfg = SCALES["tiny"]
    rng = np.random.default_rng(3)
    import dataclasses

    sv = 6561
    core = dataclasses.replace(cfg, speech_vocab=sv)
    state = {
        "t3.text_emb.weight": torch.tensor(
            rng.standard_normal((50, cfg.d_model)).astype(np.float32) * 0.02),
        "t3.speech_emb.weight": torch.tensor(
            rng.standard_normal((sv + 2, cfg.d_model)).astype(np.float32) * 0.02),
        "t3.speech_head.weight": torch.tensor(
            rng.standard_normal((sv + 2, cfg.d_model)).astype(np.float32) * 0.02),
    }
    state.update(_backbone_state(rng, core.lm, "t3.tfmr."))
    ckpt = tmp_path / "t3_fsq.pt"
    torch.save(state, ckpt)

    report = import_hf_checkpoint(family="chatterbox", checkpoint=ckpt,
                                  assets_dir=tmp_path, name="t3")
    assert report["text_vocab"] == "50"

    rt = ChatterboxRuntime.create(tmp_path)
    assert rt.cfg.speech_vocab == sv
    assert rt.cfg.lm.vocab_size == sv + 2
    assert rt.params["t3"]["lm"]["tok_emb"].shape[0] == sv + 2
    audio, sr, meta = rt.synthesize("Bonjour.")
    assert np.isfinite(audio).all()
