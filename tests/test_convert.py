"""Torch→JAX conversion bridge tests (round-trip through real torch)."""

import numpy as np
import pytest

from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_linear,
    load_state_dict,
    read_safetensors,
)

pytestmark = pytest.mark.unit


def test_linear_conversion_matches_torch():
    import torch

    lin = torch.nn.Linear(8, 16)
    x = torch.randn(3, 8)
    want = lin(x).detach().numpy()
    params = convert_linear(lin.weight.detach().numpy(), lin.bias.detach().numpy())
    got = x.numpy() @ params["w"] + params["b"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_conversion_matches_torch():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.convnets import conv1d

    conv = torch.nn.Conv1d(4, 6, kernel_size=3, padding=1)
    x = torch.randn(2, 4, 20)  # NCT
    want = conv(x).detach().numpy().transpose(0, 2, 1)  # → NTC
    params = convert_conv1d(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    params = {"w": jnp.asarray(params["w"]), "b": jnp.asarray(params["b"])}
    got = np.asarray(conv1d(params, jnp.asarray(x.numpy().transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_state_dict_loading_pt(tmp_path):
    import torch

    model = torch.nn.Linear(4, 4)
    path = tmp_path / "ckpt.pt"
    torch.save(model.state_dict(), path)
    state = load_state_dict(path)
    assert set(state) == {"weight", "bias"}
    assert state["weight"].shape == (4, 4)


def test_safetensors_reader_roundtrip(tmp_path):
    # write a safetensors file by hand (json header + raw data)
    import json, struct

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.ones(3, dtype=np.float32)
    tensors = {"w": w, "b": b}
    header = {}
    blobs = b""
    for name, arr in tensors.items():
        start = len(blobs)
        blobs += arr.tobytes()
        header[name] = {
            "dtype": "F32",
            "shape": list(arr.shape),
            "data_offsets": [start, len(blobs)],
        }
    hjson = json.dumps(header).encode()
    path = tmp_path / "x.safetensors"
    path.write_bytes(struct.pack("<Q", len(hjson)) + hjson + blobs)

    out = read_safetensors(path)
    np.testing.assert_array_equal(out["w"], w)
    np.testing.assert_array_equal(out["b"], b)


def test_onnx_initializer_reader(tmp_path):
    """Hand-built ONNX wire-format file round-trips through the reader."""
    import struct

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def ld(field, payload):  # length-delimited field
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def vi(field, value):  # varint field
        return varint((field << 3) | 0) + varint(value)

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    tensor = (
        vi(1, 2) + vi(1, 3)                 # dims
        + vi(2, 1)                          # data_type = FLOAT
        + ld(8, b"enc.weight")              # name
        + ld(9, w.tobytes())                # raw_data
    )
    b = np.array([7], dtype=np.int64)
    tensor2 = (
        vi(1, 1) + vi(2, 7) + ld(8, b"steps") + ld(9, b.tobytes())
    )
    graph = ld(5, tensor) + ld(5, tensor2)
    model = ld(7, graph)
    path = tmp_path / "m.onnx"
    path.write_bytes(model)

    from vocalie_tts_tpu.models.convert.onnx_reader import read_onnx_initializers

    tensors = read_onnx_initializers(path)
    np.testing.assert_array_equal(tensors["enc.weight"], w)
    np.testing.assert_array_equal(tensors["steps"], b)


def test_hf_llama_decoder_logit_parity():
    """Converted HF Llama weights reproduce transformers logits —
    validates the weight mapping AND the RoPE/RMSNorm/SwiGLU math."""
    import jax.numpy as jnp
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        forward_all_logits,
    )
    from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state

    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = TransformerConfig(
        vocab_size=96, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=16, d_ff=128, max_seq_len=64, dtype=jnp.float32,
    )
    params = convert_hf_decoder_state(state, cfg)

    tokens = np.array([[3, 17, 42, 8, 77, 5, 21, 60]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    got = np.asarray(forward_all_logits(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_hf_qwen2_decoder_logit_parity():
    """Qwen2 family: attention-projection biases (cfg.attn_bias) map and
    reproduce transformers logits (the CosyVoice LM backbone — ref:
    cosyvoice_runner.py:67-76)."""
    import jax.numpy as jnp
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        forward_all_logits,
    )
    from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state

    hf_cfg = Qwen2Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = TransformerConfig(
        vocab_size=96, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=16, d_ff=128, max_seq_len=64, attn_bias=True,
        dtype=jnp.float32,
    )
    params = convert_hf_decoder_state(state, cfg)
    assert "bq" in params["layers"], "qkv biases must be mapped"

    tokens = np.array([[5, 11, 70, 2, 33, 90, 14, 48]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    got = np.asarray(forward_all_logits(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_hf_qwen3_decoder_logit_parity():
    """Qwen3 family: per-head q/k RMSNorm (cfg.qk_norm) maps and
    reproduces transformers logits (the Qwen3-TTS backbone — ref:
    qwen3_runner.py:70-93)."""
    import jax.numpy as jnp
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from vocalie_tts_tpu.models.common.transformer import (
        TransformerConfig,
        forward_all_logits,
    )
    from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state

    hf_cfg = Qwen3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = TransformerConfig(
        vocab_size=96, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_head=16, d_ff=128, max_seq_len=64, qk_norm=True, norm_eps=1e-6,
        dtype=jnp.float32,
    )
    params = convert_hf_decoder_state(state, cfg)
    assert "q_norm" in params["layers"], "qk norms must be mapped"

    tokens = np.array([[9, 25, 61, 7, 84, 30, 12, 55]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    got = np.asarray(forward_all_logits(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_hf_decoder_conversion_fails_loud():
    import jax.numpy as jnp
    import pytest as _pytest

    from vocalie_tts_tpu.models.common.transformer import TransformerConfig
    from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state

    cfg = TransformerConfig(
        vocab_size=8, d_model=4, n_layers=1, n_heads=2, n_kv_heads=2,
        d_head=2, d_ff=8, dtype=jnp.float32,
    )
    with _pytest.raises(KeyError):
        convert_hf_decoder_state({}, cfg)
    bad = {"model.embed_tokens.weight": np.zeros((8, 5), np.float32)}
    with _pytest.raises(ValueError):
        convert_hf_decoder_state(bad, cfg)


def test_import_hf_checkpoint_into_chatterbox(tmp_path, monkeypatch):
    """End-to-end import: tiny HF Llama checkpoint file → t3 lm graft →
    ChatterboxRuntime loads it and synthesizes."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, ChatterboxRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import import_hf_checkpoint

    lm_cfg = SCALES["tiny"].lm
    hf_cfg = LlamaConfig(
        vocab_size=lm_cfg.vocab_size, hidden_size=lm_cfg.d_model,
        intermediate_size=lm_cfg.d_ff, num_hidden_layers=lm_cfg.n_layers,
        num_attention_heads=lm_cfg.n_heads, num_key_value_heads=lm_cfg.n_kv_heads,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg)
    ckpt = tmp_path / "t3_hf.pt"
    torch.save(model.state_dict(), ckpt)

    report = import_hf_checkpoint(
        family="chatterbox", checkpoint=ckpt, assets_dir=tmp_path, name="t3"
    )
    assert int(report["lm_params"]) > 0

    rt = ChatterboxRuntime.create(tmp_path)
    want = np.asarray(
        model.model.embed_tokens.weight.detach().numpy(), np.float32
    )
    got = np.asarray(rt.params["t3"]["lm"]["tok_emb"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-3)
    audio, sr, _ = rt.synthesize("Bonjour depuis le checkpoint importé.")
    assert len(audio) > 0


def test_gpt2_decoder_logit_parity():
    """GPT-2 family (the XTTS GPT layout): learned positions, biased
    LayerNorm, fused-qkv Conv1D weights, gelu MLP — converted params
    reproduce transformers GPT2LMHeadModel logits."""
    import jax.numpy as jnp
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    from vocalie_tts_tpu.models.common.transformer import forward_all_logits
    from vocalie_tts_tpu.models.convert.gpt2 import convert_gpt2_state, gpt2_config

    hf_cfg = GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        activation_function="gelu_new", tie_word_embeddings=True,
    )
    torch.manual_seed(5)
    model = GPT2LMHeadModel(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = gpt2_config(vocab_size=96, d_model=64, n_layers=2, n_heads=4,
                      max_seq_len=64)
    params = convert_gpt2_state(state, cfg)
    assert "pos_emb" in params and "attn_norm_b" in params["layers"]

    tokens = np.array([[4, 19, 83, 7, 61, 28, 90, 12]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    got = np.asarray(forward_all_logits(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_gpt2_decode_loop_matches_forward():
    """The GPT-2 variant's prefill+decode path (learned positions,
    LayerNorm, gelu) agrees with the all-positions forward."""
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.transformer import (
        decode_step,
        forward_all_logits,
        init_params,
        prefill,
    )
    from vocalie_tts_tpu.models.convert.gpt2 import gpt2_config

    cfg = gpt2_config(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                      max_seq_len=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 64)
    full = forward_all_logits(params, cfg, tokens)

    lengths = jnp.array([6, 6])
    logits, cache = prefill(params, cfg, tokens, lengths, cache_len=16)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, -1]), atol=1e-4, rtol=1e-4
    )
    step_logits, cache = decode_step(params, cfg, tokens[:, -1], cache)
    ext = jnp.concatenate([tokens, tokens[:, -1:]], axis=1)
    full2 = forward_all_logits(params, cfg, ext)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full2[:, -1]), atol=1e-4, rtol=1e-4
    )


def test_import_xtts_gpt_checkpoint(tmp_path, monkeypatch):
    """End-to-end XTTS GPT import: a checkpoint with the published
    naming (gpt.gpt.h.* blocks + mel/text embeddings/heads beside the
    GPT2 module) → import_xtts_checkpoint → XTTSRuntime synthesizes."""
    import jax.numpy as jnp
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_xtts_checkpoint,
    )
    from vocalie_tts_tpu.models.xtts.model import VOCAB
    from vocalie_tts_tpu.models.xtts.runtime import SCALES, XTTSRuntime

    cfg = SCALES["tiny"]
    hf = GPT2LMHeadModel(
        GPT2Config(vocab_size=8, n_positions=16, n_embd=cfg.d_model,
                   n_layer=cfg.n_layers, n_head=cfg.n_heads, n_inner=cfg.d_ff)
    )
    torch.manual_seed(6)
    state = {}
    for k, v in hf.state_dict().items():
        if k.startswith("transformer.h.") or k.startswith("transformer.ln_f."):
            state["gpt.gpt." + k[len("transformer."):]] = v
    d = cfg.d_model
    state["gpt.mel_embedding.weight"] = torch.randn(VOCAB, d) * 0.02
    state["gpt.mel_pos_embedding.emb.weight"] = torch.randn(cfg.mel_pos_len, d) * 0.01
    state["gpt.text_embedding.weight"] = torch.randn(cfg.text_vocab, d) * 0.02
    state["gpt.text_pos_embedding.emb.weight"] = torch.randn(cfg.text_pos_len, d) * 0.01
    state["gpt.mel_head.weight"] = torch.randn(VOCAB, d) * 0.02
    state["gpt.mel_head.bias"] = torch.zeros(VOCAB)
    ckpt = tmp_path / "xtts_model.pth"
    torch.save({"model": state}, ckpt)

    report = import_xtts_checkpoint(checkpoint=ckpt, assets_dir=tmp_path)
    assert int(report["lm_params"]) > 0

    rt = XTTSRuntime.create(tmp_path)
    want = state["gpt.mel_embedding.weight"].numpy()
    got = np.asarray(rt.params["gpt"]["lm"]["tok_emb"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-3)

    audio, sr, _ = rt.synthesize(
        "Bonjour depuis le checkpoint importé.",
        voice_ref_path=str(_plant_ref(tmp_path)),
    )
    assert len(audio) > 0 and np.isfinite(audio).all()


def _plant_ref(tmp_path):
    from vocalie_tts_tpu.io.wavio import write_wav

    t = np.arange(24000 * 4) / 24000.0
    path = tmp_path / "ref.wav"
    write_wav(path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype("float32"), 24000)
    return path
