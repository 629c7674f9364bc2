"""Full token→wav stage import: a torch-exported synthetic S3Gen-layout
bundle (``flow.*`` + ``mel2wav.*``, built from the independently written
torch replicas in the per-module parity tests) must convert, load into
the chatterbox runtime, and drive synthesis end-to-end (ref:
tts_backends/chatterbox_impl.py:63-73, cosyvoice_runner.py:67-76)."""

import numpy as np
import pytest

from tests.test_convert_cfm import _build_torch_decoder
from tests.test_convert_conformer import _build_torch_encoder
from tests.test_convert_hift import _build_torch_hift

pytestmark = pytest.mark.unit


def _synthetic_s3gen_state(t2w_cfg, seed=0):
    """One state dict in the published chatterbox s3gen layout."""
    import torch

    torch.manual_seed(seed)
    enc = _build_torch_encoder(t2w_cfg.encoder, seed=seed)
    dec = _build_torch_decoder(t2w_cfg.decoder, seed=seed + 1)
    hift = _build_torch_hift(t2w_cfg.hift, seed=seed + 2)

    state = {}
    state["flow.input_embedding.weight"] = torch.randn(
        t2w_cfg.speech_vocab, t2w_cfg.encoder.input_size
    ) * 0.05
    state["flow.spk_embed_affine_layer.weight"] = torch.randn(
        t2w_cfg.n_mels, t2w_cfg.spk_dim
    ) * 0.05
    state["flow.spk_embed_affine_layer.bias"] = torch.zeros(t2w_cfg.n_mels)
    state["flow.encoder_proj.weight"] = torch.randn(
        t2w_cfg.n_mels, t2w_cfg.encoder.output_size
    ) * 0.1
    state["flow.encoder_proj.bias"] = torch.zeros(t2w_cfg.n_mels)
    for k, v in enc.state_dict().items():
        state[f"flow.encoder.{k}"] = v
    for k, v in dec.state_dict().items():
        state[f"flow.decoder.estimator.{k}"] = v
    for k, v in hift.state_dict().items():
        state[f"mel2wav.{k}"] = v
    return state, enc


def test_import_s3gen_into_chatterbox(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, ChatterboxRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_token2wav_checkpoint,
    )

    t2w_cfg = SCALES["tiny"].t2w
    state, enc = _synthetic_s3gen_state(t2w_cfg)
    ckpt = tmp_path / "s3gen.pt"
    torch.save(state, ckpt)

    report = import_token2wav_checkpoint(
        family="chatterbox", checkpoint=ckpt, assets_dir=tmp_path
    )
    assert int(report["t2w_params"]) > 0
    assert report["name"] == "s3gen"

    rt = ChatterboxRuntime.create(tmp_path)

    # the converted flow must be bit-compatible: check the deterministic
    # conditioning path (embedding → conformer → proj = mu) vs torch
    from vocalie_tts_tpu.models.common.conformer import apply_conformer_encoder
    from vocalie_tts_tpu.models.common.unet2d import dense

    tokens = np.array([[3, 9, 1, 7, 2, 5]], np.int32)
    t2w = rt.params["decoder"]["t2w"]
    h = t2w["input_embedding"][jnp.asarray(tokens)]
    h = apply_conformer_encoder(t2w["encoder"], t2w_cfg.encoder, h)
    mu = np.asarray(dense(t2w["encoder_proj"], h))

    with torch.no_grad():
        emb_t = torch.from_numpy(np.asarray(state["flow.input_embedding.weight"]))
        h_t = emb_t[torch.from_numpy(tokens).long()]
        h_t = enc(h_t)
        mu_t = (
            h_t @ state["flow.encoder_proj.weight"].T + state["flow.encoder_proj.bias"]
        ).numpy()
    np.testing.assert_allclose(mu, mu_t, rtol=3e-4, atol=3e-4)

    audio, sr, _ = rt.synthesize("Bonjour, étage importé.")
    assert sr == rt.cfg.sample_rate
    assert len(audio) > 0 and np.isfinite(audio).all()


def test_import_separate_flow_and_hift(tmp_path, monkeypatch):
    """CosyVoice layout: unprefixed flow.pt + hift.pt files."""
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_token2wav_checkpoint,
    )
    from vocalie_tts_tpu.models.cosyvoice.runtime import SCALES

    t2w_cfg = SCALES["tiny"].t2w
    state, _enc = _synthetic_s3gen_state(t2w_cfg, seed=3)
    flow_state = {
        k[len("flow."):]: v for k, v in state.items() if k.startswith("flow.")
    }
    hift_state = {
        k[len("mel2wav."):]: v for k, v in state.items() if k.startswith("mel2wav.")
    }
    flow_ckpt, hift_ckpt = tmp_path / "flow.pt", tmp_path / "hift.pt"
    torch.save(flow_state, flow_ckpt)
    torch.save(hift_state, hift_ckpt)

    report = import_token2wav_checkpoint(
        family="cosyvoice", checkpoint=flow_ckpt, assets_dir=tmp_path,
        hift_checkpoint=hift_ckpt,
    )
    assert report["name"] == "flow"

    from vocalie_tts_tpu.models.cosyvoice.runtime import CosyVoiceRuntime

    rt = CosyVoiceRuntime.create(tmp_path)
    audio, sr, meta = rt.synthesize("Test import cosyvoice.", mode="instruct")
    assert len(audio) > 0 and np.isfinite(audio).all()


def test_import_rejects_geometry_mismatch(tmp_path, monkeypatch):
    """A checkpoint whose geometry differs from the scale template must
    fail loud at import time, not at engine load."""
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    import dataclasses

    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_token2wav_checkpoint,
    )

    t2w_cfg = SCALES["tiny"].t2w
    wrong = dataclasses.replace(
        t2w_cfg,
        decoder=dataclasses.replace(t2w_cfg.decoder, num_mid_blocks=2),
    )
    state, _ = _synthetic_s3gen_state(wrong, seed=5)
    ckpt = tmp_path / "bad.pt"
    torch.save(state, ckpt)
    with pytest.raises(ValueError, match="does not match"):
        import_token2wav_checkpoint(
            family="chatterbox", checkpoint=ckpt, assets_dir=tmp_path
        )
