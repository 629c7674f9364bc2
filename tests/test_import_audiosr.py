"""End-to-end AudioSR checkpoint import: a torch LDM bundle (CompVis
VAE under first_stage_model. + UNet under model.diffusion_model.) →
import_audiosr_checkpoint → AudioSRRuntime loads and enhances audio
(ref: backend/workers/audiosr_runner.py:93-97)."""

import numpy as np
import pytest

from tests.test_convert_ldm import _build_torch_unet
from tests.test_convert_vae import _build_torch_vae

pytestmark = pytest.mark.unit


def test_import_audiosr_bundle(tmp_path, monkeypatch):
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    from vocalie_tts_tpu.models.audiosr.runtime import SCALES, AudioSRRuntime
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_audiosr_checkpoint,
    )

    cfg = SCALES["tiny"]
    vae = _build_torch_vae(cfg.vae, seed=11)
    unet = _build_torch_unet(cfg.unet, seed=12)
    state = {f"first_stage_model.{k}": v for k, v in vae.state_dict().items()}
    state.update(
        {f"model.diffusion_model.{k}": v for k, v in unet.state_dict().items()}
    )
    ckpt = tmp_path / "audiosr_basic.pt"
    torch.save(state, ckpt)

    report = import_audiosr_checkpoint(checkpoint=ckpt, assets_dir=tmp_path)
    assert int(report["ldm_params"]) > 0

    rt = AudioSRRuntime.create(tmp_path)
    want = vae.state_dict()["encoder.conv_in.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(rt.params["vae"]["encoder"]["conv_in"]["w"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)

    audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(24000) / 48000)).astype(
        np.float32
    )
    out = rt.enhance_audio(audio, 48000, ddim_steps=4, guidance_scale=2.0, seed=0)
    assert out.dtype == np.float32 and len(out) > 0
    assert np.all(np.isfinite(out))
