"""HiFi-GAN generator conversion parity: a weight-normed torch
generator (the published checkpoint architecture) must reproduce the
same waveform through the JAX vocoder after conversion. This is the
waveform-stage converter every engine family shares (ref:
chatterbox_impl.py:63-73, cosyvoice_runner.py:67-76)."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _build_torch_generator(n_mels, base, rates, kernels, res_kernels, res_dils, seed=0):
    """Standard HiFi-GAN V1 generator (own implementation of the public
    architecture) with weight_norm, as published checkpoints ship it."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    SLOPE = 0.1

    class ResBlock(nn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = nn.ModuleList(
                weight_norm(nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2))
                for d in dils
            )
            self.convs2 = nn.ModuleList(
                weight_norm(nn.Conv1d(ch, ch, k, padding=k // 2)) for _ in dils
            )

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = c2(F.leaky_relu(c1(F.leaky_relu(x, SLOPE)), SLOPE))
                x = x + xt
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = weight_norm(nn.Conv1d(n_mels, base, 7, padding=3))
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            ch = base
            for r, k in zip(rates, kernels):
                self.ups.append(
                    weight_norm(nn.ConvTranspose1d(ch, ch // 2, k, r, padding=(k - r) // 2))
                )
                ch //= 2
                for rk, dil in zip(res_kernels, res_dils):
                    self.resblocks.append(ResBlock(ch, rk, dil))
            self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

        def forward(self, mel):
            x = self.conv_pre(mel)
            nk = len(res_kernels)
            for i, up in enumerate(self.ups):
                x = up(F.leaky_relu(x, SLOPE))
                acc = None
                for j in range(nk):
                    y = self.resblocks[i * nk + j](x)
                    acc = y if acc is None else acc + y
                x = acc / nk
            return torch.tanh(self.conv_post(F.leaky_relu(x)))

    torch.manual_seed(seed)
    return Generator().eval()


def test_hifigan_conversion_waveform_parity():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.vocoder import VocoderConfig, apply_vocoder
    from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator

    n_mels, base = 20, 64
    rates, kernels = (8, 2), (16, 4)
    res_kernels, res_dils = (3, 7), ((1, 3, 5), (1, 3, 5))
    gen = _build_torch_generator(n_mels, base, rates, kernels, res_kernels, res_dils)

    state = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
    cfg = VocoderConfig(
        n_mels=n_mels, base_channels=base, upsample_rates=rates,
        upsample_kernels=kernels, resblock_kernels=res_kernels,
        resblock_dilations=res_dils, dtype=jnp.float32,
    )
    params = convert_hifigan_generator(state, cfg)

    mel = np.random.RandomState(0).randn(2, n_mels, 25).astype(np.float32)
    with torch.no_grad():
        want = gen(torch.tensor(mel)).numpy()[:, 0, :]
    got = np.asarray(apply_vocoder(params, cfg, jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_hifigan_config_inference_and_prefix():
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.convert.hifigan import (
        convert_hifigan_generator,
        infer_vocoder_config,
    )

    gen = _build_torch_generator(
        16, 32, (4, 2), (8, 4), (3,), ((1, 3),), seed=1
    )
    state = {f"generator.{k}": v.detach().numpy() for k, v in gen.state_dict().items()}

    cfg = infer_vocoder_config(state, prefix="generator.", dtype=jnp.float32)
    assert cfg.n_mels == 16 and cfg.base_channels == 32
    assert cfg.upsample_rates == (4, 2) and cfg.upsample_kernels == (8, 4)
    assert cfg.resblock_kernels == (3,) and cfg.resblock_dilations == ((1, 3),)

    params = convert_hifigan_generator(state, cfg, prefix="generator.")
    assert params["pre"]["w"].shape == (7, 16, 32)


def test_import_vocoder_into_qwen3(tmp_path, monkeypatch):
    """End-to-end stage-2 import: torch generator checkpoint →
    import_vocoder_checkpoint → LMTTSRuntime loads + synthesizes
    with the converted vocoder."""
    import jax.numpy as jnp
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    from vocalie_tts_tpu.models.convert.hifigan import fused_weight  # noqa: F401
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_vocoder_checkpoint,
    )
    from vocalie_tts_tpu.models.convert.torch_bridge import fuse_weight_norm
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES, LMTTSRuntime

    voc_cfg = SCALES["tiny"].vocoder
    gen = _build_torch_generator(
        voc_cfg.n_mels, voc_cfg.base_channels, voc_cfg.upsample_rates,
        voc_cfg.upsample_kernels, voc_cfg.resblock_kernels,
        voc_cfg.resblock_dilations, seed=4,
    )
    ckpt = tmp_path / "codec_vocoder.pt"
    torch.save(gen.state_dict(), ckpt)

    report = import_vocoder_checkpoint(
        family="qwen3", checkpoint=ckpt, assets_dir=tmp_path
    )
    assert int(report["vocoder_params"]) > 0

    rt = LMTTSRuntime.create(tmp_path)
    sd = gen.state_dict()
    want_pre = fuse_weight_norm(
        sd["conv_pre.weight_g"].numpy(), sd["conv_pre.weight_v"].numpy()
    ).transpose(2, 1, 0)
    got_pre = np.asarray(rt.params["decoder"]["vocoder"]["pre"]["w"], np.float32)
    np.testing.assert_allclose(got_pre, want_pre, atol=1e-5)

    audio, sr, _ = rt.synthesize("Bonjour avec le vocodeur importé.")
    assert len(audio) > 0


def test_vocoder_graft_rejects_token2wav_families(tmp_path):
    """chatterbox/cosyvoice stage-2 is flow+HiFT — the vanilla HiFi-GAN
    graft must refuse and point at --stage token2wav."""
    import pytest as _pytest

    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_vocoder_checkpoint,
    )

    for family in ("chatterbox", "cosyvoice"):
        with _pytest.raises(ValueError, match="token2wav"):
            import_vocoder_checkpoint(
                family=family, checkpoint=tmp_path / "x.pt", assets_dir=tmp_path
            )


def test_hifigan_conversion_fails_loud():
    import jax.numpy as jnp
    import pytest as _pytest

    from vocalie_tts_tpu.models.common.vocoder import VocoderConfig
    from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator

    cfg = VocoderConfig(n_mels=8, base_channels=16, upsample_rates=(2,),
                        upsample_kernels=(4,), resblock_kernels=(3,),
                        resblock_dilations=((1,),), dtype=jnp.float32)
    with _pytest.raises(KeyError):
        convert_hifigan_generator({}, cfg)

    bad = {"conv_pre.weight": np.zeros((16, 9, 7), np.float32),
           "conv_pre.bias": np.zeros(16, np.float32)}
    with _pytest.raises(ValueError):
        convert_hifigan_generator(bad, cfg)
