"""XTTS speaker d-vector encoder conversion parity: an independent
torch replica of the published H/ASP SE-ResNet speaker encoder
(pre-emphasis + hamming power-mel front-end, SE blocks, attentive
stats pooling — written here from the published architecture
description) must match models/xtts/speaker_resnet.py after
state-dict conversion with folded BatchNorms (ref: SURVEY §2.4 XTTS
re-support mandate)."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit

N_MELS, PROJ = 16, 16
LAYERS, FILTERS = (1, 2, 1, 1), (4, 8, 16, 32)
REDUCTION, ATTN_HIDDEN = 2, 8
SR, N_FFT, WIN, HOP, PREEMPH = 16000, 512, 400, 160, 0.97


def _torch_mel(audio):
    """torchaudio-equivalent front-end built on torch.stft (torchaudio
    is not in this image): PreEmphasis → hamming power spectrogram
    (win 400 padded to n_fft 512) → HTK mel (norm=None) → log(+1e-6)."""
    import torch

    from vocalie_tts_tpu.models.common.audio import _mel_filterbank_np

    x = torch.from_numpy(audio)
    # PreEmphasis: reflect-pad one sample, y[t] = x[t] - 0.97 x[t-1]
    xpad = torch.nn.functional.pad(x.unsqueeze(1), (1, 0), "reflect").squeeze(1)
    x = xpad[:, 1:] - PREEMPH * xpad[:, :-1]
    window = torch.hamming_window(WIN, periodic=True)
    spec = torch.stft(
        x, N_FFT, HOP, WIN, window=window,
        center=True, pad_mode="reflect", return_complex=True,
    ).abs() ** 2                                  # [b, bins, frames]
    fb = torch.from_numpy(
        _mel_filterbank_np(SR, N_FFT, N_MELS, 0.0, SR / 2, normalize=False)
    )
    mel = torch.einsum("bkf,km->bmf", spec, fb)
    return torch.log(mel + 1e-6)                  # [b, mels, frames]


def _build_torch_encoder(seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class SELayer(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.avg_pool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Sequential(
                nn.Linear(ch, ch // REDUCTION), nn.ReLU(),
                nn.Linear(ch // REDUCTION, ch), nn.Sigmoid(),
            )

        def forward(self, x):
            b, c, _, _ = x.size()
            y = self.fc(self.avg_pool(x).view(b, c)).view(b, c, 1, 1)
            return x * y

    class SEBasicBlock(nn.Module):
        def __init__(self, c_in, c_out, stride, downsample):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.relu = nn.ReLU(inplace=True)
            self.se = SELayer(c_out)
            self.downsample = downsample

        def forward(self, x):
            residual = x
            out = self.bn1(self.relu(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            out = self.se(out)
            if self.downsample is not None:
                residual = self.downsample(x)
            return self.relu(out + residual)

    class ResNetSpeakerEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, FILTERS[0], 3, 1, 1)
            self.relu = nn.ReLU(inplace=True)
            self.bn1 = nn.BatchNorm2d(FILTERS[0])
            self.inplanes = FILTERS[0]
            self.layer1 = self._make(FILTERS[0], LAYERS[0], 1)
            self.layer2 = self._make(FILTERS[1], LAYERS[1], 2)
            self.layer3 = self._make(FILTERS[2], LAYERS[2], 2)
            self.layer4 = self._make(FILTERS[3], LAYERS[3], 2)
            self.instancenorm = nn.InstanceNorm1d(N_MELS)
            outmap = N_MELS // 8
            feat = FILTERS[3] * outmap
            self.attention = nn.Sequential(
                nn.Conv1d(feat, ATTN_HIDDEN, 1), nn.ReLU(),
                nn.BatchNorm1d(ATTN_HIDDEN),
                nn.Conv1d(ATTN_HIDDEN, feat, 1), nn.Softmax(dim=2),
            )
            self.fc = nn.Linear(feat * 2, PROJ)

        def _make(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            layers = [SEBasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers.append(SEBasicBlock(planes, planes, 1, None))
            return nn.Sequential(*layers)

        def forward(self, mel):  # [b, mels, frames] log power mel
            import torch

            x = self.instancenorm(mel).unsqueeze(1)
            x = self.bn1(self.relu(self.conv1(x)))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.reshape(x.size()[0], -1, x.size()[-1])
            w = self.attention(x)
            mu = torch.sum(x * w, dim=2)
            sg = torch.sqrt(torch.clamp(
                torch.sum((x ** 2) * w, dim=2) - mu ** 2, min=1e-5))
            x = torch.cat((mu, sg), 1)
            x = self.fc(x)
            return torch.nn.functional.normalize(x, p=2, dim=1)

    m = ResNetSpeakerEncoder().eval()
    # perturb BN running stats so folding is non-trivial
    import torch as _t

    with _t.no_grad():
        for mod in m.modules():
            if isinstance(mod, (nn.BatchNorm2d, nn.BatchNorm1d)):
                mod.running_mean.add_(_t.randn_like(mod.running_mean) * 0.1)
                mod.running_var.mul_(_t.rand_like(mod.running_var) * 0.5 + 0.75)
                mod.weight.add_(_t.randn_like(mod.weight) * 0.1)
                mod.bias.add_(_t.randn_like(mod.bias) * 0.1)
    return m


def test_speaker_resnet_parity_vs_torch_replica():
    import torch

    from vocalie_tts_tpu.models.convert.xtts_modules import (
        convert_speaker_resnet,
        infer_speaker_resnet_config,
    )
    from vocalie_tts_tpu.models.xtts.speaker_resnet import (
        SpeakerResNetConfig,
        apply_speaker_resnet,
    )

    m = _build_torch_encoder()
    state = {f"hifigan_decoder.speaker_encoder.{k}": v.detach().numpy()
             for k, v in m.state_dict().items()}

    inferred = infer_speaker_resnet_config(state)
    assert inferred.n_mels == N_MELS
    assert inferred.layers == LAYERS and inferred.filters == FILTERS

    cfg = SpeakerResNetConfig(
        n_mels=N_MELS, proj_dim=PROJ, layers=LAYERS, filters=FILTERS,
        se_reduction=REDUCTION, attn_hidden=ATTN_HIDDEN,
    )
    params = convert_speaker_resnet(state, cfg)

    rng = np.random.default_rng(4)
    audio = (rng.normal(size=(2, 4800)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = m(_torch_mel(audio)).numpy()

    import jax.numpy as jnp

    got = np.asarray(apply_speaker_resnet(params, cfg, jnp.asarray(audio)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
