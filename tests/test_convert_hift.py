"""HiFT generator conversion parity: a torch replica of the published
NSF+ISTFT HiFi-GAN (CosyVoice/S3Gen mel2wav, written here independently)
must match models/common/hift.py after state-dict conversion, with the
stochastic source terms disabled (ref: tts_backends/
cosyvoice_runner.py:67-76, chatterbox_impl.py:63-73)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _build_torch_hift(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    class Snake(nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.alpha = nn.Parameter(torch.ones(channels))

        def forward(self, x):
            a = self.alpha.unsqueeze(0).unsqueeze(-1)
            return x + (1.0 / (a + 1e-9)) * torch.sin(x * a) ** 2

    def pad_of(k, d=1):
        return (k * d - d) // 2

    class ResBlock(nn.Module):
        def __init__(self, ch, k, dilations):
            super().__init__()
            self.convs1 = nn.ModuleList(
                [weight_norm(nn.Conv1d(ch, ch, k, dilation=d, padding=pad_of(k, d)))
                 for d in dilations]
            )
            self.convs2 = nn.ModuleList(
                [weight_norm(nn.Conv1d(ch, ch, k, padding=pad_of(k))) for _ in dilations]
            )
            self.activations1 = nn.ModuleList([Snake(ch) for _ in dilations])
            self.activations2 = nn.ModuleList([Snake(ch) for _ in dilations])

        def forward(self, x):
            for a1, c1, a2, c2 in zip(self.activations1, self.convs1,
                                      self.activations2, self.convs2):
                xt = c1(a1(x))
                xt = c2(a2(xt))
                x = x + xt
            return x

    class F0Predictor(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            ch = cfg.in_channels
            for _ in range(cfg.f0_layers):
                layers += [weight_norm(nn.Conv1d(ch, cfg.f0_cond_channels, 3, padding=1)),
                           nn.ELU()]
                ch = cfg.f0_cond_channels
            self.condnet = nn.Sequential(*layers)
            self.classifier = nn.Linear(cfg.f0_cond_channels, 1)

        def forward(self, x):
            x = self.condnet(x).transpose(1, 2)
            return torch.abs(self.classifier(x).squeeze(-1))

    class SourceModule(nn.Module):
        """Deterministic SineGen + merge head (no random phase/noise)."""

        def __init__(self):
            super().__init__()
            self.l_linear = nn.Linear(cfg.nb_harmonics + 1, 1)

        def forward(self, f0_up):  # [b, T, 1]
            h = torch.arange(1, cfg.nb_harmonics + 2).float()
            fn = f0_up * h  # [b, T, H+1]
            rad = (fn / cfg.sampling_rate) % 1
            over = torch.cumsum(rad, 1) % 1
            idx = (over[:, 1:, :] - over[:, :-1, :]) < 0
            shift = torch.zeros_like(rad)
            shift[:, 1:, :] = idx * -1.0
            sines = torch.sin(torch.cumsum(rad + shift, dim=1) * 2 * math.pi)
            uv = (f0_up > cfg.nsf_voiced_threshold).float()
            sine_waves = sines * cfg.nsf_alpha * uv
            return torch.tanh(self.l_linear(sine_waves))

    class HiFT(nn.Module):
        def __init__(self):
            super().__init__()
            self.f0_predictor = F0Predictor()
            self.m_source = SourceModule()
            self.f0_upsamp = nn.Upsample(scale_factor=cfg.hop)
            self.conv_pre = weight_norm(
                nn.Conv1d(cfg.in_channels, cfg.base_channels, 7, padding=3)
            )
            self.ups = nn.ModuleList()
            self.source_downs = nn.ModuleList()
            self.source_resblocks = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            ch = cfg.base_channels
            for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
                co = ch // 2
                self.ups.append(
                    weight_norm(nn.ConvTranspose1d(ch, co, k, u, padding=(k - u) // 2))
                )
                down = int(np.prod(cfg.upsample_rates[i + 1:])) if i + 1 < len(
                    cfg.upsample_rates) else 1
                if down == 1:
                    self.source_downs.append(nn.Conv1d(cfg.istft_n_fft + 2, co, 1))
                else:
                    self.source_downs.append(
                        nn.Conv1d(cfg.istft_n_fft + 2, co, down * 2, down, padding=down // 2)
                    )
                self.source_resblocks.append(
                    ResBlock(co, cfg.source_resblock_kernels[i],
                             cfg.source_resblock_dilations[i])
                )
                for rk, rd in zip(cfg.resblock_kernels, cfg.resblock_dilations):
                    self.resblocks.append(ResBlock(co, rk, rd))
                ch = co
            self.conv_post = weight_norm(nn.Conv1d(ch, cfg.istft_n_fft + 2, 7, padding=3))
            self.window = torch.hann_window(cfg.istft_n_fft)

        def forward(self, mel):  # [b, n_mels, t]
            f0 = self.f0_predictor(mel)
            f0_up = self.f0_upsamp(f0[:, None]).transpose(1, 2)
            s = self.m_source(f0_up).transpose(1, 2)  # [b, 1, T]
            spec = torch.stft(
                s.squeeze(1), cfg.istft_n_fft, cfg.istft_hop, window=self.window,
                return_complex=True,
            )
            s_stft = torch.cat([spec.real, spec.imag], dim=1)

            x = self.conv_pre(mel)
            nk = len(cfg.resblock_kernels)
            for i in range(len(self.ups)):
                x = F.leaky_relu(x, 0.1)
                x = self.ups[i](x)
                if i == len(self.ups) - 1:
                    x = F.pad(x, (1, 0), mode="reflect")
                si = self.source_resblocks[i](self.source_downs[i](s_stft))
                x = x + si
                xs = None
                for j in range(nk):
                    y = self.resblocks[i * nk + j](x)
                    xs = y if xs is None else xs + y
                x = xs / nk
            x = F.leaky_relu(x)
            x = self.conv_post(x)
            bins = cfg.istft_n_fft // 2 + 1
            mag = torch.exp(x[:, :bins, :]).clip(max=1e2)
            phase = torch.sin(x[:, bins:, :])
            real = mag * torch.cos(phase)
            imag = mag * torch.sin(phase)
            audio = torch.istft(
                torch.complex(real, imag), cfg.istft_n_fft, cfg.istft_hop,
                window=self.window,
            )
            return torch.clamp(audio, -cfg.audio_limit, cfg.audio_limit)

    torch.manual_seed(seed)
    model = HiFT().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return model


def _tiny_cfg():
    from vocalie_tts_tpu.models.common.hift import HiFTConfig

    return HiFTConfig(
        in_channels=8, base_channels=32, nb_harmonics=3,
        upsample_rates=(2, 2), upsample_kernels=(4, 4),
        f0_cond_channels=16, f0_layers=2,
    )


def test_hift_parity():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.hift import apply_hift
    from vocalie_tts_tpu.models.convert.hift import convert_hift

    cfg = _tiny_cfg()
    model = _build_torch_hift(cfg)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, inferred = convert_hift(state, cfg)
    assert inferred.upsample_rates == cfg.upsample_rates
    assert inferred.nb_harmonics == cfg.nb_harmonics
    assert inferred.f0_layers == cfg.f0_layers
    assert inferred.istft_n_fft == cfg.istft_n_fft

    rng = np.random.default_rng(0)
    t = 8
    mel = rng.standard_normal((2, cfg.in_channels, t)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(mel)).numpy()
    got = np.asarray(apply_hift(params, inferred, jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == ref.shape == (2, t * cfg.hop)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_hift_random_init_runs():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.hift import apply_hift, init_hift

    cfg = _tiny_cfg()
    p = init_hift(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.in_channels))
    audio = jax.jit(lambda m, r: apply_hift(p, cfg, m, r))(mel, jax.random.PRNGKey(2))
    assert audio.shape == (1, 6 * cfg.hop)
    a = np.asarray(audio)
    assert np.isfinite(a).all() and np.abs(a).max() <= cfg.audio_limit + 1e-6
