"""XTTS latent HiFi-GAN decoder conversion parity: an independent
torch replica of the published HifiDecoder (linear latent interpolation
+ HifiganGenerator with cond_in_each_up_layer, written here from the
published architecture description) must match
models/xtts/hifi_decoder.py after state-dict conversion (ref: SURVEY
§2.4 XTTS re-support mandate; BASELINE config #2)."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit

LATENT, DVEC, BASE = 16, 8, 32
UPS, KERNELS = (4, 4), (8, 8)
RES_KERNELS = (3,)
DILS = (1, 3, 5)


def _build_torch_decoder(seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    torch.manual_seed(seed)

    def get_padding(k, d):
        return (k * d - d) // 2

    class ResBlock1(nn.Module):
        def __init__(self, ch, k):
            super().__init__()
            self.convs1 = nn.ModuleList([
                weight_norm(nn.Conv1d(ch, ch, k, 1, get_padding(k, d), dilation=d))
                for d in DILS
            ])
            self.convs2 = nn.ModuleList([
                weight_norm(nn.Conv1d(ch, ch, k, 1, get_padding(k, 1)))
                for _ in DILS
            ])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = c1(F.leaky_relu(x, 0.1))
                xt = c2(F.leaky_relu(xt, 0.1))
                x = x + xt
            return x

    class HifiganGenerator(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = nn.Conv1d(LATENT, BASE, 7, 1, 3)   # not weight-normed
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            self.conds = nn.ModuleList()
            ch = BASE
            for r, k in zip(UPS, KERNELS):
                self.ups.append(weight_norm(
                    nn.ConvTranspose1d(ch, ch // 2, k, r, padding=(k - r) // 2)))
                ch //= 2
                for rk in RES_KERNELS:
                    self.resblocks.append(ResBlock1(ch, rk))
                self.conds.append(nn.Conv1d(DVEC, ch, 1))
            self.conv_post = nn.Conv1d(ch, 1, 7, 1, 3, bias=False)
            self.cond_layer = nn.Conv1d(DVEC, BASE, 1)

        def forward(self, x, g):
            o = self.conv_pre(x) + self.cond_layer(g)
            nk = len(RES_KERNELS)
            for i in range(len(UPS)):
                o = F.leaky_relu(o, 0.1)
                o = self.ups[i](o) + self.conds[i](g)
                zs = sum(self.resblocks[i * nk + j](o) for j in range(nk))
                o = zs / nk
            o = F.leaky_relu(o)                                 # slope 0.01
            return torch.tanh(self.conv_post(o))

    class HifiDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.waveform_decoder = HifiganGenerator()

        def forward(self, latents, g):  # [b, n, latent], [b, dvec]
            z = F.interpolate(
                latents.transpose(1, 2), scale_factor=[1024 / 256], mode="linear",
            )
            z = F.interpolate(z, scale_factor=[24000 / 22050], mode="linear")
            return self.waveform_decoder(z, g.unsqueeze(-1))

    return HifiDecoder().eval()


def test_hifi_decoder_parity_vs_torch_replica():
    import torch

    from vocalie_tts_tpu.models.convert.xtts_modules import (
        convert_hifi_decoder,
        infer_hifi_decoder_config,
    )
    from vocalie_tts_tpu.models.xtts.hifi_decoder import (
        HifiDecoderConfig,
        apply_hifi_decoder,
    )

    m = _build_torch_decoder()
    state = {f"hifigan_decoder.{k}": v.detach().numpy()
             for k, v in m.state_dict().items()}

    inferred = infer_hifi_decoder_config(state)
    assert inferred.latent_dim == LATENT
    assert inferred.d_vector_dim == DVEC
    assert inferred.upsample_rates == UPS

    cfg = HifiDecoderConfig(
        latent_dim=LATENT, d_vector_dim=DVEC, base_channels=BASE,
        upsample_rates=UPS, upsample_kernels=KERNELS, resblock_kernels=RES_KERNELS,
    )
    params = convert_hifi_decoder(state, cfg)

    rng = np.random.default_rng(3)
    latents = rng.normal(size=(2, 7, LATENT)).astype(np.float32)
    g = rng.normal(size=(2, DVEC)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(latents), torch.from_numpy(g)).numpy()[:, 0, :]

    import jax.numpy as jnp

    got = np.asarray(apply_hifi_decoder(params, cfg, jnp.asarray(latents), jnp.asarray(g)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
