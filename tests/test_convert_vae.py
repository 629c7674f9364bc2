"""AutoencoderKL conversion parity: a torch replica of the CompVis VAE
(public architecture, written independently) must reproduce the same
moments and reconstruction through the JAX vae after conversion (the
AudioSR first stage — ref: backend/workers/audiosr_runner.py:93-97)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _ng(c, want=32):
    g = min(want, c)
    while c % g:
        g -= 1
    return g


def _build_torch_vae(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def norm(c):
        return nn.GroupNorm(_ng(c), c, eps=1e-6)

    class Resnet(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = norm(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = norm(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.nin_shortcut = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = self.conv1(F.silu(self.norm1(x)))
            h = self.conv2(F.silu(self.norm2(h)))
            skip = self.nin_shortcut(x) if hasattr(self, "nin_shortcut") else x
            return skip + h

    class Attn(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = norm(c)
            self.q = nn.Conv2d(c, c, 1)
            self.k = nn.Conv2d(c, c, 1)
            self.v = nn.Conv2d(c, c, 1)
            self.proj_out = nn.Conv2d(c, c, 1)

        def forward(self, x):
            b, c, hh, ww = x.shape
            h = self.norm(x)
            q = self.q(h).reshape(b, c, -1)
            k = self.k(h).reshape(b, c, -1)
            v = self.v(h).reshape(b, c, -1)
            w = torch.softmax(
                torch.einsum("bct,bcs->bts", q, k) / math.sqrt(c), dim=-1
            )
            a = torch.einsum("bts,bcs->bct", w, v).reshape(b, c, hh, ww)
            return x + self.proj_out(a)

    class Down(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(F.pad(x, (0, 1, 0, 1)))

    class Up(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))

    class Level(nn.Module):
        pass

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            n = len(cfg.channel_mult)

            class Mod(nn.Module):
                pass

            enc = Mod()
            enc.conv_in = nn.Conv2d(cfg.in_channels, cfg.base_channels, 3, padding=1)
            enc.down = nn.ModuleList()
            ch = cfg.base_channels
            for i, mult in enumerate(cfg.channel_mult):
                lvl = Mod()
                blocks = nn.ModuleList()
                for _ in range(cfg.num_res_blocks):
                    blocks.append(Resnet(ch, cfg.base_channels * mult))
                    ch = cfg.base_channels * mult
                lvl.block = blocks
                if i != n - 1:
                    lvl.downsample = Down(ch)
                enc.down.append(lvl)
            mid = Mod()
            mid.block_1, mid.attn_1, mid.block_2 = Resnet(ch, ch), Attn(ch), Resnet(ch, ch)
            enc.mid = mid
            enc.norm_out = norm(ch)
            enc.conv_out = nn.Conv2d(ch, 2 * cfg.z_channels, 3, padding=1)
            self.encoder = enc

            dec = Mod()
            dec.conv_in = nn.Conv2d(cfg.embed_dim, ch, 3, padding=1)
            midd = Mod()
            midd.block_1, midd.attn_1, midd.block_2 = Resnet(ch, ch), Attn(ch), Resnet(ch, ch)
            dec.mid = midd
            ups = [None] * n
            for i in reversed(range(n)):
                lvl = Mod()
                blocks = nn.ModuleList()
                for _ in range(cfg.num_res_blocks + 1):
                    blocks.append(Resnet(ch, cfg.base_channels * cfg.channel_mult[i]))
                    ch = cfg.base_channels * cfg.channel_mult[i]
                lvl.block = blocks
                if i != 0:
                    lvl.upsample = Up(ch)
                ups[i] = lvl
            dec.up = nn.ModuleList(ups)
            dec.norm_out = norm(ch)
            dec.conv_out = nn.Conv2d(ch, cfg.in_channels, 3, padding=1)
            self.decoder = dec
            self.quant_conv = nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
            self.post_quant_conv = nn.Conv2d(cfg.embed_dim, cfg.embed_dim, 1)

        def encode_moments(self, x):
            enc = self.encoder
            h = enc.conv_in(x)
            for i, lvl in enumerate(enc.down):
                for b in lvl.block:
                    h = b(h)
                if hasattr(lvl, "downsample"):
                    h = lvl.downsample(h)
            h = enc.mid.block_2(enc.mid.attn_1(enc.mid.block_1(h)))
            import torch.nn.functional as F

            h = enc.conv_out(F.silu(enc.norm_out(h)))
            return self.quant_conv(h)

        def decode(self, z):
            import torch.nn.functional as F

            dec = self.decoder
            h = dec.conv_in(self.post_quant_conv(z))
            h = dec.mid.block_2(dec.mid.attn_1(dec.mid.block_1(h)))
            for i in reversed(range(len(dec.up))):
                for b in dec.up[i].block:
                    h = b(h)
                if hasattr(dec.up[i], "upsample"):
                    h = dec.up[i].upsample(h)
            return dec.conv_out(F.silu(dec.norm_out(h)))

    import torch

    torch.manual_seed(seed)
    return VAE().eval()


def test_vae_conversion_parity():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.audiosr.vae import (
        VAEConfig,
        vae_decode,
        vae_encode_moments,
    )
    from vocalie_tts_tpu.models.convert.ldm import convert_vae

    cfg = VAEConfig(in_channels=1, base_channels=16, channel_mult=(1, 2),
                    num_res_blocks=1, z_channels=4, embed_dim=4)
    model = _build_torch_vae(cfg, seed=7)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_vae(state, cfg)

    x = np.random.RandomState(0).randn(2, 1, 16, 8).astype(np.float32)
    with torch.no_grad():
        want_m = model.encode_moments(torch.tensor(x)).numpy()
    got_m = np.asarray(
        vae_encode_moments(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_m, want_m, atol=2e-4, rtol=2e-4)

    z = np.random.RandomState(1).randn(2, cfg.embed_dim, 8, 4).astype(np.float32)
    with torch.no_grad():
        want_r = model.decode(torch.tensor(z)).numpy()
    got_r = np.asarray(
        vae_decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_r, want_r, atol=2e-4, rtol=2e-4)


def test_vae_roundtrip_shapes():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.audiosr.vae import (
        VAEConfig,
        init_vae,
        vae_decode,
        vae_encode,
    )

    cfg = VAEConfig(in_channels=1, base_channels=8, channel_mult=(1, 2, 2),
                    num_res_blocks=1, z_channels=4, embed_dim=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1, 32, 16, 1))
    z = vae_encode(params, cfg, x)
    assert z.shape == (1, 8, 4, 4)
    y = vae_decode(params, cfg, z)
    assert y.shape == x.shape
