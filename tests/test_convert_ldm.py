"""LDM UNet conversion parity: a torch UNetModel replica (the public
guided-diffusion/CompVis architecture, written here independently) must
produce the same eps prediction through the JAX unet2d after state-dict
conversion. This pins the converter the real AudioSR checkpoint rides
(ref: backend/workers/audiosr_runner.py:93-97)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _ng(c, want=32):
    g = min(want, c)
    while c % g:
        g -= 1
    return g


def _build_torch_unet(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    emb_dim = 4 * cfg.model_channels

    class ResBlock(nn.Module):
        def __init__(self, cin, cout, scale_shift):
            super().__init__()
            self.scale_shift = scale_shift
            self.in_layers = nn.Sequential(
                nn.GroupNorm(_ng(cin), cin), nn.SiLU(),
                nn.Conv2d(cin, cout, 3, padding=1),
            )
            self.emb_layers = nn.Sequential(
                nn.SiLU(), nn.Linear(emb_dim, 2 * cout if scale_shift else cout)
            )
            self.out_layers = nn.Sequential(
                nn.GroupNorm(_ng(cout), cout), nn.SiLU(), nn.Dropout(0.0),
                nn.Conv2d(cout, cout, 3, padding=1),
            )
            self.skip_connection = (
                nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()
            )

        def forward(self, x, emb):
            h = self.in_layers(x)
            e = self.emb_layers(emb)[:, :, None, None]
            if self.scale_shift:
                scale, shift = torch.chunk(e, 2, dim=1)
                norm, act, _drop, conv = self.out_layers
                h = norm(h) * (1 + scale) + shift
                h = conv(act(h))
            else:
                h = h + e
                h = self.out_layers(h)
            return self.skip_connection(x) + h

    class AttnBlock(nn.Module):
        def __init__(self, c, heads):
            super().__init__()
            self.heads = heads
            self.norm = nn.GroupNorm(_ng(c), c)
            self.qkv = nn.Conv1d(c, 3 * c, 1)
            self.proj_out = nn.Conv1d(c, c, 1)

        def forward(self, x):
            b, c, hh, ww = x.shape
            flat = x.reshape(b, c, -1)
            qkv = self.qkv(self.norm(flat))
            # legacy QKVAttention: heads-major split
            d = c // self.heads
            q, k, v = qkv.reshape(b * self.heads, 3 * d, -1).split(d, dim=1)
            scale = 1 / math.sqrt(math.sqrt(d))
            w = torch.softmax(
                torch.einsum("bct,bcs->bts", q * scale, k * scale), dim=-1
            )
            a = torch.einsum("bts,bcs->bct", w, v).reshape(b, c, -1)
            return x + self.proj_out(a).reshape(b, c, hh, ww)

    class Down(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.op = nn.Conv2d(c, c, 3, stride=2, padding=1)

        def forward(self, x):
            return self.op(x)

    class Up(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))

    class UNet(nn.Module):
        def __init__(self):
            super().__init__()
            ss = cfg.use_scale_shift_norm
            self.time_embed = nn.Sequential(
                nn.Linear(cfg.model_channels, emb_dim), nn.SiLU(),
                nn.Linear(emb_dim, emb_dim),
            )
            self.input_blocks = nn.ModuleList(
                [nn.Sequential(nn.Conv2d(cfg.in_channels, cfg.model_channels, 3, padding=1))]
            )
            ch, ds = cfg.model_channels, 1
            chans = [ch]
            for level, mult in enumerate(cfg.channel_mult):
                for _ in range(cfg.num_res_blocks):
                    mods = [ResBlock(ch, mult * cfg.model_channels, ss)]
                    ch = mult * cfg.model_channels
                    if ds in cfg.attention_resolutions:
                        mods.append(AttnBlock(ch, cfg.num_heads))
                    self.input_blocks.append(nn.Sequential(*mods))
                    chans.append(ch)
                if level != len(cfg.channel_mult) - 1:
                    self.input_blocks.append(nn.Sequential(Down(ch)))
                    chans.append(ch)
                    ds *= 2
            self.middle_block = nn.Sequential(
                ResBlock(ch, ch, ss), AttnBlock(ch, cfg.num_heads), ResBlock(ch, ch, ss)
            )
            self.output_blocks = nn.ModuleList()
            for level, mult in reversed(list(enumerate(cfg.channel_mult))):
                for i in range(cfg.num_res_blocks + 1):
                    ich = chans.pop()
                    mods = [ResBlock(ch + ich, cfg.model_channels * mult, ss)]
                    ch = cfg.model_channels * mult
                    if ds in cfg.attention_resolutions:
                        mods.append(AttnBlock(ch, cfg.num_heads))
                    if level and i == cfg.num_res_blocks:
                        mods.append(Up(ch))
                        ds //= 2
                    self.output_blocks.append(nn.Sequential(*mods))
            self.out = nn.Sequential(
                nn.GroupNorm(_ng(ch), ch), nn.SiLU(),
                nn.Conv2d(ch, cfg.out_channels, 3, padding=1),
            )

        def forward(self, x, t):
            half = cfg.model_channels // 2
            freqs = torch.exp(
                -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
            )
            args = t.float()[:, None] * freqs[None]
            emb = self.time_embed(torch.cat([torch.cos(args), torch.sin(args)], dim=-1))
            hs, h = [], x
            for block in self.input_blocks:
                for mod in block:
                    h = mod(h, emb) if isinstance(mod, ResBlock) else mod(h)
                hs.append(h)
            for mod in self.middle_block:
                h = mod(h, emb) if isinstance(mod, ResBlock) else mod(h)
            for block in self.output_blocks:
                h = torch.cat([h, hs.pop()], dim=1)
                for mod in block:
                    h = mod(h, emb) if isinstance(mod, ResBlock) else mod(h)
            return self.out(h)

    import torch

    torch.manual_seed(seed)
    return UNet().eval()


@pytest.mark.parametrize("scale_shift", [False, True])
def test_ldm_unet_conversion_parity(scale_shift):
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.unet2d import UNet2DConfig, apply_unet2d
    from vocalie_tts_tpu.models.convert.ldm import convert_ldm_unet

    cfg = UNet2DConfig(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        use_scale_shift_norm=scale_shift,
    )
    model = _build_torch_unet(cfg, seed=1 + int(scale_shift))
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_ldm_unet(state, cfg)

    x = np.random.RandomState(0).randn(2, 6, 8, 8).astype(np.float32)
    t = np.array([3.0, 700.0], np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(
        apply_unet2d(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_ldm_unet_conversion_fails_loud():
    from vocalie_tts_tpu.models.common.unet2d import UNet2DConfig
    from vocalie_tts_tpu.models.convert.ldm import convert_ldm_unet

    cfg = UNet2DConfig(in_channels=4, model_channels=8, out_channels=4,
                       num_res_blocks=1, attention_resolutions=(),
                       channel_mult=(1,), num_heads=1)
    with pytest.raises(KeyError):
        convert_ldm_unet({}, cfg)
    bad = {"input_blocks.0.0.weight": np.zeros((8, 5, 3, 3), np.float32)}
    with pytest.raises(ValueError):
        convert_ldm_unet(bad, cfg)
