"""Upsample-conformer conversion parity: a torch replica of the
published CosyVoice2/S3Gen flow encoder (wenet UpsampleConformerEncoder
with espnet rel-pos attention, written here independently) must match
models/common/conformer.py after state-dict conversion (ref:
tts_backends/cosyvoice_runner.py:67-76)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _build_torch_encoder(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    d, h = cfg.output_size, cfg.attention_heads
    dk = d // h

    class RelPosEnc(nn.Module):
        """Espnet relative positional encoding (no params)."""

        def forward(self, x):
            t = x.size(1)
            pos = torch.arange(t - 1, -t, -1).float()
            div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
            ang = pos.unsqueeze(1) * div.unsqueeze(0)
            pe = torch.zeros(2 * t - 1, d)
            pe[:, 0::2] = torch.sin(ang)
            pe[:, 1::2] = torch.cos(ang)
            return x * math.sqrt(d), pe.unsqueeze(0)

    class Embed(nn.Module):
        def __init__(self, d_in):
            super().__init__()
            self.out = nn.Sequential(nn.Linear(d_in, d), nn.LayerNorm(d), nn.Dropout(0.0))
            self.pos_enc = RelPosEnc()

        def forward(self, x):
            return self.pos_enc(self.out(x))

    class RelPosAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_q = nn.Linear(d, d)
            self.linear_k = nn.Linear(d, d)
            self.linear_v = nn.Linear(d, d)
            self.linear_out = nn.Linear(d, d)
            self.linear_pos = nn.Linear(d, d, bias=False)
            self.pos_bias_u = nn.Parameter(torch.randn(h, dk) * 0.1)
            self.pos_bias_v = nn.Parameter(torch.randn(h, dk) * 0.1)

        @staticmethod
        def rel_shift(x):
            b, nh, t, _ = x.shape
            zero_pad = torch.zeros((b, nh, t, 1))
            x_padded = torch.cat([zero_pad, x], dim=-1).view(b, nh, 2 * t, t)
            return x_padded[:, :, 1:].reshape(b, nh, t, 2 * t - 1)[:, :, :, :t]

        def forward(self, x, pos_emb):
            b, t, _ = x.shape
            q = self.linear_q(x).view(b, t, h, dk)
            k = self.linear_k(x).view(b, t, h, dk).transpose(1, 2)
            v = self.linear_v(x).view(b, t, h, dk).transpose(1, 2)
            p = self.linear_pos(pos_emb).view(1, -1, h, dk).transpose(1, 2)
            q_u = (q + self.pos_bias_u).transpose(1, 2)
            q_v = (q + self.pos_bias_v).transpose(1, 2)
            ac = q_u @ k.transpose(-2, -1)
            bd = self.rel_shift(q_v @ p.transpose(-2, -1))
            scores = (ac + bd) / math.sqrt(dk)
            attn = torch.softmax(scores, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, t, d)
            return self.linear_out(out)

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = RelPosAttn()
            self.feed_forward = nn.Module()
            self.feed_forward.w_1 = nn.Linear(d, cfg.linear_units)
            self.feed_forward.w_2 = nn.Linear(cfg.linear_units, d)
            self.norm_mha = nn.LayerNorm(d)
            self.norm_ff = nn.LayerNorm(d)

        def forward(self, x, pos_emb):
            x = x + self.self_attn(self.norm_mha(x), pos_emb)
            h_ = self.norm_ff(x)
            return x + self.feed_forward.w_2(torch.relu(self.feed_forward.w_1(h_)))

    class PreLookahead(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv1d(d, d, cfg.pre_lookahead_len + 1)
            self.conv2 = nn.Conv1d(d, d, 3)

        def forward(self, x):
            o = x.transpose(1, 2)
            o = F.leaky_relu(self.conv1(F.pad(o, (0, cfg.pre_lookahead_len))))
            o = self.conv2(F.pad(o, (2, 0))).transpose(1, 2)
            return x + o

    class Upsample(nn.Module):
        def __init__(self):
            super().__init__()
            s = cfg.upsample_stride
            self.conv = nn.Conv1d(d, d, 2 * s + 1)

        def forward(self, x):
            s = cfg.upsample_stride
            o = F.interpolate(x, scale_factor=float(s), mode="nearest")
            return self.conv(F.pad(o, (2 * s, 0)))

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = Embed(cfg.input_size)
            self.pre_lookahead_layer = PreLookahead()
            self.encoders = nn.ModuleList([Layer() for _ in range(cfg.num_blocks)])
            self.up_layer = Upsample()
            self.up_embed = Embed(cfg.input_size)
            self.up_encoders = nn.ModuleList([Layer() for _ in range(cfg.num_up_blocks)])
            self.after_norm = nn.LayerNorm(d)

        def forward(self, x):
            x, pos = self.embed(x)
            x = self.pre_lookahead_layer(x)
            for layer in self.encoders:
                x = layer(x, pos)
            x = self.up_layer(x.transpose(1, 2)).transpose(1, 2)
            x, pos = self.up_embed(x)
            for layer in self.up_encoders:
                x = layer(x, pos)
            return self.after_norm(x)

    torch.manual_seed(seed)
    model = Encoder().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


def test_conformer_parity():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.conformer import (
        ConformerEncoderConfig, apply_conformer_encoder,
    )
    from vocalie_tts_tpu.models.convert.conformer import convert_conformer_encoder

    cfg = ConformerEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, num_up_blocks=1, upsample_stride=2, pre_lookahead_len=3,
    )
    model = _build_torch_encoder(cfg)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, inferred = convert_conformer_encoder(state)
    assert inferred == cfg

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = np.asarray(apply_conformer_encoder(params, inferred, jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 18, 16)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_conformer_upsamples_and_masks():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.conformer import (
        ConformerEncoderConfig, apply_conformer_encoder, init_conformer_encoder,
    )

    cfg = ConformerEncoderConfig(
        input_size=8, output_size=8, attention_heads=2, linear_units=16,
        num_blocks=1, num_up_blocks=1,
    )
    p = init_conformer_encoder(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8))
    mask = jnp.ones((2, 6, 1)).at[1, 4:, :].set(0.0)
    out = jax.jit(lambda x, m: apply_conformer_encoder(p, cfg, x, m))(x, mask)
    assert out.shape == (2, 12, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out[1, 8:, :])).max() == 0.0
