"""CFM estimator conversion parity: a torch replica of the published
Matcha/CosyVoice flow-matching decoder (written here independently)
must produce the same velocity field through models/common/cfm.py
after state-dict conversion. This pins the converter that real
CosyVoice flow and Chatterbox S3Gen checkpoints ride (ref:
tts_backends/cosyvoice_runner.py:67-76, chatterbox_impl.py:63-73)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _build_torch_decoder(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    emb_dim = cfg.channels[0] * 4

    class Transpose(nn.Module):
        def forward(self, x):
            return x.transpose(1, 2)

    class CausalConv1d(nn.Conv1d):
        def __init__(self, cin, cout, k):
            super().__init__(cin, cout, k)
            self._lpad = k - 1

        def forward(self, x):
            return super().forward(F.pad(x, (self._lpad, 0)))

    def block1d(cin, cout):
        if cfg.causal:
            return nn.Sequential(
                CausalConv1d(cin, cout, 3), Transpose(), nn.LayerNorm(cout),
                Transpose(), nn.Mish(),
            )
        return nn.Sequential(
            nn.Conv1d(cin, cout, 3, padding=1), nn.GroupNorm(8 if cout % 8 == 0 else 1, cout),
            nn.Mish(),
        )

    class Block1D(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.block = block1d(cin, cout)

        def forward(self, x, mask):
            return self.block(x * mask) * mask

    class ResnetBlock1D(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.mlp = nn.Sequential(nn.Mish(), nn.Linear(emb_dim, cout))
            self.block1 = Block1D(cin, cout)
            self.block2 = Block1D(cout, cout)
            self.res_conv = nn.Conv1d(cin, cout, 1)

        def forward(self, x, mask, t):
            h = self.block1(x, mask)
            h = h + self.mlp(t).unsqueeze(-1)
            h = self.block2(h, mask)
            return h + self.res_conv(x * mask)

    class Attention(nn.Module):
        def __init__(self, dim, heads, d_head):
            super().__init__()
            inner = heads * d_head
            self.heads, self.d_head = heads, d_head
            self.to_q = nn.Linear(dim, inner, bias=False)
            self.to_k = nn.Linear(dim, inner, bias=False)
            self.to_v = nn.Linear(dim, inner, bias=False)
            self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])

        def forward(self, x):
            b, t, _ = x.shape
            q = self.to_q(x).view(b, t, self.heads, self.d_head).transpose(1, 2)
            k = self.to_k(x).view(b, t, self.heads, self.d_head).transpose(1, 2)
            v = self.to_v(x).view(b, t, self.heads, self.d_head).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.d_head), dim=-1)
            o = (a @ v).transpose(1, 2).reshape(b, t, -1)
            return self.to_out[0](o)

    class GELUProj(nn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = nn.Linear(dim, inner)

        def forward(self, x):
            return F.gelu(self.proj(x))

    class FeedForward(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.net = nn.ModuleList(
                [GELUProj(dim, dim * 4), nn.Dropout(0.0), nn.Linear(dim * 4, dim)]
            )

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class BasicTransformerBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn1 = Attention(dim, cfg.num_heads, cfg.attention_head_dim)
            self.norm3 = nn.LayerNorm(dim)
            self.ff = FeedForward(dim)

        def forward(self, x):
            x = x + self.attn1(self.norm1(x))
            return x + self.ff(self.norm3(x))

    class Downsample1D(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv = nn.Conv1d(dim, dim, 3, 2, 1)

        def forward(self, x):
            return self.conv(x)

    class Upsample1D(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv = nn.ConvTranspose1d(dim, dim, 4, 2, 1)

        def forward(self, x):
            return self.conv(x)

    class TimestepEmbedding(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = nn.Linear(cfg.in_channels, emb_dim)
            self.linear_2 = nn.Linear(emb_dim, emb_dim)

        def forward(self, t):
            return self.linear_2(F.silu(self.linear_1(t)))

    def sin_emb(t, dim, scale=1000.0):
        half = dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = torch.exp(torch.arange(half).float() * -emb)
        ang = scale * t.unsqueeze(1) * freqs.unsqueeze(0)
        return torch.cat([ang.sin(), ang.cos()], dim=-1)

    def last_conv(dim):
        return CausalConv1d(dim, dim, 3) if cfg.causal else nn.Conv1d(dim, dim, 3, padding=1)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_mlp = TimestepEmbedding()
            self.down_blocks = nn.ModuleList([])
            self.mid_blocks = nn.ModuleList([])
            self.up_blocks = nn.ModuleList([])
            out_ch = cfg.in_channels
            for i, ch in enumerate(cfg.channels):
                is_last = i == len(cfg.channels) - 1
                resnet = ResnetBlock1D(out_ch, ch)
                xfs = nn.ModuleList([BasicTransformerBlock(ch) for _ in range(cfg.n_blocks)])
                down = last_conv(ch) if is_last else Downsample1D(ch)
                self.down_blocks.append(nn.ModuleList([resnet, xfs, down]))
                out_ch = ch
            for _ in range(cfg.num_mid_blocks):
                resnet = ResnetBlock1D(cfg.channels[-1], cfg.channels[-1])
                xfs = nn.ModuleList(
                    [BasicTransformerBlock(cfg.channels[-1]) for _ in range(cfg.n_blocks)]
                )
                self.mid_blocks.append(nn.ModuleList([resnet, xfs]))
            rev = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
            for i in range(len(rev) - 1):
                is_last = i == len(rev) - 2
                resnet = ResnetBlock1D(rev[i] * 2, rev[i + 1])
                xfs = nn.ModuleList([BasicTransformerBlock(rev[i + 1]) for _ in range(cfg.n_blocks)])
                up = last_conv(rev[i + 1]) if is_last else Upsample1D(rev[i + 1])
                self.up_blocks.append(nn.ModuleList([resnet, xfs, up]))
            self.final_block = Block1D(rev[-1], rev[-1])
            self.final_proj = nn.Conv1d(rev[-1], cfg.out_channels, 1)

        def forward(self, x, mask, mu, t, spks=None, cond=None):
            # x/mu/cond: [b, c, t]; mask: [b, 1, t]; spks: [b, c]
            t = self.time_mlp(sin_emb(t, cfg.in_channels))
            feats = [x, mu]
            if spks is not None:
                feats.append(spks.unsqueeze(-1).expand(-1, -1, x.shape[-1]))
            if cond is not None:
                feats.append(cond)
            x = torch.cat(feats, dim=1)
            hiddens, masks = [], [mask]
            for resnet, xfs, down in self.down_blocks:
                m = masks[-1]
                x = resnet(x, m, t)
                h = x.transpose(1, 2)
                for blk in xfs:
                    h = blk(h)
                x = h.transpose(1, 2)
                hiddens.append(x)
                x = down(x * m)
                masks.append(m if isinstance(down, (nn.Conv1d,)) and down.stride[0] == 1 else m[:, :, ::2])
            masks = masks[:-1]
            m = masks[-1]
            for resnet, xfs in self.mid_blocks:
                x = resnet(x, m, t)
                h = x.transpose(1, 2)
                for blk in xfs:
                    h = blk(h)
                x = h.transpose(1, 2)
            for resnet, xfs, up in self.up_blocks:
                m = masks.pop()
                skip = hiddens.pop()
                x = torch.cat([x[:, :, : skip.shape[-1]], skip], dim=1)
                x = resnet(x, m, t)
                h = x.transpose(1, 2)
                for blk in xfs:
                    h = blk(h)
                x = h.transpose(1, 2)
                x = up(x * m)
            x = self.final_block(x, m)
            return self.final_proj(x * m) * mask

    torch.manual_seed(seed)
    model = Decoder().eval()
    # break the symmetry of default inits a bit
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


def _parity(cfg, with_spks_cond, t_len=12, b=2, tol=2e-4):
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.cfm import apply_cfm_estimator
    from vocalie_tts_tpu.models.convert.cfm import convert_cfm_estimator

    model = _build_torch_decoder(cfg)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, inferred = convert_cfm_estimator(state, cfg)
    assert inferred.causal == cfg.causal
    assert inferred.channels == cfg.channels
    assert inferred.num_mid_blocks == cfg.num_mid_blocks
    assert inferred.n_blocks == cfg.n_blocks

    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, cfg.out_channels, t_len)).astype(np.float32)
    mu = rng.standard_normal((b, cfg.out_channels, t_len)).astype(np.float32)
    mask = np.ones((b, 1, t_len), np.float32)
    t = np.array([0.3, 0.8], np.float32)
    spks = cond = None
    if with_spks_cond:
        spks = rng.standard_normal((b, cfg.out_channels)).astype(np.float32)
        cond = rng.standard_normal((b, cfg.out_channels, t_len)).astype(np.float32)

    with torch.no_grad():
        ref = model(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(mu),
            torch.from_numpy(t),
            None if spks is None else torch.from_numpy(spks),
            None if cond is None else torch.from_numpy(cond),
        ).numpy()

    got = apply_cfm_estimator(
        params, inferred,
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
        None if spks is None else jnp.asarray(spks),
        None if cond is None else jnp.asarray(cond.transpose(0, 2, 1)),
    )
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_cfm_parity_causal_cosyvoice_shape():
    """CosyVoice2/3 causal single-level decoder with spk + cond."""
    from vocalie_tts_tpu.models.common.cfm import CFMDecoderConfig

    cfg = CFMDecoderConfig(
        in_channels=32, out_channels=8, channels=(24,), attention_head_dim=8,
        n_blocks=2, num_mid_blocks=3, num_heads=2, causal=True,
    )
    _parity(cfg, with_spks_cond=True)


def test_cfm_parity_noncausal_matcha_shape():
    """Matcha-style two-level decoder with down/upsampling, no spk/cond."""
    from vocalie_tts_tpu.models.common.cfm import CFMDecoderConfig

    cfg = CFMDecoderConfig(
        in_channels=16, out_channels=8, channels=(16, 24), attention_head_dim=8,
        n_blocks=1, num_mid_blocks=2, num_heads=2, causal=False,
    )
    _parity(cfg, with_spks_cond=False)


def test_cfm_generate_shapes_and_mask():
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.cfm import (
        CFMDecoderConfig, cfm_generate, init_cfm_estimator,
    )

    cfg = CFMDecoderConfig(
        in_channels=32, out_channels=8, channels=(16,), attention_head_dim=8,
        n_blocks=1, num_mid_blocks=1, num_heads=2, causal=True, n_timesteps=3,
    )
    params = init_cfm_estimator(jax.random.PRNGKey(0), cfg)
    b, t = 2, 10
    mu = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8))
    mask = jnp.ones((b, t, 1)).at[1, 7:, :].set(0.0)
    spks = jax.random.normal(jax.random.PRNGKey(2), (b, 8))
    cond = jnp.zeros((b, t, 8))
    mel = jax.jit(
        lambda r, mu, mask, spks, cond: cfm_generate(params, cfg, r, mu, mask, spks, cond)
    )(jax.random.PRNGKey(3), mu, mask, spks, cond)
    assert mel.shape == (b, t, 8)
    assert np.isfinite(np.asarray(mel)).all()
    assert np.abs(np.asarray(mel[1, 7:, :])).max() == 0.0


def test_xf_block_flash_path_matches_naive():
    """The whole-row-tile flash path (t >= 256, kv_lens set) must match
    the naive masked-softmax path (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.cfm import (
        CFMDecoderConfig,
        _xf_block,
        _xf_block_init,
    )

    cfg = CFMDecoderConfig(channels=(64,), num_heads=4, attention_head_dim=16)
    p = _xf_block_init(jax.random.PRNGKey(0), 64, cfg.num_heads,
                       cfg.attention_head_dim)
    rng = np.random.RandomState(0)
    b, t = 2, 320
    x = jnp.asarray(rng.randn(b, t, 64).astype(np.float32))
    lens = np.array([256, 320], np.int32)
    keep = (np.arange(t)[None, :] < lens[:, None])
    bias = jnp.asarray(
        np.where(keep, 0.0, -1e9)[:, None, None, :].astype(np.float32)
    )

    out_naive = np.asarray(_xf_block(p, cfg, x, bias, None))
    out_flash = np.asarray(_xf_block(p, cfg, x, None, jnp.asarray(lens)))
    # rows only diverge where the mask padding differs — compare the
    # valid frames (padded frames feed masked-out keys only)
    for i, n in enumerate(lens):
        np.testing.assert_allclose(
            out_flash[i, :n], out_naive[i, :n], atol=2e-4, rtol=2e-4
        )
