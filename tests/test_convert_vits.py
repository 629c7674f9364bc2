"""VITS conversion parity: a torch SynthesizerTrn replica (the public
VITS architecture, written here independently, with the published
parameter names) must reproduce the JAX graph's outputs after state-dict
conversion — encoder stats, stochastic durations (same injected noise),
flow inverse, and the final waveform. This pins the converter real
Piper checkpoints ride (BASELINE config #1; ref: SURVEY §2.4)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit


# ── torch replica of the public architecture ────────────────────────────


def _build_torch_vits(cfg, seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class LayerNorm(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.gamma = nn.Parameter(torch.ones(c))
            self.beta = nn.Parameter(torch.zeros(c))

        def forward(self, x):  # [b, c, t]
            x = x.transpose(1, -1)
            x = F.layer_norm(x, (x.size(-1),), self.gamma, self.beta, 1e-5)
            return x.transpose(1, -1)

    class MultiHeadAttention(nn.Module):
        def __init__(self, c, heads, window):
            super().__init__()
            self.heads, self.window = heads, window
            d = c // heads
            self.conv_q = nn.Conv1d(c, c, 1)
            self.conv_k = nn.Conv1d(c, c, 1)
            self.conv_v = nn.Conv1d(c, c, 1)
            self.conv_o = nn.Conv1d(c, c, 1)
            rel_std = d ** -0.5
            self.emb_rel_k = nn.Parameter(torch.randn(1, 2 * window + 1, d) * rel_std)
            self.emb_rel_v = nn.Parameter(torch.randn(1, 2 * window + 1, d) * rel_std)

        def _rel_emb(self, emb, t):
            pad = max(t - (self.window + 1), 0)
            start = max((self.window + 1) - t, 0)
            padded = F.pad(emb, (0, 0, pad, pad))
            return padded[:, start: start + 2 * t - 1]

        @staticmethod
        def _rel_to_abs(x):
            b, h, t, _ = x.shape
            x = F.pad(x, (0, 1))
            x = x.view(b, h, t * 2 * t)
            x = F.pad(x, (0, t - 1))
            return x.view(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1:]

        @staticmethod
        def _abs_to_rel(x):
            b, h, t, _ = x.shape
            x = F.pad(x, (0, t - 1))
            x = x.view(b, h, t * t + t * (t - 1))
            x = F.pad(x, (t, 0))
            return x.view(b, h, t, 2 * t)[:, :, :, 1:]

        def forward(self, x, attn_mask):  # x [b, c, t]
            b, c, t = x.shape
            h, d = self.heads, c // self.heads
            q = self.conv_q(x).view(b, h, d, t).transpose(2, 3)
            k = self.conv_k(x).view(b, h, d, t).transpose(2, 3)
            v = self.conv_v(x).view(b, h, d, t).transpose(2, 3)
            scores = torch.matmul(q / math.sqrt(d), k.transpose(-2, -1))
            rel_k = self._rel_emb(self.emb_rel_k, t)
            rel_logits = torch.matmul(q / math.sqrt(d), rel_k.unsqueeze(0).transpose(-2, -1))
            scores = scores + self._rel_to_abs(rel_logits)
            scores = scores.masked_fill(~attn_mask, -1e4)
            p = torch.softmax(scores, dim=-1)
            out = torch.matmul(p, v)
            rel_v = self._rel_emb(self.emb_rel_v, t)
            out = out + torch.matmul(self._abs_to_rel(p), rel_v.unsqueeze(0))
            out = out.transpose(2, 3).contiguous().view(b, c, t)
            return self.conv_o(out)

    class FFN(nn.Module):
        def __init__(self, c, hidden, kernel):
            super().__init__()
            self.conv_1 = nn.Conv1d(c, hidden, kernel, padding=kernel // 2)
            self.conv_2 = nn.Conv1d(hidden, c, kernel, padding=kernel // 2)

        def forward(self, x, mask):
            x = self.conv_1(x * mask)
            x = torch.relu(x)
            return self.conv_2(x * mask)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn_layers = nn.ModuleList()
            self.norm_layers_1 = nn.ModuleList()
            self.ffn_layers = nn.ModuleList()
            self.norm_layers_2 = nn.ModuleList()
            for _ in range(cfg.n_layers):
                self.attn_layers.append(
                    MultiHeadAttention(cfg.d_model, cfg.n_heads, cfg.rel_window))
                self.norm_layers_1.append(LayerNorm(cfg.d_model))
                self.ffn_layers.append(FFN(cfg.d_model, cfg.d_ff, cfg.ff_kernel))
                self.norm_layers_2.append(LayerNorm(cfg.d_model))

        def forward(self, x, mask):
            attn_mask = (mask.unsqueeze(2) * mask.unsqueeze(-1)) > 0
            x = x * mask
            for i in range(cfg.n_layers):
                y = self.attn_layers[i](x * mask, attn_mask)
                x = self.norm_layers_1[i](x + y)
                y = self.ffn_layers[i](x, mask)
                x = self.norm_layers_2[i](x + y)
            return x * mask

    class TextEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(cfg.n_phones, cfg.d_model)
            nn.init.normal_(self.emb.weight, 0.0, cfg.d_model ** -0.5)
            self.encoder = Encoder()
            self.proj = nn.Conv1d(cfg.d_model, 2 * cfg.latent_dim, 1)

        def forward(self, phones, mask):
            x = self.emb(phones) * math.sqrt(cfg.d_model)
            x = x.transpose(1, 2)
            x = self.encoder(x, mask)
            stats = self.proj(x) * mask
            return x, stats

    class DDSConv(nn.Module):
        def __init__(self, ch, kernel, n_layers):
            super().__init__()
            self.kernel = kernel
            self.convs_sep = nn.ModuleList()
            self.convs_1x1 = nn.ModuleList()
            self.norms_1 = nn.ModuleList()
            self.norms_2 = nn.ModuleList()
            for i in range(n_layers):
                dil = kernel ** i
                pad = (kernel * dil - dil) // 2
                self.convs_sep.append(
                    nn.Conv1d(ch, ch, kernel, groups=ch, dilation=dil, padding=pad))
                self.convs_1x1.append(nn.Conv1d(ch, ch, 1))
                self.norms_1.append(LayerNorm(ch))
                self.norms_2.append(LayerNorm(ch))

        def forward(self, x, mask, g=None):
            if g is not None:
                x = x + g
            for i in range(len(self.convs_sep)):
                y = self.convs_sep[i](x * mask)
                y = self.norms_1[i](y)
                y = F.gelu(y)
                y = self.convs_1x1[i](y)
                y = self.norms_2[i](y)
                y = F.gelu(y)
                x = x + y
            return x * mask

    # rational-quadratic spline (inverse, linear tails) — public transform
    def rqs_inverse(inputs, uw, uh, ud, tail_bound):
        bins = uw.size(-1)
        inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
        const = math.log(math.exp(1.0 - 1e-3) - 1.0)
        ud = F.pad(ud, (1, 1), value=const)
        widths = torch.softmax(uw, dim=-1)
        widths = 1e-3 + (1 - 1e-3 * bins) * widths
        cumw = torch.cumsum(widths, -1)
        cumw = F.pad(cumw, (1, 0))
        cumw = 2 * tail_bound * cumw - tail_bound
        cumw[..., 0] = -tail_bound
        cumw[..., -1] = tail_bound
        widths = cumw[..., 1:] - cumw[..., :-1]
        derivs = 1e-3 + F.softplus(ud)
        heights = torch.softmax(uh, dim=-1)
        heights = 1e-3 + (1 - 1e-3 * bins) * heights
        cumh = torch.cumsum(heights, -1)
        cumh = F.pad(cumh, (1, 0))
        cumh = 2 * tail_bound * cumh - tail_bound
        cumh[..., 0] = -tail_bound
        cumh[..., -1] = tail_bound
        heights = cumh[..., 1:] - cumh[..., :-1]
        safe = inputs.clamp(-tail_bound, tail_bound)
        idx = (safe[..., None] >= cumh[..., :-1]).sum(-1) - 1
        idx = idx.clamp(0, bins - 1)

        def take(arr):
            return arr.gather(-1, idx[..., None])[..., 0]

        in_cw, in_w = take(cumw[..., :-1]), take(widths)
        in_ch, in_h = take(cumh[..., :-1]), take(heights)
        in_d, in_d1 = take(derivs[..., :-1]), take(derivs[..., 1:])
        delta = in_h / in_w
        y_rel = safe - in_ch
        a = in_h * (delta - in_d) + y_rel * (in_d + in_d1 - 2 * delta)
        b_ = in_h * in_d - y_rel * (in_d + in_d1 - 2 * delta)
        c_ = -delta * y_rel
        disc = (b_ * b_ - 4 * a * c_).clamp_min(0)
        root = (2 * c_) / (-b_ - torch.sqrt(disc))
        out = root * in_w + in_cw
        return torch.where(inside, out, inputs)

    class ElementwiseAffine(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.m = nn.Parameter(torch.zeros(ch, 1))
            self.logs = nn.Parameter(torch.zeros(ch, 1))

        def reverse(self, x, mask):
            return (x - self.m) * torch.exp(-self.logs) * mask

    class ConvFlow(nn.Module):
        def __init__(self):
            super().__init__()
            f = cfg.dp_filter
            self.pre = nn.Conv1d(1, f, 1)
            self.convs = DDSConv(f, cfg.dp_kernel, 3)
            self.proj = nn.Conv1d(f, 3 * cfg.dp_bins - 1, 1)
            nn.init.zeros_(self.proj.weight)
            nn.init.zeros_(self.proj.bias)

        def reverse(self, x, mask, g):
            x0, x1 = x[:, :1], x[:, 1:]
            h = self.pre(x0)
            h = self.convs(h, mask, g=g)
            h = self.proj(h) * mask
            h = h.permute(0, 2, 1)  # [b, t, 3bins-1]
            bins = cfg.dp_bins
            denom = math.sqrt(cfg.dp_filter)
            uw = h[..., :bins] / denom
            uh = h[..., bins:2 * bins] / denom
            ud = h[..., 2 * bins:]
            x1v = rqs_inverse(x1[:, 0], uw, uh, ud, cfg.dp_tail_bound)
            return torch.cat([x0, x1v.unsqueeze(1) * mask], 1)

    class SDP(nn.Module):
        def __init__(self):
            super().__init__()
            f = cfg.dp_filter
            self.pre = nn.Conv1d(cfg.d_model, f, 1)
            self.convs = DDSConv(f, cfg.dp_kernel, 3)
            self.proj = nn.Conv1d(f, f, 1)
            self.flows = nn.ModuleList([ElementwiseAffine(2)])
            for _ in range(cfg.dp_flows):
                self.flows.append(ConvFlow())
                self.flows.append(nn.Identity())   # Flip (no params)
            if cfg.speaker_dim:
                self.cond = nn.Conv1d(cfg.speaker_dim, f, 1)

        def reverse(self, x, mask, g, noise):
            x = self.pre(x)
            if g is not None:
                x = x + self.cond(g)
            x = self.convs(x, mask)
            x = self.proj(x) * mask
            z = noise * mask
            # published inference order: Flip, CF_{n-1}, …, Flip, CF_1,
            # Flip (CF_0 dropped), EA
            for j in range(cfg.dp_flows - 1, 0, -1):
                z = torch.flip(z, [1])
                z = self.flows[1 + 2 * j].reverse(z, mask, x)
            z = torch.flip(z, [1])
            z = self.flows[0].reverse(z, mask)
            return z[:, 0]

    class WN(nn.Module):
        def __init__(self, hidden, kernel, n_layers, gin):
            super().__init__()
            self.hidden, self.n_layers = hidden, n_layers
            self.in_layers = nn.ModuleList()
            self.res_skip_layers = nn.ModuleList()
            for i in range(n_layers):
                self.in_layers.append(nn.utils.weight_norm(
                    nn.Conv1d(hidden, 2 * hidden, kernel, padding=kernel // 2)))
                out_ch = 2 * hidden if i < n_layers - 1 else hidden
                self.res_skip_layers.append(nn.utils.weight_norm(
                    nn.Conv1d(hidden, out_ch, 1)))
            if gin:
                self.cond_layer = nn.utils.weight_norm(
                    nn.Conv1d(gin, 2 * hidden * n_layers, 1))

        def forward(self, x, mask, g=None):
            out = torch.zeros_like(x)
            h = self.hidden
            if g is not None:
                g = self.cond_layer(g)
            for i in range(self.n_layers):
                x_in = self.in_layers[i](x)
                if g is not None:
                    x_in = x_in + g[:, 2 * h * i: 2 * h * (i + 1)]
                acts = torch.tanh(x_in[:, :h]) * torch.sigmoid(x_in[:, h:])
                rs = self.res_skip_layers[i](acts)
                if i < self.n_layers - 1:
                    x = (x + rs[:, :h]) * mask
                    out = out + rs[:, h:]
                else:
                    out = out + rs
            return out * mask

    class CouplingLayer(nn.Module):
        def __init__(self):
            super().__init__()
            half = cfg.latent_dim // 2
            self.pre = nn.Conv1d(half, cfg.flow_hidden, 1)
            self.enc = WN(cfg.flow_hidden, cfg.flow_kernel, cfg.flow_wn_layers,
                          cfg.speaker_dim)
            self.post = nn.Conv1d(cfg.flow_hidden, half, 1)
            nn.init.zeros_(self.post.weight)
            nn.init.zeros_(self.post.bias)

        def reverse(self, x, mask, g):
            half = cfg.latent_dim // 2
            x0, x1 = x[:, :half], x[:, half:]
            h = self.pre(x0) * mask
            h = self.enc(h, mask, g)
            m = self.post(h) * mask
            return torch.cat([x0, (x1 - m) * mask], 1)

    class Flow(nn.Module):
        def __init__(self):
            super().__init__()
            self.flows = nn.ModuleList()
            for _ in range(cfg.n_flows):
                self.flows.append(CouplingLayer())
                self.flows.append(nn.Identity())   # Flip (no params)

        def reverse(self, z, mask, g):
            for idx in range(len(self.flows) - 2, -1, -2):
                z = torch.flip(z, [1])
                z = self.flows[idx].reverse(z, mask, g)
            return z

    from tests.test_convert_hifigan import _build_torch_generator

    class Synth(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_p = TextEncoder()
            self.dp = SDP()
            self.flow = Flow()
            vc = cfg.vocoder
            self.dec = _build_torch_generator(
                vc.n_mels, vc.base_channels, vc.upsample_rates,
                vc.upsample_kernels, vc.resblock_kernels, vc.resblock_dilations,
            )
            if cfg.speaker_dim:
                self.dec.cond = nn.Conv1d(cfg.speaker_dim, vc.base_channels, 1)
                self.emb_g = nn.Embedding(cfg.n_speakers, cfg.speaker_dim)
                nn.init.normal_(self.emb_g.weight, 0.0, 0.02)

    import torch

    torch.manual_seed(seed)
    return Synth().eval()


# ── the parity test ─────────────────────────────────────────────────────


def _tiny_cfg():
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.vits.model import VITSConfig

    return VITSConfig(
        n_phones=40, d_model=32, n_layers=2, n_heads=2, d_ff=64, latent_dim=16,
        n_flows=2, flow_hidden=16, flow_wn_layers=2, dp_filter=16, dp_flows=2,
        n_speakers=3, speaker_dim=8, vocoder_channels=32, dtype=jnp.float32,
    )


def test_vits_conversion_full_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.vocoder import apply_vocoder
    from vocalie_tts_tpu.models.convert.vits import convert_vits_checkpoint
    from vocalie_tts_tpu.models.vits import model as M

    cfg = _tiny_cfg()
    synth = _build_torch_vits(cfg, seed=3)
    state = {k: v.detach().numpy() for k, v in synth.state_dict().items()}
    params = convert_vits_checkpoint(state, cfg)

    rng = np.random.RandomState(0)
    b, t = 2, 12
    phones = rng.randint(1, cfg.n_phones, (b, t)).astype(np.int64)
    mask_t = torch.ones(b, 1, t)
    mask_j = jnp.ones((b, t))
    sid = np.array([0, 2])

    with torch.no_grad():
        x_t, stats_t = synth.enc_p(torch.tensor(phones), mask_t)
    x_j = M._encoder(params, cfg, jnp.asarray(phones, jnp.int32), mask_j)
    stats_j = M.conv1d(params["proj"], x_j)
    np.testing.assert_allclose(
        np.asarray(x_j).transpose(0, 2, 1), x_t.numpy(), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(stats_j).transpose(0, 2, 1), stats_t.numpy(), atol=2e-4, rtol=2e-4
    )

    # SDP with injected noise
    g_t = synth.emb_g(torch.tensor(sid)).unsqueeze(-1)  # [b, gin, 1]
    noise = rng.randn(b, 2, t).astype(np.float32) * 0.8
    with torch.no_grad():
        logw_t = synth.dp.reverse(x_t, mask_t, g_t, torch.tensor(noise))
    g_j = M._speaker_vec(params, cfg, jnp.asarray(sid, jnp.int32), t)
    logw_j = M.duration_log_w(
        params, cfg, x_j, mask_j, g_j, jax.random.PRNGKey(0), 0.8,
        noise=jnp.asarray(noise.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(logw_j), logw_t.numpy(), atol=3e-4, rtol=3e-4)

    # flow inverse + generator with injected prior noise, same durations
    durations = np.clip(np.ceil(np.exp(logw_t.numpy())), 1, 10).astype(np.int64)
    total = int(durations.sum(1).max())
    m_p_t, logs_p_t = stats_t.split(cfg.latent_dim, dim=1)
    # expand to frames (replica: repeat_interleave per row, pad to total)
    eps = rng.randn(b, cfg.latent_dim, total).astype(np.float32)
    z_p_t = torch.zeros(b, cfg.latent_dim, total)
    y_mask_t = torch.zeros(b, 1, total)
    for i in range(b):
        mp = m_p_t[i].repeat_interleave(torch.tensor(durations[i]), dim=1)
        lp = logs_p_t[i].repeat_interleave(torch.tensor(durations[i]), dim=1)
        n = mp.size(1)
        z_p_t[i, :, :n] = mp + torch.tensor(eps[i, :, :n]) * torch.exp(
            torch.clamp(lp, -6.0, 2.0)) * 0.667
        y_mask_t[i, 0, :n] = 1.0
    with torch.no_grad():
        z_t = synth.flow.reverse(z_p_t * y_mask_t, y_mask_t, g_t)
        xg = synth.dec.conv_pre(z_t * y_mask_t) + synth.dec.cond(g_t)
        # replica generator body after the stem
        nk = len(cfg.vocoder.resblock_kernels)
        h = xg
        for i, up in enumerate(synth.dec.ups):
            h = up(torch.nn.functional.leaky_relu(h, 0.1))
            acc = None
            for j in range(nk):
                y = synth.dec.resblocks[i * nk + j](h)
                acc = y if acc is None else acc + y
            h = acc / nk
        audio_t = torch.tanh(
            synth.dec.conv_post(torch.nn.functional.leaky_relu(h))
        )[:, 0]

    # JAX side with the same durations + eps
    stats_frames, frame_mask = M._length_regulate(
        jnp.asarray(np.concatenate(
            [m_p_t.numpy(), logs_p_t.numpy()], axis=1).transpose(0, 2, 1)),
        jnp.asarray(durations.astype(np.int32)), total,
    )
    m_p_j = stats_frames[..., : cfg.latent_dim]
    logs_p_j = jnp.clip(stats_frames[..., cfg.latent_dim:], -6.0, 2.0)
    z_p_j = m_p_j + jnp.asarray(eps.transpose(0, 2, 1)) * jnp.exp(logs_p_j) * 0.667
    z_p_j = z_p_j * frame_mask[..., None]
    g_frames = M._speaker_vec(params, cfg, jnp.asarray(sid, jnp.int32), total)
    z_j = M._flow_inverse(params, cfg, z_p_j, frame_mask, g_frames)
    cond = M.conv1d(params["voc_cond"], g_frames[:, :1, :])[:, 0, :]
    audio_j = apply_vocoder(params["vocoder"], cfg.vocoder,
                            z_j * frame_mask[..., None], cond=cond)

    np.testing.assert_allclose(
        np.asarray(z_j).transpose(0, 2, 1), z_t.numpy(), atol=3e-4, rtol=3e-4
    )
    np.testing.assert_allclose(np.asarray(audio_j), audio_t.numpy(), atol=2e-3)


def test_vits_conversion_fails_loud():
    from vocalie_tts_tpu.models.convert.vits import convert_vits_checkpoint

    cfg = _tiny_cfg()
    with pytest.raises(KeyError):
        convert_vits_checkpoint({}, cfg)
    bad = {"enc_p.emb.weight": np.zeros((7, 7), np.float32)}
    with pytest.raises(ValueError):
        convert_vits_checkpoint(bad, cfg)


def test_import_vits_into_piper_runtime(tmp_path, monkeypatch):
    """End-to-end: torch SynthesizerTrn checkpoint (.pt, weight-normed)
    → import_vits_checkpoint → VITSRuntime loads it and synthesizes."""
    import jax.numpy as jnp
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_vits_checkpoint,
    )
    from vocalie_tts_tpu.models.vits.runtime import SCALES, VITSRuntime

    cfg = SCALES["tiny"]
    synth = _build_torch_vits(cfg, seed=9)
    ckpt = tmp_path / "voice.pt"
    torch.save(synth.state_dict(), ckpt)

    report = import_vits_checkpoint(checkpoint=ckpt, assets_dir=tmp_path)
    assert int(report["vits_params"]) > 0

    rt = VITSRuntime.create(tmp_path)
    want = synth.state_dict()["enc_p.emb.weight"].numpy()
    got = np.asarray(rt.params["emb"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)

    audio, sr, meta = rt.synthesize("Bonjour depuis un vrai checkpoint.")
    assert sr == cfg.sample_rate and len(audio) > 0
    assert np.isfinite(audio).all()
