"""XTTS conditioning conversion parity: an independent torch replica of
the published conditioning path (tortoise-style ConditioningEncoder +
lucidrains-style PerceiverResampler, written here from the published
architecture description) must match models/xtts/conditioning.py after
state-dict conversion (ref: SURVEY §2.4 XTTS re-support mandate)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit

SPEC, D, BLOCKS, HEADS, GROUPS = 12, 32, 2, 4, 8
P_DIM, P_DEPTH, P_LATENTS, P_DH, P_HEADS, P_MULT = 32, 2, 8, 8, 4, 4


def _build_torch_conditioning(seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class AttentionBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = nn.GroupNorm(GROUPS, D)
            self.qkv = nn.Conv1d(D, 3 * D, 1)
            self.proj_out = nn.Conv1d(D, D, 1)

        def forward(self, x):  # [b, c, t]
            b, c, t = x.shape
            qkv = self.qkv(self.norm(x))
            ch = c // HEADS
            q, k, v = qkv.reshape(b * HEADS, ch * 3, t).split(ch, dim=1)
            scale = 1.0 / math.sqrt(math.sqrt(ch))
            w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
            w = torch.softmax(w, dim=-1)
            a = torch.einsum("bts,bcs->bct", w, v).reshape(b, -1, t)
            return x + self.proj_out(a)

    class ConditioningEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.init = nn.Conv1d(SPEC, D, 1)
            self.attn = nn.Sequential(*[AttentionBlock() for _ in range(BLOCKS)])

        def forward(self, mel):  # [b, spec, t] → [b, d, t]
            return self.attn(self.init(mel))

    ff_inner = int(P_DIM * P_MULT * 2 / 3)
    inner = P_DH * P_HEADS

    class GEGLU(nn.Module):
        def forward(self, x):
            x, gate = x.chunk(2, dim=-1)
            return F.gelu(gate) * x

    class RMSNorm(nn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = nn.Parameter(torch.ones(P_DIM))

        def forward(self, x):
            return F.normalize(x, dim=-1) * math.sqrt(P_DIM) * self.gamma

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = nn.Linear(P_DIM, inner, bias=False)
            self.to_kv = nn.Linear(P_DIM, 2 * inner, bias=False)
            self.to_out = nn.Linear(inner, P_DIM, bias=False)

        def forward(self, x, context):
            # cross_attn_include_queries: latents prepend the context
            ctx = torch.cat((x, context), dim=-2)
            q = self.to_q(x)
            k, v = self.to_kv(ctx).chunk(2, dim=-1)
            b, n, _ = q.shape
            q = q.view(b, n, P_HEADS, P_DH).transpose(1, 2)
            k = k.view(b, -1, P_HEADS, P_DH).transpose(1, 2)
            v = v.view(b, -1, P_HEADS, P_DH).transpose(1, 2)
            attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(P_DH), dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n, inner)
            return self.to_out(out)

    class PerceiverResampler(nn.Module):
        def __init__(self):
            super().__init__()
            self.latents = nn.Parameter(torch.randn(P_LATENTS, P_DIM) * 0.02)
            self.layers = nn.ModuleList([
                nn.ModuleList([
                    Attention(),
                    nn.Sequential(nn.Linear(P_DIM, 2 * ff_inner), GEGLU(),
                                  nn.Linear(ff_inner, P_DIM)),
                ])
                for _ in range(P_DEPTH)
            ])
            self.norm = RMSNorm()

        def forward(self, x):  # [b, t, dim] → [b, n_latents, dim]
            latents = self.latents.unsqueeze(0).expand(x.shape[0], -1, -1)
            for attn, ff in self.layers:
                latents = attn(latents, x) + latents
                latents = ff(latents) + latents
            return self.norm(latents)

    class Wrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.conditioning_encoder = ConditioningEncoder()
            self.conditioning_perceiver = PerceiverResampler()

        def forward(self, mel):  # [b, spec, t]
            conds = self.conditioning_encoder(mel)
            return self.conditioning_perceiver(conds.permute(0, 2, 1)).transpose(1, 2)

    m = Wrapper().eval()
    # perturb constant-init tensors (norm gains/biases) so parity is
    # non-trivial, keeping their mean so activations stay well-scaled
    with torch.no_grad():
        for p in m.parameters():
            if p.std() < 1e-6 and p.numel() > 1:
                p.add_(torch.randn_like(p) * 0.05)
    return m


def _configs():
    from vocalie_tts_tpu.models.xtts.conditioning import (
        ConditioningEncoderConfig,
        PerceiverConfig,
        XTTSConditioningConfig,
    )

    return XTTSConditioningConfig(
        encoder=ConditioningEncoderConfig(
            spec_dim=SPEC, d_model=D, n_blocks=BLOCKS, n_heads=HEADS, groups=GROUPS,
        ),
        perceiver=PerceiverConfig(
            dim=P_DIM, depth=P_DEPTH, num_latents=P_LATENTS,
            dim_head=P_DH, heads=P_HEADS, ff_mult=P_MULT,
        ),
    )


def test_conditioning_parity_vs_torch_replica():
    import torch

    from vocalie_tts_tpu.models.convert.xtts_modules import (
        convert_xtts_conditioning,
        infer_conditioning_config,
    )
    from vocalie_tts_tpu.models.xtts.conditioning import (
        apply_conditioning_encoder,
        apply_perceiver,
    )

    m = _build_torch_conditioning()
    state = {f"gpt.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    cfg = _configs()

    inferred = infer_conditioning_config(
        state, n_heads=HEADS, perceiver_heads=P_HEADS, perceiver_dim_head=P_DH,
    )
    assert inferred.encoder.d_model == D and inferred.encoder.n_blocks == BLOCKS
    assert inferred.perceiver.num_latents == P_LATENTS
    assert inferred.perceiver.ff_mult == P_MULT

    params = convert_xtts_conditioning(state, cfg)

    rng = np.random.default_rng(1)
    mel = rng.normal(size=(2, 25, SPEC)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(mel).permute(0, 2, 1)).permute(0, 2, 1).numpy()

    import jax.numpy as jnp

    enc = apply_conditioning_encoder(params["encoder"], cfg.encoder, jnp.asarray(mel))
    got = np.asarray(apply_perceiver(params["perceiver"], cfg.perceiver, enc))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cloning_mel_matches_torch_stft_pipeline():
    """The cloning front-end (|STFT|² → slaney mel → log/clamp → norms)
    must match a torch.stft replica of wav_to_mel_cloning."""
    import torch

    from vocalie_tts_tpu.models.common.audio import _mel_filterbank_np
    from vocalie_tts_tpu.models.xtts.conditioning import (
        CLONING_HOP,
        CLONING_N_FFT,
        cloning_mel,
    )

    rng = np.random.default_rng(2)
    audio = (rng.normal(size=(1, 22050)) * 0.1).astype(np.float32)
    norms = (rng.uniform(0.5, 2.0, size=(80,))).astype(np.float32)

    window = torch.hann_window(CLONING_N_FFT, periodic=True)
    spec = torch.stft(
        torch.from_numpy(audio), CLONING_N_FFT, CLONING_HOP, CLONING_N_FFT,
        window=window, center=True, pad_mode="reflect", return_complex=True,
    ).abs() ** 2                               # [b, bins, frames]
    fb = torch.from_numpy(
        _mel_filterbank_np(22050, CLONING_N_FFT, 80, 0.0, 8000.0, scale="slaney")
    )
    mel = torch.einsum("bkf,km->bmf", spec, fb)
    want = (torch.log(torch.clamp(mel, min=1e-5)) /
            torch.from_numpy(norms)[None, :, None]).numpy()

    import jax.numpy as jnp

    got = np.asarray(cloning_mel(jnp.asarray(audio), jnp.asarray(norms)))
    got = np.transpose(got, (0, 2, 1))         # [b, mels, frames]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
