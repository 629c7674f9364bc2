"""S3 speech-tokenizer conversion parity: an independent torch replica
of the whisper-style encoder + FSQ quantizer (written here from the
published architecture description) must match
models/common/s3_tokenizer.py after state-dict conversion (ref:
tts_backends/cosyvoice_runner.py:87-125 zero-shot prompt tokens)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.unit

N_MELS, D, HEADS, LAYERS = 12, 64, 1, 2
FSQ_DIMS, LEVELS, POOL = 4, 3, 2


def _build_torch_tokenizer(seed=0):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class MHA(nn.Module):
        def __init__(self):
            super().__init__()
            self.query = nn.Linear(D, D)
            self.key = nn.Linear(D, D, bias=False)
            self.value = nn.Linear(D, D)
            self.out = nn.Linear(D, D)

        def forward(self, x):
            b, t, _ = x.shape
            dh = D // HEADS
            scale = dh ** -0.25
            q = (self.query(x) * scale).view(b, t, HEADS, dh).transpose(1, 2)
            k = (self.key(x) * scale).view(b, t, HEADS, dh).transpose(1, 2)
            v = self.value(x).view(b, t, HEADS, dh).transpose(1, 2)
            w = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
            o = (w @ v).transpose(1, 2).reshape(b, t, D)
            return self.out(o)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = MHA()
            self.attn_ln = nn.LayerNorm(D)
            self.mlp = nn.Sequential(nn.Linear(D, 4 * D), nn.GELU(), nn.Linear(4 * D, D))
            self.mlp_ln = nn.LayerNorm(D)

        def forward(self, x):
            x = x + self.attn(self.attn_ln(x))
            return x + self.mlp(self.mlp_ln(x))

    def sinusoids(length, channels):
        log_timescale = math.log(10000) / (channels // 2 - 1)
        inv = torch.exp(-log_timescale * torch.arange(channels // 2))
        ang = torch.arange(length)[:, None].float() * inv[None, :]
        return torch.cat([ang.sin(), ang.cos()], dim=1)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv1d(N_MELS, D, 3, padding=1)
            self.conv2 = nn.Conv1d(D, D, 3, stride=2, padding=1)
            self.register_buffer("positional_embedding", sinusoids(512, D))
            self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
            self.ln_post = nn.LayerNorm(D)

        def forward(self, mel):  # [b, n_mels, t]
            x = F.gelu(self.conv1(mel))
            x = F.gelu(self.conv2(x)).permute(0, 2, 1)
            x = x + self.positional_embedding[: x.shape[1]]
            for blk in self.blocks:
                x = blk(x)
            return self.ln_post(x)

    class Quantizer(nn.Module):
        def __init__(self):
            super().__init__()
            self.project_down = nn.Linear(D, FSQ_DIMS)

        def forward(self, x):  # [b, t, d] → ids [b, t]
            half = (LEVELS - 1) / 2.0
            h = torch.tanh(self.project_down(x)) * 0.999 * half
            digits = torch.round(h) + half
            base = LEVELS ** torch.arange(FSQ_DIMS)
            return (digits.long() * base).sum(-1)

    class S3(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.quantizer = Quantizer()

        def forward(self, mel):
            x = self.encoder(mel)
            t = (x.shape[1] // POOL) * POOL
            x = x[:, :t].reshape(x.shape[0], t // POOL, POOL, -1).mean(2)
            return self.quantizer(x)

    return S3().eval()


def test_s3_tokenizer_parity_vs_torch_replica():
    import torch

    from vocalie_tts_tpu.models.common.s3_tokenizer import (
        encode_features,
        fsq_quantize,
    )
    from vocalie_tts_tpu.models.convert.s3_tokenizer import (
        convert_s3_tokenizer,
        infer_s3_tokenizer_config,
    )

    m = _build_torch_tokenizer()
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    cfg = infer_s3_tokenizer_config(state, fsq_levels=LEVELS, pool=POOL)
    assert cfg.d_model == D and cfg.n_layers == LAYERS
    assert cfg.n_mels == N_MELS and cfg.fsq_dims == FSQ_DIMS
    assert cfg.vocab_size == LEVELS ** FSQ_DIMS
    # tiny D breaks the d/64 head heuristic — pin the replica's heads
    cfg = __import__("dataclasses").replace(cfg, n_heads=HEADS)

    params = convert_s3_tokenizer(state, cfg)

    rng = np.random.default_rng(5)
    mel = rng.normal(size=(2, 48, N_MELS)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(mel).permute(0, 2, 1)).numpy()

    import jax.numpy as jnp

    z = encode_features(params, cfg, jnp.asarray(mel))
    got = np.asarray(fsq_quantize(z, cfg))
    assert got.shape == want.shape
    # FSQ rounding at bin edges can flip a digit at f32 tolerance —
    # demand near-total agreement, not bit equality
    agree = (got == want).mean()
    assert agree > 0.98, f"token agreement {agree:.3f}"
    assert got.min() >= 0 and got.max() < cfg.vocab_size


def test_whisper_log_mel_matches_torch_stft():
    import torch

    from vocalie_tts_tpu.models.common.audio import _mel_filterbank_np
    from vocalie_tts_tpu.models.common.s3_tokenizer import (
        S3TokenizerConfig,
        whisper_log_mel,
    )

    cfg = S3TokenizerConfig(n_mels=N_MELS, d_model=D, n_heads=HEADS, n_layers=LAYERS)
    rng = np.random.default_rng(6)
    audio = (rng.normal(size=(1, 16000)) * 0.1).astype(np.float32)

    window = torch.hann_window(cfg.n_fft, periodic=True)
    spec = torch.stft(torch.from_numpy(audio), cfg.n_fft, cfg.hop, cfg.n_fft,
                      window=window, center=True, pad_mode="reflect",
                      return_complex=True).abs() ** 2
    spec = spec[..., :-1]                         # whisper drops the last frame
    fb = torch.from_numpy(
        _mel_filterbank_np(cfg.sr, cfg.n_fft, cfg.n_mels, 0.0, cfg.sr / 2,
                           scale="slaney"))
    mel = torch.einsum("bkf,km->bmf", spec, fb)
    log_spec = torch.log10(torch.clamp(mel, min=1e-10))
    log_spec = torch.maximum(log_spec, log_spec.amax(dim=(1, 2), keepdim=True) - 8.0)
    want = ((log_spec + 4.0) / 4.0).numpy()

    import jax.numpy as jnp

    got = np.transpose(np.asarray(whisper_log_mel(jnp.asarray(audio), cfg)), (0, 2, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
