"""HiFT generator: NSF-HiFiGAN with an ISTFT head (CosyVoice/S3Gen).

The published mel→waveform network inside both CosyVoice bundles and
Chatterbox's S3Gen stage (ref: tts_backends/cosyvoice_runner.py:67-76,
tts_backends/chatterbox_impl.py:63-73):

1. a conv F0 predictor over the mel;
2. a harmonic NSF source: sine harmonics at k·f0 (cumulative-phase
   generation), merged by a tanh(linear) head, with voiced/unvoiced
   gating and noise;
3. the source is STFT'd (n_fft=16, hop=4) and fused into each HiFi-GAN
   upsample stage through per-stage downsample convs + resblocks;
4. the head emits log-magnitude + phase for a tiny ISTFT (hop 4), so
   the transposed convs only upsample 64× instead of 256×.

Param tree mirrors the torch module tree (see convert/hift.py). All
shapes static; the ISTFT is a DFT-basis matmul + overlap-add via an
lhs-dilated identity conv — tiny (n_fft=16) and fusion-friendly on TPU.
Noise/random-phase terms take an explicit rng; pass ``None`` for the
deterministic variant (used for conversion parity and seed control).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.models.common.convnets import (
    conv1d,
    conv1d_init,
    conv1d_transpose,
    leaky_relu,
)
from vocalie_tts_tpu.models.common.unet2d import dense, dense_init

Params = Dict[str, Any]

_DN = ("NHC", "HIO", "NHC")


@dataclasses.dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1           # sine amplitude
    nsf_sigma: float = 0.003         # voiced noise std
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 8)
    upsample_kernels: Tuple[int, ...] = (16, 16)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernels: Tuple[int, ...] = (7, 11)
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 2
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512
    f0_layers: int = 5
    #: compute dtype for the generator conv stack (conv_pre → upsample
    #: stages → conv_post). The f0 predictor, NSF harmonic source
    #: (phase cumsum), and the STFT/ISTFT head always run f32 —
    #: phase/overlap-add precision is audible. bf16 at serving scale.
    dtype: Any = jnp.float32

    @property
    def hop(self) -> int:
        out = self.istft_hop
        for r in self.upsample_rates:
            out *= r
        return out  # 256 in the published config

    @property
    def n_bins(self) -> int:
        return self.istft_n_fft // 2 + 1


# ── snake resblock (BigVGAN-style, as in the published HiFT) ───────────


def _snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation: x + sin²(αx)/α, learnable per-channel α."""
    a = alpha.astype(x.dtype)
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def _snake_resblock_init(key, channels: int, kernel: int, dilations) -> Params:
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [
            conv1d_init(keys[2 * i], kernel, channels, channels)
            for i in range(len(dilations))
        ],
        "convs2": [
            conv1d_init(keys[2 * i + 1], kernel, channels, channels)
            for i in range(len(dilations))
        ],
        "alphas1": [jnp.ones((channels,), jnp.float32) for _ in dilations],
        "alphas2": [jnp.ones((channels,), jnp.float32) for _ in dilations],
    }


def _snake_resblock(p: Params, x: jax.Array, dilations) -> jax.Array:
    for i, dil in enumerate(dilations):
        h = _snake(x, p["alphas1"][i])
        h = conv1d(p["convs1"][i], h, dilation=int(dil))
        h = _snake(h, p["alphas2"][i])
        h = conv1d(p["convs2"][i], h, dilation=1)
        x = x + h
    return x


# ── init ────────────────────────────────────────────────────────────────


def init_hift(key: jax.Array, cfg: HiFTConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    p: Params = {}

    # f0 predictor: stack of k=3 convs + ELU, linear classifier
    ch_in = cfg.in_channels
    condnet = []
    for _ in range(cfg.f0_layers):
        condnet.append(conv1d_init(next(keys), 3, ch_in, cfg.f0_cond_channels))
        ch_in = cfg.f0_cond_channels
    p["f0_predictor"] = {
        "condnet": condnet,
        "classifier": dense_init(next(keys), cfg.f0_cond_channels, 1),
    }
    p["m_source"] = {"l_linear": dense_init(next(keys), cfg.nb_harmonics + 1, 1)}

    p["conv_pre"] = conv1d_init(next(keys), 7, cfg.in_channels, cfg.base_channels)
    ups, source_downs, source_resblocks, resblocks = [], [], [], []
    ch = cfg.base_channels
    n_stft = cfg.istft_n_fft + 2
    for i, (rate, kern) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        ch_out = ch // 2
        ups.append(conv1d_init(next(keys), kern, ch, ch_out))
        # source fusion at this stage: downsample the 64×-rate source
        # spectrum to the stage rate (stride = prod of remaining rates)
        down = 1
        for r in cfg.upsample_rates[i + 1:]:
            down *= r
        k_down = 1 if down == 1 else down * 2
        source_downs.append(conv1d_init(next(keys), k_down, n_stft, ch_out))
        source_resblocks.append(
            _snake_resblock_init(
                next(keys), ch_out, cfg.source_resblock_kernels[i],
                cfg.source_resblock_dilations[i],
            )
        )
        stage = []
        for rk, dil in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            stage.append(_snake_resblock_init(next(keys), ch_out, rk, dil))
        resblocks.append(stage)
        ch = ch_out
    p["ups"] = ups
    p["source_downs"] = source_downs
    p["source_resblocks"] = source_resblocks
    p["resblocks"] = resblocks
    p["conv_post"] = conv1d_init(next(keys), 7, ch, n_stft)
    return p


# ── F0 → harmonic source ────────────────────────────────────────────────


def predict_f0(p: Params, cfg: HiFTConfig, mel: jax.Array) -> jax.Array:
    """mel [b, t, n_mels] → f0 [b, t] (Hz, non-negative)."""
    x = mel
    for layer in p["f0_predictor"]["condnet"]:
        x = jax.nn.elu(conv1d(layer, x))
    return jnp.abs(dense(p["f0_predictor"]["classifier"], x)[..., 0])


def harmonic_source(
    p: Params, cfg: HiFTConfig, f0: jax.Array, rng: Optional[jax.Array]
) -> jax.Array:
    """f0 [b, t_mel] → NSF source [b, t_mel*hop] (sines + uv-gated noise).

    Phase accumulates via cumsum of per-sample phase increments with the
    published integer-shift trick (keeps the f32 accumulator small so
    long utterances don't lose phase precision)."""
    f0_up = jnp.repeat(f0, cfg.hop, axis=1)  # nearest upsample to audio rate
    harmonics = jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)
    fn = f0_up[..., None] * harmonics  # [b, T, H+1]
    rad = jnp.mod(fn / cfg.sampling_rate, 1.0)
    if rng is not None:
        rng, k1 = jax.random.split(rng)
        rand_ini = jax.random.uniform(k1, (rad.shape[0], rad.shape[2]))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
    cum = jnp.mod(jnp.cumsum(rad, axis=1), 1.0)
    wrap = jnp.concatenate(
        [jnp.zeros_like(cum[:, :1]), (cum[:, 1:] - cum[:, :-1] < 0).astype(rad.dtype)],
        axis=1,
    )
    phase = jnp.cumsum(rad - wrap, axis=1)
    sines = jnp.sin(2.0 * math.pi * phase) * cfg.nsf_alpha

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = 0.0 if rng is None else noise_amp * jax.random.normal(rng, sines.shape)
    sine_waves = sines * uv + noise
    merged = jnp.tanh(dense(p["m_source"]["l_linear"], sine_waves))
    return merged[..., 0]  # [b, T]


# ── tiny STFT / ISTFT (n_fft = 16) ──────────────────────────────────────


def _hann(n: int) -> jnp.ndarray:
    # periodic Hann (torch.hann_window default)
    i = jnp.arange(n, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2.0 * math.pi * i / n)


def _stft(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[b, T] → [b, frames, n_fft+2] (real ‖ imag), center/reflect."""
    half = n_fft // 2
    x = jnp.concatenate([x[:, 1 : half + 1][:, ::-1], x, x[:, -half - 1 : -1][:, ::-1]], axis=1)
    win = _hann(n_fft)
    n = jnp.arange(n_fft, dtype=jnp.float32)
    k = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32)
    ang = 2.0 * math.pi * k[:, None] * n[None, :] / n_fft
    basis_re = (jnp.cos(ang) * win).T   # [n_fft, bins]
    basis_im = (-jnp.sin(ang) * win).T
    basis = jnp.concatenate([basis_re, basis_im], axis=1)[:, None, :]  # [n_fft, 1, 2*bins]
    return jax.lax.conv_general_dilated(
        x[..., None], basis, (hop,), [(0, 0)], dimension_numbers=_DN
    )


def _istft(spec_re: jax.Array, spec_im: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Onesided centered ISTFT. [b, frames, bins] ×2 → [b, (frames-1)*hop]."""
    bins = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.float32)
    k = jnp.arange(bins, dtype=jnp.float32)
    ang = 2.0 * math.pi * k[None, :] * n[:, None] / n_fft
    # hermitian expansion weights: DC and Nyquist once, others twice
    w = jnp.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    cos_b = jnp.cos(ang) * w   # [n_fft, bins]
    sin_b = jnp.sin(ang) * w
    frames = jnp.einsum("bfk,nk->bfn", spec_re, cos_b) - jnp.einsum(
        "bfk,nk->bfn", spec_im, sin_b
    )
    win = _hann(n_fft)
    frames = frames * win

    # overlap-add via lhs-dilated identity conv: out[t] = Σ_f frames[f, t - hop*f].
    # XLA convs are correlations, so the identity kernel is flipped along
    # its spatial axis to recover convolution (scatter) semantics.
    n_frames = frames.shape[1]
    t_full = (n_frames - 1) * hop + n_fft
    eye = jnp.flip(jnp.eye(n_fft, dtype=frames.dtype), 0)[:, :, None]
    ola = jax.lax.conv_general_dilated(
        frames, eye, (1,), [(n_fft - 1, n_fft - 1)], lhs_dilation=(hop,),
        dimension_numbers=_DN,
    )[..., 0]  # length exactly t_full

    wsq = jnp.tile(win[None, None, :] ** 2, (1, n_frames, 1))
    norm = jax.lax.conv_general_dilated(
        wsq, eye, (1,), [(n_fft - 1, n_fft - 1)], lhs_dilation=(hop,),
        dimension_numbers=_DN,
    )[..., 0]
    out = ola / jnp.maximum(norm, 1e-11)
    half = n_fft // 2
    return out[:, half : t_full - half]


# ── the generator ───────────────────────────────────────────────────────


def _conv_strided(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """torch Conv1d(k=2s, stride=s, padding=s//2) for the source downs."""
    k = p["w"].shape[0]
    if stride == 1:
        pad = [((k - 1) // 2, k // 2)]
    else:
        pad = [(stride // 2, stride // 2)]
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), pad, dimension_numbers=_DN
    )
    return out + p["b"].astype(x.dtype)


def apply_hift(
    p: Params,
    cfg: HiFTConfig,
    mel: jax.Array,                     # [b, t, n_mels]
    rng: Optional[jax.Array] = None,    # None → deterministic source
) -> jax.Array:
    """mel → waveform [b, t*hop], clamped to ±audio_limit."""
    f0 = predict_f0(p, cfg, mel.astype(jnp.float32))
    source = harmonic_source(p, cfg, f0, rng)  # [b, t*256]
    s_spec = _stft(source, cfg.istft_n_fft, cfg.istft_hop)  # [b, t*64+1, 18]
    # generator conv stack in cfg.dtype (bf16 at serving scale); the
    # source spectrum joins it at the fusion points
    s_spec = s_spec.astype(cfg.dtype)

    x = conv1d(p["conv_pre"], mel.astype(cfg.dtype))
    n_up = len(cfg.upsample_rates)
    for i, rate in enumerate(cfg.upsample_rates):
        x = leaky_relu(x, cfg.lrelu_slope)
        x = conv1d_transpose(p["ups"][i], x, stride=rate)
        if i == n_up - 1:
            # reflection pad (1, 0): aligns with the source frame count
            x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
        down = 1
        for r in cfg.upsample_rates[i + 1:]:
            down *= r
        si = _conv_strided(p["source_downs"][i], s_spec, down)
        si = _snake_resblock(
            p["source_resblocks"][i], si, cfg.source_resblock_dilations[i]
        )
        x = x + si
        acc = None
        for rb, dil in zip(p["resblocks"][i], cfg.resblock_dilations):
            y = _snake_resblock(rb, x, dil)
            acc = y if acc is None else acc + y
        x = acc / len(p["resblocks"][i])

    x = leaky_relu(x, 0.01)  # F.leaky_relu default slope at the head
    # ISTFT head in f32: exp(magnitude)/phase trig + overlap-add
    # normalization are precision-sensitive
    x = conv1d(p["conv_post"], x).astype(jnp.float32)
    bins = cfg.n_bins
    magnitude = jnp.exp(jnp.clip(x[..., :bins], max=math.log(1e2)))
    phase = jnp.sin(x[..., bins:])  # published head: sin-squashed phase
    real = magnitude * jnp.cos(phase)
    imag = magnitude * jnp.sin(phase)
    audio = _istft(real, imag, cfg.istft_n_fft, cfg.istft_hop)
    return jnp.clip(audio, -cfg.audio_limit, cfg.audio_limit)


__all__ = [
    "HiFTConfig",
    "init_hift",
    "apply_hift",
    "predict_f0",
    "harmonic_source",
]
