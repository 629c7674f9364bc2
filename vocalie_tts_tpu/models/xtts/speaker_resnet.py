"""XTTS-v2 speaker d-vector encoder (SE-ResNet-34 + attentive stats).

The published HifiDecoder conditions its waveform generator on a
512-dim d-vector from an H/ASP-style speaker encoder: 16 kHz audio →
pre-emphasis 0.97 → 64-band power log-mel (hamming window, n_fft 512,
hop 160) → per-channel instance norm → SE-ResNet-34 (layers 3/4/6/3,
filters 32/64/128/256, stride-2 at stages 2–4) → attentive statistics
pooling → linear 512 → L2 normalize. Ref: SURVEY §2.4 XTTS re-support
mandate; this + ``convert_speaker_resnet`` closes the remaining piece
of the "latent-consuming HiFi-GAN decoder" delta in docs/PARITY.md
(the decoder's ``g`` comes from THIS network, so imported decoder
weights need it to see the d-vectors they were trained with).

TPU notes: channels-last NHWC convs (XLA tiles 3×3 convs onto the MXU
directly), BatchNorm folded to a fused scale/shift at conversion time
(inference graph — running stats never change), one jit per reference
clip, off the decode hot path. Parity vs an independent torch replica
in ``tests/test_convert_xtts_speaker.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SpeakerResNetConfig:
    n_mels: int = 64
    proj_dim: int = 512
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    filters: Tuple[int, ...] = (32, 64, 128, 256)
    se_reduction: int = 8
    attn_hidden: int = 128
    sr: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop: int = 160
    preemphasis: float = 0.97
    dtype: Any = jnp.float32

    @property
    def outmap(self) -> int:
        return self.n_mels // 8          # three stride-2 stages

    @property
    def feat_dim(self) -> int:
        return self.filters[-1] * self.outmap


# ── param init ──────────────────────────────────────────────────────────


def _conv2d_init(key, kh, kw, c_in, c_out, dtype):
    scale = 1.0 / math.sqrt(kh * kw * c_in)
    w = jax.random.uniform(key, (kh, kw, c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype)}


def _bn_init(c, dtype):
    # BatchNorm folded for inference: y = x·scale + shift
    return {"scale": jnp.ones((c,), dtype), "shift": jnp.zeros((c,), dtype)}


def _linear_init(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (d_out,), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype), "b": b.astype(dtype)}


def _block_init(key, c_in, c_out, stride, cfg) -> Params:
    keys = jax.random.split(key, 5)
    p: Params = {
        "conv1": _conv2d_init(keys[0], 3, 3, c_in, c_out, cfg.dtype),
        "bn1": _bn_init(c_out, cfg.dtype),
        "conv2": _conv2d_init(keys[1], 3, 3, c_out, c_out, cfg.dtype),
        "bn2": _bn_init(c_out, cfg.dtype),
        "se_fc1": _linear_init(keys[2], c_out, c_out // cfg.se_reduction, cfg.dtype),
        "se_fc2": _linear_init(keys[3], c_out // cfg.se_reduction, c_out, cfg.dtype),
    }
    if stride != 1 or c_in != c_out:
        p["down_conv"] = _conv2d_init(keys[4], 1, 1, c_in, c_out, cfg.dtype)
        p["down_bn"] = _bn_init(c_out, cfg.dtype)
    return p


def init_speaker_resnet(key: jax.Array, cfg: SpeakerResNetConfig) -> Params:
    keys = jax.random.split(key, 8)
    stages: List[List[Params]] = []
    c_in = cfg.filters[0]
    for s, (n_blocks, c_out) in enumerate(zip(cfg.layers, cfg.filters)):
        stride = 1 if s == 0 else 2
        blocks = []
        for b in range(n_blocks):
            blocks.append(_block_init(
                jax.random.fold_in(keys[2 + s], b),
                c_in if b == 0 else c_out, c_out,
                stride if b == 0 else 1, cfg,
            ))
        stages.append(blocks)
        c_in = c_out
    conv1 = _conv2d_init(keys[0], 3, 3, 1, cfg.filters[0], cfg.dtype)
    conv1["b"] = jnp.zeros((cfg.filters[0],), cfg.dtype)
    return {
        "conv1": conv1,
        "bn1": _bn_init(cfg.filters[0], cfg.dtype),
        "stages": stages,
        "attn_conv1": _linear_init(keys[5], cfg.feat_dim, cfg.attn_hidden, cfg.dtype),
        "attn_bn": _bn_init(cfg.attn_hidden, cfg.dtype),
        "attn_conv2": _linear_init(keys[6], cfg.attn_hidden, cfg.feat_dim, cfg.dtype),
        "fc": _linear_init(keys[7], cfg.feat_dim * 2, cfg.proj_dim, cfg.dtype),
    }


# ── front-end ───────────────────────────────────────────────────────────


def _hamming_periodic(n: int) -> np.ndarray:
    return (0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def speaker_log_mel(audio: jax.Array, cfg: SpeakerResNetConfig) -> jax.Array:
    """[b, T] 16 kHz → [b, frames, n_mels] instance-normed log power mel."""
    from vocalie_tts_tpu.models.common.audio import frame_signal, _mel_filterbank_np

    x = audio.astype(jnp.float32)
    # pre-emphasis with reflect-padded first sample (torch conv1d replica)
    xpad = jnp.concatenate([x[:, 1:2], x], axis=1)
    x = xpad[:, 1:] - cfg.preemphasis * xpad[:, :-1]
    frames = frame_signal(x, cfg.win_length, cfg.hop, center=True)
    frames = frames * jnp.asarray(_hamming_periodic(cfg.win_length))
    spec = jnp.abs(jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)) ** 2
    # torchaudio default filterbank: HTK break points, NO slaney
    # area-normalization (norm=None)
    fb = jnp.asarray(
        _mel_filterbank_np(cfg.sr, cfg.n_fft, cfg.n_mels, 0.0, cfg.sr / 2, normalize=False)
    )
    mel = jnp.einsum("bfk,km->bfm", spec, fb)
    mel = jnp.log(mel + 1e-6)
    # InstanceNorm1d(n_mels): per-sample, per-band stats across time
    mean = jnp.mean(mel, axis=1, keepdims=True)
    var = jnp.var(mel, axis=1, keepdims=True)
    return (mel - mean) * jax.lax.rsqrt(var + 1e-5)


# ── ResNet body ─────────────────────────────────────────────────────────

_DN2 = ("NHWC", "HWIO", "NHWC")


def _conv2d(p: Params, x: jax.Array, stride: int = 1, kernel: int = 3) -> jax.Array:
    pad = (kernel - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)], dimension_numbers=_DN2,
    )
    if "b" in p:   # only the stem conv carries a bias in this network
        out = out + p["b"].astype(x.dtype)
    return out


def _bn(p: Params, x: jax.Array) -> jax.Array:
    return x * p["scale"].astype(x.dtype) + p["shift"].astype(x.dtype)


def _se(block: Params, x: jax.Array) -> jax.Array:
    y = jnp.mean(x, axis=(1, 2))                                  # [b, c]
    y = jax.nn.relu(jnp.dot(y, block["se_fc1"]["w"]) + block["se_fc1"]["b"])
    y = jax.nn.sigmoid(jnp.dot(y, block["se_fc2"]["w"]) + block["se_fc2"]["b"])
    return x * y[:, None, None, :]


def _se_block(block: Params, x: jax.Array, stride: int) -> jax.Array:
    # voxceleb_trainer SEBasicBlock order: conv→relu→bn, conv→bn, SE
    out = _bn(block["bn1"], jax.nn.relu(_conv2d(block["conv1"], x, stride)))
    out = _bn(block["bn2"], _conv2d(block["conv2"], out))
    out = _se(block, out)
    res = x
    if "down_conv" in block:
        res = _bn(block["down_bn"], _conv2d(block["down_conv"], x, stride, kernel=1))
    return jax.nn.relu(out + res)


def apply_speaker_resnet(
    params: Params, cfg: SpeakerResNetConfig, audio: jax.Array  # [b, T] 16 kHz
) -> jax.Array:
    """→ [b, proj_dim] L2-normalized speaker d-vector."""
    mel = speaker_log_mel(audio, cfg)                 # [b, T', n_mels]
    x = mel.transpose(0, 2, 1)[..., None].astype(cfg.dtype)  # [b, F, T', 1]
    x = _bn(params["bn1"], jax.nn.relu(_conv2d(params["conv1"], x)))
    for s, blocks in enumerate(params["stages"]):
        for b, block in enumerate(blocks):
            x = _se_block(block, x, stride=(2 if (s > 0 and b == 0) else 1))
    # torch flattens (C, H) with C outer: [b, C·H, W]
    bsz = x.shape[0]
    feat = x.transpose(0, 2, 3, 1).reshape(bsz, x.shape[2], -1)   # [b, W, C·H]
    h = jax.nn.relu(jnp.dot(feat, params["attn_conv1"]["w"]) + params["attn_conv1"]["b"])
    h = _bn(params["attn_bn"], h)
    logits = jnp.dot(h, params["attn_conv2"]["w"]) + params["attn_conv2"]["b"]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(feat.dtype)
    mu = jnp.sum(feat * w, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(feat * feat * w, axis=1) - mu * mu, 1e-5))
    stats = jnp.concatenate([mu, sg], axis=-1)
    emb = jnp.dot(stats, params["fc"]["w"]) + params["fc"]["b"]
    return emb * jax.lax.rsqrt(jnp.maximum(jnp.sum(emb * emb, -1, keepdims=True), 1e-24))


__all__ = [
    "SpeakerResNetConfig",
    "init_speaker_resnet",
    "apply_speaker_resnet",
    "speaker_log_mel",
]
