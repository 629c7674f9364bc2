"""XTTS-v2 checkpoint converters: conditioning, HiFi decoder, speaker.

Maps the published XTTS-v2 ``model.pth`` layouts onto the JAX modules
(ref: SURVEY §2.4 XTTS re-support mandate; BASELINE config #2):

- ``gpt.conditioning_encoder.*`` + ``gpt.conditioning_perceiver.*``
  → ``models/xtts/conditioning.py`` params (the 32 GPT cond latents);
- ``hifigan_decoder.waveform_decoder.*`` (latent-consuming HiFi-GAN
  with cond-in-each-up-layer) → ``models/xtts/hifi_decoder.py``;
- ``hifigan_decoder.speaker_encoder.*`` (SE-ResNet-34 H/ASP d-vector
  net, BatchNorms folded for inference) → ``models/xtts/speaker_resnet``;
- ``mel_stats.pth`` per-band mel norms → the conditioning front-end.

Every converter fails loud (KeyError names the first missing tensor,
ValueError the first shape mismatch). Parity vs independent torch
replicas: tests/test_convert_xtts_cond.py, _decoder, _speaker.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator
from vocalie_tts_tpu.models.xtts.conditioning import (
    ConditioningEncoderConfig,
    PerceiverConfig,
    XTTSConditioningConfig,
)
from vocalie_tts_tpu.models.xtts.hifi_decoder import HifiDecoderConfig
from vocalie_tts_tpu.models.xtts.speaker_resnet import SpeakerResNetConfig

Params = Dict[str, Any]


def _keys_under(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return dict(state)
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def _pointwise(sd: Dict[str, np.ndarray], key: str, want_in: int, want_out: int) -> Params:
    """torch Conv1d(k=1) or Linear → {"w": [in, out], "b": [out]}."""
    import jax.numpy as jnp

    w = sd[f"{key}.weight"]
    if w.ndim == 3:
        w = w[:, :, 0]
    if w.shape != (want_out, want_in):
        raise ValueError(f"{key}: shape {w.shape}, expected {(want_out, want_in)}")
    b = sd.get(f"{key}.bias", np.zeros((want_out,), np.float32))
    return {"w": jnp.asarray(np.ascontiguousarray(w.T), jnp.float32),
            "b": jnp.asarray(b, jnp.float32)}


def _nobias(sd: Dict[str, np.ndarray], key: str, want_in: int, want_out: int) -> Params:
    import jax.numpy as jnp

    w = sd[f"{key}.weight"]
    if w.shape != (want_out, want_in):
        raise ValueError(f"{key}: shape {w.shape}, expected {(want_out, want_in)}")
    return {"w": jnp.asarray(np.ascontiguousarray(w.T), jnp.float32)}


# ── conditioning (encoder + perceiver) ──────────────────────────────────


def infer_conditioning_config(
    state: Dict[str, np.ndarray], *, prefix: str = "gpt.",
    n_heads: int = 16, perceiver_heads: int = 8, perceiver_dim_head: int = 64,
) -> XTTSConditioningConfig:
    """Derive sizes from tensor shapes; head counts are not recoverable
    from shapes and default to the published XTTS-v2 values."""
    sd = _keys_under(state, prefix)
    init_w = sd["conditioning_encoder.init.weight"]          # [d, spec, 1]
    d, spec = init_w.shape[0], init_w.shape[1]
    n_blocks = 0
    while f"conditioning_encoder.attn.{n_blocks}.qkv.weight" in sd:
        n_blocks += 1
    latents = sd["conditioning_perceiver.latents"]           # [n, dim]
    depth = 0
    while f"conditioning_perceiver.layers.{depth}.0.to_q.weight" in sd:
        depth += 1
    ff_in = sd["conditioning_perceiver.layers.0.1.0.weight"]  # [2·ff_inner, dim]
    ff_mult = round((ff_in.shape[0] // 2) * 3 / 2 / latents.shape[1])
    return XTTSConditioningConfig(
        encoder=ConditioningEncoderConfig(
            spec_dim=spec, d_model=d, n_blocks=n_blocks, n_heads=n_heads,
        ),
        perceiver=PerceiverConfig(
            dim=latents.shape[1], depth=depth, num_latents=latents.shape[0],
            dim_head=perceiver_dim_head, heads=perceiver_heads, ff_mult=ff_mult,
        ),
    )


def convert_xtts_conditioning(
    state: Dict[str, np.ndarray],
    cfg: XTTSConditioningConfig,
    *,
    prefix: str = "gpt.",
    mel_norms: np.ndarray | None = None,
) -> Params:
    import jax.numpy as jnp

    sd = _keys_under(state, prefix)
    e, p = cfg.encoder, cfg.perceiver

    blocks = []
    for i in range(e.n_blocks):
        base = f"conditioning_encoder.attn.{i}"
        blocks.append({
            "norm_w": jnp.asarray(sd[f"{base}.norm.weight"], jnp.float32),
            "norm_b": jnp.asarray(sd[f"{base}.norm.bias"], jnp.float32),
            "qkv": _pointwise(sd, f"{base}.qkv", e.d_model, 3 * e.d_model),
            "proj": _pointwise(sd, f"{base}.proj_out", e.d_model, e.d_model),
        })
    encoder = {
        "init": _pointwise(sd, "conditioning_encoder.init", e.spec_dim, e.d_model),
        "blocks": blocks,
    }

    layers = []
    for i in range(p.depth):
        base = f"conditioning_perceiver.layers.{i}"
        layers.append({
            "to_q": _nobias(sd, f"{base}.0.to_q", p.dim, p.dim_inner),
            "to_kv": _nobias(sd, f"{base}.0.to_kv", p.dim, 2 * p.dim_inner),
            "to_out": _nobias(sd, f"{base}.0.to_out", p.dim_inner, p.dim),
            # FeedForward Sequential: [0]=Linear in, [1]=GEGLU, [2]=Linear out
            "ff_in": _pointwise(sd, f"{base}.1.0", p.dim, 2 * p.ff_inner),
            "ff_out": _pointwise(sd, f"{base}.1.2", p.ff_inner, p.dim),
        })
    perceiver = {
        "latents": jnp.asarray(sd["conditioning_perceiver.latents"], jnp.float32),
        "layers": layers,
        "norm_gamma": jnp.asarray(sd["conditioning_perceiver.norm.gamma"], jnp.float32),
    }

    norms = (np.asarray(mel_norms, np.float32) if mel_norms is not None
             else np.ones((e.spec_dim,), np.float32))
    if norms.shape != (e.spec_dim,):
        raise ValueError(f"mel_norms: shape {norms.shape}, expected {(e.spec_dim,)}")
    return {"encoder": encoder, "perceiver": perceiver,
            "mel_norms": jnp.asarray(norms)}


# ── latent HiFi-GAN decoder ─────────────────────────────────────────────


def infer_hifi_decoder_config(
    state: Dict[str, np.ndarray], *, prefix: str = "hifigan_decoder.",
) -> HifiDecoderConfig:
    sd = _keys_under(state, prefix)
    from vocalie_tts_tpu.models.convert.hifigan import infer_vocoder_config

    voc = infer_vocoder_config(sd, prefix="waveform_decoder.")
    cond_w = sd["waveform_decoder.cond_layer.weight"]        # [base, d_vec, 1]
    return HifiDecoderConfig(
        latent_dim=voc.n_mels,
        d_vector_dim=cond_w.shape[1],
        base_channels=voc.base_channels,
        upsample_rates=voc.upsample_rates,
        upsample_kernels=voc.upsample_kernels,
        resblock_kernels=voc.resblock_kernels,
    )


def convert_hifi_decoder(
    state: Dict[str, np.ndarray],
    cfg: HifiDecoderConfig,
    *,
    prefix: str = "hifigan_decoder.",
) -> Params:
    sd = _keys_under(state, prefix)
    vocoder = convert_hifigan_generator(sd, cfg.vocoder, prefix="waveform_decoder.")
    conds = []
    ch = cfg.base_channels
    for i in range(len(cfg.upsample_rates)):
        ch //= 2
        conds.append(_pointwise(sd, f"waveform_decoder.conds.{i}", cfg.d_vector_dim, ch))
    return {
        "vocoder": vocoder,
        "cond_layer": _pointwise(
            sd, "waveform_decoder.cond_layer", cfg.d_vector_dim, cfg.base_channels
        ),
        "conds": conds,
    }


# ── speaker encoder (SE-ResNet-34, BN folded) ───────────────────────────


def _fold_bn(sd: Dict[str, np.ndarray], key: str, eps: float = 1e-5) -> Params:
    import jax.numpy as jnp

    scale = sd[f"{key}.weight"] / np.sqrt(sd[f"{key}.running_var"] + eps)
    shift = sd[f"{key}.bias"] - sd[f"{key}.running_mean"] * scale
    return {"scale": jnp.asarray(scale, jnp.float32),
            "shift": jnp.asarray(shift, jnp.float32)}


def _conv2d_w(sd: Dict[str, np.ndarray], key: str) -> Params:
    """torch Conv2d [out, in, kh, kw] → {"w": [kh, kw, in, out]} (+bias)."""
    import jax.numpy as jnp

    w = sd[f"{key}.weight"]
    out = {"w": jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                            jnp.float32)}
    if f"{key}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{key}.bias"], jnp.float32)
    return out


def infer_speaker_resnet_config(
    state: Dict[str, np.ndarray], *, prefix: str = "hifigan_decoder.speaker_encoder.",
) -> SpeakerResNetConfig:
    sd = _keys_under(state, prefix)
    filters = []
    layers = []
    for s in range(1, 5):
        n = 0
        while f"layer{s}.{n}.conv1.weight" in sd:
            n += 1
        if n == 0:
            raise KeyError(f"layer{s}.0.conv1.weight")
        layers.append(n)
        filters.append(sd[f"layer{s}.0.conv1.weight"].shape[0])
    fc_w = sd["fc.weight"]                                    # [proj, feat·2]
    attn_w = sd["attention.0.weight"]                          # [hidden, feat, 1]
    feat = attn_w.shape[1]
    return SpeakerResNetConfig(
        n_mels=feat // filters[-1] * 8,
        proj_dim=fc_w.shape[0],
        layers=tuple(layers),
        filters=tuple(filters),
        attn_hidden=attn_w.shape[0],
    )


def convert_speaker_resnet(
    state: Dict[str, np.ndarray],
    cfg: SpeakerResNetConfig,
    *,
    prefix: str = "hifigan_decoder.speaker_encoder.",
) -> Params:
    sd = _keys_under(state, prefix)
    stages = []
    for s, (n_blocks, _c) in enumerate(zip(cfg.layers, cfg.filters)):
        blocks = []
        for b in range(n_blocks):
            base = f"layer{s + 1}.{b}"
            blk: Params = {
                "conv1": _conv2d_w(sd, f"{base}.conv1"),
                "bn1": _fold_bn(sd, f"{base}.bn1"),
                "conv2": _conv2d_w(sd, f"{base}.conv2"),
                "bn2": _fold_bn(sd, f"{base}.bn2"),
                "se_fc1": _pointwise(sd, f"{base}.se.fc.0",
                                     cfg.filters[s], cfg.filters[s] // cfg.se_reduction),
                "se_fc2": _pointwise(sd, f"{base}.se.fc.2",
                                     cfg.filters[s] // cfg.se_reduction, cfg.filters[s]),
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv2d_w(sd, f"{base}.downsample.0")
                blk["down_bn"] = _fold_bn(sd, f"{base}.downsample.1")
            blocks.append(blk)
        stages.append(blocks)
    return {
        "conv1": _conv2d_w(sd, "conv1"),
        "bn1": _fold_bn(sd, "bn1"),
        "stages": stages,
        # attention Sequential: [0]=Conv1d, [1]=ReLU, [2]=BatchNorm1d,
        # [3]=Conv1d, [4]=Softmax
        "attn_conv1": _pointwise(sd, "attention.0", cfg.feat_dim, cfg.attn_hidden),
        "attn_bn": _fold_bn(sd, "attention.2"),
        "attn_conv2": _pointwise(sd, "attention.3", cfg.attn_hidden, cfg.feat_dim),
        "fc": _pointwise(sd, "fc", cfg.feat_dim * 2, cfg.proj_dim),
    }


__all__ = [
    "infer_conditioning_config",
    "convert_xtts_conditioning",
    "infer_hifi_decoder_config",
    "convert_hifi_decoder",
    "infer_speaker_resnet_config",
    "convert_speaker_resnet",
]
