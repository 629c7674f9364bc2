"""S3 speech-tokenizer checkpoint → ``models/common/s3_tokenizer`` params.

Maps the s3tokenizer/whisper-style torch layout (the torch export of
CosyVoice's ``speech_tokenizer_v2.onnx``; ref:
tts_backends/cosyvoice_runner.py:87-125 zero-shot prompt extraction):

    encoder.conv1/conv2.{weight,bias}       → conv stem (k3, stride 1/2)
    encoder.positional_embedding            → stored sinusoids (optional)
    encoder.blocks.{i}.attn.{query,key,value,out} (key bias-free)
    encoder.blocks.{i}.{attn_ln,mlp_ln,mlp.0,mlp.2}
    encoder.ln_post                         → final LayerNorm
    quantizer.project_down | project_in     → FSQ projection

Config is inferred from tensor shapes (heads = d/64, the whisper
convention); FSQ levels default to 3 (6561 = 3⁸ codes). Fails loud on
the first missing tensor. Parity vs an independent torch replica in
tests/test_convert_s3_tokenizer.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vocalie_tts_tpu.models.common.s3_tokenizer import S3TokenizerConfig

Params = Dict[str, Any]

_FSQ_PROJ_CANDIDATES = (
    "quantizer.project_down",
    "quantizer.project_in",
    "quantizer._codebook.project_down",
)


def _keys_under(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return dict(state)
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def _linear(sd, key, want_in, want_out, bias=True) -> Params:
    import jax.numpy as jnp

    w = sd[f"{key}.weight"]
    if w.shape != (want_out, want_in):
        raise ValueError(f"{key}: shape {w.shape}, expected {(want_out, want_in)}")
    p = {"w": jnp.asarray(np.ascontiguousarray(w.T), jnp.float32)}
    if bias:
        p["b"] = jnp.asarray(
            sd.get(f"{key}.bias", np.zeros((want_out,), np.float32)), jnp.float32)
    return p


def _conv(sd, key) -> Params:
    import jax.numpy as jnp

    w = sd[f"{key}.weight"]                      # [out, in, k]
    return {
        "w": jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 1, 0))), jnp.float32),
        "b": jnp.asarray(
            sd.get(f"{key}.bias", np.zeros((w.shape[0],), np.float32)), jnp.float32),
    }


def _fsq_key(sd) -> str:
    for cand in _FSQ_PROJ_CANDIDATES:
        if f"{cand}.weight" in sd:
            return cand
    raise KeyError(
        "no FSQ projection found; tried "
        + ", ".join(f"{c}.weight" for c in _FSQ_PROJ_CANDIDATES)
    )


def infer_s3_tokenizer_config(
    state: Dict[str, np.ndarray], *, prefix: str = "",
    fsq_levels: int = 3, pool: int = 2,
) -> S3TokenizerConfig:
    sd = _keys_under(state, prefix)
    conv1 = sd["encoder.conv1.weight"]           # [d, n_mels, 3]
    d, n_mels = conv1.shape[0], conv1.shape[1]
    n_layers = 0
    while f"encoder.blocks.{n_layers}.attn.query.weight" in sd:
        n_layers += 1
    proj = sd[f"{_fsq_key(sd)}.weight"]          # [fsq_dims, d]
    return S3TokenizerConfig(
        n_mels=n_mels, d_model=d, n_heads=max(1, d // 64), n_layers=n_layers,
        fsq_dims=proj.shape[0], fsq_levels=fsq_levels, pool=pool,
    )


def convert_s3_tokenizer(
    state: Dict[str, np.ndarray],
    cfg: S3TokenizerConfig,
    *,
    prefix: str = "",
) -> Params:
    import jax.numpy as jnp

    sd = _keys_under(state, prefix)
    d = cfg.d_model
    blocks = []
    for i in range(cfg.n_layers):
        b = f"encoder.blocks.{i}"
        blocks.append({
            "attn_ln_w": jnp.asarray(sd[f"{b}.attn_ln.weight"], jnp.float32),
            "attn_ln_b": jnp.asarray(sd[f"{b}.attn_ln.bias"], jnp.float32),
            "q": _linear(sd, f"{b}.attn.query", d, d),
            "k": _linear(sd, f"{b}.attn.key", d, d, bias=False),
            "v": _linear(sd, f"{b}.attn.value", d, d),
            "out": _linear(sd, f"{b}.attn.out", d, d),
            "mlp_ln_w": jnp.asarray(sd[f"{b}.mlp_ln.weight"], jnp.float32),
            "mlp_ln_b": jnp.asarray(sd[f"{b}.mlp_ln.bias"], jnp.float32),
            "mlp_in": _linear(sd, f"{b}.mlp.0", d, 4 * d),
            "mlp_out": _linear(sd, f"{b}.mlp.2", 4 * d, d),
        })
    params: Params = {
        "conv1": _conv(sd, "encoder.conv1"),
        "conv2": _conv(sd, "encoder.conv2"),
        "blocks": blocks,
        "ln_post_w": jnp.asarray(sd["encoder.ln_post.weight"], jnp.float32),
        "ln_post_b": jnp.asarray(sd["encoder.ln_post.bias"], jnp.float32),
        "fsq_proj": _linear(sd, _fsq_key(sd), d, cfg.fsq_dims),
    }
    if "encoder.positional_embedding" in sd:
        params["pos_emb"] = jnp.asarray(sd["encoder.positional_embedding"], jnp.float32)
    return params


__all__ = ["infer_s3_tokenizer_config", "convert_s3_tokenizer"]
