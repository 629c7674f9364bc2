"""HF Llama/Qwen-family decoder state dict → transformer param tree.

The published checkpoints behind every AR engine here ride the same
HF decoder layout (Chatterbox T3 = Llama backbone, ref:
chatterbox_impl.py:63-73 t3_cfg.safetensors; Qwen3-TTS = Qwen3
backbone, ref: qwen3_runner.py:70-93; CosyVoice LM = Qwen2 backbone,
ref: cosyvoice_runner.py:67-76). This module maps that layout onto
``models.common.transformer`` params:

    {p}embed_tokens.weight                      → tok_emb
    {p}layers.{i}.input_layernorm.weight        → layers.attn_norm[i]
    {p}layers.{i}.self_attn.{q,k,v,o}_proj      → wq/wk/wv/wo[i]  (Wᵀ)
    {p}layers.{i}.post_attention_layernorm      → layers.mlp_norm[i]
    {p}layers.{i}.mlp.{gate,up,down}_proj       → w_gate/w_up/w_down[i]
    {p}norm.weight                              → final_norm
    lm_head.weight (or tied embeddings)         → lm_head  (Wᵀ)

Layer weights stack on a leading [n_layers] axis (scan-over-layers
layout). The RoPE convention matches HF rotate_half exactly (split-half
pairs), so converted weights are numerically equivalent — validated in
tests against ``transformers`` Llama/Qwen2/Qwen3 ForCausalLM logits.

Family deltas handled via the config flags:
- ``cfg.attn_bias``  → maps {q,k,v}_proj.bias (Qwen2 checkpoints)
- ``cfg.qk_norm``    → maps self_attn.{q,k}_norm.weight (Qwen3)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vocalie_tts_tpu.models.common.transformer import TransformerConfig

_LAYER_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    "input_layernorm.weight": "attn_norm",
    "post_attention_layernorm.weight": "mlp_norm",
}
_NORM_KEYS = {"attn_norm", "mlp_norm"}


def convert_hf_decoder_state(
    state: Dict[str, np.ndarray],
    cfg: TransformerConfig,
    *,
    prefix: str = "model.",
    dtype=None,
    embeddings: bool = True,
) -> Dict:
    """Build the param tree from a HF-style decoder state dict.

    ``state`` values are numpy arrays (use convert.torch_bridge
    ``load_state_dict``/``read_safetensors`` to get them). Raises
    KeyError naming the first missing tensor, ValueError on shape
    mismatches — fail loud, never silently skip a weight.

    ``embeddings=False`` converts the backbone only (layers +
    final_norm) — for published layouts that keep their own
    text/speech embedding tables outside the decoder (Chatterbox T3,
    CosyVoice LM); the caller grafts ``tok_emb``/``lm_head`` itself.
    """
    import jax.numpy as jnp

    dtype = dtype or cfg.dtype

    def get(name: str) -> np.ndarray:
        if name not in state:
            raise KeyError(f"checkpoint is missing tensor {name!r}")
        return np.asarray(state[name])

    def expect(arr: np.ndarray, shape, name: str) -> np.ndarray:
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: shape {arr.shape}, expected {tuple(shape)}")
        return arr

    tok_emb = head = None
    if embeddings:
        tok_emb = expect(
            get(f"{prefix}embed_tokens.weight"), (cfg.vocab_size, cfg.d_model),
            "embed_tokens",
        )
        if "lm_head.weight" in state:
            head = expect(
                get("lm_head.weight"), (cfg.vocab_size, cfg.d_model), "lm_head"
            )
        else:  # tied embeddings
            head = tok_emb

    layer_map = dict(_LAYER_MAP)
    norm_keys = set(_NORM_KEYS)
    bias_keys: Dict[str, int] = {}
    if getattr(cfg, "attn_bias", False):
        layer_map.update({
            "self_attn.q_proj.bias": "bq",
            "self_attn.k_proj.bias": "bk",
            "self_attn.v_proj.bias": "bv",
        })
        bias_keys = {"bq": cfg.q_dim, "bk": cfg.kv_dim, "bv": cfg.kv_dim}
    if getattr(cfg, "qk_norm", False):
        layer_map.update({
            "self_attn.q_norm.weight": "q_norm",
            "self_attn.k_norm.weight": "k_norm",
        })
        norm_keys |= {"q_norm", "k_norm"}

    layers: Dict[str, list] = {v: [] for v in layer_map.values()}
    for i in range(cfg.n_layers):
        base = f"{prefix}layers.{i}."
        for hf_key, ours in layer_map.items():
            arr = get(base + hf_key)
            if ours in norm_keys:
                dim = cfg.d_head if ours in ("q_norm", "k_norm") else cfg.d_model
                arr = expect(arr, (dim,), base + hf_key)
            elif ours in bias_keys:
                arr = expect(arr, (bias_keys[ours],), base + hf_key)
            else:
                # torch Linear stores [out, in]; we contract x @ W
                d_out = {
                    "wq": cfg.q_dim, "wk": cfg.kv_dim, "wv": cfg.kv_dim,
                    "wo": cfg.d_model, "w_gate": cfg.d_ff, "w_up": cfg.d_ff,
                    "w_down": cfg.d_model,
                }[ours]
                d_in = {
                    "wq": cfg.d_model, "wk": cfg.d_model, "wv": cfg.d_model,
                    "wo": cfg.q_dim, "w_gate": cfg.d_model, "w_up": cfg.d_model,
                    "w_down": cfg.d_ff,
                }[ours]
                arr = expect(arr, (d_out, d_in), base + hf_key).T
            layers[ours].append(arr)

    stacked = {
        name: (
            jnp.asarray(np.stack(mats), jnp.float32)
            if name in norm_keys
            else jnp.asarray(np.stack(mats), dtype)
        )
        for name, mats in layers.items()
    }
    out = {
        "final_norm": jnp.asarray(
            expect(get(f"{prefix}norm.weight"), (cfg.d_model,), "final_norm"),
            jnp.float32,
        ),
        "layers": stacked,
    }
    if embeddings:
        out["tok_emb"] = jnp.asarray(tok_emb, dtype)
        out["lm_head"] = jnp.asarray(head.T, dtype)
    return out


__all__ = ["convert_hf_decoder_state"]
