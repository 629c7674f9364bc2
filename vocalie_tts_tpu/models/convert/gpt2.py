"""GPT-2-family decoder state dict → transformer params (XTTS GPT).

The XTTS-v2 checkpoint's AR stage is a GPT-2-style decoder (learned
absolute positions, biased LayerNorm, fused qkv ``Conv1D`` [in, out]
weights, gelu MLP — ref: SURVEY §2.4 XTTS re-support mandate; BASELINE
config #2). This maps that layout onto ``models.common.transformer``
with the GPT-2 variant flags:

    {p}wte.weight                       → tok_emb (+ tied lm_head)
    {p}wpe.weight                       → pos_emb
    {p}h.{i}.ln_1.{weight,bias}         → attn_norm / attn_norm_b
    {p}h.{i}.attn.c_attn.{weight,bias}  → wq/wk/wv (+ bq/bk/bv), split
    {p}h.{i}.attn.c_proj                → wo / bo
    {p}h.{i}.ln_2                       → mlp_norm / mlp_norm_b
    {p}h.{i}.mlp.c_fc                   → w_up / b_up
    {p}h.{i}.mlp.c_proj                 → w_down / b_down
    {p}ln_f                             → final_norm / final_norm_b

``Conv1D`` stores [in, out] — OUR orientation, so no transposes on the
block weights (only the tied head transposes).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vocalie_tts_tpu.models.common.transformer import TransformerConfig


def gpt2_config(
    vocab_size: int, d_model: int, n_layers: int, n_heads: int,
    *, max_seq_len: int = 1024, d_ff: Optional[int] = None, dtype=None,
    pos_index: str = "absolute", **overrides
) -> TransformerConfig:
    """A TransformerConfig with the GPT-2 variant flags set."""
    import jax.numpy as jnp

    return TransformerConfig(
        vocab_size=vocab_size,
        d_model=d_model,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_heads,
        d_head=d_model // n_heads,
        d_ff=d_ff or 4 * d_model,
        max_seq_len=max_seq_len,
        norm_type="layer",
        mlp_type="gelu",
        bias=True,
        attn_bias=True,
        pos_type="learned",
        pos_index=pos_index,
        dtype=dtype or jnp.float32,
        **overrides,
    )


def convert_gpt2_state(
    state: Dict[str, np.ndarray],
    cfg: TransformerConfig,
    *,
    prefix: str = "transformer.",
    dtype=None,
    embeddings: bool = True,
) -> Dict:
    """Build the param tree from a GPT-2-style decoder state dict.

    ``embeddings=False`` converts only the blocks + final norm — for
    checkpoints whose embeddings/heads live outside the GPT2 module
    (the XTTS GPT keeps mel/text embeddings and heads alongside it)."""
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

    d = cfg.d_model
    if embeddings:
        wte = expect(get(f"{prefix}wte.weight"), (cfg.vocab_size, d), "wte")
        wpe = get(f"{prefix}wpe.weight")
        if wpe.shape[1] != d:
            raise ValueError(f"wpe: width {wpe.shape}, expected (*, {d})")

    cols: Dict[str, list] = {
        k: [] for k in ("attn_norm", "attn_norm_b", "wq", "wk", "wv", "bq",
                        "bk", "bv", "wo", "bo", "mlp_norm", "mlp_norm_b",
                        "w_up", "b_up", "w_down", "b_down")
    }
    for i in range(cfg.n_layers):
        base = f"{prefix}h.{i}."
        cols["attn_norm"].append(expect(get(base + "ln_1.weight"), (d,), "ln_1.w"))
        cols["attn_norm_b"].append(expect(get(base + "ln_1.bias"), (d,), "ln_1.b"))
        ca = expect(get(base + "attn.c_attn.weight"), (d, 3 * d), "c_attn.w")
        cb = expect(get(base + "attn.c_attn.bias"), (3 * d,), "c_attn.b")
        cols["wq"].append(ca[:, :d])
        cols["wk"].append(ca[:, d:2 * d])
        cols["wv"].append(ca[:, 2 * d:])
        cols["bq"].append(cb[:d])
        cols["bk"].append(cb[d:2 * d])
        cols["bv"].append(cb[2 * d:])
        cols["wo"].append(expect(get(base + "attn.c_proj.weight"), (d, d), "c_proj.w"))
        cols["bo"].append(expect(get(base + "attn.c_proj.bias"), (d,), "c_proj.b"))
        cols["mlp_norm"].append(expect(get(base + "ln_2.weight"), (d,), "ln_2.w"))
        cols["mlp_norm_b"].append(expect(get(base + "ln_2.bias"), (d,), "ln_2.b"))
        cols["w_up"].append(expect(get(base + "mlp.c_fc.weight"), (d, cfg.d_ff), "c_fc.w"))
        cols["b_up"].append(expect(get(base + "mlp.c_fc.bias"), (cfg.d_ff,), "c_fc.b"))
        cols["w_down"].append(
            expect(get(base + "mlp.c_proj.weight"), (cfg.d_ff, d), "mlp.c_proj.w"))
        cols["b_down"].append(
            expect(get(base + "mlp.c_proj.bias"), (d,), "mlp.c_proj.b"))

    f32_keys = {"attn_norm", "attn_norm_b", "mlp_norm", "mlp_norm_b"}
    layers = {
        k: jnp.asarray(np.stack(v), jnp.float32 if k in f32_keys else dtype)
        for k, v in cols.items()
    }
    out = {
        "final_norm": jnp.asarray(get(f"{prefix}ln_f.weight"), jnp.float32),
        "final_norm_b": jnp.asarray(get(f"{prefix}ln_f.bias"), jnp.float32),
        "layers": layers,
    }
    if embeddings:
        if "lm_head.weight" in state:
            head = np.asarray(state["lm_head.weight"]).T
        else:
            head = wte.T  # tied embeddings
        out["tok_emb"] = jnp.asarray(wte, dtype)
        out["pos_emb"] = jnp.asarray(wpe, dtype)
        out["lm_head"] = jnp.asarray(head, dtype)
    return out


__all__ = ["gpt2_config", "convert_gpt2_state"]
