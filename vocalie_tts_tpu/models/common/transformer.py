"""Decoder-only transformer core (functional, pytree params).

One implementation serves every AR family in the framework
(Chatterbox-class T3, Qwen3-TTS-class LM, CosyVoice-class LM, XTTS
GPT): pre-norm RMSNorm blocks, RoPE, GQA attention, SwiGLU MLP,
bfloat16 params with float32 norms/logits.

Design notes (TPU):
- **Layers are stacked and scanned**: layer params live in arrays with
  a leading [n_layers] axis and the block runs under ``jax.lax.scan``,
  so XLA compiles ONE block regardless of depth — compile time for the
  0.5B/30-layer decode loop drops from minutes to seconds, and the
  pytree stays small for fast dispatch.
- prefill runs the Pallas flash-attention kernel (ops/flash_attention);
- decode steps use the stacked KV cache so the whole sampling loop
  stays inside one jitted ``lax.while_loop``;
- all shapes static; batch/length bucketing happens in the runtimes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vocalie_tts_tpu.ops.flash_attention import flash_attention
from vocalie_tts_tpu.utils.env import bool_env

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_head: int
    d_ff: int
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    #: extra input channels concatenated/conditioned (0 = none)
    cond_dim: int = 0
    #: int8-quantize the KV cache (halves decode HBM traffic; per-token
    #: per-head amax scales — guide §13 pattern)
    kv_quant: bool = False
    #: fused Pallas decode attention (qK^T→softmax→pV in one kernel pass;
    #: profiling showed XLA lowers the q_len==1 einsums to VPU kLoop
    #: fusions at ~75 µs/layer — the kernel streams K/V once instead)
    decode_kernel: bool = False
    #: int8-native Pallas kernels for the decode-step DENSE dots
    #: (fused qkv / o-proj / whole SwiGLU MLP) — weights feed the MXU
    #: as int8 with activations quantized in-kernel, reading the
    #: stacked per-layer weights in place (scalar-prefetch). Pairs with
    #: int8 weights (quantize_weights_int8 + fuse_decode_weights);
    #: silently inert otherwise. See ops/decode_dense.
    dense_kernel: bool = False
    #: additive q/k/v projection biases (Qwen2-family checkpoints carry
    #: them — ref: cosyvoice_runner.py:67-76 loads a Qwen2 LM)
    attn_bias: bool = False
    #: per-head RMSNorm on q and k before RoPE (Qwen3-family — ref:
    #: qwen3_runner.py:70-93 loads a Qwen3 backbone)
    qk_norm: bool = False
    # ── GPT-2-family variant flags (the XTTS GPT checkpoint layout) ──
    #: "rms" (Llama/Qwen) or "layer" (LayerNorm with bias, GPT-2)
    norm_type: str = "rms"
    #: "swiglu" (gate·up) or "gelu" (fc → gelu → proj, with biases)
    mlp_type: str = "swiglu"
    #: biases on o-proj and the MLP (GPT-2 has them everywhere)
    bias: bool = False
    #: "rope" or "learned" (absolute learned table; for caller-built
    #: inputs_embeds the PROMPT positions are the caller's job, decode
    #: steps look the table up per cfg.pos_index)
    pos_type: str = "rope"
    #: decode-step position index: "absolute" (prompt+decoded — plain
    #: GPT-2) or "decode_relative" (n_decoded + 1 — XTTS mel positions,
    #: whose prompt carries its own text/mel-BOS position embeddings)
    pos_index: str = "absolute"
    #: learned position table length (0 → max_seq_len); published
    #: checkpoints size this separately from the cache length
    pos_len: int = 0
    #: bias on the LM head (the XTTS mel head has one; plain GPT-2 ties
    #: a bias-free head to the embeddings)
    head_bias: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.d_head

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.d_head

    @property
    def kv_packed(self) -> bool:
        """int8 K and V stored lane-INTERLEAVED: one [.., T, 2·d_head]
        array per layer/head with k in lanes [0, d) and v in [d, 2d).

        Why: TPU tiled layouts pad the minor dim to 128 lanes, so a
        d_head=64 cache silently reads 2× its bytes — measured 55 vs
        28.5 µs/layer for identical logical bytes at d_head 128 (the
        whole gap between the int8 attention kernel and its DMA
        floor). Packing k|v fills the 128 lanes exactly; the kernel
        zero-extends q for the score dot and extracts the v half of
        the output with constant selector matmuls (ops/decode_attention
        _kernel_stacked_int8dots_packed). Active only in the Pallas
        int8 serving config."""
        return self.decode_kernel and self.kv_quant and self.d_head * 2 == 128


class StackedKVCache(NamedTuple):
    """All layers' caches stacked on a leading [n_layers] axis.

    Layout: positions [0, prompt_pad) hold the (padded) prompt; decode
    tokens land at the uniform slot ``prompt_pad + n_decoded`` for all
    rows, so each step is ONE tiny ``dynamic_update_slice`` instead of
    a masked rewrite of the whole cache (the difference between ~HBM
    roofline and 3× off it at 0.5B scale). Per-row validity is carried
    by ``prompt_lengths`` and used in the attention mask; RoPE uses
    logical positions, so storage slots need not equal positions.
    """

    k: jax.Array  # [L, batch, kv_heads, max_len, head_dim] (bf16 or int8);
    #               [.., max_len, 2*head_dim] lane-interleaved k|v when packed
    v: Optional[jax.Array]  # None in packed mode (k holds both)
    prompt_lengths: jax.Array  # [batch] — valid prompt positions
    n_decoded: jax.Array       # scalar int32 — decode tokens written
    prompt_pad: jax.Array      # scalar int32 — start of the decode region
    #: per-(layer, row, head, position) dequant scales when int8
    k_scale: Optional[jax.Array] = None  # [L, batch, kv_heads, max_len]
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, n_layers, batch, kv_heads, max_len, head_dim,
               dtype=jnp.bfloat16, quantized: bool = False,
               packed: bool = False):
        shape = (n_layers, batch, kv_heads, max_len, head_dim)
        if packed:
            # lane-interleaved k|v (see TransformerConfig.kv_packed):
            # ONE [.., T, 2d] int8 array in ``k``, ``v`` is None
            if not quantized:
                raise ValueError("packed KV requires the int8 cache")
            return cls(
                k=jnp.zeros(shape[:-1] + (2 * head_dim,), jnp.int8),
                v=None,
                prompt_lengths=jnp.zeros((batch,), jnp.int32),
                n_decoded=jnp.zeros((), jnp.int32),
                prompt_pad=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
                v_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            )
        if quantized:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                prompt_lengths=jnp.zeros((batch,), jnp.int32),
                n_decoded=jnp.zeros((), jnp.int32),
                prompt_pad=jnp.zeros((), jnp.int32),
                k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
                v_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            prompt_lengths=jnp.zeros((batch,), jnp.int32),
            n_decoded=jnp.zeros((), jnp.int32),
            prompt_pad=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def length(self) -> jax.Array:
        """Per-row logical sequence length (prompt + decoded)."""
        return self.prompt_lengths + self.n_decoded

    def valid_mask(self) -> jax.Array:
        """[batch, max_len] — True where a cache slot holds a real token."""
        pos = jnp.arange(self.max_len)[None, :]
        in_prompt = pos < self.prompt_lengths[:, None]
        in_decode = (pos >= self.prompt_pad) & (pos < self.prompt_pad + self.n_decoded)
        return in_prompt | in_decode


# ── init ────────────────────────────────────────────────────────────────


def _dense_init(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def _stacked_dense_init(key, n, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (n, d_in, d_out), jnp.float32) * scale).astype(dtype)


def init_params(key: jax.Array, cfg: TransformerConfig) -> Params:
    keys = jax.random.split(key, 11)
    L = cfg.n_layers
    params: Params = {
        "tok_emb": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "lm_head": _dense_init(keys[1], cfg.d_model, cfg.vocab_size, cfg.dtype),
        "layers": {
            "attn_norm": jnp.ones((L, cfg.d_model), jnp.float32),
            "wq": _stacked_dense_init(keys[3], L, cfg.d_model, cfg.q_dim, cfg.dtype),
            "wk": _stacked_dense_init(keys[4], L, cfg.d_model, cfg.kv_dim, cfg.dtype),
            "wv": _stacked_dense_init(keys[5], L, cfg.d_model, cfg.kv_dim, cfg.dtype),
            "wo": _stacked_dense_init(keys[6], L, cfg.q_dim, cfg.d_model, cfg.dtype),
            "mlp_norm": jnp.ones((L, cfg.d_model), jnp.float32),
            "w_up": _stacked_dense_init(keys[8], L, cfg.d_model, cfg.d_ff, cfg.dtype),
            "w_down": _stacked_dense_init(keys[9], L, cfg.d_ff, cfg.d_model, cfg.dtype),
        },
    }
    if cfg.mlp_type == "swiglu":
        params["layers"]["w_gate"] = _stacked_dense_init(
            keys[7], L, cfg.d_model, cfg.d_ff, cfg.dtype
        )
    if cfg.head_bias:
        params["lm_head_b"] = jnp.zeros((cfg.vocab_size,), jnp.float32)
    if cfg.norm_type == "layer":
        params["final_norm_b"] = jnp.zeros((cfg.d_model,), jnp.float32)
        params["layers"]["attn_norm_b"] = jnp.zeros((L, cfg.d_model), jnp.float32)
        params["layers"]["mlp_norm_b"] = jnp.zeros((L, cfg.d_model), jnp.float32)
    if cfg.bias:
        params["layers"]["bo"] = jnp.zeros((L, cfg.d_model), cfg.dtype)
        params["layers"]["b_up"] = jnp.zeros((L, cfg.d_ff), cfg.dtype)
        params["layers"]["b_down"] = jnp.zeros((L, cfg.d_model), cfg.dtype)
    if cfg.pos_type == "learned":
        n_pos = cfg.pos_len or cfg.max_seq_len
        params["pos_emb"] = (
            jax.random.normal(keys[10], (n_pos, cfg.d_model), jnp.float32)
            * 0.01
        ).astype(cfg.dtype)
    if cfg.attn_bias:
        params["layers"]["bq"] = jnp.zeros((L, cfg.q_dim), cfg.dtype)
        params["layers"]["bk"] = jnp.zeros((L, cfg.kv_dim), cfg.dtype)
        params["layers"]["bv"] = jnp.zeros((L, cfg.kv_dim), cfg.dtype)
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, cfg.d_head), jnp.float32)
        params["layers"]["k_norm"] = jnp.ones((L, cfg.d_head), jnp.float32)
    if cfg.cond_dim:
        params["cond_proj"] = _dense_init(keys[2], cfg.cond_dim, cfg.d_model, cfg.dtype)
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ── building blocks ─────────────────────────────────────────────────────


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def _norm(x: jax.Array, cfg: TransformerConfig, weight: jax.Array,
          bias: Optional[jax.Array]) -> jax.Array:
    """rms or layer norm per cfg.norm_type (layer norm in f32, biased)."""
    if cfg.norm_type == "rms":
        return rms_norm(x, weight, cfg.norm_eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + cfg.norm_eps) * weight
    return (out + bias).astype(x.dtype)


def rope_angles(positions: jax.Array, d_head: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables for *positions* — [..., d_head // 2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d_head, 2, dtype=jnp.float32) / d_head)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [batch, heads, seq, d_head]; cos/sin: [batch, seq, d_head/2]."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    cos = cos[:, None]
    sin = sin[:, None]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _split_heads(x: jax.Array, n_heads: int, d_head: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, d_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _quantize_kv(t: jax.Array):
    """[..., d] → (int8 values, bf16 scales [...]) with per-vector amax.

    Scales are stored bf16: the rounded scale is what divides the
    values, so dequant is self-consistent; the ~0.4% scale rounding is
    far under the 7-bit value quantization, and halving the scale
    arrays saves ~2.4 MB/layer of decode reads + half the scale-write
    cost per step."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(t.astype(jnp.float32) / scale[..., None].astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)
    return q, scale


# ── int8 weight-only quantization ───────────────────────────────────────
#
# Autoregressive decode is weight-streaming-bound (every step reads the
# full parameter set from HBM for a [b, 1, d] activation). Storing the
# matmul weights as int8 with per-output-channel scales halves that
# traffic; XLA fuses the int8→bf16 convert into the dot's operand load,
# and the scale factors out of the contraction so it is applied once to
# the [b, d_out] result. Near-lossless for inference (per-channel
# weight-only int8). Enabled per engine via VOCALIE_WEIGHT_INT8=1.

_QUANT_KEYS = {"lm_head", "cond_proj", "wq", "wk", "wv", "wo",
               "w_gate", "w_up", "w_down"}


def _quantize_dense(w: jax.Array):
    """[..., d_in, d_out] → {"q": int8, "s": f32 [..., 1, d_out]}."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_weights_int8(params: Params) -> Params:
    """Return a param tree with matmul weights int8-quantized.

    Embedding and norm vectors stay in their original dtype (the token
    gather reads one row; norms are tiny). The result feeds the same
    forward functions — ``_qdot`` dispatches on the leaf type.
    """
    out = dict(params)
    for key in ("lm_head", "cond_proj"):
        if key in out:
            out[key] = _quantize_dense(out[key])
    layers = dict(params["layers"])
    for key in list(layers):
        if key in _QUANT_KEYS:
            layers[key] = _quantize_dense(layers[key])
    out["layers"] = layers
    return out


def fuse_decode_weights(params: Params) -> Params:
    """Runtime-only transform: concatenate the per-layer q/k/v (and
    swiglu gate/up) projections along the output channel so the decode
    loop issues ONE dot where it issued three (two).

    Why it pays: at decode the activations are [b, 1, d] — every dot is
    a skinny matvec whose cost is its weight stream plus a fixed kernel
    overhead. Fusing shares one HBM stream and one kernel launch across
    projections that read the same input. Works on plain or
    int8-quantized ({"q","s"}) layers; applied by the runtimes only
    (``save_params`` refuses fused trees — reload templates are
    unfused)."""
    layers = dict(params["layers"])

    def cat(names):
        vals = [layers.pop(n) for n in names]
        if isinstance(vals[0], dict):  # int8 {"q","s"}
            return {
                "q": jnp.concatenate([v["q"] for v in vals], axis=-1),
                "s": jnp.concatenate([v["s"] for v in vals], axis=-1),
            }
        return jnp.concatenate(vals, axis=-1)

    layers["wqkv"] = cat(["wq", "wk", "wv"])
    if "bq" in layers:
        layers["bqkv"] = jnp.concatenate(
            [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
        )
    if "w_gate" in layers:
        layers["w_gateup"] = cat(["w_gate", "w_up"])

    out = {**params, "layers": layers}
    # Pad the int8 lm_head to a 128-multiple output width so the decode
    # step can run it through the int8-native Pallas dense kernel (the
    # 1287-wide vocab of the T3 family is not tileable; XLA's int8 path
    # pays the elementwise-dequant unpack penalty). Padded columns are
    # zero-weight/unit-scale; consumers slice logits[..., :vocab].
    lm = out.get("lm_head")
    if isinstance(lm, dict):
        v = lm["q"].shape[-1]
        pad = (-v) % 128
        if pad:
            out["lm_head"] = {
                "q": jnp.pad(lm["q"], ((0, 0), (0, pad))),
                "s": jnp.pad(lm["s"], ((0, 0), (0, pad)), constant_values=1.0),
            }
    return out


def maybe_head_stack_qkv(params: Params, cfg: TransformerConfig,
                         batch: int) -> Params:
    """Install the decode-only head-stacked qkv layout
    (``layers["wqkv_h"]`` / ``["bqkv_h"]``) when the fused whole-step
    kernel applies: VOCALIE_FUSED_STEP=1, b==1, the int8 packed-KV
    rms/swiglu serving config (see ops/decode_step). Called at the TOP
    of the jitted generate programs so the transpose traces once per
    dispatch, OUTSIDE the decode while_loop — never persisted
    (runtime-only, like fuse_decode_weights)."""
    if batch != 1 or not bool_env("VOCALIE_FUSED_STEP", True):
        return params
    layers = params.get("layers", {})
    if "wqkv_h" in layers:      # already materialized at engine init
        return params
    w = layers.get("wqkv")
    ok = (
        isinstance(w, dict)
        and "q" in w
        and cfg.dense_kernel
        and cfg.decode_kernel
        and cfg.kv_quant
        and cfg.kv_packed
        and cfg.norm_type == "rms"
        and cfg.mlp_type == "swiglu"
        and not cfg.bias
        and cfg.pos_type == "rope"
        and not cfg.qk_norm
        and cfg.n_heads == cfg.n_kv_heads
        and isinstance(layers.get("w_gateup"), dict)
        and isinstance(layers.get("w_down"), dict)
        and isinstance(layers.get("wo"), dict)
        and cfg.d_model % 128 == 0
        and cfg.d_ff % 128 == 0
    )
    if not ok:
        return params
    from vocalie_tts_tpu.ops.decode_step import head_stack_qkv

    wh, bh = head_stack_qkv(layers, cfg.n_heads, cfg.n_kv_heads, cfg.d_head)
    layers = dict(layers)
    layers["wqkv_h"] = wh
    layers["bqkv_h"] = bh
    return {**params, "layers": layers}


def unfuse_decode_weights(params: Params, cfg: TransformerConfig) -> Params:
    """Exact inverse of ``fuse_decode_weights`` (the fusion is a pure
    concatenation) — used by the save path so persisted checkpoints
    keep the canonical unfused tree."""
    layers = dict(params["layers"])
    if "wqkv" not in layers and "w_gateup" not in layers:
        return params

    def split(v, names, sizes):
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        for name, lo, hi in zip(names, offs[:-1], offs[1:]):
            if isinstance(v, dict):
                layers[name] = {"q": v["q"][..., lo:hi], "s": v["s"][..., lo:hi]}
            else:
                layers[name] = v[..., lo:hi]

    if "wqkv" in layers:
        split(layers.pop("wqkv"), ("wq", "wk", "wv"),
              (cfg.q_dim, cfg.kv_dim, cfg.kv_dim))
        if "bqkv" in layers:
            split(layers.pop("bqkv"), ("bq", "bk", "bv"),
                  (cfg.q_dim, cfg.kv_dim, cfg.kv_dim))
    if "w_gateup" in layers:
        split(layers.pop("w_gateup"), ("w_gate", "w_up"), (cfg.d_ff, cfg.d_ff))
    out = {**params, "layers": layers}
    lm = out.get("lm_head")
    if isinstance(lm, dict) and lm["q"].shape[-1] != cfg.vocab_size:
        out["lm_head"] = {
            "q": lm["q"][..., : cfg.vocab_size],
            "s": lm["s"][..., : cfg.vocab_size],
        }
    return out


def _qdot(x: jax.Array, w, **kwargs) -> jax.Array:
    """dot(x, w) for plain or int8-quantized ({"q","s"}) weights.

    Weight-only int8 (activations stay bf16): measured FASTER than
    W8A8 int8×int8 dots here (3.38 vs 3.57 ms/step) — unlike decode
    attention, these deep-K matmuls let XLA fuse the int8→bf16 weight
    convert into the dot efficiently, and per-matmul activation
    quantization only adds passes."""
    if isinstance(w, dict):
        y = jnp.dot(x, w["q"].astype(x.dtype), **kwargs)
        return y * w["s"].reshape(w["s"].shape[-1]).astype(y.dtype)
    return jnp.dot(x, w, **kwargs)


def _lm_head_logits(x2d: jax.Array, params: Params, cfg: TransformerConfig) -> jax.Array:
    """[b, d_model] → [b, vocab] f32 logits.

    With the int8 serving config the (128-padded, see
    fuse_decode_weights) head runs through the int8-native Pallas dense
    kernel — at vocab 1287 the XLA int8 dot pays the elementwise
    dequant-unpack penalty every decode step. Falls back to _qdot for
    plain/unpadded heads; always slices away pad columns.
    """
    w = params["lm_head"]
    if (
        isinstance(w, dict)
        and cfg.dense_kernel
        and w["q"].shape[-1] % 128 == 0
        and x2d.shape[-1] % 128 == 0
    ):
        from vocalie_tts_tpu.ops.decode_dense import dense_int8_stacked

        logits = dense_int8_stacked(
            x2d, w["q"][None], w["s"][None], jnp.zeros((), jnp.int32)
        )
    else:
        logits = _qdot(x2d, w, preferred_element_type=jnp.float32)
    logits = logits[..., : cfg.vocab_size]
    if "lm_head_b" in params:
        logits = logits + params["lm_head_b"].astype(logits.dtype)
    return logits


def _block_qkv(layer: Params, x: jax.Array, cfg: TransformerConfig, cos, sin,
               qkv_dot=None):
    h = _norm(x, cfg, layer["attn_norm"], layer.get("attn_norm_b"))
    if qkv_dot is not None:  # int8-native Pallas dense kernel (decode)
        qkv = qkv_dot(h)
        if cfg.attn_bias:
            qkv = qkv + layer["bqkv"].astype(qkv.dtype)
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim]
        v = qkv[..., cfg.q_dim + cfg.kv_dim :]
    elif "wqkv" in layer:  # fused decode representation (fuse_decode_weights)
        qkv = _qdot(h, layer["wqkv"])
        if cfg.attn_bias:
            qkv = qkv + layer["bqkv"].astype(qkv.dtype)
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim]
        v = qkv[..., cfg.q_dim + cfg.kv_dim :]
    else:
        q, k, v = _qdot(h, layer["wq"]), _qdot(h, layer["wk"]), _qdot(h, layer["wv"])
        if cfg.attn_bias:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
    return _finish_qkv(layer, cfg, q, k, v, cos, sin)


def _finish_qkv(layer: Params, cfg: TransformerConfig, q, k, v, cos, sin):
    """Head split + optional per-head q/k norm + RoPE (post-projection)."""
    q = _split_heads(q, cfg.n_heads, cfg.d_head)
    k = _split_heads(k, cfg.n_kv_heads, cfg.d_head)
    v = _split_heads(v, cfg.n_kv_heads, cfg.d_head)
    if cfg.qk_norm:
        # per-head RMSNorm over d_head, pre-RoPE (Qwen3 convention)
        q = rms_norm(q, layer["q_norm"], cfg.norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.norm_eps)
    if cfg.pos_type != "rope":
        return q, k, v
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _block_tail(layer: Params, x: jax.Array, attn: jax.Array, cfg: TransformerConfig,
                o_dot=None, mlp_fn=None):
    merged = _merge_heads(attn)
    o = o_dot(merged) if o_dot is not None else _qdot(merged, layer["wo"])
    if cfg.bias:
        o = o + layer["bo"].astype(o.dtype)
    x = x + o.astype(x.dtype)
    h2 = _norm(x, cfg, layer["mlp_norm"], layer.get("mlp_norm_b"))
    if mlp_fn is not None:  # int8-native fused SwiGLU Pallas kernel
        return x + mlp_fn(h2).astype(x.dtype)
    if cfg.mlp_type == "swiglu":
        if "w_gateup" in layer:  # fused decode representation
            gu = _qdot(h2, layer["w_gateup"], preferred_element_type=jnp.float32)
            gate, up = gu[..., : cfg.d_ff], gu[..., cfg.d_ff :]
            hidden = (jax.nn.silu(gate) * up).astype(x.dtype)
        else:
            gate = jax.nn.silu(
                _qdot(h2, layer["w_gate"], preferred_element_type=jnp.float32)
            )
            up = _qdot(h2, layer["w_up"], preferred_element_type=jnp.float32)
            hidden = (gate * up).astype(x.dtype)
    else:  # gelu (GPT-2): fc → gelu(tanh approx, the published impl) → proj
        up = _qdot(h2, layer["w_up"], preferred_element_type=jnp.float32)
        if cfg.bias:
            up = up + layer["b_up"].astype(up.dtype)
        hidden = jax.nn.gelu(up, approximate=True).astype(x.dtype)
    mlp = _qdot(hidden, layer["w_down"], preferred_element_type=jnp.float32)
    if cfg.bias:
        mlp = mlp + layer["b_down"].astype(mlp.dtype)
    return x + mlp.astype(x.dtype)


# ── forward passes ──────────────────────────────────────────────────────


def prefill(
    params: Params,
    cfg: TransformerConfig,
    tokens: jax.Array,  # [batch, seq] int32
    lengths: jax.Array,  # [batch] valid prompt lengths
    cond: Optional[jax.Array] = None,  # [batch, seq, cond_dim]
    inputs_embeds: Optional[jax.Array] = None,
    cache_len: Optional[int] = None,
) -> Tuple[jax.Array, StackedKVCache]:
    """Encode the prompt, fill the stacked cache, return last-position
    logits. ``cache_len`` sizes the cache (default cfg.max_seq_len)."""
    if inputs_embeds is None:
        b, s = tokens.shape
        x = params["tok_emb"][tokens]
    else:
        b, s = inputs_embeds.shape[:2]
        x = inputs_embeds
    if cond is not None and cfg.cond_dim:
        x = x + _qdot(cond.astype(x.dtype), params["cond_proj"])

    positions = jnp.arange(s)[None, :].repeat(b, axis=0)
    if cfg.pos_type == "rope":
        cos, sin = rope_angles(positions, cfg.d_head, cfg.rope_theta)
    else:
        cos = sin = None
        if inputs_embeds is None:
            # learned absolute positions on the token path; callers that
            # build inputs_embeds own their positional scheme (XTTS adds
            # separate text/mel position tables before prefill)
            x = x + params["pos_emb"][jnp.arange(s)][None].astype(x.dtype)

    c_len = cache_len or cfg.max_seq_len

    # Pallas flash attention earns its tiling only on long prompts;
    # short VO chunks (<512 positions) run the XLA softmax — faster at
    # these sizes and one less Mosaic compile per bucket.
    if s >= 512:
        attn_fn = functools.partial(flash_attention, causal=True)
    else:
        from vocalie_tts_tpu.ops.flash_attention import reference_attention

        attn_fn = functools.partial(reference_attention, causal=True)

    def layer_step(x, layer):
        q, k, v = _block_qkv(layer, x, cfg, cos, sin)
        attn = attn_fn(q, k, v)
        x = _block_tail(layer, x, attn, cfg)
        return x, (k, v)

    x, (k_all, v_all) = jax.lax.scan(layer_step, x, params["layers"])

    # install prompt K/V into a fresh stacked cache; decode region
    # starts right after the padded prompt
    cache = StackedKVCache.create(
        cfg.n_layers, b, cfg.n_kv_heads, c_len, cfg.d_head, cfg.dtype,
        quantized=cfg.kv_quant, packed=cfg.kv_packed,
    )
    if cfg.kv_quant:
        k_q, k_s = _quantize_kv(k_all)
        v_q, v_s = _quantize_kv(v_all)
        if cfg.kv_packed:
            kv_q = jnp.concatenate([k_q, v_q], axis=-1)  # [.., s, 2d]
            k_w = jax.lax.dynamic_update_slice(cache.k, kv_q, (0, 0, 0, 0, 0))
            v_w = None
        else:
            k_w = jax.lax.dynamic_update_slice(cache.k, k_q, (0, 0, 0, 0, 0))
            v_w = jax.lax.dynamic_update_slice(cache.v, v_q, (0, 0, 0, 0, 0))
        cache = StackedKVCache(
            k=k_w,
            v=v_w,
            prompt_lengths=lengths.astype(jnp.int32),
            n_decoded=jnp.zeros((), jnp.int32),
            prompt_pad=jnp.asarray(s, jnp.int32),
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, k_s, (0, 0, 0, 0)),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, v_s, (0, 0, 0, 0)),
        )
    else:
        k_cache = jax.lax.dynamic_update_slice(
            cache.k, k_all.astype(cache.k.dtype), (0, 0, 0, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache.v, v_all.astype(cache.v.dtype), (0, 0, 0, 0, 0)
        )
        cache = StackedKVCache(
            k=k_cache,
            v=v_cache,
            prompt_lengths=lengths.astype(jnp.int32),
            n_decoded=jnp.zeros((), jnp.int32),
            prompt_pad=jnp.asarray(s, jnp.int32),
        )

    x = _norm(x, cfg, params["final_norm"], params.get("final_norm_b"))
    last_idx = jnp.clip(lengths - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits = _lm_head_logits(x_last, params, cfg)
    return logits, cache


def decode_step(
    params: Params,
    cfg: TransformerConfig,
    token: jax.Array,  # [batch] int32 — previous token
    cache: StackedKVCache,
    cond_vec: Optional[jax.Array] = None,  # [batch, cond_dim]
    return_hidden: bool = False,
) -> Tuple[jax.Array, StackedKVCache]:
    """One AR step under scan-over-layers: (logits, updated cache).

    ``return_hidden=True`` (trace-time flag) additionally returns the
    post-final-norm hidden state [b, d_model] — the "GPT latent" the
    XTTS-v2 waveform decoder consumes for the token that was this
    step's INPUT (ref: SURVEY §2.4 XTTS re-support mandate)."""
    b = token.shape[0]
    x = params["tok_emb"][token][:, None, :]  # [b, 1, d_model]
    if cond_vec is not None and cfg.cond_dim:
        x = x + _qdot(cond_vec.astype(x.dtype), params["cond_proj"])[:, None, :]

    # logical positions for RoPE are per-row; the storage slot is the
    # uniform prompt_pad + n_decoded (see StackedKVCache docstring)
    positions = cache.length[:, None]  # [b, 1]
    if cfg.pos_type == "rope":
        cos, sin = rope_angles(positions, cfg.d_head, cfg.rope_theta)
    else:
        cos = sin = None
        if cfg.pos_index == "decode_relative":
            # XTTS mel positions: BOS sits at 0 in the prompt, the
            # n-th generated token is mel position n+1
            pos_idx = jnp.broadcast_to(cache.n_decoded + 1, (b,))
        else:
            pos_idx = cache.length
        x = x + params["pos_emb"][pos_idx][:, None, :].astype(x.dtype)
    write_pos = cache.prompt_pad + cache.n_decoded
    # mask covers CACHED slots only — the current token's k/v enter the
    # softmax separately (flash-style merge), so the cache arrays stay
    # READ-ONLY through the whole layer loop. That read-only-ness is
    # load-bearing: a cache carried+updated inside the loop forces XLA
    # to materialize a copy per pallas operand (~1 ms/step at 0.5B).
    attend = cache.valid_mask()  # [b, max_len]
    neg = jnp.asarray(-0.7 * jnp.finfo(jnp.float32).max, jnp.float32)
    attn_bias = jnp.where(attend, 0.0, neg)[:, None, None, :]  # [b,1,1,T]
    bias2d = jnp.where(attend, 0.0, neg)
    sm_scale = 1.0 / math.sqrt(cfg.d_head)
    group = cfg.n_heads // cfg.n_kv_heads
    quant = cfg.kv_quant
    k_all, v_all = cache.k, cache.v
    ks_all, vs_all = cache.k_scale, cache.v_scale

    # int8-native Pallas dense kernels: the STACKED weight arrays go to
    # pallas whole, indexed by the scan's layer counter via
    # scalar-prefetch — the scan-sliced per-layer weights would
    # otherwise materialize as pallas-operand copies, re-spending the
    # HBM traffic the kernels save (see ops/decode_dense).
    layers_all = params["layers"]

    def _is_i8(w):
        return isinstance(w, dict) and "q" in w

    use_dense = (
        cfg.dense_kernel
        and _is_i8(layers_all.get("wqkv"))
        and _is_i8(layers_all.get("wo"))
        and layers_all["wqkv"]["q"].shape[2] % 128 == 0
        and cfg.d_model % 128 == 0
    )
    use_dense_mlp = (
        use_dense
        and cfg.mlp_type == "swiglu"
        and _is_i8(layers_all.get("w_gateup"))
        and _is_i8(layers_all.get("w_down"))
        and cfg.d_ff % 128 == 0
    )
    use_dense_mlp_gelu = (
        use_dense
        and cfg.mlp_type == "gelu"
        and cfg.bias  # GPT-2 layout: fc bias lives in the kernel
        and _is_i8(layers_all.get("w_up"))
        and _is_i8(layers_all.get("w_down"))
        and cfg.d_ff % 128 == 0
    )
    # rms/swiglu families (T3 / CosyVoice / Qwen): the WHOLE layer tail
    # (o-proj → residual → rms_norm → SwiGLU → residual) and the
    # norm+qkv projection each run as ONE kernel — fewer pallas calls
    # and XLA glue fusions per layer means fewer scheduling bubbles in
    # the 30-layer scan.
    use_fused_tail = use_dense_mlp and cfg.norm_type == "rms" and not cfg.bias
    use_fused_tail_gelu = (
        use_dense_mlp_gelu and cfg.norm_type == "layer"
    )
    if use_dense:
        from vocalie_tts_tpu.ops.decode_dense import (
            dense_int8_stacked,
            mlp_gelu_int8_stacked,
            mlp_swiglu_int8_stacked,
            qkv_lnorm_int8_stacked,
            qkv_norm_int8_stacked,
            tail_gelu_int8_stacked,
            tail_gelu_qkv_int8_stacked,
            tail_swiglu_int8_stacked,
            tail_swiglu_qkv_int8_stacked,
        )
    # megakernel scan: each layer's tail also computes the NEXT layer's
    # norm+qkv (carried through the scan) — one pallas launch less per
    # layer; the first layer's qkv comes from one standalone call.
    # VOCALIE_MEGATAIL=0 falls back to the separate tail + qkv kernels
    # (A/B knob: the fusion wins at 0.5B shapes, measure per model)
    _mega_env = bool_env("VOCALIE_MEGATAIL", True)
    use_megatail = use_fused_tail and _mega_env
    use_megatail_gelu = use_fused_tail_gelu and _mega_env
    # megalayer: the WHOLE layer (attention T-blocks + per-head-chunk
    # o-proj + MLP tail + next qkv) as ONE pallas launch — removes a
    # launch boundary per layer (see ops/decode_layer.py). Opt-in until
    # TPU-validated (VOCALIE_MEGALAYER=1).
    use_megalayer = (
        use_megatail
        and cfg.decode_kernel
        and quant
        and (cfg.kv_packed or cfg.d_head % 128 == 0)
        and cache.max_len % 128 == 0
        and bool_env("VOCALIE_MEGALAYER")
    )
    # fused step: ALL layers in ONE pallas launch (grid = layers ×
    # phases) — amortizes the per-launch pipeline fill that dominates
    # b=1 streaming decode (see ops/decode_step). Requires the
    # head-stacked qkv layout maybe_head_stack_qkv installs (the
    # in-kernel next-layer projection lands heads on sublanes).
    use_fused_step = (
        use_megatail
        and cfg.decode_kernel
        and quant
        and cfg.kv_packed
        and b == 1
        and group == 1
        and cfg.pos_type == "rope"
        and not cfg.qk_norm
        and cache.max_len % 128 == 0
        and "wqkv_h" in layers_all
    )
    if use_fused_step:
        from vocalie_tts_tpu.ops.decode_step import decode_step_fused_packed

        qkv0 = qkv_norm_int8_stacked(
            x[:, 0], layers_all["attn_norm"],
            layers_all["wqkv"]["q"], layers_all["wqkv"]["s"],
            jnp.zeros((), jnp.int32), eps=cfg.norm_eps,
        )[:, None, :].astype(x.dtype)
        if cfg.attn_bias:
            qkv0 = qkv0 + layers_all["bqkv"][0].astype(qkv0.dtype)
        q0, k0, v0 = _finish_qkv(
            {}, cfg,
            qkv0[..., : cfg.q_dim],
            qkv0[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim],
            qkv0[..., cfg.q_dim + cfg.kv_dim :],
            cos, sin,
        )
        cos_f = jnp.concatenate([cos[:, 0], cos[:, 0]], axis=-1).astype(jnp.float32)
        sin_f = jnp.concatenate([-sin[:, 0], sin[:, 0]], axis=-1).astype(jnp.float32)
        kn0 = k0[0, :, 0].astype(jnp.float32)   # [kv, d]
        vn0 = v0[0, :, 0].astype(jnp.float32)
        x_fin, kn_nxt, vn_nxt = decode_step_fused_packed(
            q0[0].astype(jnp.float32),          # [kv(=H), 1, d]
            kn0, vn0,
            x[:, 0].astype(jnp.float32),
            k_all, ks_all, vs_all, bias2d, write_pos,
            layers_all["wo"]["q"], layers_all["wo"]["s"],
            layers_all["mlp_norm"],
            layers_all["w_gateup"]["q"], layers_all["w_gateup"]["s"],
            layers_all["w_down"]["q"], layers_all["w_down"]["s"],
            layers_all["attn_norm"],
            layers_all["wqkv_h"]["q"], layers_all["wqkv_h"]["s"],
            layers_all["bqkv_h"],
            cos_f, sin_f,
            sm_scale=sm_scale, eps=cfg.norm_eps,
        )
        x = x_fin[:, None, :].astype(x.dtype)
        # kernel row l = layer l+1's k/v; prepend the operand-side
        # layer 0, drop the non-existent successor of the last layer
        kn_all = jnp.concatenate([kn0[None], kn_nxt[:-1]], axis=0)
        vn_all = jnp.concatenate([vn0[None], vn_nxt[:-1]], axis=0)
        k_news = kn_all[:, None, :, :]          # [L, 1, kv, d]
        v_news = vn_all[:, None, :, :]
        return _decode_step_finish(
            params, cfg, cache, x, k_news, v_news, write_pos,
            k_all, v_all, ks_all, vs_all, quant, return_hidden,
        )

    def _make_dense_fns(layer, l):
        if not use_dense:
            return None, None, None

        def qkv_dot(h):
            y = dense_int8_stacked(
                h[:, 0], layers_all["wqkv"]["q"], layers_all["wqkv"]["s"], l
            )
            return y[:, None, :].astype(h.dtype)

        def o_dot(merged):
            y = dense_int8_stacked(
                merged[:, 0], layers_all["wo"]["q"], layers_all["wo"]["s"], l
            )
            return y[:, None, :].astype(merged.dtype)

        if use_dense_mlp:

            def mlp_fn(h2):
                y = mlp_swiglu_int8_stacked(
                    h2[:, 0],
                    layers_all["w_gateup"]["q"], layers_all["w_gateup"]["s"],
                    layers_all["w_down"]["q"], layers_all["w_down"]["s"], l,
                )
                return y[:, None, :]

        elif use_dense_mlp_gelu:

            def mlp_fn(h2):
                y = mlp_gelu_int8_stacked(
                    h2[:, 0],
                    layers_all["w_up"]["q"], layers_all["w_up"]["s"],
                    layers_all["b_up"],
                    layers_all["w_down"]["q"], layers_all["w_down"]["s"], l,
                )
                return (y + layer["b_down"].astype(y.dtype))[:, None, :]

        else:
            mlp_fn = None
        return qkv_dot, o_dot, mlp_fn

    def layer_step(carry, xs):
        layer, l = xs
        if use_megatail or use_megatail_gelu:
            # this layer's raw qkv was computed by the PREVIOUS layer's
            # megakernel tail (layer 0's by the standalone prologue call)
            x, qkv_raw = carry
        else:
            x = carry
        o_dot = mlp_fn = None
        if use_fused_tail or use_fused_tail_gelu:
            if use_megatail or use_megatail_gelu:
                qkv = qkv_raw
            elif use_fused_tail:
                qkv = qkv_norm_int8_stacked(
                    x[:, 0], layers_all["attn_norm"],
                    layers_all["wqkv"]["q"], layers_all["wqkv"]["s"], l,
                    eps=cfg.norm_eps,
                )
            else:
                qkv = qkv_lnorm_int8_stacked(
                    x[:, 0], layers_all["attn_norm"],
                    layers_all["attn_norm_b"],
                    layers_all["wqkv"]["q"], layers_all["wqkv"]["s"], l,
                    eps=cfg.norm_eps,
                )
            qkv = qkv[:, None, :].astype(x.dtype)
            if cfg.attn_bias:
                qkv = qkv + layer["bqkv"].astype(qkv.dtype)
            q, k_new, v_new = _finish_qkv(
                layer, cfg,
                qkv[..., : cfg.q_dim],
                qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim],
                qkv[..., cfg.q_dim + cfg.kv_dim :],
                cos, sin,
            )
        else:
            qkv_dot, o_dot, mlp_fn = _make_dense_fns(layer, l)
            q, k_new, v_new = _block_qkv(layer, x, cfg, cos, sin, qkv_dot)
        kn = k_new[:, :, 0, :]  # [b, kv, d]
        vn = v_new[:, :, 0, :]
        qg = q.reshape(b, cfg.n_kv_heads, group, cfg.d_head)
        if use_megalayer:
            from vocalie_tts_tpu.ops.decode_layer import (
                layer_swiglu_qkv_int8_stacked,
            )

            x2, qkv_next = layer_swiglu_qkv_int8_stacked(
                qg.astype(jnp.float32),
                x[:, 0].astype(jnp.float32),
                k_all, v_all, ks_all, vs_all, bias2d,
                kn.astype(jnp.float32), vn.astype(jnp.float32),
                l, write_pos,
                layers_all["wo"]["q"], layers_all["wo"]["s"],
                layers_all["mlp_norm"],
                layers_all["w_gateup"]["q"], layers_all["w_gateup"]["s"],
                layers_all["w_down"]["q"], layers_all["w_down"]["s"],
                layers_all["attn_norm"],
                layers_all["wqkv"]["q"], layers_all["wqkv"]["s"],
                sm_scale=sm_scale, eps=cfg.norm_eps, packed=cfg.kv_packed,
            )
            x = x2[:, None, :].astype(x.dtype)
            return (x, qkv_next), (kn, vn)
        if cfg.decode_kernel:
            # one Pallas program per batch row reads layer l of the
            # STACKED cache in place (scalar-prefetch index_map — no
            # slice copy); K/V stream from HBM exactly once and the
            # [h, T] score matrix never leaves VMEM. int8 cache → the
            # int8-native MXU kernel (65 vs 112 µs/layer at b=16 T=576).
            from vocalie_tts_tpu.ops.decode_attention import (
                decode_attention_stacked,
            )

            attn = decode_attention_stacked(
                qg, k_all, v_all, bias2d, l,
                ks_all if quant else None, vs_all if quant else None,
                kn.astype(jnp.float32), vn.astype(jnp.float32),
                # cached slots in use — the T-blocked kernel skips DMA
                # past this (the current token's k/v merge in-kernel)
                valid_len=write_pos,
                sm_scale=sm_scale, int8_dots=quant, packed=cfg.kv_packed,
            )
        else:
            k_cache = jax.lax.dynamic_index_in_dim(k_all, l, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, l, 0, keepdims=False)
            # fused masked decode attention (q_len == 1, GQA grouped);
            # K/V stay in cache dtype — f32 only in the matmul
            # accumulators; int8 dequant scales factor out of the dots.
            s = jnp.einsum(
                "bhgd,bhtd->bhgt", qg, k_cache.astype(qg.dtype),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if quant:
                k_sc = jax.lax.dynamic_index_in_dim(ks_all, l, 0, keepdims=False)
                s = s * k_sc[:, :, None, :].astype(jnp.float32)
            s = s + attn_bias
            # current token's column, merged flash-style
            s_new = jnp.einsum(
                "bhgd,bhd->bhg", qg.astype(jnp.float32), kn.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )[..., None] * sm_scale
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
            e = jnp.exp(s - m)
            p_new = jnp.exp(s_new - m)
            denom = jnp.sum(e, axis=-1, keepdims=True) + p_new
            p = e
            if quant:
                v_sc = jax.lax.dynamic_index_in_dim(vs_all, l, 0, keepdims=False)
                p = p * v_sc[:, :, None, :].astype(jnp.float32)
            attn = jnp.einsum(
                "bhgt,bhtd->bhgd", p.astype(x.dtype), v_cache.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            attn = (attn + p_new * vn.astype(jnp.float32)[:, :, None, :]) / denom
        if use_megatail:
            merged = attn.reshape(b, cfg.n_heads * cfg.d_head)
            x2, qkv_next = tail_swiglu_qkv_int8_stacked(
                merged, x[:, 0],
                layers_all["wo"]["q"], layers_all["wo"]["s"],
                layers_all["mlp_norm"],
                layers_all["w_gateup"]["q"], layers_all["w_gateup"]["s"],
                layers_all["w_down"]["q"], layers_all["w_down"]["s"],
                layers_all["attn_norm"],
                layers_all["wqkv"]["q"], layers_all["wqkv"]["s"], l,
                eps=cfg.norm_eps,
            )
            x = x2[:, None, :].astype(x.dtype)
            return (x, qkv_next), (kn, vn)
        elif use_fused_tail:
            merged = attn.reshape(b, cfg.n_heads * cfg.d_head)
            x2 = tail_swiglu_int8_stacked(
                merged, x[:, 0],
                layers_all["wo"]["q"], layers_all["wo"]["s"],
                layers_all["mlp_norm"],
                layers_all["w_gateup"]["q"], layers_all["w_gateup"]["s"],
                layers_all["w_down"]["q"], layers_all["w_down"]["s"], l,
                eps=cfg.norm_eps,
            )
            x = x2[:, None, :].astype(x.dtype)
        elif use_megatail_gelu:
            merged = attn.reshape(b, cfg.n_heads * cfg.d_head)
            x2, qkv_next = tail_gelu_qkv_int8_stacked(
                merged, x[:, 0],
                layers_all["wo"]["q"], layers_all["wo"]["s"],
                layers_all["bo"],
                layers_all["mlp_norm"], layers_all["mlp_norm_b"],
                layers_all["w_up"]["q"], layers_all["w_up"]["s"],
                layers_all["b_up"],
                layers_all["w_down"]["q"], layers_all["w_down"]["s"],
                layers_all["b_down"],
                layers_all["attn_norm"], layers_all["attn_norm_b"],
                layers_all["wqkv"]["q"], layers_all["wqkv"]["s"], l,
                eps=cfg.norm_eps,
            )
            x = x2[:, None, :].astype(x.dtype)
            return (x, qkv_next), (kn, vn)
        elif use_fused_tail_gelu:
            merged = attn.reshape(b, cfg.n_heads * cfg.d_head)
            x2 = tail_gelu_int8_stacked(
                merged, x[:, 0],
                layers_all["wo"]["q"], layers_all["wo"]["s"],
                layers_all["bo"],
                layers_all["mlp_norm"], layers_all["mlp_norm_b"],
                layers_all["w_up"]["q"], layers_all["w_up"]["s"],
                layers_all["b_up"],
                layers_all["w_down"]["q"], layers_all["w_down"]["s"],
                layers_all["b_down"], l,
                eps=cfg.norm_eps,
            )
            x = x2[:, None, :].astype(x.dtype)
        else:
            attn = attn.reshape(b, cfg.n_heads, 1, cfg.d_head).astype(x.dtype)
            x = _block_tail(layer, x, attn, cfg, o_dot, mlp_fn)
        return x, (kn, vn)

    layer_idx = jnp.arange(cfg.n_layers)
    if use_megatail or use_megatail_gelu:
        if use_megatail:
            qkv0 = qkv_norm_int8_stacked(
                x[:, 0], layers_all["attn_norm"],
                layers_all["wqkv"]["q"], layers_all["wqkv"]["s"],
                jnp.zeros((), jnp.int32), eps=cfg.norm_eps,
            )
        else:
            qkv0 = qkv_lnorm_int8_stacked(
                x[:, 0], layers_all["attn_norm"], layers_all["attn_norm_b"],
                layers_all["wqkv"]["q"], layers_all["wqkv"]["s"],
                jnp.zeros((), jnp.int32), eps=cfg.norm_eps,
            )
        (x, _), (k_news, v_news) = jax.lax.scan(
            layer_step, (x, qkv0), (params["layers"], layer_idx)
        )
    else:
        x, (k_news, v_news) = jax.lax.scan(
            layer_step, x, (params["layers"], layer_idx)
        )

    return _decode_step_finish(
        params, cfg, cache, x, k_news, v_news, write_pos,
        k_all, v_all, ks_all, vs_all, quant, return_hidden,
    )


def _decode_step_finish(params, cfg, cache, x, k_news, v_news, write_pos,
                        k_all, v_all, ks_all, vs_all, quant, return_hidden):
    """Shared decode-step tail: batched KV append + final norm + head.

    ONE stacked write of the step's new k/v — [L, b, kv, 1, d]. In
    the kernel serving configs the write goes through the in-place
    Pallas appender (8-row RMW window) — XLA's dynamic_update_slice
    re-streams whole tile rows of the 283 MB cache (~0.23 ms/step at
    0.5B; see ops/cache_update).
    """
    pallas_write = cfg.decode_kernel or cfg.dense_kernel

    def _write_kv(k_arr, v_arr, k_n, v_n):
        if pallas_write:
            from vocalie_tts_tpu.ops.cache_update import cache_append_stacked

            return cache_append_stacked(k_arr, v_arr, k_n, v_n, write_pos)
        return (
            jax.lax.dynamic_update_slice(
                k_arr, k_n[:, :, :, None, :], (0, 0, 0, write_pos, 0)),
            jax.lax.dynamic_update_slice(
                v_arr, v_n[:, :, :, None, :], (0, 0, 0, write_pos, 0)),
        )

    if quant:
        k_q, k_s = _quantize_kv(k_news)
        v_q, v_s = _quantize_kv(v_news)
        if pallas_write:
            # values AND scales appended in-place by ONE pallas call —
            # XLA's 1-wide scale dynamic_update_slice pair restreams the
            # full [L, b, kv, T] arrays (~0.11 ms/step at 0.5B)
            from vocalie_tts_tpu.ops.cache_update import cache_append_stacked

            if cfg.kv_packed:
                kv_q = jnp.concatenate([k_q, v_q], axis=-1)  # [L, b, kv, 2d]
                k_w, ks_w, vs_w = cache_append_stacked(
                    k_all, None, kv_q, None, write_pos,
                    k_scale=ks_all, v_scale=vs_all, ks_new=k_s, vs_new=v_s,
                )
                v_w = None
            else:
                k_w, v_w, ks_w, vs_w = cache_append_stacked(
                    k_all, v_all, k_q, v_q, write_pos,
                    k_scale=ks_all, v_scale=vs_all, ks_new=k_s, vs_new=v_s,
                )
        else:
            k_w, v_w = _write_kv(k_all, v_all, k_q, v_q)
            ks_w = jax.lax.dynamic_update_slice(
                ks_all, k_s[:, :, :, None], (0, 0, 0, write_pos))
            vs_w = jax.lax.dynamic_update_slice(
                vs_all, v_s[:, :, :, None], (0, 0, 0, write_pos))
        new_cache = StackedKVCache(
            k=k_w,
            v=v_w,
            prompt_lengths=cache.prompt_lengths,
            n_decoded=cache.n_decoded + 1,
            prompt_pad=cache.prompt_pad,
            k_scale=ks_w,
            v_scale=vs_w,
        )
    else:
        k_w, v_w = _write_kv(
            k_all, v_all,
            k_news.astype(k_all.dtype), v_news.astype(v_all.dtype),
        )
        new_cache = StackedKVCache(
            k=k_w,
            v=v_w,
            prompt_lengths=cache.prompt_lengths,
            n_decoded=cache.n_decoded + 1,
            prompt_pad=cache.prompt_pad,
        )

    x = _norm(x, cfg, params["final_norm"], params.get("final_norm_b"))
    logits = _lm_head_logits(x[:, 0], params, cfg)
    if return_hidden:
        return logits, new_cache, x[:, 0]
    return logits, new_cache


def forward_all_logits(
    params: Params,
    cfg: TransformerConfig,
    tokens: jax.Array,
    *,
    use_flash: bool = False,
    mesh=None,
) -> jax.Array:
    """Causal forward returning logits at EVERY position (training path).

    ``use_flash=True`` runs the Pallas kernel with its custom-VJP
    Pallas backward. With a ``mesh``, the kernel runs under shard_map
    (batch on dp, heads on tp — see flash_attention_sharded), so the
    SPMD fine-tune path keeps the fused attention instead of falling
    back to XLA einsums.
    """
    from vocalie_tts_tpu.ops.flash_attention import (
        flash_attention_sharded,
        flash_attention_trainable,
        reference_attention,
    )

    b, s = tokens.shape
    x = params["tok_emb"][tokens]
    positions = jnp.arange(s)[None, :].repeat(b, axis=0)
    if cfg.pos_type == "rope":
        cos, sin = rope_angles(positions, cfg.d_head, cfg.rope_theta)
    else:
        cos = sin = None
        x = x + params["pos_emb"][jnp.arange(s)][None].astype(x.dtype)
    def attn_fn(q, k, v):
        if use_flash and mesh is not None:
            return flash_attention_sharded(q, k, v, mesh, causal=True)
        if use_flash:
            return flash_attention_trainable(q, k, v, True)
        return reference_attention(q, k, v, causal=True)

    def layer_step(x, layer):
        q, k, v = _block_qkv(layer, x, cfg, cos, sin)
        attn = attn_fn(q, k, v)
        return _block_tail(layer, x, attn, cfg), None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    x = _norm(x, cfg, params["final_norm"], params.get("final_norm_b"))
    logits = _qdot(x, params["lm_head"], preferred_element_type=jnp.float32)
    if "lm_head_b" in params:
        logits = logits + params["lm_head_b"].astype(logits.dtype)
    return logits


__all__ = [
    "fuse_decode_weights",
    "maybe_head_stack_qkv",
    "unfuse_decode_weights",
    "TransformerConfig",
    "StackedKVCache",
    "init_params",
    "param_count",
    "rms_norm",
    "rope_angles",
    "apply_rope",
    "prefill",
    "decode_step",
    "forward_all_logits",
]
