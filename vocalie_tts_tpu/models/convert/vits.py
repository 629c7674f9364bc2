"""VITS/Piper checkpoint → ``models.vits`` params.

Consumes a flat {name: array} dict — either a torch ``SynthesizerTrn``
state dict (.pt, weight-normed) or the initializers of a Piper voice's
.onnx export (read with convert.onnx_reader; weight norm fused at
export). The engine re-support mandate names Piper's fr_FR voices as
BASELINE config #1 (ref: SURVEY §2.4, tts_backends catalog).

Module-tree map (torch → ours):
  enc_p.emb                              emb (× sqrt(d) applied at use)
  enc_p.encoder.attn_layers.{i}.*        enc_layers[i].conv_q/k/v/o,
                                         emb_rel_k/v
  enc_p.encoder.norm_layers_1/2.{i}      norm1/norm2 (gamma/beta)
  enc_p.encoder.ffn_layers.{i}.conv_1/2  ffn1/ffn2
  enc_p.proj                             proj
  dp.pre/convs/proj[/cond]               dp.* (DDSConv: convs_sep →
                                         sep, convs_1x1 → pw)
  dp.flows.0.{m,logs}                    dp.affine
  dp.flows.{2j+1}.*                      dp.flows[j] (Flips hold no
                                         params)
  flow.flows.{2i}.{pre,post,enc.*}       flows[i] (WN weight-normed)
  dec.*                                  vocoder (HiFi-GAN converter)
  dec.cond                               voc_cond
  emb_g                                  emb_g
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    fused_weight,
)
from vocalie_tts_tpu.models.vits.model import VITSConfig


def _conv(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    w = fused_weight(state, key)  # KeyError if absent; fuses weight norm
    made = convert_conv1d(np.asarray(w), state.get(f"{key}.bias"), np.float32)
    return {"w": jnp.asarray(made["w"]), "b": jnp.asarray(made["b"])}


def _depthwise(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    w = np.asarray(fused_weight(state, key))      # [ch, 1, k]
    b = state.get(f"{key}.bias")
    return {
        "w": jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 1, 0))), jnp.float32),
        "b": jnp.asarray(
            b if b is not None else np.zeros(w.shape[0], np.float32), jnp.float32
        ),
    }


def _ln(state: Dict, key: str) -> Dict:
    import jax.numpy as jnp

    return {
        "g": jnp.asarray(np.asarray(state[f"{key}.gamma"]).reshape(-1), jnp.float32),
        "b": jnp.asarray(np.asarray(state[f"{key}.beta"]).reshape(-1), jnp.float32),
    }


def _dds(state: Dict, base: str, n_layers: int = 3) -> Dict:
    return {
        "layers": [
            {
                "sep": _depthwise(state, f"{base}.convs_sep.{i}"),
                "norm1": _ln(state, f"{base}.norms_1.{i}"),
                "pw": _conv(state, f"{base}.convs_1x1.{i}"),
                "norm2": _ln(state, f"{base}.norms_2.{i}"),
            }
            for i in range(n_layers)
        ]
    }


def convert_vits_checkpoint(
    state: Dict[str, np.ndarray], cfg: VITSConfig, *, prefix: str = ""
) -> Dict:
    """Build ``models.vits`` params from a SynthesizerTrn layout.

    Fails loud: KeyError for the first missing tensor, ValueError on
    shape drift against ``cfg``.
    """
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator

    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}

    emb = np.asarray(state["enc_p.emb.weight"])
    # published voices define their own phoneme-id space (espeak
    # phoneme_id_map, hundreds of ids) — take n_phones from the
    # checkpoint instead of gating on the in-repo inventory size; only
    # d_model (a real geometry mismatch) still fails loud
    if emb.ndim != 2 or emb.shape[1] != cfg.d_model:
        raise ValueError(
            f"enc_p.emb is {emb.shape}, config expects (*, {cfg.d_model})"
        )
    if emb.shape[0] != cfg.n_phones:
        import dataclasses

        cfg = dataclasses.replace(cfg, n_phones=int(emb.shape[0]))

    params: Dict = {
        "emb": jnp.asarray(emb, jnp.float32),
        "enc_layers": [],
        "proj": _conv(state, "enc_p.proj"),
        "vocoder": convert_hifigan_generator(state, cfg.vocoder, prefix="dec."),
    }
    for i in range(cfg.n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        params["enc_layers"].append({
            "conv_q": _conv(state, f"{a}.conv_q"),
            "conv_k": _conv(state, f"{a}.conv_k"),
            "conv_v": _conv(state, f"{a}.conv_v"),
            "conv_o": _conv(state, f"{a}.conv_o"),
            "emb_rel_k": jnp.asarray(np.asarray(state[f"{a}.emb_rel_k"]), jnp.float32),
            "emb_rel_v": jnp.asarray(np.asarray(state[f"{a}.emb_rel_v"]), jnp.float32),
            "norm1": _ln(state, f"enc_p.encoder.norm_layers_1.{i}"),
            "ffn1": _conv(state, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
            "ffn2": _conv(state, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
            "norm2": _ln(state, f"enc_p.encoder.norm_layers_2.{i}"),
        })

    dp: Dict = {
        "pre": _conv(state, "dp.pre"),
        "convs": _dds(state, "dp.convs"),
        "proj": _conv(state, "dp.proj"),
        "affine": {
            "m": jnp.asarray(np.asarray(state["dp.flows.0.m"]).reshape(-1), jnp.float32),
            "logs": jnp.asarray(
                np.asarray(state["dp.flows.0.logs"]).reshape(-1), jnp.float32
            ),
        },
        "flows": [],
    }
    if "dp.cond.weight" in state:
        dp["cond"] = _conv(state, "dp.cond")
    for j in range(cfg.dp_flows):
        base = f"dp.flows.{2 * j + 1}"     # Flips carry no params
        dp["flows"].append({
            "pre": _conv(state, f"{base}.pre"),
            "convs": _dds(state, f"{base}.convs"),
            "proj": _conv(state, f"{base}.proj"),
        })
    params["dp"] = dp

    params["flows"] = []
    for i in range(cfg.n_flows):
        base = f"flow.flows.{2 * i}"       # Flips carry no params
        enc: Dict = {
            "in_layers": [
                _conv(state, f"{base}.enc.in_layers.{l}")
                for l in range(cfg.flow_wn_layers)
            ],
            "res_skip_layers": [
                _conv(state, f"{base}.enc.res_skip_layers.{l}")
                for l in range(cfg.flow_wn_layers)
            ],
        }
        if any(k.startswith(f"{base}.enc.cond_layer") for k in state):
            enc["cond_layer"] = _conv(state, f"{base}.enc.cond_layer")
        params["flows"].append({
            "pre": _conv(state, f"{base}.pre"),
            "enc": enc,
            "post": _conv(state, f"{base}.post"),
        })

    if "emb_g.weight" in state:
        params["emb_g"] = jnp.asarray(np.asarray(state["emb_g.weight"]), jnp.float32)
        params["voc_cond"] = _conv(state, "dec.cond")
    return params


__all__ = ["convert_vits_checkpoint"]
