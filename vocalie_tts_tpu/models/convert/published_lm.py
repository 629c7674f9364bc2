"""Published LM-TTS checkpoint layouts → split [text_emb ‖ core LM] params.

Three published layouts feed the three LM families (ref:
chatterbox_impl.py:63-73, cosyvoice_runner.py:67-76,
qwen3_runner.py:70-93):

- **Chatterbox T3** (``t3_cfg.safetensors``): separate
  ``text_emb``/``speech_emb`` embedding tables + ``speech_head`` over a
  Llama backbone (``tfmr.*``); text reaches the LM only through
  inputs_embeds — exactly this framework's serving layout, so the
  import is 1:1 (``convert_t3_state``).
- **CosyVoice LM** (``llm.pt``): Qwen2 backbone under
  ``llm.model.model.*`` whose ``embed_tokens`` is the text table, plus
  ``speech_embedding`` / ``llm_decoder`` (speech head) /
  ``llm_embedding`` ([sos_eos, task] rows) (``convert_cosyvoice_lm_state``).
- **Qwen-style mixed table** (Qwen3-TTS): ONE ``embed_tokens``/
  ``lm_head`` covering [text ‖ codec ‖ control]; the converter splits it
  at ``rows − core_vocab`` (``split_mixed_decoder_state``).

Every converter fails loud on the first missing or mis-shaped tensor.
The speech/codec table's row count defines the imported core
vocabulary: rows = speech_vocab + 2, assuming the published trailing
control rows map onto this framework's [speech…, BOS, EOS] core order
(recorded as ``speech_vocab`` in the report/meta so the runtime
rebuilds its config, decode kernels, logit bias and token→wav stage at
the checkpoint's size — e.g. the 6561-code FSQ space).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from vocalie_tts_tpu.models.common.transformer import TransformerConfig
from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state


def _get(state, name: str) -> np.ndarray:
    if name not in state:
        raise KeyError(f"checkpoint is missing tensor {name!r}")
    return np.asarray(state[name])


def _expect(arr: np.ndarray, shape, name: str) -> np.ndarray:
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(f"{name}: shape {arr.shape}, expected {tuple(shape)}")
    return arr


def detect_t3_prefix(state, prefix: Optional[str] = None) -> Optional[str]:
    """The T3-layout key prefix ("t3." in full-model bundles, "" in the
    bare fine-tune overlay), or None when the state is not T3-shaped."""
    for p in ([prefix] if prefix is not None else ["t3.", ""]):
        if f"{p}text_emb.weight" in state and f"{p}speech_emb.weight" in state:
            return p
    return None


def convert_t3_state(
    state: Dict[str, np.ndarray],
    core_cfg: TransformerConfig,
    *,
    prefix: str = "t3.",
    dtype=None,
) -> Tuple[Dict, Dict]:
    """T3 layout → ({"lm", "text_emb"[, "spk_cond"]}, report).

    ``core_cfg`` is the family's speech-only LM config template; the
    published ``speech_emb``/``speech_head`` row count DEFINES the
    imported core vocab (rows − 2 = speech_vocab, trailing rows = the
    BOS/EOS control slots). ``text_emb`` rows become the returned
    text_vocab (the published tokenizer's id space). ``text_head`` is
    a training-only output head — not served, deliberately dropped."""
    import dataclasses

    import jax.numpy as jnp

    dtype = dtype or core_cfg.dtype
    d = core_cfg.d_model

    speech_emb = _get(state, f"{prefix}speech_emb.weight")
    if speech_emb.ndim != 2 or speech_emb.shape[1] != d or speech_emb.shape[0] < 3:
        raise ValueError(
            f"{prefix}speech_emb.weight: shape {speech_emb.shape}, expected "
            f"(speech_vocab + 2, {d})"
        )
    V = int(speech_emb.shape[0])
    core_cfg = dataclasses.replace(core_cfg, vocab_size=V)
    speech_head = _expect(
        _get(state, f"{prefix}speech_head.weight"), (V, d),
        f"{prefix}speech_head.weight",
    )
    text_emb = _get(state, f"{prefix}text_emb.weight")
    if text_emb.ndim != 2 or text_emb.shape[1] != d:
        raise ValueError(
            f"{prefix}text_emb.weight: shape {text_emb.shape}, expected (*, {d})"
        )

    lm = convert_hf_decoder_state(
        state, core_cfg, prefix=f"{prefix}tfmr.", dtype=dtype, embeddings=False
    )
    lm["tok_emb"] = jnp.asarray(speech_emb, dtype)
    lm["lm_head"] = jnp.asarray(speech_head.T, dtype)
    if f"{prefix}speech_head.bias" in state:
        lm["lm_head_b"] = jnp.asarray(
            _expect(_get(state, f"{prefix}speech_head.bias"), (V,),
                    f"{prefix}speech_head.bias"),
            jnp.float32,
        )

    out = {"lm": lm, "text_emb": jnp.asarray(text_emb, dtype)}
    report = {"text_vocab": int(text_emb.shape[0]),
              "speech_vocab": V - 2,
              "head_bias": f"{prefix}speech_head.bias" in state}
    # T3 conditioning: the voice-encoder projection when present
    spkr = state.get(f"{prefix}cond_enc.spkr_enc.weight")
    if spkr is not None:
        spkr = np.asarray(spkr)
        if spkr.ndim == 2 and spkr.shape[0] == d:
            out["spk_cond"] = jnp.asarray(spkr.T, dtype)  # torch [out, in]
            report["spk_cond"] = True
    return out, report


def detect_cosyvoice_prefix(state, prefix: Optional[str] = None) -> Optional[str]:
    """The CosyVoice-LM key prefix ("" in llm.pt, "llm." in full
    bundles), or None when the state is not CosyVoice-LM-shaped."""
    for p in ([prefix] if prefix is not None else ["", "llm."]):
        if (f"{p}speech_embedding.weight" in state
                and f"{p}llm_decoder.weight" in state):
            return p
    return None


def convert_cosyvoice_lm_state(
    state: Dict[str, np.ndarray],
    core_cfg: TransformerConfig,
    *,
    prefix: str = "",
    dtype=None,
) -> Tuple[Dict, Dict]:
    """CosyVoice LM layout → ({"lm", "text_emb"}, report).

    Tables: ``{p}llm.model.model.embed_tokens`` (Qwen2 text) →
    text_emb; ``{p}speech_embedding`` → core tok_emb;
    ``{p}llm_decoder`` → core lm_head (+bias); ``{p}llm_embedding``
    rows [sos_eos, task] → the BOS/EOS embedding slots (the task token
    plays the published prompt's decode-start role — our BOS; sos_eos
    fills the otherwise-never-embedded EOS row)."""
    import dataclasses

    import jax.numpy as jnp

    dtype = dtype or core_cfg.dtype
    d = core_cfg.d_model

    speech_emb = _get(state, f"{prefix}speech_embedding.weight")
    if speech_emb.ndim != 2 or speech_emb.shape[1] != d or speech_emb.shape[0] < 3:
        raise ValueError(
            f"{prefix}speech_embedding.weight: shape {speech_emb.shape}, "
            f"expected (speech_vocab + 2, {d})"
        )
    V = int(speech_emb.shape[0])
    core_cfg = dataclasses.replace(core_cfg, vocab_size=V)
    head = _expect(
        _get(state, f"{prefix}llm_decoder.weight"), (V, d),
        f"{prefix}llm_decoder.weight",
    )
    backbone = f"{prefix}llm.model.model."
    text_emb = _get(state, f"{backbone}embed_tokens.weight")
    if text_emb.ndim != 2 or text_emb.shape[1] != d:
        raise ValueError(
            f"{backbone}embed_tokens.weight: shape {text_emb.shape}, "
            f"expected (*, {d})"
        )

    lm = convert_hf_decoder_state(
        state, core_cfg, prefix=backbone, dtype=dtype, embeddings=False
    )
    tok_emb = np.array(speech_emb)
    if f"{prefix}llm_embedding.weight" in state:
        spec = _expect(_get(state, f"{prefix}llm_embedding.weight"), (2, d),
                       f"{prefix}llm_embedding.weight")
        tok_emb[V - 2] = spec[1]  # task token → BOS (decode-start) slot
        tok_emb[V - 1] = spec[0]  # sos_eos → EOS slot (never embedded)
    lm["tok_emb"] = jnp.asarray(tok_emb, dtype)
    lm["lm_head"] = jnp.asarray(head.T, dtype)
    report = {"text_vocab": int(text_emb.shape[0]),
              "speech_vocab": V - 2, "head_bias": False}
    if f"{prefix}llm_decoder.bias" in state:
        lm["lm_head_b"] = jnp.asarray(
            _expect(_get(state, f"{prefix}llm_decoder.bias"), (V,),
                    f"{prefix}llm_decoder.bias"),
            jnp.float32,
        )
        report["head_bias"] = True
    return {"lm": lm, "text_emb": jnp.asarray(text_emb, dtype)}, report


def split_mixed_decoder_state(
    state: Dict[str, np.ndarray],
    core_cfg: TransformerConfig,
    *,
    prefix: str = "model.",
    dtype=None,
) -> Tuple[Dict, Dict]:
    """Qwen-style mixed [text ‖ codec ‖ control] table → split params.

    ``embed_tokens`` rows R must exceed the core vocab V; text_vocab =
    R − V, text rows [0, R−V) → text_emb, the trailing V rows → core
    tok_emb (codec + BOS + EOS, the convention our codec logit space
    uses); lm_head columns split identically."""
    import dataclasses

    import jax.numpy as jnp

    dtype = dtype or core_cfg.dtype
    V = core_cfg.vocab_size
    rows = _get(state, f"{prefix}embed_tokens.weight").shape[0]
    if rows <= V:
        raise ValueError(
            f"{prefix}embed_tokens.weight has {rows} rows; a mixed "
            f"[text ‖ codec] table must exceed the {V}-row core vocabulary"
        )
    full_cfg = dataclasses.replace(core_cfg, vocab_size=rows)
    full = convert_hf_decoder_state(state, full_cfg, prefix=prefix, dtype=dtype)
    tv = rows - V
    text_emb = full["tok_emb"][:tv]
    lm = dict(full)
    lm["tok_emb"] = full["tok_emb"][tv:]
    lm["lm_head"] = full["lm_head"][:, tv:]
    return {"lm": lm, "text_emb": jnp.asarray(text_emb, dtype)}, {"text_vocab": int(tv)}


__all__ = [
    "convert_t3_state",
    "convert_cosyvoice_lm_state",
    "split_mixed_decoder_state",
    "detect_t3_prefix",
    "detect_cosyvoice_prefix",
]
