"""Qwen3-TTS 12.5 Hz codec-decoder checkpoint → ``models.lmtts`` params.

Closes the last per-stage converter delta (docs/PARITY.md qwen3 row:
"codec decoder is ours — the 12.5 Hz codec's decoder weights ship
separately upstream"). The stage topology this converter accepts is
the framework's codec decoder (models/lmtts/model.py
``init_codec_decoder``/``tokens_to_mel``): token embedding → two
transposed convs (×4, ×2 — 12.5 Hz → 100 fps) → mel head; the
waveform HiFi-GAN converts separately via ``--stage vocoder`` like
every other family.

Torch layout (weight-normed or fused, optional prefix):

    {p}tok_emb.weight   [CODEC_VOCAB + 2, ch]   (nn.Embedding)
    {p}up1.{weight,bias}    ConvTranspose1d(ch, ch, 8, stride 4, pad 2)
    {p}up2.{weight,bias}    ConvTranspose1d(ch, ch, 4, stride 2, pad 1)
    {p}mel_out.{weight,bias} Conv1d(ch, n_mels, 5, pad 2)

Fails loud on the first missing/mis-shaped tensor. Parity vs a torch
replica of the same graph is pinned in tests/test_convert_codec.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_conv_transpose1d,
    fused_weight,
)


def _bias(state: Dict[str, np.ndarray], key: str):
    b = state.get(f"{key}.bias")
    return np.asarray(b) if b is not None else None


def convert_codec_decoder(
    state: Dict[str, np.ndarray],
    cfg,
    *,
    prefix: str = "",
) -> Dict:
    """Codec-decoder tensors → the lmtts stage-2 bundle's
    {tok_emb, up1, up2, mel_out} keys (vocoder/speaker keys untouched —
    graft with ``import_codec_decoder_checkpoint``)."""
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.lmtts.model import CODEC_VOCAB

    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    if "tok_emb.weight" not in state:
        raise KeyError("checkpoint is missing tensor 'tok_emb.weight'")

    emb = np.asarray(state["tok_emb.weight"])
    if emb.ndim != 2 or emb.shape[0] != CODEC_VOCAB + 2:
        raise ValueError(
            f"tok_emb.weight has shape {emb.shape}; the 12.5 Hz codec "
            f"decoder embeds CODEC_VOCAB + 2 = {CODEC_VOCAB + 2} rows"
        )
    ch = emb.shape[1]

    def expect(arr, shape, name):
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: shape {arr.shape}, expected {tuple(shape)}")
        return arr

    up1_w = expect(fused_weight(state, "up1"), (ch, ch, 8), "up1.weight")
    up2_w = expect(fused_weight(state, "up2"), (ch, ch, 4), "up2.weight")
    mel_w = fused_weight(state, "mel_out")
    if mel_w.ndim != 3 or mel_w.shape[1:] != (ch, 5):
        raise ValueError(
            f"mel_out.weight: shape {mel_w.shape}, expected (n_mels, {ch}, 5)"
        )
    if mel_w.shape[0] != cfg.n_mels:
        raise ValueError(
            f"mel_out.weight emits {mel_w.shape[0]} mel bins; the family "
            f"config expects {cfg.n_mels}"
        )

    return {
        "tok_emb": jnp.asarray(emb, jnp.float32),
        "up1": {k: jnp.asarray(v) for k, v in
                convert_conv_transpose1d(up1_w, _bias(state, "up1")).items()},
        "up2": {k: jnp.asarray(v) for k, v in
                convert_conv_transpose1d(up2_w, _bias(state, "up2")).items()},
        "mel_out": {k: jnp.asarray(v) for k, v in
                    convert_conv1d(mel_w, _bias(state, "mel_out")).items()},
    }


__all__ = ["convert_codec_decoder"]
