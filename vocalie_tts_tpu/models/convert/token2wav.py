"""Full token→wav stage conversion (flow + HiFT) from published bundles.

Covers the two artifact layouts the published models ship in:

- **Chatterbox S3Gen** (ref: tts_backends/chatterbox_impl.py:63-73):
  one state dict with the flow under ``flow.*`` and the HiFT generator
  under ``mel2wav.*``.
- **CosyVoice** (ref: tts_backends/cosyvoice_runner.py:67-76): separate
  ``flow.pt`` (keys unprefixed or under ``flow.``) and ``hift.pt``.

Flow sub-keys mapped: ``input_embedding`` (token codebook),
``spk_embed_affine_layer`` (x-vector → mel dims), ``encoder.*``
(upsample conformer), ``encoder_proj``, ``decoder.estimator.*``
(CFM U-Net). Shapes/geometry are inferred from the weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from vocalie_tts_tpu.models.common.token2wav import TokenToWavConfig
from vocalie_tts_tpu.models.convert.cfm import convert_cfm_estimator
from vocalie_tts_tpu.models.convert.conformer import convert_conformer_encoder
from vocalie_tts_tpu.models.convert.hift import convert_hift
from vocalie_tts_tpu.models.convert.torch_bridge import convert_linear

Params = Dict[str, Any]


def _strip(state: Dict, prefix: str) -> Dict:
    if not prefix:
        return dict(state)
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def convert_token2wav(
    state: Dict[str, np.ndarray],
    *,
    flow_prefix: str = "flow.",
    hift_state: Optional[Dict[str, np.ndarray]] = None,
    hift_prefix: str = "mel2wav.",
    base: TokenToWavConfig | None = None,
) -> tuple[Params, TokenToWavConfig]:
    """Convert flow(+hift) state dicts; returns (params, inferred cfg).

    ``hift_state`` defaults to ``state`` (single-bundle layout). Pass
    ``flow_prefix=""``/``hift_prefix=""`` for unprefixed dumps.
    """
    base = base or TokenToWavConfig()
    flow = _strip(state, flow_prefix)
    if not flow:
        raise ValueError(f"no keys under flow prefix {flow_prefix!r}")
    hift_src = hift_state if hift_state is not None else state
    hift = _strip(hift_src, hift_prefix)
    if not any(k.startswith("conv_pre") for k in hift):
        raise ValueError(f"no HiFT generator under prefix {hift_prefix!r}")

    enc_params, enc_cfg = convert_conformer_encoder(
        flow, prefix="encoder.", base=base.encoder
    )
    dec_params, dec_cfg = convert_cfm_estimator(
        flow, base.decoder, prefix="decoder.estimator."
    )
    hift_params, hift_cfg = convert_hift(hift, base.hift)

    emb = np.asarray(flow["input_embedding.weight"], np.float32)
    spk_affine = convert_linear(
        flow["spk_embed_affine_layer.weight"], flow.get("spk_embed_affine_layer.bias")
    )
    proj = convert_linear(flow["encoder_proj.weight"], flow.get("encoder_proj.bias"))

    cfg = TokenToWavConfig(
        speech_vocab=emb.shape[0],
        spk_dim=flow["spk_embed_affine_layer.weight"].shape[1],
        n_mels=dec_cfg.out_channels,
        encoder=enc_cfg,
        decoder=dec_cfg,
        hift=hift_cfg,
    )
    params: Params = {
        "input_embedding": emb,
        "spk_embed_affine": spk_affine,
        "encoder": enc_params,
        "encoder_proj": proj,
        "estimator": dec_params,
        "hift": hift_params,
    }
    return params, cfg


__all__ = ["convert_token2wav"]
