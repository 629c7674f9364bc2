"""HiFi-GAN generator checkpoint → ``models.common.vocoder`` params.

Every waveform decoder the reference's engines ship is a HiFi-GAN-V1-
family generator (ref: chatterbox_impl.py:63 base-model load brings the
S3Gen vocoder; cosyvoice_runner.py:67-76; the XTTS and Piper decoders):
``conv_pre`` → ``ups.{i}`` (ConvTranspose1d) → MRF resblocks
(``resblocks.{i*K+j}.convs1/.convs2``) → ``conv_post``. This module
maps that torch layout (weight-normed or fused) onto the JAX vocoder's
pytree, flipping/transposing kernels per the NHC/HIO conventions in
``convert.torch_bridge``.

Checkpoints may prefix the generator (e.g. ``generator.``, ``hift.``);
pass ``prefix`` accordingly. Upsample strides are not stored in torch
weights — they come from the VocoderConfig (the HiFi-GAN convention is
stride = kernel // 2, which ``infer_vocoder_config`` assumes).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vocalie_tts_tpu.models.common.vocoder import VocoderConfig
from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_conv_transpose1d,
    fused_weight,
)


def _keys_under(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return state
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def infer_vocoder_config(
    state: Dict[str, np.ndarray], *, prefix: str = "", dtype=None
) -> VocoderConfig:
    """Derive the generator topology from checkpoint tensor shapes."""
    import jax.numpy as jnp

    sd = _keys_under(state, prefix)
    pre_w = fused_weight(sd, "conv_pre")
    n_mels, base_channels = pre_w.shape[1], pre_w.shape[0]

    n_up = 0
    while any(k.startswith(f"ups.{n_up}.") for k in sd):
        n_up += 1
    if n_up == 0:
        raise KeyError("no ups.{i} tensors found — not a HiFi-GAN generator")
    up_kernels = tuple(fused_weight(sd, f"ups.{i}").shape[2] for i in range(n_up))

    n_res_total = 0
    while any(k.startswith(f"resblocks.{n_res_total}.") for k in sd):
        n_res_total += 1
    n_kernels = n_res_total // n_up
    res_kernels, res_dilations = [], []
    for j in range(n_kernels):
        n_convs = 0
        while f"resblocks.{j}.convs1.{n_convs}.weight" in sd or any(
            k.startswith(f"resblocks.{j}.convs1.{n_convs}.") for k in sd
        ):
            n_convs += 1
        res_kernels.append(fused_weight(sd, f"resblocks.{j}.convs1.0").shape[2])
        # dilations are not recoverable from shapes; HiFi-GAN V1 uses
        # (1, 3, 5) per kernel — pad/trim to the conv count found
        res_dilations.append(tuple((1, 3, 5)[:n_convs]) or (1,))

    return VocoderConfig(
        n_mels=n_mels,
        base_channels=base_channels,
        upsample_rates=tuple(k // 2 for k in up_kernels),
        upsample_kernels=up_kernels,
        resblock_kernels=tuple(res_kernels),
        resblock_dilations=tuple(res_dilations),
        dtype=dtype or jnp.float32,
    )


def convert_hifigan_generator(
    state: Dict[str, np.ndarray],
    cfg: VocoderConfig,
    *,
    prefix: str = "",
    dtype=None,
) -> Dict:
    """Build ``apply_vocoder``-ready params from a generator state dict.

    Raises KeyError naming the first missing tensor and ValueError on
    shape mismatches — fail loud, never silently skip a weight.
    """
    import jax.numpy as jnp

    sd = _keys_under(state, prefix)
    np_dtype = np.float32 if dtype is None else dtype

    def conv(key: str, transpose: bool = False) -> Dict:
        w = fused_weight(sd, key)  # KeyError if absent
        b = sd.get(f"{key}.bias")
        made = (convert_conv_transpose1d if transpose else convert_conv1d)(
            w, b, np_dtype
        )
        return {"w": jnp.asarray(made["w"]), "b": jnp.asarray(made["b"])}

    def expect(p: Dict, want_shape, name: str) -> Dict:
        if tuple(p["w"].shape) != tuple(want_shape):
            raise ValueError(
                f"{name}: kernel shape {tuple(p['w'].shape)}, expected {tuple(want_shape)}"
            )
        return p

    n_kernels = len(cfg.resblock_kernels)
    params: Dict = {
        "pre": expect(conv("conv_pre"), (7, cfg.n_mels, cfg.base_channels), "conv_pre"),
        "ups": [],
        "resblocks": [],
    }
    ch = cfg.base_channels
    for i, (rate, kern) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        ch_out = ch // 2
        params["ups"].append(
            expect(conv(f"ups.{i}", transpose=True), (kern, ch, ch_out), f"ups.{i}")
        )
        stage = []
        for j, (rk, dil) in enumerate(
            zip(cfg.resblock_kernels, cfg.resblock_dilations)
        ):
            flat = i * n_kernels + j
            stage.append(
                {
                    "convs1": [
                        expect(
                            conv(f"resblocks.{flat}.convs1.{m}"),
                            (rk, ch_out, ch_out),
                            f"resblocks.{flat}.convs1.{m}",
                        )
                        for m in range(len(dil))
                    ],
                    "convs2": [
                        expect(
                            conv(f"resblocks.{flat}.convs2.{m}"),
                            (rk, ch_out, ch_out),
                            f"resblocks.{flat}.convs2.{m}",
                        )
                        for m in range(len(dil))
                    ],
                }
            )
        params["resblocks"].append(stage)
        ch = ch_out
    params["post"] = expect(conv("conv_post"), (7, ch, 1), "conv_post")
    return params


__all__ = ["convert_hifigan_generator", "infer_vocoder_config"]
