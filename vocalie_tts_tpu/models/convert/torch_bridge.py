"""Primitive torch→JAX tensor conversions.

Layout conventions bridged here:
- torch ``nn.Linear.weight`` is [out, in] — ours is [in, out] (x @ W);
- torch ``nn.Conv1d.weight`` is [out, in, k] — ours is [k, in, out]
  (jax NHC/HIO dimension numbers);
- torch ``nn.Embedding.weight`` is [vocab, dim] — same as ours.

``load_state_dict`` reads .pt/.pth (torch.load, CPU) and .safetensors
(via safetensors when present, else a minimal built-in parser — the
format is a JSON header + raw tensors, no torch required).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict

import numpy as np

_SAFETENSOR_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially below
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16_to_f32(raw: bytes, shape) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32).reshape(shape)


def read_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header JSON + raw little-endian data)."""
    data = Path(path).read_bytes()
    (header_len,) = struct.unpack("<Q", data[:8])
    header = json.loads(data[8 : 8 + header_len].decode("utf-8"))
    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        start, end = info["data_offsets"]
        raw = data[base + start : base + end]
        dtype_tag = info["dtype"]
        if dtype_tag == "BF16":
            out[name] = _bf16_to_f32(raw, info["shape"])
        else:
            np_dtype = _SAFETENSOR_DTYPES.get(dtype_tag)
            if np_dtype is None:
                raise ValueError(f"unsupported safetensors dtype {dtype_tag} for {name}")
            out[name] = np.frombuffer(raw, dtype=np_dtype).reshape(info["shape"])
    return out


def load_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: np.ndarray} dict."""
    path = Path(path)
    if path.suffix == ".safetensors":
        return read_safetensors(path)
    import torch  # cpu wheel is available in this image

    state = torch.load(str(path), map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if isinstance(state, dict) and wrapper in state and isinstance(state[wrapper], dict):
            state = state[wrapper]
    return {k: v.detach().to(torch.float32).numpy() for k, v in state.items()}


def convert_linear(weight: np.ndarray, bias: np.ndarray | None = None, dtype=None) -> Dict[str, Any]:
    """torch Linear [out, in] (+bias) → {"w": [in, out], "b": [out]}."""
    w = np.ascontiguousarray(weight.T)
    out = {"w": w.astype(dtype) if dtype else w}
    if bias is not None:
        out["b"] = bias.astype(dtype) if dtype else bias
    return out


def convert_embedding(weight: np.ndarray, dtype=None) -> np.ndarray:
    return weight.astype(dtype) if dtype else weight


def convert_conv1d(weight: np.ndarray, bias: np.ndarray | None, dtype=None) -> Dict[str, Any]:
    """torch Conv1d [out, in, k] → {"w": [k, in, out], "b": [out]}."""
    w = np.ascontiguousarray(np.transpose(weight, (2, 1, 0)))
    return {
        "w": w.astype(dtype) if dtype else w,
        "b": (bias if bias is not None else np.zeros(weight.shape[0], np.float32)).astype(
            dtype or np.float32
        ),
    }


def convert_conv_transpose1d(
    weight: np.ndarray, bias: np.ndarray | None, dtype=None
) -> Dict[str, Any]:
    """torch ConvTranspose1d [in, out, k] → {"w": [k, in, out], "b"}.

    Our ``conv1d_transpose`` emulates the transposed conv with
    lhs-dilated correlation, so the torch kernel is spatially flipped:
    w_ours[t, i, o] = w_torch[i, o, k-1-t] (verified to 1e-7 against
    torch in tests/test_convert.py).
    """
    w = np.ascontiguousarray(np.transpose(weight[:, :, ::-1], (2, 0, 1)))
    c_out = weight.shape[1]
    return {
        "w": w.astype(dtype) if dtype else w,
        "b": (bias if bias is not None else np.zeros(c_out, np.float32)).astype(
            dtype or np.float32
        ),
    }


def fuse_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=0): w = g * v / ||v|| (norm over dims≠0).

    HiFi-GAN-family checkpoints ship weight-normed (weight_g/weight_v
    pairs); inference wants the fused tensor.
    """
    flat = v.reshape(v.shape[0], -1)
    norm = np.linalg.norm(flat, axis=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return (g / np.maximum(norm, 1e-12)) * v


def fused_weight(state: Dict[str, np.ndarray], key: str) -> np.ndarray:
    """``state[key + '.weight']``, fusing weight-norm pairs when present."""
    if f"{key}.weight_v" in state:
        return fuse_weight_norm(state[f"{key}.weight_g"], state[f"{key}.weight_v"])
    # torch >= 2.1 parametrize-style naming
    if f"{key}.parametrizations.weight.original1" in state:
        return fuse_weight_norm(
            state[f"{key}.parametrizations.weight.original0"],
            state[f"{key}.parametrizations.weight.original1"],
        )
    return state[f"{key}.weight"]


__all__ = [
    "read_safetensors",
    "load_state_dict",
    "convert_linear",
    "convert_embedding",
    "convert_conv1d",
    "convert_conv_transpose1d",
    "fuse_weight_norm",
    "fused_weight",
]
