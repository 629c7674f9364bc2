"""Torch→JAX conversion bridge tests (round-trip through real torch)."""

import numpy as np
import pytest

from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_conv1d,
    convert_linear,
    load_state_dict,
    read_safetensors,
)

pytestmark = pytest.mark.unit


def test_linear_conversion_matches_torch():
    import torch

    lin = torch.nn.Linear(8, 16)
    x = torch.randn(3, 8)
    want = lin(x).detach().numpy()
    params = convert_linear(lin.weight.detach().numpy(), lin.bias.detach().numpy())
    got = x.numpy() @ params["w"] + params["b"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_conversion_matches_torch():
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.common.convnets import conv1d

    conv = torch.nn.Conv1d(4, 6, kernel_size=3, padding=1)
    x = torch.randn(2, 4, 20)  # NCT
    want = conv(x).detach().numpy().transpose(0, 2, 1)  # → NTC
    params = convert_conv1d(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    params = {"w": jnp.asarray(params["w"]), "b": jnp.asarray(params["b"])}
    got = np.asarray(conv1d(params, jnp.asarray(x.numpy().transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_state_dict_loading_pt(tmp_path):
    import torch

    model = torch.nn.Linear(4, 4)
    path = tmp_path / "ckpt.pt"
    torch.save(model.state_dict(), path)
    state = load_state_dict(path)
    assert set(state) == {"weight", "bias"}
    assert state["weight"].shape == (4, 4)


def test_safetensors_reader_roundtrip(tmp_path):
    # write a safetensors file by hand (json header + raw data)
    import json, struct

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.ones(3, dtype=np.float32)
    tensors = {"w": w, "b": b}
    header = {}
    blobs = b""
    for name, arr in tensors.items():
        start = len(blobs)
        blobs += arr.tobytes()
        header[name] = {
            "dtype": "F32",
            "shape": list(arr.shape),
            "data_offsets": [start, len(blobs)],
        }
    hjson = json.dumps(header).encode()
    path = tmp_path / "x.safetensors"
    path.write_bytes(struct.pack("<Q", len(hjson)) + hjson + blobs)

    out = read_safetensors(path)
    np.testing.assert_array_equal(out["w"], w)
    np.testing.assert_array_equal(out["b"], b)


def test_onnx_initializer_reader(tmp_path):
    """Hand-built ONNX wire-format file round-trips through the reader."""
    import struct

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def ld(field, payload):  # length-delimited field
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def vi(field, value):  # varint field
        return varint((field << 3) | 0) + varint(value)

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    tensor = (
        vi(1, 2) + vi(1, 3)                 # dims
        + vi(2, 1)                          # data_type = FLOAT
        + ld(8, b"enc.weight")              # name
        + ld(9, w.tobytes())                # raw_data
    )
    b = np.array([7], dtype=np.int64)
    tensor2 = (
        vi(1, 1) + vi(2, 7) + ld(8, b"steps") + ld(9, b.tobytes())
    )
    graph = ld(5, tensor) + ld(5, tensor2)
    model = ld(7, graph)
    path = tmp_path / "m.onnx"
    path.write_bytes(model)

    from vocalie_tts_tpu.models.convert.onnx_reader import read_onnx_initializers

    tensors = read_onnx_initializers(path)
    np.testing.assert_array_equal(tensors["enc.weight"], w)
    np.testing.assert_array_equal(tensors["steps"], b)
