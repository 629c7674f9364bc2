"""Minimal ONNX weight extractor (no onnx dependency).

Piper voices are published as ``.onnx`` files (BASELINE config #1
names "Piper fr_FR small VITS (ONNX)"); this environment has no onnx
wheel, so the initializers are read straight off the protobuf wire
format. Only what weight conversion needs is implemented: ModelProto
→ GraphProto → repeated TensorProto initializers with dims/data_type/
name/raw_data (plus the non-raw float/int fallbacks).

Wire-format references: ModelProto.graph = field 7,
GraphProto.initializer = field 5, TensorProto{dims=1, data_type=2,
name=8, float_data=4, int32_data=5, int64_data=7, raw_data=9}.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, Tuple

import numpy as np

# ONNX TensorProto.DataType → numpy
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
            yield field, wire, value
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims = []
    dtype_code = 1
    name = ""
    raw = b""
    float_data = []
    int32_data = []
    int64_data = []
    for field, wire, value in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(value)
        elif field == 1 and wire == 2:
            # packed repeated int64 dims
            pos = 0
            while pos < len(value):
                d, pos = _read_varint(value, pos)
                dims.append(d)
        elif field == 2 and wire == 0:
            dtype_code = value
        elif field == 4:
            if wire == 2:  # packed floats
                float_data.extend(struct.unpack(f"<{len(value) // 4}f", value))
            else:
                float_data.append(struct.unpack("<f", value)[0])
        elif field == 5 and wire == 2:
            pos = 0
            while pos < len(value):
                v, pos = _read_varint(value, pos)
                int32_data.append(v)
        elif field == 7 and wire == 2:
            pos = 0
            while pos < len(value):
                v, pos = _read_varint(value, pos)
                int64_data.append(v)
        elif field == 8 and wire == 2:
            name = value.decode("utf-8", "replace")
        elif field == 9 and wire == 2:
            raw = value
    np_dtype = _DTYPES.get(dtype_code)
    if np_dtype is None:
        raise ValueError(f"unsupported ONNX dtype {dtype_code} for {name!r}")
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=np.float32)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=np.int64)
    elif int32_data:
        arr = np.asarray(int32_data, dtype=np.int32)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def read_onnx_initializers(path: str | Path) -> Dict[str, np.ndarray]:
    """{tensor_name: array} for every initializer in the model graph."""
    data = Path(path).read_bytes()
    out: Dict[str, np.ndarray] = {}
    for field, wire, value in _fields(data):  # ModelProto
        if field == 7 and wire == 2:  # graph
            for gfield, gwire, gvalue in _fields(value):  # GraphProto
                if gfield == 5 and gwire == 2:  # initializer
                    name, arr = _parse_tensor(gvalue)
                    out[name] = arr
    return out


__all__ = ["read_onnx_initializers"]
