"""Native (C) host-runtime primitives with transparent fallback.

Loads ``libwavcodec.so`` (built by scripts/build-native.sh from
wavcodec.c) via ctypes; every entry point has a numpy fallback so the
framework runs without the native build. io/wavio and io/edit pick
these up automatically.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO_PATH = _DIR / "libwavcodec.so"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _int16_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def build_native(verbose: bool = False) -> bool:
    """Compile wavcodec.c → libwavcodec.so (gcc -O3). Returns success."""
    src = _DIR / "wavcodec.c"
    cmd = [
        "gcc", "-O3", "-march=native", "-shared", "-fPIC",
        str(src), "-o", str(_SO_PATH), "-lm",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=60)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if result.returncode != 0:
        if verbose:
            print(result.stderr, file=sys.stderr)
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO_PATH.exists():
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    lib.encode_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
    ]
    lib.decode_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.peak_abs.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
    lib.peak_abs.restype = ctypes.c_float
    lib.rms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
    lib.rms.restype = ctypes.c_float
    lib.active_range.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_float,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.active_range.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def encode_pcm16(audio: np.ndarray) -> np.ndarray:
    """float32 [-1,1] → int16 (clipped, rounded)."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None:
        clipped = np.clip(audio.astype(np.float64), -1.0, 1.0)
        return (clipped * 32767.0).round().astype(np.int16)
    out = np.empty(audio.shape, dtype=np.int16)
    lib.encode_pcm16(_float_ptr(audio), _int16_ptr(out), audio.size)
    return out


def decode_pcm16(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    lib = _load()
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape, dtype=np.float32)
    lib.decode_pcm16(_int16_ptr(pcm), _float_ptr(out), pcm.size)
    return out


def peak_abs(audio: np.ndarray) -> float:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None or audio.size == 0:
        return float(np.max(np.abs(audio))) if audio.size else 0.0
    return float(lib.peak_abs(_float_ptr(audio), audio.size))


def rms(audio: np.ndarray) -> float:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None or audio.size == 0:
        return float(np.sqrt(np.mean(audio.astype(np.float64) ** 2))) if audio.size else 0.0
    return float(lib.rms(_float_ptr(audio), audio.size))


def active_range(audio: np.ndarray, threshold: float) -> Tuple[int, int]:
    """(start, end) of |x| > threshold; (0, len) when all below."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None:
        mask = np.abs(audio) > threshold
        if not mask.any():
            return 0, len(audio)
        start = int(np.argmax(mask))
        end = len(audio) - int(np.argmax(mask[::-1]))
        return start, end
    start = ctypes.c_size_t()
    end = ctypes.c_size_t()
    found = lib.active_range(
        _float_ptr(audio), audio.size, threshold,
        ctypes.byref(start), ctypes.byref(end),
    )
    if not found:
        return 0, len(audio)
    return int(start.value), int(end.value)


__all__ = [
    "build_native",
    "native_available",
    "encode_pcm16",
    "decode_pcm16",
    "peak_abs",
    "rms",
    "active_range",
]
