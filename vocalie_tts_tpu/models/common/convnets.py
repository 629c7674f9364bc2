"""1-D convolution building blocks (functional, pytree params).

Layout convention: activations are [batch, time, channels] — channels
last lands on the TPU lane dimension, so pointwise convs become MXU
matmuls and XLA fuses the elementwise tails.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_DN = ("NHC", "HIO", "NHC")  # batch-time-channels / time-in-out


def conv1d_init(key, kernel: int, c_in: int, c_out: int, dtype=jnp.float32) -> Params:
    scale = 1.0 / math.sqrt(kernel * c_in)
    w = jax.random.uniform(key, (kernel, c_in, c_out), jnp.float32, -scale, scale)
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def conv1d(
    params: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str | Tuple[int, int] = "SAME",
) -> jax.Array:
    if isinstance(padding, tuple):
        pad = [padding]
    else:
        pad = padding
    out = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    return out + params["b"].astype(x.dtype)


def conv1d_transpose(
    params: Params,
    x: jax.Array,
    *,
    stride: int,
) -> jax.Array:
    """Fractionally-strided conv used for upsampling (HiFi-GAN style).

    Emulates torch ConvTranspose1d(k, s, padding=(k-s)//2) output
    length = T*s via lhs dilation + crop.
    """
    kernel = params["w"].shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel - 1, kernel - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    # crop to exactly T*stride, centered like torch's padding=(k-s)//2
    t_out = x.shape[1] * stride
    start = (out.shape[1] - t_out) // 2
    out = jax.lax.dynamic_slice_in_dim(out, start, t_out, axis=1)
    return out + params["b"].astype(x.dtype)


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


# ── HiFi-GAN-style residual block (multi-receptive-field) ───────────────


def resblock_init(
    key, channels: int, kernel: int, dilations: Sequence[int], dtype=jnp.float32
) -> Params:
    # NB: dilations are static config, passed to resblock_apply — they
    # must NOT live in the params pytree (jit would trace them).
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [
            conv1d_init(keys[2 * i], kernel, channels, channels, dtype)
            for i in range(len(dilations))
        ],
        "convs2": [
            conv1d_init(keys[2 * i + 1], kernel, channels, channels, dtype)
            for i in range(len(dilations))
        ],
    }


def resblock_apply(params: Params, x: jax.Array, dilations: Sequence[int]) -> jax.Array:
    for c1, c2, dil in zip(params["convs1"], params["convs2"], dilations):
        h = conv1d(c1, leaky_relu(x), dilation=int(dil))
        h = conv1d(c2, leaky_relu(h), dilation=1)
        x = x + h
    return x


# ── simple stacks ───────────────────────────────────────────────────────


def conv_stack_init(
    key,
    c_in: int,
    channels: Sequence[int],
    kernels: Sequence[int],
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, len(channels))
    layers = []
    prev = c_in
    for k, ch, kern in zip(keys, channels, kernels):
        layers.append(conv1d_init(k, kern, prev, ch, dtype))
        prev = ch
    return {"layers": layers}


def conv_stack_apply(params: Params, x: jax.Array, *, activation=leaky_relu) -> jax.Array:
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = conv1d(layer, x)
        if i < n - 1:
            x = activation(x)
    return x


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)


__all__ = [
    "conv1d_init",
    "conv1d",
    "conv1d_transpose",
    "leaky_relu",
    "resblock_init",
    "resblock_apply",
    "conv_stack_init",
    "conv_stack_apply",
    "layer_norm",
]
