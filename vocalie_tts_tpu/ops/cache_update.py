"""In-place decode-step KV-cache append as a Pallas kernel.

The decode step ends with XLA ``dynamic_update_slice`` ops writing the
step's new k/v (+ int8 scales) into the stacked cache at ``write_pos``.
Profiling the shipping config (b=16, T=576, 0.5B) shows XLA spends
~0.33 ms/step there — the 1-wide T slice lands mid-tile in the
(32, 128)-tiled int8 arrays and XLA's lowering re-streams whole tile
rows of the 283 MB cache instead of touching just the slice.

This kernel updates in place via ``input_output_aliases``: the cache
aliases itself, and only the 8-position-aligned T window containing
``pos`` is DMA'd in, row-overwritten (masked select — Mosaic only
allows statically 8-aligned sublane stores), and DMA'd back: a
[b, kv, 8, d]-per-layer RMW of ~4 MB total instead of XLA's ~95 MB
restream. Measured 57 µs/step vs 232 for the XLA pair at 0.5B. The
dynamic position arrives through scalar prefetch so it can steer the
block index_map.

Supports the packed lane-interleaved cache (one k|v array, ``v_all``
None — TransformerConfig.kv_packed) and the split k/v pair.

Scales (the [L, b, kv, T] bf16 arrays of the int8 cache) ride the SAME
grid: their T axis is the lane dim, where sub-128 windows can't be
blocked, so each program RMWs the full-T scale row of its layer with a
lane-iota masked select (~300 KB/layer — the DMA overlaps the value
windows' compute, vs ~0.11 ms/step for XLA's full-array restream of
the 1-wide dynamic_update_slice pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_one(p_ref, blk_ref, new_ref, out_ref):
    r = p_ref[0] % 8
    shape = blk_ref.shape  # (1, b, kv, 8, d)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    out_ref[...] = jnp.where(
        rows == r, jnp.broadcast_to(new_ref[...], shape), blk_ref[...]
    )


def _write_scale_one(p_ref, s_ref, new_ref, out_ref):
    pos = p_ref[0]
    shape = s_ref.shape  # (1, b, kv, T) — full T extent (lane dim)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    out_ref[...] = jnp.where(
        lanes == pos, jnp.broadcast_to(new_ref[...], shape), s_ref[...]
    )


def _write_kv_kernel(p_ref, k_ref, v_ref, kn_ref, vn_ref, ok_ref, ov_ref):
    _write_one(p_ref, k_ref, kn_ref, ok_ref)
    _write_one(p_ref, v_ref, vn_ref, ov_ref)


def _write_k_kernel(p_ref, k_ref, kn_ref, ok_ref):
    _write_one(p_ref, k_ref, kn_ref, ok_ref)


def _write_k_scales_kernel(p_ref, k_ref, ks_ref, vs_ref, kn_ref, ksn_ref,
                           vsn_ref, ok_ref, oks_ref, ovs_ref):
    _write_one(p_ref, k_ref, kn_ref, ok_ref)
    _write_scale_one(p_ref, ks_ref, ksn_ref, oks_ref)
    _write_scale_one(p_ref, vs_ref, vsn_ref, ovs_ref)


def _write_kv_scales_kernel(p_ref, k_ref, v_ref, ks_ref, vs_ref,
                            kn_ref, vn_ref, ksn_ref, vsn_ref,
                            ok_ref, ov_ref, oks_ref, ovs_ref):
    _write_one(p_ref, k_ref, kn_ref, ok_ref)
    _write_one(p_ref, v_ref, vn_ref, ov_ref)
    _write_scale_one(p_ref, ks_ref, ksn_ref, oks_ref)
    _write_scale_one(p_ref, vs_ref, vsn_ref, ovs_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_append_stacked(
    k_all: jax.Array,   # [L, b, kv, T, d] (int8 or bf16) — updated in place
    v_all: jax.Array | None,
    k_new: jax.Array,   # [L, b, kv, d] same dtype as the cache
    v_new: jax.Array | None,
    pos: jax.Array,     # scalar int32 write position
    k_scale: jax.Array | None = None,   # [L, b, kv, T] — updated in place
    v_scale: jax.Array | None = None,
    ks_new: jax.Array | None = None,    # [L, b, kv]
    vs_new: jax.Array | None = None,
    *,
    interpret: bool | None = None,
):
    """Append one step's k/v (and optionally the int8 dequant scales)
    at ``pos``. Returns, by configuration:

      split,  no scales → (k', v')
      packed, no scales → k'
      split,  scales    → (k', v', ks', vs')
      packed, scales    → (k', ks', vs')
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, b, kv, T, d = k_all.shape
    if T % 8:
        raise ValueError(f"cache length {T} must be a multiple of 8")
    single = v_all is None
    with_scales = k_scale is not None
    if with_scales and (v_scale is None or ks_new is None or vs_new is None):
        raise ValueError("scale append needs k_scale, v_scale, ks_new, vs_new")

    # one program per layer keeps the RMW window blocks in VMEM budget
    win_spec = pl.BlockSpec(
        (1, b, kv, 8, d), lambda i, p: (i, 0, 0, p[0] // 8, 0)
    )
    new_spec = pl.BlockSpec((1, b, kv, 1, d), lambda i, p: (i, 0, 0, 0, 0))
    # scales: full-T lane row per layer (sub-128 lane windows can't be
    # blocked; the whole row is ~300 KB and the DMA hides under the
    # value windows)
    srow_spec = pl.BlockSpec((1, b, kv, T), lambda i, p: (i, 0, 0, 0))
    snew_spec = pl.BlockSpec((1, b, kv, 1), lambda i, p: (i, 0, 0, 0))
    shape = jax.ShapeDtypeStruct(k_all.shape, k_all.dtype)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    if single and not with_scales:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=[win_spec, new_spec],
            out_specs=[win_spec],
        )
        out = pl.pallas_call(
            _write_k_kernel,
            out_shape=[shape],
            grid_spec=grid_spec,
            # operand indices include the scalar-prefetch arg (index 0)
            input_output_aliases={1: 0},
            interpret=interpret,
        )(pos_arr, k_all, k_new[:, :, :, None, :])
        return out[0]

    if single and with_scales:
        sshape = jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=[win_spec, srow_spec, srow_spec, new_spec,
                      snew_spec, snew_spec],
            out_specs=[win_spec, srow_spec, srow_spec],
        )
        return tuple(pl.pallas_call(
            _write_k_scales_kernel,
            out_shape=[shape, sshape, sshape],
            grid_spec=grid_spec,
            input_output_aliases={1: 0, 2: 1, 3: 2},
            interpret=interpret,
        )(pos_arr, k_all, k_scale, v_scale,
          k_new[:, :, :, None, :],
          ks_new[..., None].astype(k_scale.dtype),
          vs_new[..., None].astype(v_scale.dtype)))

    if with_scales:
        sshape = jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=[win_spec, win_spec, srow_spec, srow_spec,
                      new_spec, new_spec, snew_spec, snew_spec],
            out_specs=[win_spec, win_spec, srow_spec, srow_spec],
        )
        return tuple(pl.pallas_call(
            _write_kv_scales_kernel,
            out_shape=[shape, shape, sshape, sshape],
            grid_spec=grid_spec,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            interpret=interpret,
        )(pos_arr, k_all, v_all, k_scale, v_scale,
          k_new[:, :, :, None, :], v_new[:, :, :, None, :],
          ks_new[..., None].astype(k_scale.dtype),
          vs_new[..., None].astype(v_scale.dtype)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[win_spec, win_spec, new_spec, new_spec],
        out_specs=[win_spec, win_spec],
    )
    return pl.pallas_call(
        _write_kv_kernel,
        out_shape=[shape, shape],
        grid_spec=grid_spec,
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(pos_arr, k_all, v_all,
      k_new[:, :, :, None, :], v_new[:, :, :, None, :])


__all__ = ["cache_append_stacked"]
