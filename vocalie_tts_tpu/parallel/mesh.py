"""Mesh construction and parameter sharding rules.

The serving design is single-chip-first (SURVEY §5.8: one v5e chip is
the capability baseline); the mesh layer provides scale-out:

- ``dp`` axis: data parallelism — batches of chunks/training examples;
- ``tp`` axis: tensor parallelism — attention heads and MLP hidden
  dim sharded, XLA inserts the psum/reduce-scatter collectives over
  ICI at the wo/w_down boundaries.

Everything goes through ``jax.sharding`` + ``jit``: pick a mesh,
annotate in/out shardings, let XLA place collectives (the
scaling-book recipe). No hand-written NCCL-style code.

Deliberate scope — why dp × tp and nothing else:
- pipeline parallel (pp): the largest family is 1.77B ≈ 1.8 GB int8 /
  3.6 GB bf16 — a single v5e (16 GB HBM) holds any of them with full
  serving state, so inter-stage pipelining would only add bubble
  overhead. pp earns its complexity at 10B+, not here.
- sequence parallel (sp): decode is 1 token/step (no sequence axis to
  shard); prefill sequences are ≤ ~640 tokens, where sp's
  all-gather/reduce-scatter pairs cost more than the norm/elementwise
  compute they'd distribute.
- expert parallel (ep): no family in the product line is MoE.
If a future family crosses those thresholds, the mesh layer is the
place to add the axis; the sharding-rule pattern
(transformer_param_sharding) extends by path rules.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    tp: int = 1,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """(dp × tp) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    grid = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(grid, axis_names=axis_names)


def transformer_param_sharding(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec tree for models.common.transformer params.

    Megatron-style tensor parallelism:
      wq/wk/wv, w_gate/w_up — output (head/hidden) dim on ``tp``;
      wo, w_down            — input dim on ``tp`` (psum after);
      embeddings / lm_head  — vocab dim on ``tp``;
      norms                 — replicated.
    """

    tp_size = mesh.shape.get("tp", 1)

    def axis_spec(leaf, dim: int) -> NamedSharding:
        # layer-stacked weights are [L, d_in, d_out] — shard dim+1;
        # only shard when the dimension divides evenly, else replicate
        if leaf.ndim == 3:
            dim += 1
        if leaf.ndim in (2, 3) and leaf.shape[dim] % tp_size == 0:
            spec = [None] * leaf.ndim
            spec[dim] = "tp"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    def spec_for(path: str, leaf) -> NamedSharding:
        if any(key in path for key in ("wq", "wk", "wv", "w_gate", "w_up")):
            return axis_spec(leaf, 1)
        if path.endswith(("/bq", "/bk", "/bv")):
            # q/k/v biases follow their projection's output sharding
            # ([L, d_out] — shard the last dim so the add stays local)
            spec = [None] * leaf.ndim
            if leaf.shape[-1] % tp_size == 0:
                spec[-1] = "tp"
            return NamedSharding(mesh, P(*spec))
        if any(key in path for key in ("wo", "w_down")):
            return axis_spec(leaf, 0)
        if "lm_head" in path:
            return axis_spec(leaf, 1)
        if "tok_emb" in path:
            return axis_spec(leaf, 0)
        return NamedSharding(mesh, P())  # replicate

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        specs.append(spec_for(path_str, leaf))
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place transformer params on the mesh per the TP rules."""
    shardings = transformer_param_sharding(params, mesh)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


__all__ = [
    "make_mesh",
    "transformer_param_sharding",
    "shard_params",
    "batch_sharding",
]
