"""Tensor-parallel serving: sharded prefill + decode over a mesh.

Scale-out for models that exceed one chip (Qwen3-TTS-class 1.7B in
bf16 fits one v5e, but batch × cache growth does not): parameters
shard with the Megatron rules (parallel/mesh.py), the KV cache shards
over kv heads on ``tp``, the batch shards over ``dp`` — XLA inserts
the psum at the wo/w_down boundaries over ICI. The decode while_loop
stays fully on-device per chip.

Used by ``__graft_entry__.dryrun_multichip`` (training + the engine
path) and the sharded-decode tests. Engine runtimes opt in via
``VOCALIE_SERVE_MESH`` (see ``serve_mesh_from_env``): at create time
they place their params with ``shard_params`` and, per request, commit
the generate program's batch inputs with ``shard_generate_inputs`` —
the jitted prefill + sampling while_loop then compiles SPMD and XLA
places the TP collectives (psum at the wo/w_down boundaries) over ICI.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("vocalie_parallel")

from vocalie_tts_tpu.models.common.transformer import (
    StackedKVCache,
    TransformerConfig,
    decode_step,
    prefill,
)
from vocalie_tts_tpu.parallel.mesh import shard_params, transformer_param_sharding


def serve_mesh_from_env() -> Optional[Mesh]:
    """Serving mesh from ``VOCALIE_SERVE_MESH`` — the engine-runtime
    opt-in to multi-chip serving (SURVEY §5.8 "optional scale-out").

    Format: ``"DPxTP"`` (e.g. ``"4x2"`` = 4-way data × 2-way tensor
    parallel) or a bare device count for pure dp (``"8"``). Unset/empty
    → ``None`` (single-chip serving, the capability baseline). Raises
    when the spec needs more devices than ``jax.devices()`` has —
    misconfiguration must not silently fall back to one chip.
    """
    spec = os.environ.get("VOCALIE_SERVE_MESH", "").strip().lower()
    if not spec:
        return None
    from vocalie_tts_tpu.parallel.mesh import make_mesh

    try:
        if "x" in spec:
            dp_s, tp_s = spec.split("x", 1)
            dp, tp = int(dp_s), int(tp_s)
        else:
            dp, tp = int(spec), 1
    except ValueError as exc:
        raise ValueError(
            f"VOCALIE_SERVE_MESH={spec!r} — expected 'DPxTP' (e.g. '4x2') "
            f"or a bare device count"
        ) from exc
    n = dp * tp
    have = len(jax.devices())
    if have < n:
        raise ValueError(
            f"VOCALIE_SERVE_MESH={spec} needs {n} devices, have {have}"
        )
    logger.info("serving mesh: %ddp x %dtp over %d devices", dp, tp, n)
    return make_mesh(n, tp=tp)


def shard_generate_inputs(mesh: Mesh, batched, replicated=()):
    """Commit a generate program's inputs to the serving mesh.

    ``batched``: pytree of arrays whose LEADING axis is the padded
    batch bucket (prompt embeds, tokens, lengths, conditioning rows) —
    placed with the batch axis on ``dp``. The bucket must be a dp
    multiple; runtimes guarantee this by filtering their batch buckets
    (see LMTTSRuntime.synthesize_batch). ``replicated``: everything
    else (rng keys, scalars). Returns (batched, replicated) committed,
    so the jitted generate program compiles SPMD over the mesh — the
    KV cache and per-step state inherit their shardings from these
    inputs + the param shardings by XLA propagation.
    """
    import jax.numpy as jnp

    def _batched(leaf):
        leaf = jnp.asarray(leaf)
        spec = ["dp"] + [None] * (leaf.ndim - 1)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    repl = NamedSharding(mesh, P())
    batched = jax.tree_util.tree_map(_batched, batched)
    replicated = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(jnp.asarray(leaf), repl), replicated
    )
    return batched, replicated


def cache_sharding(mesh: Mesh) -> StackedKVCache:
    """Sharding specs for the stacked cache: kv heads on tp, batch on dp."""
    return StackedKVCache(
        k=NamedSharding(mesh, P(None, "dp", "tp", None, None)),
        v=NamedSharding(mesh, P(None, "dp", "tp", None, None)),
        prompt_lengths=NamedSharding(mesh, P("dp")),
        n_decoded=NamedSharding(mesh, P()),
        prompt_pad=NamedSharding(mesh, P()),
    )


def make_sharded_decode(
    cfg: TransformerConfig, mesh: Mesh
) -> Tuple[Any, Any]:
    """(sharded_prefill, sharded_decode_step) jitted over the mesh."""
    repl = NamedSharding(mesh, P())
    batch_s = NamedSharding(mesh, P("dp", None))
    row_s = NamedSharding(mesh, P("dp"))

    def _prefill(params, tokens, lengths, cache_len):
        return prefill(params, cfg, tokens, lengths, cache_len=cache_len)

    def _step(params, token, cache):
        return decode_step(params, cfg, token, cache)

    p_spec = None

    def prefill_jit(params, tokens, lengths, *, cache_len: int):
        nonlocal p_spec
        if p_spec is None:
            p_spec = transformer_param_sharding(params, mesh)
        c_spec = cache_sharding(mesh)
        fn = jax.jit(
            _prefill,
            static_argnums=(3,),
            in_shardings=(p_spec, batch_s, row_s),
            out_shardings=(repl, c_spec),
        )
        return fn(params, tokens, lengths, cache_len)

    def step_jit(params, token, cache):
        nonlocal p_spec
        if p_spec is None:
            p_spec = transformer_param_sharding(params, mesh)
        c_spec = cache_sharding(mesh)
        fn = jax.jit(
            _step,
            in_shardings=(p_spec, row_s, c_spec),
            out_shardings=(repl, c_spec),
        )
        return fn(params, token, cache)

    return prefill_jit, step_jit


def place_for_serving(params: Dict, mesh: Mesh) -> Dict:
    """Shard LM params onto the mesh with the TP rules."""
    return shard_params(params, mesh)


def make_sharded_enhance(cfg, mesh: Mesh):
    """AudioSR batched-window enhancement sharded over the FULL mesh.

    The batched DDIM dispatch (models/audiosr/runtime._dispatch_batch)
    is embarrassingly parallel over windows — each window's diffusion
    is independent — so the window axis shards across every device
    (dp × tp flattened into one data axis: the UNet at these sizes
    needs no tensor parallelism, and whole-window assignment avoids
    any per-step collective; XLA only gathers the audio at the end).

    Returns ``enhance(params, audio_48k [W, T] int16/f32, rng,
    ddim_steps, guidance_scale) -> audio [W, T]`` jitted over the
    mesh. W must be a multiple of the device count (the runtime's
    window-count buckets are powers of two, so any full bucket is).
    """
    from vocalie_tts_tpu.models.audiosr.model import enhance_window

    axes = tuple(mesh.axis_names)
    win_s = NamedSharding(mesh, P(axes))   # windows over all devices
    repl = NamedSharding(mesh, P())

    def _enhance(params, audio_48k, rng, ddim_steps, guidance_scale):
        return enhance_window(
            params, cfg, audio_48k, rng,
            ddim_steps=ddim_steps, guidance_scale=guidance_scale,
        )

    return jax.jit(
        _enhance,
        static_argnums=(3, 4),
        in_shardings=(repl, win_s, repl),
        out_shardings=win_s,
    )


__all__ = [
    "cache_sharding",
    "make_sharded_decode",
    "make_sharded_enhance",
    "place_for_serving",
    "serve_mesh_from_env",
    "shard_generate_inputs",
]
