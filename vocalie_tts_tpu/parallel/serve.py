"""Tensor-parallel serving: sharded prefill + decode over a mesh.

Scale-out for models that exceed one chip (Qwen3-TTS-class 1.7B in
bf16 fits one v5e, but batch × cache growth does not): parameters
shard with the Megatron rules (parallel/mesh.py), the KV cache shards
over kv heads on ``tp``, the batch shards over ``dp`` — XLA inserts
the psum at the wo/w_down boundaries over ICI. The decode while_loop
stays fully on-device per chip.

Used by ``__graft_entry__.dryrun_multichip`` (training) and the
sharded-decode test; engine runtimes opt in by wrapping their
generate programs with ``shard_generate_inputs``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vocalie_tts_tpu.models.common.transformer import (
    StackedKVCache,
    TransformerConfig,
    decode_step,
    prefill,
)
from vocalie_tts_tpu.parallel.mesh import shard_params, transformer_param_sharding


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
]
