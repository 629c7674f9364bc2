"""Distributed training step for the flagship T3 model.

Fine-tuning is a first-class capability (the product ships an FR
fine-tune of its base decoder — ref: chatterbox_impl.py:63-73, trained
upstream in torch). This module provides the TPU-native equivalent:
teacher-forced next-token cross-entropy on speech tokens with AdamW,
jitted over a (dp × tp) mesh. Parameters/optimizer state shard with
the tensor-parallel rules; batches shard over dp; XLA inserts the
gradient all-reduce and TP collectives.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vocalie_tts_tpu.models.common.transformer import (
    TransformerConfig,
    forward_all_logits,
)
from vocalie_tts_tpu.parallel.mesh import transformer_param_sharding


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jax.Array


def loss_fn(
    params: Dict[str, Any],
    cfg: TransformerConfig,
    tokens: jax.Array,       # [b, s]
    targets: jax.Array,      # [b, s] next-token ids (-100 = ignore)
    *,
    use_flash: bool = False,
    mesh: Mesh | None = None,
) -> jax.Array:
    logits = forward_all_logits(params, cfg, tokens, use_flash=use_flash, mesh=mesh)
    valid = targets >= 0
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(learning_rate, b1=0.9, b2=0.95, weight_decay=weight_decay)


def create_train_state(
    params: Dict[str, Any], optimizer=None
) -> TrainState:
    optimizer = optimizer or make_optimizer()
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_sharded_train_step(
    cfg: TransformerConfig, mesh: Mesh, optimizer=None, *, use_flash: bool = False
):
    """jit the full train step over the mesh with dp batch + tp params.

    ``use_flash=True`` keeps the Pallas flash kernel on the mesh via
    shard_map (flash_attention_sharded) in forward and backward.
    """
    optimizer = optimizer or make_optimizer()
    batch_sharding = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    def train_step(state: TrainState, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p, c, tk, tg: loss_fn(p, c, tk, tg, use_flash=use_flash,
                                         mesh=mesh if use_flash else None)
        )(state.params, cfg, tokens, targets)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def state_shardings(state: TrainState) -> TrainState:
        p_spec = transformer_param_sharding(state.params, mesh)
        # AdamW moments mirror the param tree → param specs; scalars replicate
        o_spec = _opt_sharding(state.opt_state, p_spec, repl)
        return TrainState(p_spec, o_spec, repl)

    def jit_step(state: TrainState):
        shardings = state_shardings(state)
        return jax.jit(
            train_step,
            in_shardings=(shardings, batch_sharding, batch_sharding),
            out_shardings=(shardings, repl),
            donate_argnums=(0,),
        )

    return jit_step


def make_sharded_train_epoch(
    cfg: TransformerConfig, mesh: Mesh, optimizer=None, *, use_flash: bool = False
):
    """jit a K-step ``lax.scan`` epoch over the mesh.

    One executable for K optimizer steps: on TPU this removes K-1
    dispatches per epoch; on the virtual CPU mesh it also avoids the
    XLA:CPU cross-executable collective rendezvous (which can deadlock
    when many per-step executables interleave on >4 host devices).
    Batches arrive stacked [K, b, s], sharded (None, "dp", None).
    """
    optimizer = optimizer or make_optimizer()
    epoch_sharding = NamedSharding(mesh, P(None, "dp", None))
    repl = NamedSharding(mesh, P())

    def train_step(state: TrainState, batch):
        tokens, targets = batch
        loss, grads = jax.value_and_grad(
            lambda p, c, tk, tg: loss_fn(p, c, tk, tg, use_flash=use_flash,
                                         mesh=mesh if use_flash else None)
        )(state.params, cfg, tokens, targets)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def epoch(state: TrainState, tokens_k, targets_k):
        return jax.lax.scan(train_step, state, (tokens_k, targets_k))

    def state_shardings(state: TrainState) -> TrainState:
        p_spec = transformer_param_sharding(state.params, mesh)
        o_spec = _opt_sharding(state.opt_state, p_spec, repl)
        return TrainState(p_spec, o_spec, repl)

    def jit_epoch(state: TrainState):
        shardings = state_shardings(state)
        return jax.jit(
            epoch,
            in_shardings=(shardings, epoch_sharding, epoch_sharding),
            out_shardings=(shardings, repl),
            donate_argnums=(0,),
        )

    return jit_epoch


def _opt_sharding(opt_state, p_spec, repl):
    """AdamW state: mu/nu trees share param structure → param specs."""
    params_treedef = jax.tree_util.tree_structure(p_spec)

    def map_entry(entry):
        if jax.tree_util.tree_structure(entry) == params_treedef:
            return p_spec
        return jax.tree_util.tree_map(lambda _: repl, entry)

    return jax.tree_util.tree_map(
        map_entry,
        opt_state,
        is_leaf=lambda x: jax.tree_util.tree_structure(x) == params_treedef
        or isinstance(x, jax.Array),
    )


__all__ = [
    "TrainState",
    "loss_fn",
    "make_optimizer",
    "create_train_state",
    "make_sharded_train_step",
    "make_sharded_train_epoch",
]
