"""Explicit shard_map training step.

The default Trainer relies on jit + NamedSharding annotations and lets the
XLA SPMD partitioner insert the gradient all-reduce. This module provides
the explicit-collectives formulation of the same step — per-device code
under ``jax.shard_map`` with a hand-placed ``jax.lax.pmean`` over the
``data`` axis — the shape large-scale TPU codebases use when they need
manual control of collective placement (e.g. to overlap the reduce with
the backward pass or to extend to tp/pp axes).

Numerically equivalent to the jit path (tested on the virtual 8-device
mesh in tests/test_shard_map.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import optax
from jax.sharding import PartitionSpec as P

from bert_multimodal_transformer_tpu.parallel.mesh import DATA_AXIS
from bert_multimodal_transformer_tpu.training.trainer import (
    TrainState,
    _forward,
    mse_loss,
)

# jax.shard_map moved out of experimental in recent JAX; keep one alias.
try:  # pragma: no cover - version dependent
    _shard_map = jax.shard_map
    _CHECK_KW = {"check_vma": False}
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = {"check_rep": False}  # old API spells the flag differently


def shard_map(f, **kw):
    return _shard_map(f, **kw, **_CHECK_KW)


def make_shard_map_train_step(mesh):
    """Returns train_step(state, batch) with the batch sharded on DATA_AXIS
    and an explicit pmean gradient all-reduce over ICI."""

    batch_spec = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS))

    def per_device_step(state: TrainState, batch: Tuple):
        rng, new_rng = jax.random.split(state.rng)
        # fold in the device index so dropout masks differ per shard, then
        # the gradient average still matches the global-batch semantics.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            logits, labels = _forward(state.apply_fn, params, batch, rng,
                                      deterministic=False)
            return mse_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # explicit data-parallel reduction (the reference has no
        # distributed path at all — SURVEY §2d; this is its TPU-native
        # replacement: psum/pmean over the ICI mesh axis).
        grads = jax.lax.pmean(grads, axis_name=DATA_AXIS)
        loss = jax.lax.pmean(loss, axis_name=DATA_AXIS)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, rng=new_rng)
        return new_state, loss

    mapped = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)
