"""Fully-sharded data parallelism (ZeRO-3) over the ``data`` mesh axis.

The reference is single-device (SURVEY §2d); this is a scaling
capability the framework adds on top of plain DP. With ``Trainer(...,
fsdp=True)`` every parameter AND optimizer-moment leaf is stored
sharded over the ``data`` axis — the axis the batch is already sharded
over — instead of replicated:

  * per-leaf rule (``fsdp_pspec_for_leaf``): shard the LARGEST
    dimension divisible by the data-axis size; leaves with no such
    dimension (scalars, the rng key, tiny vectors) stay replicated;
  * XLA's SPMD partitioner then materializes each weight via
    all-gather just before use in the forward/backward and
    reduce-scatters the gradients, so the AdamW update runs on the
    local 1/n shard — the ZeRO-3 schedule, derived entirely from
    sharding annotations (no hand-written collectives, the
    scaling-book recipe);
  * peak parameter+moment memory per chip drops ~n× (3 fp32 trees for
    AdamW), which is what unlocks batch/sequence growth on models
    whose state no longer fits replicated.

Composes with tensor parallelism: on a 2-D (data × model) mesh the TP
rules (parallel/tp.py) claim their dimension first and FSDP shards the
largest remaining free dimension over ``data`` (Megatron + ZeRO-3).
Training math is IDENTICAL to plain DP/TP — the collectives move the
same numbers — verified to rtol 1e-6 in tests/test_fsdp.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert_multimodal_transformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
)
from bert_multimodal_transformer_tpu.parallel.tp import tp_pspec_for_path


def fsdp_pspec_for_leaf(shape: Sequence[int], n_data: int,
                        base: Optional[Tuple] = None) -> P:
    """PartitionSpec sharding the largest ``base``-free dimension of
    ``shape`` over the data axis (ties keep the leading dimension, so
    e.g. position embeddings ``[S, D]`` with S == D shard on S).

    ``base`` is an existing spec (e.g. a TP rule) whose claimed
    dimensions are left untouched; leaves with no dimension divisible
    by ``n_data`` keep ``base`` unchanged (replicated over data)."""
    spec = list(base or ())
    spec += [None] * (len(shape) - len(spec))
    best = None
    for i, dim in enumerate(shape):
        if spec[i] is not None:
            continue
        if dim % n_data == 0 and dim >= n_data and (
                best is None or dim > shape[best]):
            best = i
    if best is not None:
        spec[best] = DATA_AXIS
    while spec and spec[-1] is None:   # P(None) != P() under equality
        spec.pop()
    return P(*spec)


def make_fsdp_state_shardings(state: Any, mesh: Mesh, *,
                              shard_attention: bool = False) -> Any:
    """NamedSharding pytree for a TrainState under FSDP.

    On a mesh with a model axis > 1 the TP rules
    (``tp_pspec_for_path``) are applied first and FSDP shards the
    largest remaining free dimension — optimizer moments mirror the
    param tree so the same path/shape rules hold wherever a leaf sits.
    """
    n_data = mesh.shape.get(DATA_AXIS, 1)
    tp_active = mesh.shape.get(MODEL_AXIS, 1) > 1

    def leaf_sharding(path, leaf):
        keystr = jax.tree_util.keystr(path)
        # the step counter and the rng key are consumed whole every
        # step — replicate them regardless of divisibility
        if keystr in (".step", ".rng"):
            return NamedSharding(mesh, P())
        shape = getattr(leaf, "shape", ())
        base = ()
        if tp_active:
            base = tuple(tp_pspec_for_path(
                keystr, shard_attention=shard_attention))
        if n_data <= 1 or len(base) > len(shape):
            return NamedSharding(mesh, P(*base))
        return NamedSharding(mesh, fsdp_pspec_for_leaf(shape, n_data,
                                                       base))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
