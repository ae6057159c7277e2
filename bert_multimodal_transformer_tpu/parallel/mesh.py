"""Device mesh construction and sharding rules.

The reference is single-GPU (global_configs.py:4-7). Here SPMD data
parallelism is the default execution mode (SURVEY §2d): a 1-D (or 2-D with a
model axis held at 1 for these model sizes) ``jax.sharding.Mesh``, with the
batch dimension sharded over the ``data`` axis and parameters replicated.
XLA inserts the gradient all-reduce (psum over ICI) automatically from the
sharding annotations on the jitted train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert_multimodal_transformer_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.model_parallel)
    data = config.data_parallel
    if data == -1:
        if n % model != 0:
            raise ValueError(
                f"model_parallel={model} does not divide the {n} available "
                f"devices; with data_parallel=-1 every device must be used "
                f"(pick model_parallel from the divisors of {n})")
        data = n // model
    if data < 1:
        raise ValueError(f"mesh needs data axis >= 1, got {data}")
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs more than the {n} available devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (config.data_axis, config.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
