"""Multi-process SPMD: run the framework the way real TPU pods run.

A real pod slice is multi-host — one process per host, each owning only
its local chips (the reference is single-process single-GPU,
global_configs.py:4-7, so this whole axis is new capability). The JAX
recipe: every process calls ``jax.distributed.initialize`` against one
coordinator, then runs the SAME SPMD program over a mesh built from the
GLOBAL device list; per-host input pipelines feed only the rows that
live on that host's devices; checkpoints rendezvous through a shared
filesystem. This module is the framework's side of that contract:

- :func:`initialize` — ``jax.distributed`` bootstrap (idempotent).
- :class:`ShardedBatchIterator` — a per-process view of
  ``data.pipeline.BatchIterator``: every process draws the identical
  global shuffle (same seed ⇒ same epoch order), then yields only its
  contiguous row-block of each global batch, so the union of all
  processes' rows IS the single-process batch stream, bit for bit.
- :meth:`Trainer.put_local_batch <put_local_batch>` companion
  :func:`put_global_batch` — assemble ``jax.Array``s spanning every
  process from process-local rows
  (``jax.make_array_from_process_local_data``).

Correctness claim validated by ``__graft_entry__.dryrun_multiprocess``:
2 processes × 4 CPU devices running the DP train step on per-process
batch shards produce bit-identical loss and parameters to the
single-process 8-device run of the same program, and a multi-process
Orbax save/restore round-trips exactly (tests/test_multiprocess.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from bert_multimodal_transformer_tpu.data.pipeline import BatchIterator
from bert_multimodal_transformer_tpu.parallel.mesh import batch_sharding


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kw) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent per process).

    Call BEFORE any JAX computation. ``coordinator_address`` is
    ``host:port`` of process 0; every process (including 0) calls with
    its own ``process_id``. After this, ``jax.devices()`` is the global
    device list and jitted programs execute collectively.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def local_row_slice(global_batch: int, num_processes: Optional[int] = None,
                    process_id: Optional[int] = None) -> slice:
    """The contiguous row-block of a [B, ...] global batch owned by this
    process under a 1-D data mesh built from ``jax.devices()``.

    ``jax.devices()`` orders devices by process index, so a
    ``PartitionSpec('data')`` sharding assigns rows
    ``[pid·B/P, (pid+1)·B/P)`` to process ``pid``.
    """
    nproc = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    if global_batch % nproc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{nproc} processes")
    rows = global_batch // nproc
    return slice(pid * rows, (pid + 1) * rows)


def put_global_batch(mesh, local_batch: Tuple) -> Tuple:
    """Assemble global batch-sharded ``jax.Array``s from THIS process's
    rows. Every process passes its own ``local_row_slice`` rows; the
    result spans all processes' devices (the multi-host twin of
    ``Trainer._put_batch``, which device_puts full host batches)."""
    sh = batch_sharding(mesh)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in local_batch)


class ShardedBatchIterator:
    """Per-process view of the global batch stream.

    Wraps a :class:`BatchIterator` constructed with the SAME seed on
    every process — `np.random.RandomState(seed)` is deterministic, so
    all processes draw the identical epoch shuffle and walk the
    identical global batches; each yields only its own row-block. With
    ``drop_remainder=False`` the validity mask is sliced the same way,
    so padded tail rows stay excluded exactly as in single-process eval.

    The iterator state (``shuffles_done`` / ``restore_position``) passes
    through to the wrapped iterator, preserving the preemption-safe
    resume contract per process.
    """

    def __init__(self, split, global_batch_size: int, *, shuffle: bool,
                 drop_remainder: bool, seed: int = 0,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None):
        self._nproc = (jax.process_count() if num_processes is None
                       else num_processes)
        self._pid = (jax.process_index() if process_id is None
                     else process_id)
        self._rows = local_row_slice(global_batch_size, self._nproc,
                                     self._pid)
        self.global_batch_size = global_batch_size
        self._it = BatchIterator(split, global_batch_size, shuffle=shuffle,
                                 drop_remainder=drop_remainder, seed=seed)

    @property
    def shuffles_done(self) -> int:
        return self._it.shuffles_done

    def restore_position(self, shuffles_done: int) -> None:
        self._it.restore_position(shuffles_done)

    def __len__(self) -> int:
        return len(self._it)

    def __iter__(self):
        return self.iter_from(0)

    def iter_from(self, start_batch: int = 0):
        r = self._rows
        for batch, valid in self._it.iter_from(start_batch):
            yield (tuple(a[r] for a in batch), valid[r])
