"""Grain-backed input pipeline (optional).

The BASELINE north star calls for a tf.data/Grain host pipeline in place of
the reference's torch DataLoader (multimodal_driver.py:269-279). The
datasets are tiny and fully materializable (the reference itself builds
in-memory TensorDatasets), so the default BatchIterator is already optimal;
this module provides the Grain variant for users who want to slot the
packed splits into a larger Grain-based loading stack (sharding-aware
index sampling, deterministic global shuffle, worker prefetch).

Gated import: falls back cleanly when grain is unavailable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from bert_multimodal_transformer_tpu.data.pipeline import PackedSplit

try:
    import grain.python as grain

    GRAIN_AVAILABLE = True
except Exception:  # pragma: no cover
    grain = None
    GRAIN_AVAILABLE = False


class _PackedSplitSource:
    """grain RandomAccessDataSource over a PackedSplit."""

    def __init__(self, split: PackedSplit):
        self._split = split

    def __len__(self) -> int:
        return len(self._split)

    def __getitem__(self, idx):
        s = self._split
        return {
            "input_ids": s.input_ids[idx],
            "visual": s.visual[idx],
            "acoustic": s.acoustic[idx],
            "input_mask": s.input_mask[idx],
            "segment_ids": s.segment_ids[idx],
            "label_ids": s.label_ids[idx],
        }


def make_grain_loader(
    split: PackedSplit,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    num_epochs: int = 1,
    drop_remainder: bool = True,
):
    """Returns a grain DataLoader yielding dict batches of fixed shape."""
    if not GRAIN_AVAILABLE:  # pragma: no cover
        raise ImportError("grain is not available in this environment")
    source = _PackedSplitSource(split)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.NoSharding(),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size,
                                drop_remainder=drop_remainder)],
        worker_count=0,  # in-process: dataset is in host RAM already
    )


def iterate_tuple_batches(loader) -> Iterator[Tuple[tuple, np.ndarray]]:
    """Adapt grain dict batches to the trainer's (tuple, valid) protocol."""
    for batch in loader:
        tup = (batch["input_ids"], batch["visual"], batch["acoustic"],
               batch["input_mask"], batch["segment_ids"],
               batch["label_ids"])
        yield tup, np.ones(batch["input_ids"].shape[0], bool)
