"""Batch inference / serving.

The reference has no inference path beyond its eval loops; this module
provides the production-shaped one: a ``Predictor`` wrapping a jitted,
batch-sharded forward over fixed-shape batches, restorable from an Orbax
training checkpoint, with optional scoring.

    predictor = Predictor(model, params)            # or .from_checkpoint
    preds = predictor.predict_split(packed_split)   # [N] float32
    scores = predictor.score_split(packed_split)    # Acc-2/MAE/corr/F1
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from bert_multimodal_transformer_tpu.data.pipeline import (
    BatchIterator,
    PackedSplit,
)
from bert_multimodal_transformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from bert_multimodal_transformer_tpu.training import metrics as metrics_lib


class Predictor:
    """Jitted fixed-shape batch predictor with data-axis sharding."""

    def __init__(self, model: Any, params: Any, mesh=None,
                 batch_size: int = 128):
        num_labels = getattr(getattr(model, "config", None), "num_labels", 1)
        if num_labels != 1:
            raise ValueError(
                "Predictor supports regression heads (num_labels=1); got "
                f"num_labels={num_labels}")
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size
        self._bsh = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        self.params = jax.device_put(params, self._rep)

        def forward(p, input_ids, visual, acoustic, input_mask,
                    segment_ids):
            logits = model.apply(
                {"params": p}, input_ids, visual, acoustic,
                attention_mask=input_mask, token_type_ids=segment_ids,
                deterministic=True)
            return logits.reshape(-1)

        self._forward = jax.jit(
            forward,
            in_shardings=(self._rep,) + (self._bsh,) * 5,
            out_shardings=self._bsh,
        )

    @classmethod
    def from_checkpoint(cls, model: Any, checkpoint_dir: str,
                        template_params: Any = None,
                        **kw) -> "Predictor":
        """Restore the latest training checkpoint's params (params-only
        restore — works regardless of which optimizer wrote the
        checkpoint; template_params is unused and kept for
        backward-compatibility)."""
        del template_params
        from bert_multimodal_transformer_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        mgr = CheckpointManager(checkpoint_dir)
        params = mgr.restore_params()
        if params is None:
            raise FileNotFoundError(
                f"no checkpoint found under {checkpoint_dir}")
        return cls(model, params, **kw)

    def predict_split(self, split: PackedSplit) -> np.ndarray:
        """Predictions for every example, in order."""
        it = BatchIterator(split, self.batch_size, shuffle=False,
                           drop_remainder=False)
        preds = []
        for batch, valid in it:
            ids, vis, ac, mask, segs, _ = batch
            out = self._forward(
                self.params,
                jax.device_put(ids, self._bsh),
                jax.device_put(vis, self._bsh),
                jax.device_put(ac, self._bsh),
                jax.device_put(mask, self._bsh),
                jax.device_put(segs, self._bsh))
            preds.append(np.asarray(jax.device_get(out))[valid])
        if not preds:
            return np.empty((0,), np.float32)
        return np.concatenate(preds)

    def score_split(self, split: PackedSplit,
                    use_zero: bool = False) -> Dict[str, float]:
        preds = self.predict_split(split)
        return metrics_lib.score_regression(preds, split.label_ids,
                                            use_zero=use_zero)
