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
        # num_labels==1 → regression logits [B] (MSE head); >1 → the
        # reference's CrossEntropy branch (bert.py:313-322), logits [B, C]
        self.num_labels = getattr(getattr(model, "config", None),
                                  "num_labels", 1)
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size
        self._bsh = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        self.params = jax.device_put(params, self._rep)
        num_labels = self.num_labels

        def forward(p, input_ids, visual, acoustic, input_mask,
                    segment_ids):
            logits = model.apply(
                {"params": p}, input_ids, visual, acoustic,
                attention_mask=input_mask, token_type_ids=segment_ids,
                deterministic=True)
            if num_labels == 1:
                return logits.reshape(-1)
            return logits.reshape(-1, num_labels)

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
        """Predictions for every example, in order: [N] regression values
        (num_labels=1) or [N, C] class logits (num_labels>1)."""
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
            shape = (0,) if self.num_labels == 1 else (0, self.num_labels)
            return np.empty(shape, np.float32)
        return np.concatenate(preds)

    def predict_classes(self, split: PackedSplit) -> np.ndarray:
        """Argmax class ids for a num_labels>1 head."""
        if self.num_labels == 1:
            raise ValueError(
                "predict_classes needs a classification head "
                "(num_labels>1); use predict_split for regression")
        return np.argmax(self.predict_split(split), axis=-1)

    def score_split(self, split: PackedSplit,
                    use_zero: bool = False) -> Dict[str, float]:
        """MOSI-standard regression scoring (num_labels=1) or
        accuracy/weighted-F1 classification scoring (num_labels>1)."""
        if self.num_labels == 1:
            return metrics_lib.score_regression(
                self.predict_split(split), split.label_ids,
                use_zero=use_zero)
        return metrics_lib.score_classification(
            self.predict_classes(split), split.label_ids)
