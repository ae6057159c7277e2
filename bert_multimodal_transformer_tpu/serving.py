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

import dataclasses
import json
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

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
    """Jitted fixed-shape batch predictor with data-axis sharding.

    ``wire_dtype`` (e.g. ``jnp.bfloat16``) casts the float modality
    features (visual/acoustic — the bulk of a request payload) on the
    host before the device transfer. With a bf16-compute model,
    ``wire_dtype=jnp.bfloat16`` is lossless relative to the model's own
    math — the model casts those inputs to bf16 anyway — while halving
    the bytes moved per request (measured: the tunnel round-trip, not
    the chip, dominates per-request latency at every batch size;
    BENCHMARKS.md "Serving per-request latency").

    ``prefetch`` keeps up to that many batches in flight during
    ``predict_split``: JAX dispatch is asynchronous, so staging batch
    n+1 (host cast + device transfer + forward dispatch) before fetching
    batch n's predictions overlaps the request transfer with the chip's
    compute instead of paying transfer + compute serially. 0 restores
    the strictly-serial loop.

    ``mem_len`` (XLNet only): score a segment-recurrence-trained model
    the way it was trained — Transformer-XL memory initialized to zeros
    and threaded through the batch stream in order. The memory chain is
    device-side, so prefetch still pipelines the host transfers.
    """

    def __init__(self, model: Any, params: Any, mesh=None,
                 batch_size: int = 128, wire_dtype: Any = None,
                 prefetch: int = 2, mem_len: Optional[int] = None):
        # num_labels==1 → regression logits [B] (MSE head); >1 → the
        # reference's CrossEntropy branch (bert.py:313-322), logits [B, C]
        self.num_labels = getattr(getattr(model, "config", None),
                                  "num_labels", 1)
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size
        self.wire_dtype = wire_dtype
        self.prefetch = prefetch
        self.mem_len = mem_len
        self._bsh = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        self.params = jax.device_put(params, self._rep)
        num_labels = self.num_labels

        def _shape_out(logits):
            if num_labels == 1:
                return logits.reshape(-1)
            return logits.reshape(-1, num_labels)

        def forward(p, input_ids, visual, acoustic, input_mask,
                    segment_ids):
            logits = model.apply(
                {"params": p}, input_ids, visual, acoustic,
                attention_mask=input_mask, token_type_ids=segment_ids,
                deterministic=True)
            return _shape_out(logits)

        self._forward = jax.jit(
            forward,
            in_shardings=(self._rep,) + (self._bsh,) * 5,
            out_shardings=self._bsh,
        )

        if mem_len is not None:
            # XLNet segment recurrence at inference: a mems-trained
            # model is scored the way it was trained — the memory
            # threads through the batch stream IN ORDER (reference
            # use_cache chain, xlnet.py:363-365; Trainer.test_epoch's
            # mems path is the training-side twin).
            cfg = getattr(model, "config", None)
            if getattr(cfg, "mem_len", None) != mem_len:
                raise ValueError(
                    f"Predictor(mem_len={mem_len}) needs the model "
                    f"built with config.mem_len={mem_len} (got "
                    f"{getattr(cfg, 'mem_len', None)})")
            msh = jax.tree_util.tree_map(
                lambda _: self._bsh, tuple(range(cfg.n_layer)))

            def forward_mems(p, input_ids, visual, acoustic, input_mask,
                             segment_ids, mems):
                out = model.apply(
                    {"params": p}, input_ids, visual, acoustic,
                    attention_mask=input_mask, token_type_ids=segment_ids,
                    mems=mems, use_cache=True, deterministic=True)
                return _shape_out(out[0]), out[1]

            self._forward_mems = jax.jit(
                forward_mems,
                in_shardings=(self._rep,) + (self._bsh,) * 5 + (msh,),
                out_shardings=(self._bsh, msh),
                donate_argnums=(6,),
            )

    def _init_mems(self):
        cfg = self.model.config
        dt = getattr(self.model, "dtype", jnp.float32)
        zeros = tuple(
            jnp.zeros((self.batch_size, self.mem_len, cfg.d_model), dt)
            for _ in range(cfg.n_layer))
        return jax.device_put(zeros, jax.tree_util.tree_map(
            lambda _: self._bsh, zeros))

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
        from collections import deque

        it = BatchIterator(split, self.batch_size, shuffle=False,
                           drop_remainder=False)
        preds = []
        pending = deque()  # (async out array, valid mask) in order
        mems = self._init_mems() if self.mem_len is not None else None
        for batch, valid in it:
            ids, vis, ac, mask, segs, _ = batch
            if self.wire_dtype is not None:
                vis = vis.astype(self.wire_dtype)
                ac = ac.astype(self.wire_dtype)
            args = (self.params,
                    jax.device_put(ids, self._bsh),
                    jax.device_put(vis, self._bsh),
                    jax.device_put(ac, self._bsh),
                    jax.device_put(mask, self._bsh),
                    jax.device_put(segs, self._bsh))
            if mems is not None:
                # the memory chain is device-side, so prefetch still
                # overlaps host transfers with the chip's compute
                out, mems = self._forward_mems(*args, mems)
            else:
                out = self._forward(*args)
            pending.append((out, valid))
            # keep at most `prefetch` batches in flight while draining —
            # the younger batches' transfers/compute overlap this fetch's
            # wait; prefetch=0 degenerates to fetch-after-dispatch
            while len(pending) > max(self.prefetch, 0):
                done, v = pending.popleft()
                preds.append(np.asarray(jax.device_get(done))[v])
        while pending:
            done, v = pending.popleft()
            preds.append(np.asarray(jax.device_get(done))[v])
        if not preds:
            shape = (0,) if self.num_labels == 1 else (0, self.num_labels)
            return np.empty(shape, np.float32)
        return np.concatenate(preds)

    def submit(self, input_ids, visual, acoustic, input_mask,
               segment_ids):
        """Dispatch one independent request WITHOUT syncing: host cast
        (wire_dtype), device transfer and jitted forward are enqueued
        asynchronously; the returned handle is the device array. Pair
        with :meth:`fetch`. Not for mems predictors (a memory chain
        makes requests order-dependent — use predict_split)."""
        if self.mem_len is not None:
            raise ValueError(
                "submit/fetch serve independent requests; a mems "
                "predictor's memory chain makes batches order-dependent "
                "— use predict_split")
        vis, ac = visual, acoustic
        if self.wire_dtype is not None:
            vis = np.asarray(vis).astype(self.wire_dtype)
            ac = np.asarray(ac).astype(self.wire_dtype)
        return self._forward(
            self.params,
            jax.device_put(input_ids, self._bsh),
            jax.device_put(vis, self._bsh),
            jax.device_put(ac, self._bsh),
            jax.device_put(input_mask, self._bsh),
            jax.device_put(segment_ids, self._bsh))

    @staticmethod
    def fetch(handle) -> np.ndarray:
        """Block on one submitted request and return host predictions."""
        return np.asarray(jax.device_get(handle))

    def predict_requests(self, requests, in_flight: int = 2):
        """Serve a stream of INDEPENDENT requests, keeping up to
        ``in_flight`` dispatched ahead of the fetch point — request
        N+1's payload transfer and forward overlap request N's fetch
        instead of paying transfer + compute + fetch serially (on the
        tunneled chip the round-trip dominates per-request latency, so
        two-in-flight recovers most of the chained-throughput bound;
        BENCHMARKS.md "Serving request concurrency").

        ``requests`` yields (input_ids, visual, acoustic, input_mask,
        segment_ids) tuples; predictions are yielded per request, in
        order. ``in_flight=1`` degenerates to the synchronous loop.
        """
        from collections import deque

        if in_flight < 1:
            raise ValueError(f"in_flight must be >= 1, got {in_flight}")
        pending = deque()
        for req in requests:
            pending.append(self.submit(*req))
            while len(pending) >= in_flight:
                yield self.fetch(pending.popleft())
        while pending:
            yield self.fetch(pending.popleft())

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


# ---- serving-artifact export (StableHLO via jax.export) --------------------
#
# The Predictor above serves in-process (model code + params in this
# package). The functions below are the out-of-process story: serialize
# the trained, deterministic forward as a StableHLO artifact (weights
# captured as constants, symbolic batch dimension, lowered per platform)
# that any JAX process can deserialize and call WITHOUT this package's
# model code. The reference's deployment story ends at an in-memory
# torch state_dict (multimodal_driver.py:483-552 keeps ``best_model``
# and never writes it).
#
# Portability is the contract, so the export re-clones the model onto
# the einsum attention path by default: the fused Pallas kernels
# serialize as ``tpu_custom_call`` ops whose Mosaic payload is pinned to
# a libtpu version — exactly the coupling a serving artifact must not
# carry (jax.export refuses them unless explicitly waived). Pass
# ``keep_attention_impl=True`` to export the fused path anyway for a
# same-fleet deployment (platforms must then be TPU-only).

_MAGIC = "magtpu-serving"
_VERSION = 1


def export_forward(
    model,
    params,
    *,
    seq_len: int,
    visual_dim: int,
    acoustic_dim: int,
    platforms: Sequence[str] = ("tpu", "cpu"),
    keep_attention_impl: bool = False,
    batch_size: Optional[int] = None,
):
    """Export ``model``'s deterministic forward as a ``jax.export.Exported``.

    The exported callable has the trainer's predict signature
    (``input_ids [b,S] i32, visual [b,S,Dv] f32, acoustic [b,S,Da] f32,
    attention_mask [b,S] i32, token_type_ids [b,S] i32 -> logits``) with
    ``b`` symbolic (one artifact, any batch size) — or fixed to
    ``batch_size`` when given. ``params`` are closed over and serialized
    into the artifact (a serving bundle, not a checkpoint).

    ``keep_attention_impl=True`` requires a concrete ``batch_size``: the
    fused Pallas kernels' VMEM plans are RESOLVED from the concrete
    batch (compile-probed plan resolvers, ops/fused_attention.py), so a
    fused artifact is inherently per-batch-size.
    """
    if not keep_attention_impl:
        cfg = model.config
        updates = {}
        if getattr(cfg, "attention_impl", "einsum") != "einsum":
            updates["attention_impl"] = "einsum"
        if getattr(cfg, "tp_attention_mesh", None) is not None:
            # a Mesh pins the artifact to this process's device topology;
            # the serving forward is single-program (shard at load time)
            updates["tp_attention_mesh"] = None
        if updates:
            model = model.clone(
                config=dataclasses.replace(cfg, **updates))
        checks = ()
    else:
        non_tpu = [p for p in platforms if p.lower() != "tpu"]
        if non_tpu:
            raise ValueError(
                "keep_attention_impl=True exports the Pallas kernel path, "
                f"which only lowers for TPU — drop {non_tpu} from platforms "
                "or export the portable einsum path (default)")
        if batch_size is None:
            raise ValueError(
                "keep_attention_impl=True exports the fused Pallas "
                "kernel path, whose VMEM kernel plans are resolved from "
                "the concrete batch size (ops/fused_attention.py plan "
                "resolvers) — a symbolic batch dimension is impossible; "
                "pass batch_size=<N> for a fixed-batch artifact")
        checks = (jax_export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call"),)

    def forward(input_ids, visual, acoustic, attention_mask,
                token_type_ids):
        out = model.apply({"params": params}, input_ids, visual, acoustic,
                          attention_mask=attention_mask,
                          token_type_ids=token_type_ids,
                          deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    specs = (
        jax.ShapeDtypeStruct((b, seq_len), jnp.int32),
        jax.ShapeDtypeStruct((b, seq_len, visual_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, seq_len, acoustic_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, seq_len), jnp.int32),
        jax.ShapeDtypeStruct((b, seq_len), jnp.int32),
    )
    return jax_export.export(
        jax.jit(forward), platforms=[p.lower() for p in platforms],
        disabled_checks=list(checks))(*specs)


def save_artifact(path: str, exported, *, meta: Optional[dict] = None
                  ) -> None:
    """Write the serialized artifact plus a JSON sidecar (``path.json``)
    describing its calling convention — the consumer-facing contract."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    side = {
        "format": _MAGIC,
        "version": _VERSION,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "inputs": [
            {"name": n, "shape": [str(d) for d in s.shape],
             "dtype": str(s.dtype)}
            for n, s in zip(
                ("input_ids", "visual", "acoustic", "attention_mask",
                 "token_type_ids"), exported.in_avals)
        ],
        "outputs": [{"shape": [str(d) for d in s.shape],
                     "dtype": str(s.dtype)}
                    for s in exported.out_avals],
    }
    side.update(meta or {})
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=2)


def load_artifact(path: str):
    """Deserialize a saved artifact into a callable ``fn(input_ids,
    visual, acoustic, attention_mask, token_type_ids) -> logits``.
    Needs only jax — none of this package's model code."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(bytearray(blob))

    def serve(input_ids, visual, acoustic, attention_mask,
              token_type_ids):
        return exported.call(
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(visual, jnp.float32),
            jnp.asarray(acoustic, jnp.float32),
            jnp.asarray(attention_mask, jnp.int32),
            jnp.asarray(token_type_ids, jnp.int32))

    serve.exported = exported
    return serve


def predict_batches(serve_fn, loader) -> Tuple[np.ndarray, np.ndarray]:
    """Run a (batch, valid) loader through a loaded artifact — the
    serving twin of Trainer.test_epoch (reference test_epoch,
    multimodal_driver.py:424-459). Returns (preds, labels) with padding
    rows dropped; regression artifacts ([B] or [B,1] outputs) yield 1-D
    preds, classification artifacts ([B,C]) keep the class axis —
    mirroring Predictor.predict_split."""
    preds, labels = [], []
    for batch, valid in loader:
        ids, vis, aco, mask, seg, lab = batch
        p = np.asarray(jax.device_get(serve_fn(ids, vis, aco, mask, seg)))
        v = np.asarray(valid)
        p = p[v]  # mask rows before any flatten — [B,C] stays per-row
        if p.ndim > 1 and p.shape[-1] == 1:
            p = p.reshape(-1)
        preds.append(p)
        labels.append(np.asarray(lab).reshape(-1)[v])
    return np.concatenate(preds), np.concatenate(labels)
