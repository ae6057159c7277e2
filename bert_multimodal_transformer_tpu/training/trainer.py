"""Training / evaluation engine.

Re-derivation of the reference's training stack
(multimodal_driver.py:289-523) as jit-compiled SPMD functions:

  * one jitted ``train_step`` — forward (MSE on logits, computed outside the
    model exactly as the reference does at multimodal_driver.py:371-373),
    backward, AdamW update; gradient accumulation is a ``lax.scan`` over
    micro-batches *inside* the step (reference: Python micro-batch loop,
    :375-386);
  * batch sharded over the ``data`` mesh axis, parameters replicated — XLA
    emits the gradient all-reduce over ICI;
  * jitted eval/predict steps with validity masks so padded eval batches
    score every example exactly once;
  * epoch drivers (train_epoch / eval_epoch / test_epoch / test_score_model /
    train) mirroring multimodal_driver.py:354-523.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from bert_multimodal_transformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from bert_multimodal_transformer_tpu.training import metrics as metrics_lib
from bert_multimodal_transformer_tpu.training.losses import mse_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, tx, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng, apply_fn=apply_fn,
                   tx=tx)


def _forward(apply_fn, params, batch, rng, deterministic: bool,
             mems=None):
    input_ids, visual, acoustic, input_mask, segment_ids, label_ids = batch
    kwargs = {}
    if not deterministic:
        kwargs = {"rngs": {"dropout": rng}}
    if mems is not None:
        # XLNet segment recurrence (reference cache_mem, xlnet.py:81-91):
        # under use_cache the classifier returns (logits, new_mems, ...)
        # (xlnet.py:510-513)
        out = apply_fn(
            {"params": params}, input_ids, visual, acoustic,
            attention_mask=input_mask, token_type_ids=segment_ids,
            mems=mems, use_cache=True,
            deterministic=deterministic, **kwargs)
        return out[0], label_ids, out[1]
    logits = apply_fn(
        {"params": params}, input_ids, visual, acoustic,
        attention_mask=input_mask, token_type_ids=segment_ids,
        deterministic=deterministic, **kwargs)
    return logits, label_ids


def _make_step(grad_accum: int, masked: bool):
    """Shared train-step builder (see make_train_step /
    make_masked_train_step for the two public semantics). ``masked`` is a
    Python-level switch, so the unmasked (perf-default) trace is
    byte-identical to a hand-written unmasked step — only the ragged-tail
    variant carries the valid mask through the scan."""

    def loss_fn(params, apply_fn, micro, rng, valid):
        logits, labels = _forward(apply_fn, params, micro, rng,
                                  deterministic=False)
        if not masked:
            return mse_loss(logits, labels)
        err = jnp.square(logits.reshape(-1).astype(jnp.float32)
                         - labels.reshape(-1).astype(jnp.float32))
        return jnp.sum(err * valid)

    def train_step(state: TrainState, batch: Tuple,
                   valid: Optional[jax.Array] = None):
        if masked:
            valid = valid.astype(jnp.float32)
        rng, new_rng = jax.random.split(state.rng)
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, state.apply_fn, batch, rng, valid)
        else:
            micro_batches = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]),
                batch)
            micro_rngs = jax.random.split(rng, grad_accum)
            xs = (micro_batches, micro_rngs)
            if masked:
                xs = xs + (valid.reshape(grad_accum, -1),)

            def scan_body(carry, inp):
                acc_grads, acc_loss = carry
                micro, mrng = inp[0], inp[1]
                mvalid = inp[2] if masked else None
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, state.apply_fn, micro, mrng, mvalid)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(
                scan_body, (zero_grads, jnp.zeros(())), xs)
        if masked:
            # sum-of-squared-errors over valid examples -> masked mean
            n = jnp.maximum(jnp.sum(valid), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            loss = loss / n
        elif grad_accum > 1:
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
            loss = loss / grad_accum

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, rng=new_rng)
        return new_state, loss

    return train_step


def make_train_step(grad_accum: int = 1):
    """Builds the jitted train step.

    With grad_accum > 1 the batch's leading dim is split into
    [grad_accum, B/grad_accum, ...] and scanned; gradients are averaged —
    matching the reference's loss/accum scaling (multimodal_driver.py:375-386)
    where each micro-loss is divided by the accumulation count.
    """
    step = _make_step(grad_accum, masked=False)

    def train_step(state: TrainState, batch: Tuple):
        return step(state, batch)

    return train_step


def make_masked_train_step(grad_accum: int = 1):
    """Train step for the final RAGGED batch: zero-padded to shape with a
    per-example validity mask, loss = masked mean. The reference trains on
    the ragged tail as a smaller torch batch (multimodal_driver.py:358-386);
    a masked mean over the padded batch is numerically identical, and keeps
    every compiled shape static. Full batches (valid all-ones) reduce to
    exactly the unmasked step's math."""
    return _make_step(grad_accum, masked=True)


def eval_step(state: TrainState, batch: Tuple, valid: jax.Array):
    """Masked dev-set MSE: returns (sum_sq_err, n_valid) so ragged final
    batches contribute exactly their real examples."""
    logits, labels = _forward(state.apply_fn, state.params, batch,
                              rng=None, deterministic=True)
    err = jnp.square(logits.reshape(-1) - labels.reshape(-1))
    v = valid.astype(jnp.float32)
    return jnp.sum(err * v), jnp.sum(v)


def predict_step(state: TrainState, batch: Tuple):
    logits, labels = _forward(state.apply_fn, state.params, batch,
                              rng=None, deterministic=True)
    return logits.reshape(-1), labels.reshape(-1)


# ---- XLNet segment-recurrence (mems-carrying) step variants ----
# The reference's only long-context mechanism is Transformer-XL memory
# (xlnet.py:81-91, klen = mlen + qlen at :241-242) — dormant in its
# driver, first-class here: fixed-shape mems threaded through every
# step, carried across batches, reset at epoch boundaries. Gradients do
# not flow into mems (the model stop_gradients its cache), exactly the
# torch semantics.

def make_mems_train_step(masked: bool, grad_accum: int = 1):
    """``grad_accum > 1``: the loader batch's [A·B, ...] rows scan as A
    sequential micro-batches of B rows, and the memory chains THROUGH
    the scan — micro-batch i consumes micro-batch i−1's cache, exactly
    the reference's use_cache chain (xlnet.py:363-365) — while the
    gradients accumulate against the step's (constant) params. The
    returned memory is the last micro-batch's, so the chain continues
    seamlessly into the next optimizer step."""

    def loss_fn(params, apply_fn, batch, rng, valid, mems):
        logits, labels, new_mems = _forward(apply_fn, params, batch, rng,
                                            deterministic=False, mems=mems)
        if not masked:
            return mse_loss(logits, labels), new_mems
        err = jnp.square(logits.reshape(-1).astype(jnp.float32)
                         - labels.reshape(-1).astype(jnp.float32))
        return jnp.sum(err * valid), new_mems

    def train_step(state: TrainState, batch: Tuple, mems,
                   valid: Optional[jax.Array] = None):
        if masked:
            valid = valid.astype(jnp.float32)
        rng, new_rng = jax.random.split(state.rng)
        if grad_accum == 1:
            (loss, new_mems), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.apply_fn,
                                       batch, rng, valid, mems)
        else:
            micro_batches = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]),
                batch)
            micro_rngs = jax.random.split(rng, grad_accum)
            xs = (micro_batches, micro_rngs)
            if masked:
                xs = xs + (valid.reshape(grad_accum, -1),)

            def scan_body(carry, inp):
                acc_grads, acc_loss, m = carry
                micro, mrng = inp[0], inp[1]
                mvalid = inp[2] if masked else None
                (loss, new_m), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, state.apply_fn,
                                           micro, mrng, mvalid, m)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads,
                                                   grads)
                return (acc_grads, acc_loss + loss, new_m), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like,
                                                state.params)
            (grads, loss, new_mems), _ = jax.lax.scan(
                scan_body, (zero_grads, jnp.zeros(()), mems), xs)
        if masked:
            n = jnp.maximum(jnp.sum(valid), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            loss = loss / n
        elif grad_accum > 1:
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
            loss = loss / grad_accum
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, rng=new_rng)
        return new_state, loss, new_mems

    return train_step


def mems_eval_step(state: TrainState, batch: Tuple, valid: jax.Array,
                   mems):
    logits, labels, new_mems = _forward(state.apply_fn, state.params,
                                        batch, rng=None,
                                        deterministic=True, mems=mems)
    err = jnp.square(logits.reshape(-1) - labels.reshape(-1))
    v = valid.astype(jnp.float32)
    return jnp.sum(err * v), jnp.sum(v), new_mems


def mems_predict_step(state: TrainState, batch: Tuple, mems):
    logits, labels, new_mems = _forward(state.apply_fn, state.params,
                                        batch, rng=None,
                                        deterministic=True, mems=mems)
    return logits.reshape(-1), labels.reshape(-1), new_mems


@dataclasses.dataclass
class Trainer:
    """Epoch-level driver. Owns the mesh, the compiled steps and the state.

    ``model`` is any Flax module with the MAG-classifier call signature
    (input_ids, visual, acoustic, attention_mask=, token_type_ids=,
    deterministic=) → logits — both MagBertForSequenceClassification and
    MagXLNetForSequenceClassification satisfy it.
    """

    model: Any
    tx: optax.GradientTransformation
    mesh: Optional[Mesh] = None
    grad_accum: int = 1
    donate: bool = True
    # Under TP (model axis > 1), additionally head-shard the XLNet
    # relative-attention weights (einsum attention path only —
    # parallel/tp.py docstring).
    tp_shard_attention: bool = False
    # ZeRO-3: shard params + optimizer moments over the data axis
    # (parallel/fsdp.py); composes with TP on a 2-D mesh.
    fsdp: bool = False
    # XLNet segment recurrence: carry fixed-shape Transformer-XL memory
    # ([B, mem_len, D] per layer, reference xlnet.py:81-91) across the
    # batch stream, reset at epoch/split boundaries. Must equal the model
    # config's mem_len. Static shapes mean the memory starts as ZEROS
    # (and zero-valued positions are attended — they receive softmax
    # mass through their position biases until real segments flush
    # them), where torch grows the window from empty: the chain equals
    # the model's own use_cache path driven with the same zero init
    # (tests/test_mems_trainer.py), NOT a growing-window torch run —
    # the warmup difference decays but the trajectories are not
    # bit-equal.
    mem_len: Optional[int] = None
    # Optional XLA compile options for every jitted step (e.g.
    # {"xla_tpu_scoped_vmem_limit_kib": "65536"}). Passed straight to
    # jax.jit(compiler_options=...); invalid names/values fail loudly at
    # compile time. This is the reliable per-program knob on a PJRT
    # backend — process-level LIBTPU_INIT_ARGS measured as a no-op
    # through the tunneled plugin (BENCHMARKS.md "XLA compile-option
    # sweep").
    compiler_options: Optional[dict] = None
    # Multi-process SPMD (one process per host — the way real pods run;
    # parallel/multiprocess.py). Loaders must yield process-LOCAL batch
    # rows (ShardedBatchIterator); _put_batch assembles global arrays
    # spanning every process from them, and test_epoch allgathers
    # predictions so every process scores the full split. Requires
    # jax.distributed.initialize before building the Trainer.
    multiprocess: bool = False

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh()
        if self.multiprocess and self.mem_len is not None:
            raise ValueError(
                "multiprocess does not compose with mem_len (the memory "
                "init builds [B, mlen, D] zeros from the local batch "
                "shape; global assembly for mems is not implemented)")
        if self.tp_shard_attention:
            # Guard the preconditions the CLI enforces (driver.py) for
            # direct Trainer users too.
            mp = self.mesh.shape.get("model", 1)
            cfg = getattr(self.model, "config", None)
            impl = getattr(cfg, "attention_impl", "einsum")
            if mp <= 1:
                raise ValueError(
                    "tp_shard_attention requires a mesh model axis > 1")
            if impl == "flash":
                raise ValueError(
                    "tp_shard_attention supports einsum and fused "
                    "attention, not flash")
            if (impl == "fused"
                    and getattr(cfg, "tp_attention_mesh", None) is None):
                raise ValueError(
                    "tp_shard_attention with the fused kernels needs the "
                    "model built with tp_attention_mesh=<mesh> (the "
                    "pallas_call is shard_map'd over the model axis; "
                    "ops/fused_attention.py TP wrappers)")
            n_head = getattr(cfg, "n_head",
                             getattr(cfg, "num_attention_heads", 0))
            if n_head % mp != 0:
                raise ValueError(
                    f"tp_shard_attention needs n_head ({n_head}) divisible "
                    f"by the model-axis size ({mp})")
        self._bsh = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        # model-axis > 1 → tensor parallelism: params carry per-leaf
        # shardings (parallel/tp.py rules) instead of being replicated;
        # the jitted steps then inherit shardings from their arguments
        # and XLA SPMD inserts the FFN collectives. FSDP (ZeRO-3,
        # parallel/fsdp.py) works the same way: the state is device_put
        # with per-leaf data-axis shardings and the steps infer.
        self._tp = self.mesh.shape.get("model", 1) > 1
        explicit = not (self._tp or self.fsdp)

        def _jit(fn, **kw):
            if self.compiler_options:
                kw["compiler_options"] = dict(self.compiler_options)
            return jax.jit(fn, **kw)

        train_step = make_train_step(self.grad_accum)
        self._train_step = _jit(
            train_step,
            in_shardings=(self._rep, self._bsh) if explicit else None,
            out_shardings=(self._rep, self._rep) if explicit else None,
            donate_argnums=(0,) if self.donate else (),
        )
        # compiled lazily — only a training run whose final batch is
        # actually ragged ever pays for this variant
        self._train_step_masked = _jit(
            make_masked_train_step(self.grad_accum),
            in_shardings=(self._rep, self._bsh,
                          self._bsh) if explicit else None,
            out_shardings=(self._rep, self._rep) if explicit else None,
            donate_argnums=(0,) if self.donate else (),
        )
        self._eval_step = _jit(
            eval_step,
            in_shardings=(self._rep, self._bsh,
                          self._bsh) if explicit else None,
            out_shardings=(self._rep, self._rep) if explicit else None,
        )
        self._predict_step = _jit(
            predict_step,
            in_shardings=(self._rep, self._bsh) if explicit else None,
            out_shardings=(self._bsh, self._bsh) if explicit else None,
        )

        if self.mem_len is not None:
            cfg = getattr(self.model, "config", None)
            if getattr(cfg, "mem_len", None) != self.mem_len:
                raise ValueError(
                    f"Trainer(mem_len={self.mem_len}) needs the model "
                    f"built with config.mem_len={self.mem_len} (got "
                    f"{getattr(cfg, 'mem_len', None)}) — the model's "
                    "cache_mem truncation reads its own config")
            if self._tp or self.fsdp:
                raise ValueError(
                    "mem_len supports the data-parallel trainer "
                    "(mems shard over the batch axis)")
            # mems tuples shard like batches: [B, mlen, D] per layer
            msh = None if not explicit else jax.tree_util.tree_map(
                lambda _: self._bsh, tuple(range(cfg.n_layer)))
            self._train_step_mems = _jit(
                make_mems_train_step(masked=False,
                                     grad_accum=self.grad_accum),
                in_shardings=((self._rep, self._bsh, msh)
                              if explicit else None),
                out_shardings=((self._rep, self._rep, msh)
                               if explicit else None),
                donate_argnums=(0, 2) if self.donate else (),
            )
            self._train_step_mems_masked = _jit(
                make_mems_train_step(masked=True,
                                     grad_accum=self.grad_accum),
                in_shardings=((self._rep, self._bsh, msh, self._bsh)
                              if explicit else None),
                out_shardings=((self._rep, self._rep, msh)
                               if explicit else None),
                donate_argnums=(0, 2) if self.donate else (),
            )
            self._eval_step_mems = _jit(
                mems_eval_step,
                in_shardings=((self._rep, self._bsh, self._bsh, msh)
                              if explicit else None),
                out_shardings=((self._rep, self._rep, msh)
                               if explicit else None),
                donate_argnums=(3,) if self.donate else (),
            )
            self._predict_step_mems = _jit(
                mems_predict_step,
                in_shardings=((self._rep, self._bsh, msh)
                              if explicit else None),
                out_shardings=((self._bsh, self._bsh, msh)
                               if explicit else None),
                donate_argnums=(2,) if self.donate else (),
            )

    def _init_mems(self, batch, *, for_train: bool = False):
        """Fixed-shape zero memory for a new epoch/split: n_layer ×
        [B, mem_len, d_model] at the model dtype, placed batch-sharded.
        With grad accumulation a TRAIN loader batch holds A·B rows that
        scan as A sequential B-row segments, so the carried memory is
        B rows (eval/predict loaders are un-accumulated)."""
        cfg = self.model.config
        b = np.asarray(batch[0]).shape[0]
        if for_train:
            b //= self.grad_accum
        dt = getattr(self.model, "dtype", jnp.float32)
        zeros = tuple(
            jnp.zeros((b, self.mem_len, cfg.d_model), dt)
            for _ in range(cfg.n_layer))
        return jax.device_put(zeros, jax.tree_util.tree_map(
            lambda _: self._bsh, zeros))

    def _state_sharding(self, state):
        if self.fsdp:
            from bert_multimodal_transformer_tpu.parallel.fsdp import (
                make_fsdp_state_shardings)
            return make_fsdp_state_shardings(
                state, self.mesh,
                shard_attention=self.tp_shard_attention)
        if not self._tp:
            return self._rep
        from bert_multimodal_transformer_tpu.parallel.tp import (
            make_state_shardings)
        return make_state_shardings(
            state, self.mesh,
            shard_attention=self.tp_shard_attention)

    def init_state(self, rng: jax.Array, sample_batch: Tuple) -> TrainState:
        input_ids, visual, acoustic, input_mask, segment_ids, _ = sample_batch
        params = self.model.init(
            rng, jnp.asarray(input_ids), jnp.asarray(visual),
            jnp.asarray(acoustic), jnp.asarray(input_mask),
            jnp.asarray(segment_ids))["params"]
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx,
            rng=jax.random.fold_in(rng, 1))
        return jax.device_put(state, self._state_sharding(state))

    def create_state_from_params(self, params, rng: jax.Array) -> TrainState:
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=self.tx, rng=rng)
        return jax.device_put(state, self._state_sharding(state))

    def _put_batch(self, batch):
        if self.multiprocess:
            # batch holds THIS process's rows; the assembled arrays span
            # every process's devices (parallel/multiprocess.py)
            return tuple(
                jax.make_array_from_process_local_data(self._bsh,
                                                       np.asarray(a))
                for a in batch)
        return tuple(jax.device_put(np.asarray(a), self._bsh) for a in batch)

    def _put_valid(self, valid):
        if self.multiprocess:
            return jax.make_array_from_process_local_data(
                self._bsh, np.asarray(valid))
        return jax.device_put(np.asarray(valid), self._bsh)

    def train_epoch(self, state: TrainState, loader) -> Tuple[TrainState, float]:
        """Mirrors train_epoch (multimodal_driver.py:354-388): mean loss.
        A ragged final batch (loader with drop_remainder=False) trains via
        the masked step — same semantics as the reference's smaller tail
        batch, with static shapes."""
        state, loss, _ = self._train_epoch(state, loader)
        return state, loss

    def _train_epoch(self, state: TrainState, loader, *,
                     start_batch: int = 0, step_callback=None,
                     max_steps: Optional[int] = None):
        """train_epoch plus the preemption-safe-resume mechanics: skip the
        first ``start_batch`` batches (already trained before an
        interruption — the loader replays the identical shuffle order, see
        BatchIterator.restore_position), invoke ``step_callback(state,
        batch_idx)`` after each optimizer step, and stop mid-epoch after
        ``max_steps`` steps. Returns (state, mean_loss, info) with
        info = {"steps": n, "stopped_at_batch": next batch to train or
        None if the epoch completed}."""
        losses = []
        stopped_at = None
        n_batches = len(loader) if hasattr(loader, "__len__") else None
        if start_batch and hasattr(loader, "iter_from"):
            # skip already-trained batches without materializing them
            it = enumerate(loader.iter_from(start_batch),
                           start=start_batch)
        else:
            it = enumerate(loader)
        mems = None  # segment recurrence: fresh memory each epoch (and
        # after a mid-epoch resume — activation state is not checkpointed)
        for bi, (batch, valid) in it:
            if bi < start_batch:
                continue
            if self.mem_len is not None:
                if mems is None:
                    mems = self._init_mems(batch, for_train=True)
                if valid.all():
                    state, loss, mems = self._train_step_mems(
                        state, self._put_batch(batch), mems)
                else:
                    state, loss, mems = self._train_step_mems_masked(
                        state, self._put_batch(batch), mems,
                        self._put_valid(valid))
            elif valid.all():
                state, loss = self._train_step(state, self._put_batch(batch))
            else:
                state, loss = self._train_step_masked(
                    state, self._put_batch(batch), self._put_valid(valid))
            losses.append(loss)
            if step_callback is not None:
                step_callback(state, bi)
            if (max_steps is not None and len(losses) >= max_steps
                    and (n_batches is None or bi + 1 < n_batches)):
                stopped_at = bi + 1
                break
        mean = (float(np.mean([jax.device_get(l) for l in losses]))
                if losses else 0.0)
        return state, mean, {"steps": len(losses),
                             "stopped_at_batch": stopped_at}

    def eval_epoch(self, state: TrainState, loader) -> float:
        """Mirrors eval_epoch (multimodal_driver.py:391-421): mean dev MSE
        (exact per-example mean; the reference averages per-batch means).
        Partial sums stay on device; one host sync at epoch end."""
        sums = []
        mems = None
        for batch, valid in loader:
            if self.mem_len is not None:
                if mems is None:
                    mems = self._init_mems(batch)
                s, c, mems = self._eval_step_mems(
                    state, self._put_batch(batch),
                    self._put_valid(valid), mems)
            else:
                s, c = self._eval_step(state, self._put_batch(batch),
                                       self._put_valid(valid))
            sums.append((s, c))
        if not sums:
            return 0.0
        tot = jnp.sum(jnp.stack([s for s, _ in sums]))
        cnt = jnp.sum(jnp.stack([c for _, c in sums]))
        tot, cnt = jax.device_get((tot, cnt))
        return float(tot) / max(float(cnt), 1.0)

    def test_epoch(self, state: TrainState, loader):
        """Mirrors test_epoch (multimodal_driver.py:424-459)."""
        preds, labels = [], []
        mems = None
        for batch, valid in loader:
            if self.mem_len is not None:
                if mems is None:
                    mems = self._init_mems(batch)
                p, l, mems = self._predict_step_mems(
                    state, self._put_batch(batch), mems)
            else:
                p, l = self._predict_step(state, self._put_batch(batch))
            if self.multiprocess:
                # predictions are batch-sharded across processes; gather
                # the full batch (and every process's valid rows) so all
                # processes score the complete split identically
                from jax.experimental import multihost_utils

                p = multihost_utils.process_allgather(p, tiled=True)
                l = multihost_utils.process_allgather(l, tiled=True)
                valid = multihost_utils.process_allgather(
                    np.asarray(valid), tiled=True)
            p = np.asarray(jax.device_get(p))[valid]
            l = np.asarray(jax.device_get(l))[valid]
            preds.append(p)
            labels.append(l)
        return np.concatenate(preds), np.concatenate(labels)

    def test_score_model(self, state: TrainState, loader,
                         use_zero: bool = False) -> Dict[str, float]:
        preds, labels = self.test_epoch(state, loader)
        return metrics_lib.score_regression(preds, labels, use_zero=use_zero)

    def train(self, state: TrainState, train_loader, dev_loader, test_loader,
              n_epochs: int, logger=None,
              epoch_callback=None, use_zero: bool = False,
              start_epoch: int = 0, start_batch: int = 0,
              initial_history=None, step_callback=None,
              max_steps: Optional[int] = None
              ) -> Tuple[TrainState, Dict]:
        """Epoch driver mirroring train() (multimodal_driver.py:483-523),
        with the same per-epoch metric dict. ``epoch_callback(state, epoch)``
        runs after each epoch's logging (e.g. checkpointing).

        Preemption-safe resume: ``start_epoch``/``start_batch`` resume an
        interrupted run mid-epoch (the train loader must be positioned with
        BatchIterator.restore_position first so the shuffle order replays);
        ``initial_history`` carries the completed epochs' records so
        best_valid_loss/best_test_acc stay correct. ``step_callback(state,
        epoch, batch_idx)`` runs after every optimizer step (step-level
        checkpointing). ``max_steps`` stops after that many optimizer steps
        in THIS call; the summary's "interrupted" entry then holds the
        resume position {"epoch", "next_batch"} (None when training ran to
        completion) — continuing from it reproduces the uninterrupted run's
        parameters bit-for-bit (tests/test_resume.py)."""
        history = list(initial_history or [])
        valid_losses = [r["valid_loss"] for r in history]
        test_accs = [r["test_acc"] for r in history]
        steps_left = max_steps
        interrupted = None
        for epoch_i in range(int(start_epoch), int(n_epochs)):
            t0 = time.monotonic()
            cb = None
            if step_callback is not None:
                def cb(st, bi, _e=epoch_i):
                    step_callback(st, _e, bi)
            state, train_loss, info = self._train_epoch(
                state, train_loader,
                start_batch=start_batch if epoch_i == start_epoch else 0,
                step_callback=cb, max_steps=steps_left)
            if steps_left is not None:
                steps_left -= info["steps"]
            if info["stopped_at_batch"] is not None:
                interrupted = {"epoch": epoch_i,
                               "next_batch": info["stopped_at_batch"]}
                break
            valid_loss = self.eval_epoch(state, dev_loader)
            scores = self.test_score_model(state, test_loader,
                                           use_zero=use_zero)
            dt = time.monotonic() - t0
            valid_losses.append(valid_loss)
            test_accs.append(scores["acc"])
            record = {
                "epoch": epoch_i,
                "train_loss": train_loss,
                # a mid-epoch-resumed epoch's train_loss averages only the
                # post-resume batches (eval/test below are full and exact);
                # mark it so readers don't compare it against full epochs
                **({"resumed_mid_epoch": True}
                   if epoch_i == start_epoch and start_batch else {}),
                "valid_loss": valid_loss,
                "test_acc": scores["acc"],
                "test_mae": scores["mae"],
                "test_corr": scores["corr"],
                "test_f_score": scores["f_score"],
                "best_valid_loss": min(valid_losses),
                "best_test_acc": max(test_accs),
                "epoch_seconds": dt,
            }
            history.append(record)
            if logger is not None:
                logger.log(record)
            if epoch_callback is not None:
                epoch_callback(state, epoch_i)
            if (steps_left is not None and steps_left <= 0
                    and epoch_i + 1 < int(n_epochs)):
                interrupted = {"epoch": epoch_i + 1, "next_batch": 0}
                break
        return state, {"history": history,
                       "best_valid_loss": min(valid_losses) if valid_losses
                       else float("inf"),
                       "best_test_acc": max(test_accs) if test_accs else 0.0,
                       "interrupted": interrupted}
