"""GPipe-style pipeline parallelism for MAG-BERT.

The reference is single-GPU (global_configs.py:4-7) — it has no pipeline
(or any distributed) execution at all. This module is the TPU-native
pipelining layer the framework offers beyond the reference: encoder
stages laid out over a ``pipe`` mesh axis, activations travelling
stage-to-stage over ICI via ``lax.ppermute``, and the GPipe microbatch
schedule written as a single ``lax.scan`` over ticks so the whole
pipelined training step is ONE compiled XLA program (no Python-level
stage loop, no host round-trips between microbatches).

Design (scaling-book pipelining recipe, re-derived for this model):

  * The model is split into PROLOGUE (embeddings + MAG — the reference
    fuses the modalities right after the embedding layer,
    bert.py:76-237), a homogeneous stack of ``BertLayer``s distributed
    over the pipe axis, and EPILOGUE (pooler + dropout + classifier,
    reference bert.py:240-324).
  * Per-stage layer parameters are STACKED on a leading axis of size
    ``num_hidden_layers`` and sharded ``P("pipe")`` — each device holds
    its ``L/n_stages`` consecutive layers and scans over them locally.
    Prologue/epilogue parameters are replicated over the pipe axis
    (their gradients are psum'd so every rank applies the identical
    optimizer update).
  * Schedule: ``T = n_micro + n_stages - 1`` ticks. At tick ``t`` rank
    ``r`` processes microbatch ``m = t - r`` (bubble ticks compute
    masked garbage — the standard GPipe bubble, fraction
    ``(n_stages-1)/T``). Activations move via ``ppermute``; microbatch
    inputs/labels stay device-resident per rank (every rank holds the
    full local batch and slices the microbatch it needs, so only the
    [mb, S, D] activation ever crosses ICI).
  * Differentiation: ``jax.value_and_grad`` runs INSIDE ``shard_map``
    (the explicit-collectives formulation, parallel/shard_map_step.py).
    The per-device loss is the LOCAL masked contribution (non-zero only
    on the last rank) — the collective transposes of ppermute carry the
    cotangents backward through the stages, so each rank's layer
    gradients come out exactly right; prologue/epilogue gradients are
    then psum'd over ``pipe`` and everything reduced over ``data``.
  * The optimizer update runs per-device on the local parameter shards
    (optax transforms are elementwise; the HF-exact AdamW in
    training/optim.py qualifies — global-norm clipping would need a
    cross-stage norm and is not supported).

``PipelineTrainer`` subclasses the plain ``Trainer`` and swaps only the
four jitted steps (train / masked-train / eval / predict), so every
epoch driver, the preemption-safe resume machinery, and the scoring
paths (training/trainer.py) run unchanged on top of the pipeline.

Numerics: a pipelined step is exactly a grad_accum=n_micro data step —
tests/test_pipeline_parallel.py asserts loss and updated parameters
match the plain Trainer to fp32 tolerance on the virtual 8-device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert_multimodal_transformer_tpu.models.bert import (
    BertEmbeddings,
    BertLayer,
    BertPooler,
    BertSelfAttention,
    LayerNorm,
)
from bert_multimodal_transformer_tpu.ops.activations import ACT2FN
from bert_multimodal_transformer_tpu.parallel.mesh import MODEL_AXIS
from bert_multimodal_transformer_tpu.models.mag import MAG
from bert_multimodal_transformer_tpu.ops.attention import (
    extended_attention_mask,
)
from bert_multimodal_transformer_tpu.parallel.mesh import DATA_AXIS
from bert_multimodal_transformer_tpu.parallel.shard_map_step import shard_map
from bert_multimodal_transformer_tpu.training.losses import mse_loss
from bert_multimodal_transformer_tpu.training.trainer import (
    Trainer,
    TrainState,
)

PIPE_AXIS = "pipe"


def make_pp_mesh(n_stages: int, data_parallel: int = 1,
                 devices=None, model_parallel: int = 1) -> Mesh:
    """(data, pipe[, model]) mesh. The pipe axis sits outside the model
    axis so a stage's TP group is ICI-adjacent (the per-layer FFN psums
    ride one hop) and consecutive stages are contiguous blocks
    (activations hop between neighbouring groups)."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_stages * data_parallel * model_parallel
    if need > len(devices):
        raise ValueError(
            f"pp mesh {data_parallel}x{n_stages}x{model_parallel} needs "
            f"{need} devices, have {len(devices)}")
    if model_parallel > 1:
        arr = np.asarray(devices[:need]).reshape(
            data_parallel, n_stages, model_parallel)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices[:need]).reshape(data_parallel, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# ---- Megatron f/g region boundaries (explicit VJPs) -----------------------
#
# Inside shard_map the FFN's tensor-parallel region needs exactly two
# collectives per layer (Megatron-LM's f/g operators):
#   f — identity forward, psum backward: entering the split region, each
#       model rank back-propagates only its kernel shard's partial
#       cotangent; f rebuilds the full cotangent so everything BEHIND
#       the region (attention, LayerNorms, earlier layers) receives
#       identical, complete gradients on every model rank.
#   g — psum forward, identity backward: leaving the split region, the
#       row-parallel partial products sum to the full activation; the
#       downstream cotangent is replicated across ranks, so the
#       backward is the identity (a psum transpose here would
#       overcount by the axis size).
# Explicit custom_vjp rather than relying on shard_map's psum
# transposition so the pairing is self-evident and backend-independent.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_f(x, axis_name: str):
    return x


def _tp_f_fwd(x, axis_name):
    return x, None


def _tp_f_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


_tp_f.defvjp(_tp_f_fwd, _tp_f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_g(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def _tp_g_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _tp_g_bwd(axis_name, _, ct):
    return (ct,)


_tp_g.defvjp(_tp_g_fwd, _tp_g_bwd)


class _RowParallelOut(nn.Module):
    """The FFN's second (row-parallel) matmul: local [F/mp, D] kernel
    shard → partial product → psum over the model axis (g) → the FULL
    bias added once post-psum. Param names match BertLayer's
    ``output_dense`` so the stacked tree stays interchangeable."""

    features: int
    dtype: Any
    kernel_init: Any

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (jnp.shape(x)[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.matmul(x, kernel.astype(self.dtype))
        y = _tp_g(y, MODEL_AXIS)
        return y + bias.astype(self.dtype)


class _TPBertLayer(nn.Module):
    """BertLayer with the FFN Megatron-split over the mesh model axis
    (mirrors models/bert.py::BertLayer math exactly; parallel/tp.py's
    GSPMD formulation of the same sharding, re-expressed with explicit
    collectives because shard_map bodies are per-device). Attention,
    LayerNorms and the output bias stay replicated; the f/g boundaries
    keep every replicated gradient full and identical on all model
    ranks, so no extra cross-model grad psums are needed."""

    config: Any
    dtype: Any = jnp.float32
    mp: int = 1

    @nn.compact
    def __call__(self, hidden: jax.Array, attn_bias, head_mask=None,
                 attention_mask_2d=None, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.config
        if output_attentions:
            raise ValueError("output_attentions unsupported under PPxTP")
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        attn_out = BertSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attn_bias, head_mask, attention_mask_2d,
            deterministic=deterministic)
        x = _tp_f(attn_out, MODEL_AXIS)
        # column-parallel: features attr is the LOCAL width, matching
        # the [D, F/mp] kernel shard this rank holds
        x = nn.Dense(cfg.intermediate_size // self.mp, dtype=self.dtype,
                     kernel_init=init, name="intermediate_dense")(x)
        x = ACT2FN[cfg.hidden_act](x)
        x = _RowParallelOut(cfg.hidden_size, self.dtype, init,
                            name="output_dense")(x)
        x = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)
        return LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="output_LayerNorm")(x + attn_out)


class _Prologue(nn.Module):
    """Embeddings + MAG with the SAME submodule names as MagBertModel so
    the parameter subtrees are interchangeable (models/bert.py:420-497)."""

    config: Any
    multimodal_config: Any
    visual_dim: int
    acoustic_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, visual, acoustic, token_type_ids,
                 deterministic: bool = True):
        cfg = self.config
        emb = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        mm = self.multimodal_config
        return MAG(
            hidden_size=cfg.hidden_size,
            visual_dim=self.visual_dim,
            acoustic_dim=self.acoustic_dim,
            beta_shift=mm.beta_shift,
            dropout_prob=mm.dropout_prob,
            use_fused_kernel=mm.use_fused_kernel,
            name="MAG",
        )(emb, visual.astype(self.dtype), acoustic.astype(self.dtype),
          deterministic=deterministic)


class _Epilogue(nn.Module):
    """Pooler + dropout + classifier head, names matching
    MagBertForSequenceClassification (models/bert.py:500-558)."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq_out, deterministic: bool = True):
        cfg = self.config
        pooled = BertPooler(cfg, self.dtype, name="pooler")(seq_out)
        pooled = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype,
                          kernel_init=init, name="classifier")(pooled)
        return logits.astype(jnp.float32)


def pp_params_from_model_params(params: Any) -> Any:
    """MagBertForSequenceClassification param tree → pipeline layout:
    {prologue: {embeddings, MAG}, layers: stacked [L, ...] leaves,
    epilogue: {pooler, classifier}}. Inner names are preserved, so the
    optimizer's path-based no-decay mask (training/optim.py::_no_decay)
    classifies every leaf identically to the unstacked tree."""
    bert = params["bert"]
    enc = bert["encoder"]
    n_layers = len([k for k in enc if k.startswith("layer_")])
    layer_trees = [enc[f"layer_{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *layer_trees)
    return {
        "prologue": {"embeddings": bert["embeddings"], "MAG": bert["MAG"]},
        "layers": stacked,
        "epilogue": {"pooler": bert["pooler"],
                     "classifier": params["classifier"]},
    }


def model_params_from_pp_params(pp_params: Any) -> Any:
    """Inverse of pp_params_from_model_params — for checkpoint export and
    the HF converters (utils/convert.py), which expect the model tree."""
    layers = pp_params["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    enc = {f"layer_{i}": jax.tree_util.tree_map(lambda x, _i=i: x[_i],
                                                layers)
           for i in range(n_layers)}
    return {
        "bert": {
            "embeddings": pp_params["prologue"]["embeddings"],
            "MAG": pp_params["prologue"]["MAG"],
            "encoder": enc,
            "pooler": pp_params["epilogue"]["pooler"],
        },
        "classifier": pp_params["epilogue"]["classifier"],
    }


def _key_name(k) -> str:
    return str(getattr(k, "key", getattr(k, "name", k)))


def _under_layers(path) -> bool:
    return any(_key_name(k) == "layers" for k in path)


def _state_spec_tree(state: TrainState, mp: int = 1):
    """PartitionSpec pytree for a pp TrainState: stacked-layer leaves
    (params and their optimizer moments) are sharded over the pipe axis
    on their stacking dim; everything else is replicated. With a model
    axis (``mp > 1``) the FFN leaves are additionally Megatron-sharded
    (parallel/tp.py's rules, on the stacked [L, ...] layout): the
    column-parallel ``intermediate_dense`` on its LAST dim, the
    row-parallel ``output_dense`` kernel on its CONTRACTION dim; the
    output bias and everything attention-side stay replicated over
    model (added once post-psum / computed redundantly)."""
    def spec(path, leaf):
        if not (_under_layers(path) and getattr(leaf, "ndim", 0) >= 1):
            return P()
        if mp > 1:
            names = [_key_name(k) for k in path]
            if "attention" not in names:
                # column-parallel first FFN matmul (BERT
                # intermediate_dense / XLNet ff.layer_1): kernel split on
                # its LAST dim, bias split with it
                if "intermediate_dense" in names or (
                        "ff" in names and "layer_1" in names):
                    return (P(PIPE_AXIS, None, MODEL_AXIS)
                            if leaf.ndim == 3 else P(PIPE_AXIS, MODEL_AXIS))
                # row-parallel second matmul (BERT output_dense / XLNet
                # ff.layer_2): kernel split on its CONTRACTION dim, bias
                # replicated (added once post-psum)
                if leaf.ndim == 3 and (
                        "output_dense" in names or (
                            "ff" in names and "layer_2" in names)):
                    return P(PIPE_AXIS, MODEL_AXIS, None)
        return P(PIPE_AXIS)

    return jax.tree_util.tree_map_with_path(spec, state)


def state_shardings(state: TrainState, mesh: Mesh):
    mp = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), _state_spec_tree(state, mp),
        is_leaf=lambda x: isinstance(x, P))


@dataclasses.dataclass
class PipelineTrainer(Trainer):
    """Pipelined drop-in for the plain Trainer (MAG-BERT regression).

    ``model`` supplies the architecture (config/multimodal_config/dims);
    its parameter tree converts losslessly to and from the pipeline
    layout, so Orbax checkpoints round-trip (saved in pipeline layout)
    and the HF import/export paths work through
    ``model_params_from_pp_params``.

    ``n_micro`` microbatches per step; the per-data-shard batch must
    divide by ``n_micro``. Step semantics match the plain Trainer's
    ``grad_accum=n_micro`` step (mean loss over microbatches, summed
    gradients / n_micro; the masked ragged-tail step matches the masked
    global-mean semantics) — the pipeline only changes WHERE each layer
    runs, not what is computed. Epoch drivers, mid-epoch resume and
    scoring are inherited from Trainer unchanged.
    """

    n_micro: int = 4

    def _pp_jit(self, fn, **kw):
        """jax.jit with the Trainer's per-step XLA ``compiler_options``
        applied — the pipeline's shard_map programs honor the same
        surface as the jitted SPMD steps (driver --compiler_options,
        BENCH_COMPILER_OPTIONS)."""
        if self.compiler_options:
            kw["compiler_options"] = dict(self.compiler_options)
        return jax.jit(fn, **kw)

    def _pp_common_setup(self, n_layers: int, hidden_size: int):
        """Family-independent validation + boilerplate shared by the
        BERT and XLNet pipeline trainers (parallel/pp_xlnet.py): mesh/
        grad-accum/TP/mems guards, stage geometry, shardings."""
        if self.mesh is None or PIPE_AXIS not in self.mesh.shape:
            raise ValueError("the pipeline trainer needs a mesh with a "
                             f"'{PIPE_AXIS}' axis (make_pp_mesh)")
        if self.grad_accum != 1:
            raise ValueError(
                "PipelineTrainer accumulates over n_micro microbatches; "
                "grad_accum must stay 1")
        if self.tp_shard_attention:
            raise ValueError(
                "tp_shard_attention does not compose with the pipeline "
                "trainer (no 'model' axis on a pp mesh)")
        if self.mem_len is not None:
            raise ValueError(
                "mem_len (segment recurrence) does not compose with the "
                "pipeline trainer — the pipelined step never threads "
                "mems, so accepting it would silently train without "
                "memory; use the data-parallel Trainer")
        if self.fsdp:
            raise ValueError(
                "fsdp does not compose with the pipeline trainer (the "
                "pipeline owns its stage-sharded state layout)")
        self._n_stages = self.mesh.shape[PIPE_AXIS]
        self._dp = self.mesh.shape.get(DATA_AXIS, 1)
        self._mp = self.mesh.shape.get(MODEL_AXIS, 1)
        if n_layers % self._n_stages != 0:
            raise ValueError(
                f"layer count ({n_layers}) must divide "
                f"evenly over {self._n_stages} pipeline stages")
        if self.model.config.num_labels != 1:
            raise ValueError(
                "PipelineTrainer implements the reference's regression "
                "training loop (MSE, multimodal_driver.py:371-373); "
                "num_labels must be 1")
        if self.n_micro < 1:
            raise ValueError("n_micro must be >= 1")
        self._k = n_layers // self._n_stages
        self._cfg = self.model.config
        self._hidden_size = hidden_size
        self._dtype = getattr(self.model, "dtype", jnp.float32)
        self._bsh = NamedSharding(self.mesh, P(DATA_AXIS))
        self._rep = NamedSharding(self.mesh, P())
        self._fns = {}

    def __post_init__(self):
        cfg = self.model.config
        self._pp_common_setup(cfg.num_hidden_layers, cfg.hidden_size)
        if getattr(self.model.multimodal_config, "injection_index", 0) != 0:
            raise ValueError(
                "PipelineTrainer's prologue applies MAG before layer 0 "
                "(BERT semantics, reference bert.py:219); "
                "injection_index != 0 is not pipelined")
        dt = self._dtype
        self._pro = _Prologue(cfg, self.model.multimodal_config,
                              self.model.visual_dim,
                              self.model.acoustic_dim, dt)
        if self._mp > 1:
            # PPxTP: the stage's layer stack runs with the FFN
            # Megatron-split over the mesh model axis
            if cfg.intermediate_size % self._mp != 0:
                raise ValueError(
                    f"intermediate_size ({cfg.intermediate_size}) must "
                    f"divide by the model axis ({self._mp}) for the "
                    "Megatron FFN split")
            self._layer = _TPBertLayer(cfg, dt, self._mp)
        else:
            self._layer = BertLayer(cfg, dt)
        self._epi = _Epilogue(cfg, dt)

    # family hooks: the GPipe schedule, shard_map steps and epoch drivers
    # are family-independent; subclasses (parallel/pp_xlnet.py) override
    # these four to pipeline a different backbone.

    def _to_pp(self, params):
        return pp_params_from_model_params(params)

    def _from_pp(self, pp_params):
        return model_params_from_pp_params(pp_params)

    def _stage_forward(self, params, mb, recv, rank, rng_m,
                       deterministic: bool, live):
        """One stage's work for one tick: returns (h_out [mb,S,D] to send
        downstream, logits [mb]). ``mb`` = (ids, visual, acoustic, mask,
        seg) microbatch tensors; ``recv`` is the upstream activation;
        ``live`` is a traced bool — False on GPipe bubble ticks, whose
        compute is garbage (subclasses use it to keep bubble garbage out
        of gradient-NaN territory, e.g. zero-norm inputs to MAG).
        Every rank computes the prologue (uniform SPMD program) and the
        where(rank==0) keeps only rank 0's."""
        ids, vis, ac, mask, seg = mb

        def maybe_rngs(key):
            return {} if deterministic else {"dropout": key}

        pro = self._pro.apply(
            {"params": params["prologue"]}, ids, vis, ac, seg,
            deterministic,
            rngs=maybe_rngs(None if deterministic
                            else jax.random.fold_in(rng_m, 1 << 20)))
        x_in = jnp.where(rank == 0, pro, recv)
        bias = extended_attention_mask(mask, jnp.float32)
        layer_ids = rank * self._k + jnp.arange(self._k)

        if deterministic:
            layer_xs = (params["layers"],)
        else:
            layer_keys = jax.vmap(
                lambda i: jax.random.fold_in(rng_m, i))(layer_ids)
            layer_xs = (params["layers"], layer_keys)

        def layer_body(h, xs):
            p_layer = xs[0]
            key = None if deterministic else xs[1]
            out = self._layer.apply(
                {"params": p_layer}, h, bias, None, mask,
                deterministic, False, rngs=maybe_rngs(key))
            return out, None

        h, _ = jax.lax.scan(layer_body, x_in, layer_xs)
        logits = self._epi.apply(
            {"params": params["epilogue"]}, h, deterministic,
            rngs=maybe_rngs(None if deterministic
                            else jax.random.fold_in(rng_m, 2 << 20)))
        return h, logits.reshape(-1)

    # ---------------------------------------------------------------- state

    def init_state(self, rng: jax.Array, sample_batch: Tuple) -> TrainState:
        input_ids, visual, acoustic, input_mask, segment_ids, _ = sample_batch
        params = self.model.init(
            rng, jnp.asarray(input_ids), jnp.asarray(visual),
            jnp.asarray(acoustic), jnp.asarray(input_mask),
            jnp.asarray(segment_ids))["params"]
        return self.create_state_from_params(
            params, jax.random.fold_in(rng, 1))

    def create_state_from_params(self, params: Any,
                                 rng: jax.Array) -> TrainState:
        """``params`` in the MODEL layout (as from model.init / the HF
        converters) — converted to the pipeline layout and placed."""
        pp = self._to_pp(params)
        state = TrainState.create(apply_fn=self.model.apply, params=pp,
                                  tx=self.tx, rng=rng)
        return jax.device_put(state, state_shardings(state, self.mesh))

    # kept as an alias; earlier revisions exposed the conversion under
    # this name and __graft_entry__/tools may call either
    create_state_from_model_params = create_state_from_params

    def model_params(self, state: TrainState) -> Any:
        """The unstacked model tree (for the HF export path)."""
        return self._from_pp(jax.device_get(state.params))

    # ------------------------------------------------------------- pipeline

    def _pipeline_forward(self, params, batch, rng, deterministic: bool,
                          collect_logits: bool,
                          valid: Optional[jax.Array] = None):
        """The GPipe tick scan. Returns (loss_local, logits_ticks).

        loss_local is this rank's contribution (non-zero only on the
        last stage): mean-MSE per microbatch summed and divided by
        n_micro when ``valid`` is None, or the SUM of valid-masked
        squared errors when ``valid`` is given (caller divides by the
        global valid count — the masked ragged-tail semantics of
        training/trainer.py::make_masked_train_step).

        logits_ticks is [T, mb] when collect_logits (zeros off the last
        rank / bubble ticks)."""
        cfg = self._cfg
        n_stages, k, n_micro = self._n_stages, self._k, self.n_micro
        input_ids, visual, acoustic, input_mask, segment_ids, labels = batch
        b_local, s = input_ids.shape
        if b_local % n_micro != 0:
            raise ValueError(
                f"local batch {b_local} not divisible by n_micro "
                f"{n_micro} (global batch must divide by "
                f"n_micro x data_parallel)")
        mb = b_local // n_micro

        def micro_split(x):
            return x.reshape((n_micro, mb) + x.shape[1:])

        m_ids = micro_split(input_ids)
        m_vis = micro_split(visual)
        m_ac = micro_split(acoustic)
        m_mask = micro_split(input_mask)
        m_seg = micro_split(segment_ids)
        m_lab = micro_split(labels.reshape(b_local))
        m_valid = (None if valid is None
                   else micro_split(valid.reshape(b_local)
                                    .astype(jnp.float32)))

        rank = jax.lax.axis_index(PIPE_AXIS)
        n_ticks = n_micro + n_stages - 1
        x0 = jnp.zeros((mb, s, self._hidden_size), self._dtype)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(x_prev, t):
            recv = jax.lax.ppermute(x_prev, PIPE_AXIS, perm)
            m = t - rank          # microbatch this rank processes now
            m_c = jnp.clip(m, 0, n_micro - 1)

            def take(arr):
                return jax.lax.dynamic_index_in_dim(arr, m_c, 0,
                                                    keepdims=False)

            ids, vis, ac = take(m_ids), take(m_vis), take(m_ac)
            mask, seg, lab = take(m_mask), take(m_seg), take(m_lab)
            # rank 0 feeds the pipeline (for rank 0, m == t so the m_c
            # slice is its microbatch); other ranks consume the wire
            rng_m = (None if deterministic
                     else jax.random.fold_in(rng, m_c))
            live = (m >= 0) & (m < n_micro)  # real microbatch this tick?
            h, logits = self._stage_forward(
                params, (ids, vis, ac, mask, seg), recv, rank, rng_m,
                deterministic, live)
            on_duty = ((rank == n_stages - 1) & live)
            if valid is None:
                l_m = mse_loss(logits, lab)
            else:
                err = jnp.square(logits.reshape(mb) - lab)
                l_m = jnp.sum(err * take(m_valid))
            contrib = jnp.where(on_duty, l_m, 0.0)
            out_logits = (jnp.where(on_duty, logits.reshape(mb), 0.0)
                          if collect_logits else jnp.zeros((0,)))
            return h, (contrib, out_logits)

        _, (contribs, logits_ticks) = jax.lax.scan(
            tick, x0, jnp.arange(n_ticks))
        total = jnp.sum(contribs)
        if valid is None:
            total = total / n_micro
        return total, logits_ticks

    def _cross_stage_grads(self, grads):
        """psum the replicated blocks' gradients over the pipe axis: only
        one rank's prologue/epilogue compute reaches the loss, the others
        hold zeros — the psum gives every rank the true gradient so the
        replicated params stay in sync. Layer grads are rank-owned (the
        transposed ppermutes already delivered each stage's cotangents)
        and stay local."""
        return {
            "prologue": jax.lax.psum(grads["prologue"], PIPE_AXIS),
            "layers": grads["layers"],
            "epilogue": jax.lax.psum(grads["epilogue"], PIPE_AXIS),
        }

    # ------------------------------------------------------- jitted steps

    def _build_train(self, state: TrainState, batch: Tuple):
        dp = self._dp

        def per_device_step(state: TrainState, batch: Tuple):
            rng, new_rng = jax.random.split(state.rng)
            if dp > 1:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(DATA_AXIS))

            def loss_fn(params):
                loss, _ = self._pipeline_forward(
                    params, batch, rng, deterministic=False,
                    collect_logits=False)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            grads = self._cross_stage_grads(grads)
            loss = jax.lax.psum(loss, PIPE_AXIS)
            if dp > 1:
                grads = jax.lax.pmean(grads, DATA_AXIS)
                loss = jax.lax.pmean(loss, DATA_AXIS)
            updates, new_opt_state = state.tx.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                opt_state=new_opt_state, rng=new_rng)
            return new_state, loss

        state_spec = _state_spec_tree(state, self._mp)
        batch_spec = tuple(P(DATA_AXIS) for _ in batch)
        mapped = shard_map(per_device_step, mesh=self.mesh,
                           in_specs=(state_spec, batch_spec),
                           out_specs=(state_spec, P()))
        return self._pp_jit(
            mapped, donate_argnums=(0,) if self.donate else ())

    def _build_train_masked(self, state: TrainState, batch: Tuple):
        dp = self._dp

        def per_device_step(state: TrainState, batch: Tuple,
                            valid: jax.Array):
            rng, new_rng = jax.random.split(state.rng)
            if dp > 1:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(DATA_AXIS))
            vf = valid.astype(jnp.float32)

            def loss_fn(params):
                sse, _ = self._pipeline_forward(
                    params, batch, rng, deterministic=False,
                    collect_logits=False, valid=vf)
                return sse

            sse, grads = jax.value_and_grad(loss_fn)(state.params)
            grads = self._cross_stage_grads(grads)
            sse = jax.lax.psum(sse, PIPE_AXIS)
            n = jnp.sum(vf)
            if dp > 1:
                # masked mean is over the GLOBAL valid count (exactly the
                # jit masked step's semantics)
                grads = jax.lax.psum(grads, DATA_AXIS)
                sse = jax.lax.psum(sse, DATA_AXIS)
                n = jax.lax.psum(n, DATA_AXIS)
            n = jnp.maximum(n, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            loss = sse / n
            updates, new_opt_state = state.tx.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                opt_state=new_opt_state, rng=new_rng)
            return new_state, loss

        state_spec = _state_spec_tree(state, self._mp)
        batch_spec = tuple(P(DATA_AXIS) for _ in batch)
        mapped = shard_map(per_device_step, mesh=self.mesh,
                           in_specs=(state_spec, batch_spec, P(DATA_AXIS)),
                           out_specs=(state_spec, P()))
        return self._pp_jit(
            mapped, donate_argnums=(0,) if self.donate else ())

    def _pp_logits(self, params, batch):
        """Per-device deterministic pipeline forward → local [b] logits
        (psum over pipe broadcasts the last rank's collected ticks)."""
        _, logits_ticks = self._pipeline_forward(
            params, batch, rng=None, deterministic=True,
            collect_logits=True)
        logits = logits_ticks[self._n_stages - 1:].reshape(-1)
        return jax.lax.psum(logits, PIPE_AXIS)

    def _build_eval(self, state: TrainState, batch: Tuple):
        dp = self._dp

        def per_device_eval(params, batch, valid):
            logits = self._pp_logits(params, batch)
            labels = batch[-1].reshape(-1).astype(jnp.float32)
            vf = valid.astype(jnp.float32)
            s = jnp.sum(jnp.square(logits - labels) * vf)
            c = jnp.sum(vf)
            if dp > 1:
                s = jax.lax.psum(s, DATA_AXIS)
                c = jax.lax.psum(c, DATA_AXIS)
            return s, c

        params_spec = _state_spec_tree(state, self._mp).params
        batch_spec = tuple(P(DATA_AXIS) for _ in batch)
        mapped = shard_map(per_device_eval, mesh=self.mesh,
                           in_specs=(params_spec, batch_spec,
                                     P(DATA_AXIS)),
                           out_specs=(P(), P()))
        jitted = self._pp_jit(mapped)
        return lambda state, batch, valid: jitted(state.params, batch,
                                                  valid)

    def _build_predict(self, state: TrainState, batch: Tuple):
        def per_device_predict(params, batch):
            logits = self._pp_logits(params, batch)
            labels = batch[-1].reshape(-1).astype(jnp.float32)
            return logits, labels

        params_spec = _state_spec_tree(state, self._mp).params
        batch_spec = tuple(P(DATA_AXIS) for _ in batch)
        mapped = shard_map(per_device_predict, mesh=self.mesh,
                           in_specs=(params_spec, batch_spec),
                           out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
        jitted = self._pp_jit(mapped)
        return lambda state, batch: jitted(state.params, batch)

    # The Trainer epoch drivers call these with batches already placed
    # by _put_batch; the jitted shard_map programs are built lazily on
    # first use (in_specs need the state's concrete pytree structure).

    def _get(self, name, builder, state, batch):
        if name not in self._fns:
            self._fns[name] = builder(state, batch)
        return self._fns[name]

    def _train_step(self, state: TrainState, batch: Tuple):
        return self._get("train", self._build_train, state, batch)(
            state, batch)

    def _train_step_masked(self, state: TrainState, batch: Tuple,
                           valid: jax.Array):
        return self._get("masked", self._build_train_masked, state,
                         batch)(state, batch, valid)

    def _eval_step(self, state: TrainState, batch: Tuple,
                   valid: jax.Array):
        return self._get("eval", self._build_eval, state, batch)(
            state, batch, valid)

    def _predict_step(self, state: TrainState, batch: Tuple):
        return self._get("predict", self._build_predict, state, batch)(
            state, batch)

    # ------------------------------------------------- direct-use wrappers

    def train_step(self, state: TrainState, batch: Tuple):
        """One pipelined optimizer step on a host batch."""
        return self._train_step(state, self._put_batch(batch))

    def predict(self, state: TrainState, batch: Tuple) -> jax.Array:
        """Deterministic pipelined forward: [B] float32 logits."""
        logits, _ = self._predict_step(state, self._put_batch(batch))
        return logits
