"""GPipe pipeline parallelism for MAG-XLNet.

The XLNet twin of ``parallel/pp.py`` — the reference's headline model
(MAG_XLNetForSequenceClassification, xlnet.py:432-527) pipelined over a
``pipe`` mesh axis. The GPipe tick schedule, shard_map'd train/eval/
predict steps, epoch drivers and resume machinery are all inherited from
``PipelineTrainer``; this module supplies the XLNet-specific stage
computation and parameter layout:

  * PROLOGUE (replicated over pipe): word embedding + dropout
    (xlnet.py:300-313). The mask algebra, segment matrix and relative
    position encodings (xlnet.py:247-333) are layer-independent pure
    functions of the microbatch — each rank recomputes them per tick
    (cheap, uniform SPMD; only the [mb, S, D] activation crosses ICI).
  * MAG INJECTION mid-stack: the reference injects MAG before layer
    ``XLNET_INJECTION_INDEX`` (=1) inside the layer loop
    (xlnet.py:371-372). With k = L/n_stages layers per stage and
    injection_index = r0·k + p (both r0 and p are STATIC integers), the
    per-tick structure is uniform across ranks: scan local layers
    [0, p), apply MAG once, select it only where rank == r0, scan
    [p, k). One MAG evaluation per tick — no per-layer select waste —
    and the layout generalizes to any injection_index, including k = 1
    (one layer per stage, injection living on rank 1).
  * EPILOGUE: model-level dropout + last-token SequenceSummary +
    logits projection (xlnet.py:396-399, 508-509), replicated like the
    prologue; its gradients psum over pipe.

Scope: the fine-tuning driver path — bi attention, content stream only,
no mems (the reference's training never feeds mems either,
multimodal_driver.py:354-388); ``bi_data`` and two-stream inputs are
rejected at construction. Numerics: a pipelined step equals the plain
Trainer's grad_accum=n_micro step exactly with dropout off
(tests/test_pp_xlnet.py, both the k≥2 and k=1 injection geometries).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_multimodal_transformer_tpu.models.mag import MAG
from bert_multimodal_transformer_tpu.models.xlnet import (
    LayerNorm,
    SequenceSummary,
    XLNetLayer,
    XLNetRelativeAttention,
    relative_positional_encoding,
)
from bert_multimodal_transformer_tpu.ops.activations import ACT2FN
from bert_multimodal_transformer_tpu.parallel.mesh import MODEL_AXIS
from bert_multimodal_transformer_tpu.parallel.pp import (
    PipelineTrainer,
    _RowParallelOut,
    _tp_f,
)


class _TPXLNetFF(nn.Module):
    """XLNetFeedForward with the two matmuls Megatron-split over the
    mesh model axis (models/xlnet.py:505-523 math; same f/g boundary
    collectives as the BERT stage, parallel/pp.py). The inner dropout
    acts on the rank-local [.., F/mp] slice with the SAME rng on every
    rank — each element still drops with the configured rate, but mask
    bits repeat across the mp chunks of the F dim (an impl detail like
    the pipelined dropout streams; equivalence tests run dropout 0)."""

    config: Any
    dtype: Any = jnp.float32
    mp: int = 1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        out = _tp_f(x, MODEL_AXIS)
        out = nn.Dense(cfg.d_inner // self.mp, dtype=self.dtype,
                       kernel_init=init, name="layer_1")(out)
        out = ACT2FN[cfg.ff_activation](out)
        out = nn.Dropout(rate=cfg.dropout)(out,
                                           deterministic=deterministic)
        out = _RowParallelOut(cfg.d_model, self.dtype, init,
                              name="layer_2")(out)
        out = nn.Dropout(rate=cfg.dropout)(out,
                                           deterministic=deterministic)
        return LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(
            out + x)


class _TPXLNetLayer(nn.Module):
    """XLNetLayer with the FFN TP-split (rel-attention stays replicated;
    mirrors models/xlnet.py::XLNetLayer on the fine-tune path — content
    stream only, which is all the pipeline drives)."""

    config: Any
    dtype: Any = jnp.float32
    mp: int = 1

    @nn.compact
    def __call__(self, h, g, attn_mask_h, attn_mask_g, r, seg_mat,
                 mems=None, target_mapping=None, head_mask=None,
                 deterministic=True, output_attentions=False,
                 mask_bias_h=None, mask_bias_g=None, seg_diff=None):
        if output_attentions or g is not None:
            raise ValueError("the TP stage layer drives the content "
                             "stream only (fine-tune path)")
        out_h, out_g = XLNetRelativeAttention(
            self.config, self.dtype, name="rel_attn")(
            h, g, attn_mask_h, attn_mask_g, r, seg_mat, mems,
            target_mapping, head_mask, deterministic=deterministic,
            mask_bias_h=mask_bias_h, mask_bias_g=mask_bias_g,
            seg_diff=seg_diff)
        out_h = _TPXLNetFF(self.config, self.dtype, self.mp,
                           name="ff")(out_h, deterministic=deterministic)
        return out_h, out_g


class _XlnetPrologue(nn.Module):
    """Word embedding + dropout, submodule name matching MagXLNetModel
    (models/xlnet.py:645-655) so the parameter subtree is interchangeable."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.d_model,
                       embedding_init=nn.initializers.normal(
                           stddev=cfg.initializer_range),
                       dtype=self.dtype, name="word_embedding")(input_ids)
        return nn.Dropout(rate=cfg.dropout)(emb,
                                            deterministic=deterministic)


class _XlnetEpilogue(nn.Module):
    """Model-level dropout + SequenceSummary + logits projection, names
    matching MagXLNetForSequenceClassification (models/xlnet.py:813-883)."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, deterministic: bool = True):
        cfg = self.config
        out = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        summary = SequenceSummary(cfg, self.dtype,
                                  name="sequence_summary")(
            out, deterministic=deterministic)
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype,
                          kernel_init=init, name="logits_proj")(summary)
        return logits.astype(jnp.float32)


def pp_params_from_xlnet_params(params: Any) -> Any:
    """MagXLNetForSequenceClassification param tree → pipeline layout
    (inner names preserved for the optimizer's no-decay mask)."""
    tr = params["transformer"]
    n_layers = len([k for k in tr if k.startswith("layer_")])
    layer_trees = [tr[f"layer_{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *layer_trees)
    return {
        "prologue": {"word_embedding": tr["word_embedding"],
                     "MAG": tr["MAG"]},
        "layers": stacked,
        "epilogue": {"sequence_summary": params["sequence_summary"],
                     "logits_proj": params["logits_proj"]},
    }


def xlnet_params_from_pp_params(pp_params: Any) -> Any:
    """Inverse of pp_params_from_xlnet_params (checkpoint export + the
    HF converter boundary, utils/convert.py::convert_xlnet_params)."""
    layers = pp_params["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    tr = {f"layer_{i}": jax.tree_util.tree_map(lambda x, _i=i: x[_i],
                                               layers)
          for i in range(n_layers)}
    tr["word_embedding"] = pp_params["prologue"]["word_embedding"]
    tr["MAG"] = pp_params["prologue"]["MAG"]
    return {
        "transformer": tr,
        "sequence_summary": pp_params["epilogue"]["sequence_summary"],
        "logits_proj": pp_params["epilogue"]["logits_proj"],
    }


@dataclasses.dataclass
class XLNetPipelineTrainer(PipelineTrainer):
    """Pipelined drop-in Trainer for MAG-XLNet regression. See the
    module docstring; everything above ``_stage_forward`` — schedule,
    collectives, optimizer, epoch drivers, resume — is the shared
    ``PipelineTrainer`` machinery."""

    def __post_init__(self):
        cfg = self.model.config
        self._pp_common_setup(cfg.n_layer, cfg.d_model)
        if self._mp > 1 and cfg.d_inner % self._mp != 0:
            raise ValueError(
                f"d_inner ({cfg.d_inner}) must divide by the model "
                f"axis ({self._mp}) for the Megatron FFN split")
        if cfg.attn_type != "bi":
            raise ValueError(
                "the pipelined XLNet stage implements bi attention (the "
                "fine-tuning config, xlnet-base-cased); attn_type="
                f"{cfg.attn_type!r} is not pipelined")
        if cfg.bi_data:
            raise ValueError(
                "bi_data position streams are not pipelined (training "
                "never uses them — reference xlnet.py:126-141)")
        inj = self.model.multimodal_config.injection_index
        if not (0 <= inj < cfg.n_layer):
            raise ValueError(
                f"injection_index {inj} outside [0, {cfg.n_layer})")
        # injection_index = r0·k + p: MAG applies before local layer p
        # on rank r0 — both static, so the tick structure stays uniform
        self._inj_rank, self._inj_local = divmod(inj, self._k)
        dt = self._dtype
        mm = self.model.multimodal_config
        self._pro = _XlnetPrologue(cfg, dt)
        self._mag = MAG(hidden_size=cfg.d_model,
                        visual_dim=self.model.visual_dim,
                        acoustic_dim=self.model.acoustic_dim,
                        beta_shift=mm.beta_shift,
                        dropout_prob=mm.dropout_prob,
                        use_fused_kernel=mm.use_fused_kernel)
        self._layer = (_TPXLNetLayer(cfg, dt, self._mp)
                       if self._mp > 1 else XLNetLayer(cfg, dt))
        self._epi = _XlnetEpilogue(cfg, dt)

    # ------------------------------------------------------- family hooks

    def _to_pp(self, params):
        return pp_params_from_xlnet_params(params)

    def _from_pp(self, pp_params):
        return xlnet_params_from_pp_params(pp_params)

    def _stage_forward(self, params, mb, recv, rank, rng_m,
                       deterministic: bool, live):
        cfg = self._cfg
        dt = self._dtype
        f32 = jnp.float32
        ids, vis, ac, mask, seg = mb
        s = ids.shape[-1]

        def maybe_rngs(key):
            return {} if deterministic else {"dropout": key}

        def fold(tag):
            return None if deterministic else jax.random.fold_in(rng_m,
                                                                 tag)

        emb = self._pro.apply(
            {"params": {"word_embedding":
                        params["prologue"]["word_embedding"]}},
            ids, deterministic, rngs=maybe_rngs(fold(1 << 20)))
        x_in = jnp.where(rank == 0, emb, recv)

        # ---- layer-independent tensors, recomputed per tick (reference
        # xlnet.py:247-333; mlen=0, qlen=klen=S on the fine-tune path) ----
        input_mask = 1.0 - mask.astype(f32)            # 1 = padding
        attn_mask = input_mask[:, None, None, :]       # [B,1,1,K]
        attn_mask = (attn_mask > 0).astype(f32)
        eye = jnp.eye(s, dtype=f32)
        non_tgt_mask = ((attn_mask - eye[None, None]) > 0).astype(f32)
        diff = (seg[:, :, None] != seg[:, None, :])
        seg_mat = jax.nn.one_hot(diff.astype(jnp.int32), 2, dtype=f32)
        pos_emb = relative_positional_encoding(
            s, s, cfg.d_model, cfg.attn_type, cfg.clamp_len,
            bi_data=False, dtype=dt)
        if not deterministic and cfg.dropout > 0:
            keep = jax.random.bernoulli(fold(4 << 20), 1.0 - cfg.dropout,
                                        pos_emb.shape)
            pos_emb = jnp.where(keep, pos_emb / (1.0 - cfg.dropout),
                                0.0).astype(dt)

        layer_ids = rank * self._k + jnp.arange(self._k)

        def run_layers(h, lo, hi):
            sub = jax.tree_util.tree_map(lambda x: x[lo:hi],
                                         params["layers"])
            if deterministic:
                xs = (sub,)
            else:
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rng_m, i))(
                        layer_ids[lo:hi])
                xs = (sub, keys)

            def layer_body(carry, layer_xs):
                p_layer = layer_xs[0]
                key = None if deterministic else layer_xs[1]
                out_h, _g = self._layer.apply(
                    {"params": p_layer}, carry, None, non_tgt_mask,
                    attn_mask, pos_emb, seg_mat, None, None, None,
                    deterministic, False, rngs=maybe_rngs(key))
                return out_h, None

            h, _ = jax.lax.scan(layer_body, h, xs)
            return h

        p = self._inj_local
        h = x_in
        if p > 0:
            h = run_layers(h, 0, p)
        # MAG once per tick, applied only on the owning rank (uniform
        # program — every rank computes it, the where keeps one). The
        # gate's ‖text‖₂ has an undefined gradient at exactly 0, and on
        # bubble ticks (and on every non-owning rank before its first
        # live tick) h IS exactly zero — the masked-out cotangent would
        # still produce 0·NaN = NaN into the stage params, so MAG reads
        # a sanitized input everywhere its output is garbage anyway.
        apply_here = rank == self._inj_rank
        h_safe = jnp.where(apply_here & live, h, jnp.ones_like(h))
        mag_out = self._mag.apply(
            {"params": params["prologue"]["MAG"]}, h_safe,
            vis.astype(dt), ac.astype(dt), deterministic=deterministic,
            rngs=maybe_rngs(fold(3 << 20)))
        h = jnp.where(apply_here, mag_out, h)
        if p < self._k:
            h = run_layers(h, p, self._k)

        logits = self._epi.apply(
            {"params": params["epilogue"]}, h, deterministic,
            rngs=maybe_rngs(fold(2 << 20)))
        return h, logits.reshape(-1)
