"""MAG-BERT: BERT encoder with the Multimodal Adaptation Gate.

TPU-native re-derivation of the reference's ``MAG_BertModel`` /
``MAG_BertForSequenceClassification`` (bert.py:76-324), which reassemble HF
transformers 3.0.2 BertEmbeddings/BertEncoder/BertPooler (bert.py:17) around
an early-fusion MAG applied to the embedding output (bert.py:218-219).

Design departures from the torch original, for TPU:
  * QKV projections are one packed [D, 3D] matmul per layer (one MXU pass
    instead of three small ones); the checkpoint converter packs HF q/k/v.
  * Attention softmax accumulates in fp32; everything else runs in the
    configurable compute dtype (bf16 on TPU) with fp32 parameters.
  * The layer stack runs under ``nn.remat``-able static unrolling — no
    Python-level control flow depends on data.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_multimodal_transformer_tpu.config import BertConfig, MultimodalConfig
from bert_multimodal_transformer_tpu.models.mag import MAG
from bert_multimodal_transformer_tpu.ops.activations import ACT2FN
from bert_multimodal_transformer_tpu.ops.attention import (
    dot_product_attention,
    extended_attention_mask,
    flash_attention,
)
from bert_multimodal_transformer_tpu.ops.fused_attention import (
    fused_attention_packed,
)

Dtype = Any


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 with cast back to the compute dtype.
    eps 1e-12 matches HF BertLayerNorm."""

    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta
        return y.astype(x.dtype)


class BertEmbeddings(nn.Module):
    """word + learned-position + token-type embeddings → LN → dropout
    (HF BertEmbeddings contract, used by the reference at bert.py:81,211-216).
    """

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Optional[jax.Array],
                 token_type_ids: jax.Array,
                 position_ids: Optional[jax.Array] = None,
                 inputs_embeds: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        word = self.param("word_embeddings", init,
                          (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", init,
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        typ = self.param("token_type_embeddings", init,
                         (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        seq_len = (input_ids.shape[-1] if input_ids is not None
                   else inputs_embeds.shape[-2])
        if position_ids is None:
            position_ids = jnp.arange(seq_len)[None, :]
        word_emb = (jnp.take(word, input_ids, axis=0)
                    if inputs_embeds is None else inputs_embeds)
        x = (word_emb
             + jnp.take(pos, position_ids, axis=0)
             + jnp.take(typ, token_type_ids, axis=0)).astype(self.dtype)
        x = LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm")(x)
        x = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)
        return x


class _DenseParams(nn.Module):
    """nn.Dense-identical parameters (kernel/bias names, shapes, init,
    fp32 param dtype) WITHOUT the matmul — for handing the weights to a
    kernel that performs the projection itself (qkv_fusion). Instantiated
    with the same ``name`` as the Dense it replaces, so the param tree —
    and therefore checkpoints and the HF converters — are unchanged."""

    features: int
    kernel_init: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init,
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k.astype(self.dtype), b.astype(self.dtype)


class BertSelfAttention(nn.Module):
    """Multi-head self-attention with packed QKV (HF BertAttention math)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, attn_bias: Optional[jax.Array],
                 head_mask: Optional[jax.Array] = None,
                 attention_mask_2d: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        dh = d // h
        b, s, _ = hidden.shape
        init = nn.initializers.normal(stddev=cfg.initializer_range)

        probs = None
        tp_mesh = cfg.tp_attention_mesh

        # Long-sequence guards for the fused-kernel variants: the full-H
        # kernels' [H,S,S] f32 scratch outgrows the 16 MB scoped-VMEM
        # limit near S≈380 at base geometry. The non-TP packed entry
        # then head-blocks its grid ([hb,S,S] scratch, compile-verified
        # through S=640 at base bf16, fused_attention_fits_hb) and
        # beyond that streams k-blocks flash-style with in-kernel
        # dropout replay (fused_attention_fits_fs — HBM-bound, any
        # 128-divisible S); the TP/qkvproj paths need the full-H fit
        # (split kernels / in-kernel projection). Beyond every fit,
        # degrade to flash (dropout-free) or einsum instead of failing
        # to compile (BENCHMARKS.md "Long-sequence scaling").
        from bert_multimodal_transformer_tpu.ops.fused_attention import (
            fused_attention_fits,
            fused_attention_fits_fs,
            fused_attention_fits_hb,
        )

        fused_fits = fused_attention_fits(
            h, s, d, jnp.dtype(self.dtype).itemsize)
        # the hb/fs fits are compile-verified on TPU (the probe needs
        # the exact production kernel parameters — dropout rate,
        # softmax scale, dtype; ops/fused_attention.py::
        # _resolve_hb_plan / _resolve_fs_plan)
        fit_kwargs = dict(
            batch=b,
            rate=(0.0 if deterministic
                  else cfg.attention_probs_dropout_prob),
            scale=1.0 / (dh ** 0.5),
            dtype=jnp.dtype(self.dtype))
        fused_fits_hb = fused_attention_fits_hb(
            h, s, d, jnp.dtype(self.dtype).itemsize, **fit_kwargs)
        fused_fits_any = fused_fits_hb or fused_attention_fits_fs(
            h, s, d, jnp.dtype(self.dtype).itemsize, **fit_kwargs)

        use_qkvproj = (cfg.attention_impl == "fused" and cfg.qkv_fusion
                       and tp_mesh is None and head_mask is None
                       and not output_attentions and fused_fits)
        if use_qkvproj:
            # QKV projection fused into the attention kernel: declare the
            # Dense-identical params (same "qkv" tree path — checkpoints
            # and converters see no difference) and hand them to the op.
            wk, wb = _DenseParams(3 * d, kernel_init=init,
                                  dtype=self.dtype, name="qkv")(d)
            qkv = None
        else:
            qkv = nn.Dense(3 * d, dtype=self.dtype, kernel_init=init,
                           name="qkv")(hidden)

        # one place owns the TP activation shardings: qkv5 [B,S,3,H,Dh]
        # head-sharded on H, head-flat ctx [B,S,D] sharded on D into the
        # row-parallel output projection (kernel P("model", None),
        # parallel/tp.py)
        def constrain(x, *spec):
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(tp_mesh, P(*spec)))
        # fused short-seq kernel: softmax + prob-dropout in VMEM with a
        # fused backward (ops/fused_attention.py). The packed variant
        # consumes the raw QKV projection and emits [B,S,D] directly —
        # no [B,S,H,Dh]↔[B,H,S,Dh] transposes in either pass; training
        # dropout uses the TPU hardware PRNG. head_mask still falls back,
        # as does output_attentions (the kernel never materializes probs),
        # and LONG SEQUENCES beyond every fit (fused_fits_hb above; the
        # TP branch needs the stricter full-H fit).
        use_fused_tp = (cfg.attention_impl == "fused" and tp_mesh is not None
                        and head_mask is None and not output_attentions
                        and fused_fits)
        use_fused = (cfg.attention_impl == "fused" and tp_mesh is None
                     and head_mask is None and not output_attentions
                     and fused_fits_any)
        if use_qkvproj:
            from bert_multimodal_transformer_tpu.ops.fused_attention import (
                fused_attention_qkvproj,
            )

            rate = cfg.attention_probs_dropout_prob
            dropout_rng = None
            if not deterministic and rate > 0:
                dropout_rng = self.make_rng("dropout")
            ctx = fused_attention_qkvproj(
                hidden.astype(self.dtype), wk, wb, attention_mask_2d,
                n_heads=h,
                scale=1.0 / (dh ** 0.5),
                dropout_rate=rate,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                qkv_residual=cfg.qkv_residual,
            )
        elif use_fused_tp:
            # TP: heads sharded over the mesh model axis. The packed
            # kernel's q|k|v column blocks cannot be head-aligned by a
            # contiguous model-axis chunk, so TP uses the split-tensor
            # kernel under shard_map (ops/fused_attention.py TP wrappers)
            # with explicit head-sharding constraints on the activations.
            from bert_multimodal_transformer_tpu.ops.fused_attention import (
                fused_attention_tp,
            )

            qkv5 = constrain(qkv.reshape(b, s, 3, h, dh),
                             "data", None, None, "model", None)
            q, k, v = [jnp.moveaxis(qkv5[:, :, i], 2, 1) for i in range(3)]
            rate = cfg.attention_probs_dropout_prob
            dropout_rng = None
            if not deterministic and rate > 0:
                dropout_rng = self.make_rng("dropout")
            ctx = fused_attention_tp(
                q, k, v, attention_mask_2d,
                mesh=tp_mesh,
                scale=1.0 / (dh ** 0.5),
                dropout_rate=rate,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
            )
            ctx = constrain(jnp.moveaxis(ctx, 1, 2).reshape(b, s, d),
                            "data", None, "model")
        elif use_fused:
            rate = cfg.attention_probs_dropout_prob
            dropout_rng = None
            if not deterministic and rate > 0:
                dropout_rng = self.make_rng("dropout")
            ctx = fused_attention_packed(
                qkv, attention_mask_2d,
                n_heads=h,
                scale=1.0 / (dh ** 0.5),
                dropout_rate=rate,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
            )
        else:
            qkv = qkv.reshape(b, s, 3, h, dh)
            if tp_mesh is not None:
                # einsum path under TP: GSPMD head-shards the whole
                # attention from these constraints (no shard_map needed)
                qkv = constrain(qkv, "data", None, None, "model", None)
            q, k, v = [jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3)]
            # flash kernel has no attention-prob dropout: only take it
            # when it cannot change semantics (eval, or dropout == 0).
            # attention_impl="fused" beyond even the head-blocked AND
            # flash-streamed fits (S not 128-divisible, exotic head
            # geometry), or under TP beyond the full-H fit, also lands
            # here — flash IS the long-seq design (O(S) memory), so it
            # is the right degradation when dropout permits; einsum
            # otherwise.
            use_flash = (cfg.attention_impl in ("flash", "fused")
                         and head_mask is None and s % 128 == 0
                         and not output_attentions
                         and (deterministic
                              or cfg.attention_probs_dropout_prob == 0.0))
            if use_flash:
                ctx = flash_attention(
                    q, k, v, attention_mask_2d, scale=1.0 / (dh ** 0.5))
            else:
                dropout_rng = None
                if (not deterministic
                        and cfg.attention_probs_dropout_prob > 0):
                    dropout_rng = self.make_rng("dropout")
                ctx = dot_product_attention(
                    q, k, v, attn_bias,
                    scale=1.0 / (dh ** 0.5),
                    dropout_rate=cfg.attention_probs_dropout_prob,
                    dropout_rng=dropout_rng,
                    deterministic=deterministic,
                    head_mask=head_mask,
                    return_probs=output_attentions,
                )
                if output_attentions:
                    ctx, probs = ctx
            ctx = jnp.moveaxis(ctx, 1, 2).reshape(b, s, d)
            if tp_mesh is not None:
                ctx = constrain(ctx, "data", None, "model")

        out = nn.Dense(d, dtype=self.dtype, kernel_init=init,
                       name="output_dense")(ctx)
        out = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            out, deterministic=deterministic)
        out = LayerNorm(epsilon=cfg.layer_norm_eps, name="output_LayerNorm")(
            out + hidden)
        if output_attentions:
            return out, probs
        return out


class BertLayer(nn.Module):
    """Self-attention block + GELU FFN block with post-LN residuals
    (HF BertLayer, 12× via the reference's encoder at bert.py:221-229)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, attn_bias: Optional[jax.Array],
                 head_mask: Optional[jax.Array] = None,
                 attention_mask_2d: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 output_attentions: bool = False):
        # NOTE: deterministic is positional (not kw-only) so nn.remat can
        # mark it static (static_argnums) for the rematerialized stack.
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        attn_out = BertSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attn_bias, head_mask, attention_mask_2d,
            deterministic=deterministic,
            output_attentions=output_attentions)
        probs = None
        if output_attentions:
            attn_out, probs = attn_out
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     kernel_init=init, name="intermediate_dense")(attn_out)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                     name="output_dense")(x)
        x = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)
        x = LayerNorm(epsilon=cfg.layer_norm_eps, name="output_LayerNorm")(
            x + attn_out)
        if output_attentions:
            return x, probs
        return x


class BertEncoder(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32
    remat: bool = False
    # "full" recomputes everything (lowest memory); "dots" saves matmul
    # outputs and recomputes only elementwise ops — cheaper backward at
    # higher memory.
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, hidden: jax.Array, attn_bias: Optional[jax.Array],
                 head_mask: Optional[jax.Array] = None,
                 attention_mask_2d: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 output_hidden_states: bool = False,
                 output_attentions: bool = False):
        if output_attentions and self.remat:
            raise ValueError(
                "output_attentions is incompatible with remat (the "
                "rematerialized stack discards per-layer probs)")
        layer_cls = BertLayer
        if self.remat:
            # deterministic/output_attentions must be static; flax remat
            # counts the module itself as args[0], so they are
            # args[5]/args[6] after attention_mask_2d.
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.checkpoint_dots
            elif self.remat_policy == "full":
                policy = None
            else:
                raise ValueError(
                    f"remat_policy must be 'full' or 'dots', got "
                    f"{self.remat_policy!r}")
            layer_cls = nn.remat(BertLayer, static_argnums=(5, 6),
                                 policy=policy)
        all_hidden = [] if output_hidden_states else None
        all_attn = [] if output_attentions else None
        for i in range(self.config.num_hidden_layers):
            if output_hidden_states:
                # per-layer INPUT states + final output, HF BertEncoder
                # semantics (reference surfaces them via bert.py:233-237)
                all_hidden.append(hidden)
            # head_mask: [L, H] per-layer rows or [H] shared (HF
            # get_head_mask contract, reference bert.py:208-209).
            hm = None
            if head_mask is not None:
                hm = head_mask[i] if head_mask.ndim == 2 else head_mask
            out = layer_cls(self.config, self.dtype, name=f"layer_{i}")(
                hidden, attn_bias, hm, attention_mask_2d, deterministic,
                output_attentions)
            if output_attentions:
                hidden, probs = out
                all_attn.append(probs)
            else:
                hidden = out
        if output_hidden_states:
            all_hidden.append(hidden)
        if output_hidden_states or output_attentions:
            return (hidden,
                    tuple(all_hidden) if output_hidden_states else None,
                    tuple(all_attn) if output_attentions else None)
        return hidden


class BertPooler(nn.Module):
    """tanh(Linear(hidden[:, 0])) — HF BertPooler (reference bert.py:231)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        init = nn.initializers.normal(stddev=self.config.initializer_range)
        first = hidden[:, 0]
        return jnp.tanh(nn.Dense(self.config.hidden_size, dtype=self.dtype,
                                 kernel_init=init, name="dense")(first))


class MagBertModel(nn.Module):
    """BERT backbone with early-fusion MAG (reference MAG_BertModel,
    bert.py:76-237): embeddings → MAG(emb, visual, acoustic) → encoder →
    pooler."""

    config: BertConfig
    multimodal_config: MultimodalConfig
    visual_dim: int
    acoustic_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        visual: jax.Array,
        acoustic: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        head_mask: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        cfg = self.config
        if (input_ids is None) == (inputs_embeds is None):
            raise ValueError(
                "specify exactly one of input_ids or inputs_embeds")
        input_shape = (input_ids.shape if input_ids is not None
                       else inputs_embeds.shape[:-1])
        if attention_mask is None:
            attention_mask = jnp.ones(input_shape, jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(input_shape, jnp.int32)

        attn_bias = extended_attention_mask(attention_mask, jnp.float32)

        emb = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids,
            inputs_embeds=inputs_embeds, deterministic=deterministic)

        mm = self.multimodal_config
        fused = MAG(
            hidden_size=cfg.hidden_size,
            visual_dim=self.visual_dim,
            acoustic_dim=self.acoustic_dim,
            beta_shift=mm.beta_shift,
            dropout_prob=mm.dropout_prob,
            use_fused_kernel=mm.use_fused_kernel,
            name="MAG",
        )(emb, visual.astype(self.dtype), acoustic.astype(self.dtype),
          deterministic=deterministic)

        enc_out = BertEncoder(cfg, self.dtype, remat=self.remat,
                              remat_policy=self.remat_policy,
                              name="encoder")(
            fused, attn_bias, head_mask, attention_mask,
            deterministic=deterministic,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions)
        if output_hidden_states or output_attentions:
            seq_out, all_hidden, all_attn = enc_out
        else:
            seq_out, all_hidden, all_attn = enc_out, None, None
        pooled = BertPooler(cfg, self.dtype, name="pooler")(seq_out)
        outputs = (seq_out, pooled)
        # reference: "add hidden_states and attentions if they are here"
        # (bert.py:233-237)
        if output_hidden_states:
            outputs = outputs + (all_hidden,)
        if output_attentions:
            outputs = outputs + (all_attn,)
        return outputs


class MagBertForSequenceClassification(nn.Module):
    """Pooled-output classifier head over MagBertModel (reference
    MAG_BertForSequenceClassification, bert.py:240-324)."""

    config: BertConfig
    multimodal_config: MultimodalConfig
    visual_dim: int
    acoustic_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        visual: jax.Array,
        acoustic: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        head_mask: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        cfg = self.config
        bert_out = MagBertModel(
            cfg, self.multimodal_config, self.visual_dim, self.acoustic_dim,
            self.dtype, self.remat, self.remat_policy, name="bert")(
            input_ids, visual, acoustic, attention_mask, token_type_ids,
            position_ids, head_mask, inputs_embeds,
            deterministic=deterministic,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions)
        pooled = bert_out[1]
        extras = bert_out[2:]  # hidden_states/attentions when requested
        pooled = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype, kernel_init=init,
                          name="classifier")(pooled)
        logits = logits.astype(jnp.float32)
        if labels is not None:
            # internal MSE/CE loss switch (reference bert.py:313-322)
            from bert_multimodal_transformer_tpu.training.losses import (
                sequence_classification_loss,
            )

            loss = sequence_classification_loss(logits, labels,
                                                cfg.num_labels)
            return (loss, logits) + extras
        if extras:
            # reference: (logits,) + outputs[2:] (bert.py:304-311)
            return (logits,) + extras
        return logits
