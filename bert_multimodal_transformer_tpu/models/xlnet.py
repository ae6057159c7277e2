"""MAG-XLNet: XLNet with the Multimodal Adaptation Gate.

TPU-native re-derivation of the reference's ``MAG_XLNetModel`` /
``MAG_XLNetForSequenceClassification`` (xlnet.py:15-527), which re-owns the
full HF XLNetModel forward — masks, mems, relative positions, segment
matrix — and injects MAG before layer XLNET_INJECTION_INDEX (=1)
(xlnet.py:371-372, global_configs.py:19).

Design departures for TPU:
  * Everything is batch-first [B, T, ...]. The torch original transposes to
    time-first [T, B] at entry and back at exit (xlnet.py:206-239, 396-399)
    because the 2019 kernels preferred it; on TPU batch-first keeps the
    lane dimension contiguous and XLA happy. The math is identical — the
    relative-shift trick operates on the position axis either way.
  * Relative position encodings are computed once per forward as [P, D]
    (P = klen + qlen for bi attention) and broadcast, not tiled per batch.
  * mems are an explicit carried tuple (functional state), not detached
    tensors mutated in place (xlnet.py:81-91).
  * Two-stream attention (query stream, target_mapping, perm_mask) is fully
    supported for capability parity even though the fine-tuning driver path
    only exercises the content stream.

Checkpoint-format note: q/k/v/o/r attention params are stored FLAT
[D, H·Dh] (see XLNetRelativeAttention.setup). Orbax checkpoints written
before this layout change (round-1 pre-flattening builds) do not restore
against the current template; re-convert from the HF .bin via
utils/convert.py instead. No released checkpoint used the old layout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_multimodal_transformer_tpu.config import (
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.bert import LayerNorm
from bert_multimodal_transformer_tpu.models.mag import MAG
from bert_multimodal_transformer_tpu.ops.activations import ACT2FN
from bert_multimodal_transformer_tpu.ops.fused_attention import (
    fused_rel_attention,
    fused_rel_attention_fits,
    fused_rel_attention_fits_fs,
    fused_rel_attention_fits_hb,
    fused_rel_attention_ingredients_fits_fs,
)

Dtype = Any
MASK_VERY_NEG = 1e30  # HF uses score - 1e30·mask in fp32


def rel_shift(x: jax.Array, klen: int) -> jax.Array:
    """Relative-shift: [B, H, Q, P] scores indexed by absolute position
    distance → [B, H, Q, klen] aligned scores (HF XLNetRelativeAttention
    rel_shift, reimplemented on the trailing axes for batch-first layout)."""
    b, h, q, p = x.shape
    x = x.reshape(b, h, p, q)
    x = x[:, :, 1:, :]
    x = x.reshape(b, h, q, p - 1)
    return x[:, :, :, :klen]


def relative_positional_encoding(
    qlen: int,
    klen: int,
    d_model: int,
    attn_type: str = "bi",
    clamp_len: int = -1,
    bi_data: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Sinusoidal relative position embeddings [P, D]
    (reference xlnet.py:93-146). For "bi": positions klen…-qlen+1 descending
    (P = klen+qlen); for "uni": klen…0 descending."""
    freq_seq = jnp.arange(0, d_model, 2.0, dtype=jnp.float32)
    inv_freq = 1.0 / (10000.0 ** (freq_seq / d_model))

    if attn_type == "bi":
        beg, end = klen, -qlen
    elif attn_type == "uni":
        beg, end = klen, -1
    else:
        raise ValueError(f"Unknown attn_type {attn_type!r}")

    def sinusoid(pos_seq):
        inp = jnp.einsum("i,d->id", pos_seq, inv_freq)
        return jnp.concatenate([jnp.sin(inp), jnp.cos(inp)], axis=-1)

    fwd_pos_seq = jnp.arange(beg, end, -1.0, dtype=jnp.float32)
    if clamp_len > 0:
        fwd_pos_seq = jnp.clip(fwd_pos_seq, -clamp_len, clamp_len)
    pos_emb = sinusoid(fwd_pos_seq)
    if bi_data:
        bwd_pos_seq = jnp.arange(-beg, -end, 1.0, dtype=jnp.float32)
        if clamp_len > 0:
            bwd_pos_seq = jnp.clip(bwd_pos_seq, -clamp_len, clamp_len)
        # bi_data stacks fwd/bwd along batch; callers split it. (Training
        # never uses it — xlnet-base-cased config has bi_data=False.)
        pos_emb = jnp.stack([pos_emb, sinusoid(bwd_pos_seq)], axis=0)
    return pos_emb.astype(dtype)


def causal_attn_mask(qlen: int, mlen: int,
                     same_length: bool = False) -> jax.Array:
    """Float mask [Q, K], 1=masked (reference create_mask, xlnet.py:51-79)."""
    attn_mask = jnp.ones((qlen, qlen), jnp.float32)
    mask_up = jnp.triu(attn_mask, k=1)
    ret = jnp.concatenate([jnp.zeros((qlen, mlen), jnp.float32), mask_up],
                          axis=1)
    if same_length:
        mask_lo = jnp.tril(attn_mask, k=-1)
        ret = jnp.concatenate(
            [ret[:, :qlen] + mask_lo, ret[:, qlen:]], axis=1)
    return ret


class XLNetRelativeAttention(nn.Module):
    """Two-stream relative multi-head attention (the HF XLNetLayer core the
    reference imports at xlnet.py:9-12), batch-first."""

    config: XLNetConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        d, h, dh = cfg.d_model, cfg.n_head, cfg.d_head
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        # einsum-layout params, same shapes as HF ([D, H, Dh] heads,
        # [H, Dh] biases, [2, H, Dh] segment embedding).
        # q/k/v/o/r are stored FLAT [D, H·Dh] (HF keeps [D,H,Dh] einsum
        # weights): the gemms want the flat shape anyway, and a [·,12,64]
        # minor layout pads to (16,128) tiles — 2.67× wasted bandwidth in
        # every optimizer pass and weight relayout. The converter
        # (utils/convert.py) reshapes at the HF boundary.
        self.q = self.param("q", init, (d, h * dh), jnp.float32)
        self.k = self.param("k", init, (d, h * dh), jnp.float32)
        self.v = self.param("v", init, (d, h * dh), jnp.float32)
        self.o = self.param("o", init, (d, h * dh), jnp.float32)
        self.r = self.param("r", init, (d, h * dh), jnp.float32)
        self.r_w_bias = self.param("r_w_bias", init, (h, dh), jnp.float32)
        self.r_r_bias = self.param("r_r_bias", init, (h, dh), jnp.float32)
        self.r_s_bias = self.param("r_s_bias", init, (h, dh), jnp.float32)
        self.seg_embed = self.param("seg_embed", init, (2, h, dh),
                                    jnp.float32)
        self.layer_norm = LayerNorm(epsilon=self.config.layer_norm_eps,
                                    name="layer_norm")
        self.attn_dropout = nn.Dropout(rate=cfg.dropout)
        self.out_dropout = nn.Dropout(rate=cfg.dropout)

    def _rel_attn_core(self, q_head, k_head, v_head, k_head_r, seg_mat,
                       attn_mask, deterministic, head_mask=None,
                       output_attentions=False, mask_bias=None,
                       seg_diff=None):
        """q_head [B,Q,H,Dh]; k/v_head [B,K,H,Dh]; k_head_r [P,H,Dh] (or
        [B,P,H,Dh] under bi_data's per-half position streams);
        seg_mat [B,Q,K,2] or None; attn_mask [B,1,Q,K] float 1=masked.
        With ``output_attentions`` returns (attn_vec, attn_prob).

        ``mask_bias``/``seg_diff`` are optional precomputed forms used by
        the fused path (MagXLNetModel hoists them out of the layer loop —
        they are layer-independent, so converting per layer wasted
        ~0.2 ms/layer of copies at b256): mask_bias = −1e30·mask already
        at the compute dtype; seg_diff = the [B,1,Q,K] bool behind
        seg_mat's one-hot. Both reduce to exactly the same ebias values
        (mask_bias is the same product with the sign folded; the one-hot
        contraction over {same,diff} IS a select)."""
        cfg = self.config
        scale = 1.0 / (cfg.d_head ** 0.5)
        klen = k_head.shape[1]
        f32 = jnp.float32
        # batched position stream (bi_data): r carries a leading batch dim
        bd_eq = ("bqhf,bphf->bhqp" if k_head_r.ndim == 4
                 else "bqhf,phf->bhqp")

        # Scoped-VMEM fit gate (mirrors models/bert.py): beyond the
        # full-H fit the rel entry head-blocks its grid
        # (fused_rel_attention_fits_hb — K includes mems, so long memory
        # also routes here), then flash-streams kb-column key blocks
        # with the ebias sliced into VMEM per block
        # (fused_rel_attention_fits_fs); only beyond every fit, fall
        # through to the einsum path below. TP needs the stricter
        # full-H fit (shard_map'd split kernels).
        item = jnp.dtype(self.dtype).itemsize
        nh_gate, qlen_gate = q_head.shape[2], q_head.shape[1]
        d_gate = nh_gate * q_head.shape[3]
        rel_fits = fused_rel_attention_fits(
            nh_gate, qlen_gate, klen, d_gate, item, item)
        # compile-verified on TPU: the probe needs the exact production
        # kernel parameters (ops/fused_attention.py::_resolve_rel_hb_plan
        # / _resolve_rel_fs_plan)
        rel_fit_kwargs = dict(
            batch=q_head.shape[0],
            rate=(0.0 if deterministic else cfg.dropout),
            scale=scale,
            dtype=jnp.dtype(self.dtype), eb_dtype=jnp.dtype(self.dtype))
        rel_fits_hb = fused_rel_attention_fits_hb(
            nh_gate, qlen_gate, klen, d_gate, item, item,
            **rel_fit_kwargs)
        rel_fits_any = rel_fits_hb or fused_rel_attention_fits_fs(
            nh_gate, qlen_gate, klen, d_gate, item, item,
            **rel_fit_kwargs)
        # Long-S inkernel: the ingredients flash-streamed tier reaches
        # past both the full-H ingredients fit AND (potentially) the
        # ebias tiers — it has its own compile-probed plan, so gate it
        # independently. Under TP the gate evaluates the PER-SHARD
        # geometry (H/mp local heads): the shard_map'd ingredients
        # wrapper calls the same auto-tiering entry per shard, so
        # long-S XLNet composes with tensor parallelism.
        tp_mp = (cfg.tp_attention_mesh.shape.get("model", 1)
                 if cfg.tp_attention_mesh is not None else 1)
        relik_fs_ok = (
            cfg.attention_impl == "fused"
            and cfg.rel_bias_impl in ("inkernel", "auto")
            and head_mask is None
            and not output_attentions
            and k_head_r.ndim == 3
            and k_head_r.shape[0] >= qlen_gate + klen
            and not rel_fits
            and nh_gate % tp_mp == 0
            and fused_rel_attention_ingredients_fits_fs(
                nh_gate // tp_mp, qlen_gate, klen, k_head_r.shape[0],
                d_gate // tp_mp, item, batch=q_head.shape[0],
                rate=rel_fit_kwargs["rate"], scale=scale,
                dtype=jnp.dtype(self.dtype)))

        if (cfg.attention_impl == "fused" and head_mask is None
                and not output_attentions
                and ((rel_fits or relik_fs_ok)
                     if cfg.tp_attention_mesh is not None
                     else (rel_fits_any or relik_fs_ok))):
            # Pallas rel-attention kernel (ops/fused_attention.py): the
            # QK dot, softmax, and prob-dropout run in VMEM; only ONE
            # [B,H,Q,K] tensor (ebias, differentiable) is streamed
            # instead of the ac/score/probs/keep-mask family. bqhf→flat
            # reshapes are free (h,f already minor). The bd/ef assembly
            # (incl. the rel_shift data shuffle) runs at the compute
            # dtype with the scale folded into rr/rs — at bf16 this
            # halves the [B,H,Q,P] rel_shift traffic.
            dt = self.dtype
            bsz, qlen2, h, dh = q_head.shape
            # rw feeds only the kernel's flat q input: add the bias FLAT
            # so no [B,Q,H,Dh] (64-lane, tile-padded) tensor is
            # materialized for it. Same element pairing as the 4D add.
            rw = (q_head.reshape(bsz, qlen2, h * dh)
                  + self.r_w_bias.reshape(-1)).astype(dt)
            # "auto" takes the ingredients path ONLY via the fs tier
            # (past the full-H ebias fit, where it measured ~2x);
            # explicit "inkernel" selects it whenever eligible.
            if (k_head_r.ndim == 3
                    and k_head_r.shape[0] >= qlen2 + klen
                    and ((cfg.rel_bias_impl == "inkernel"
                          and (rel_fits or relik_fs_ok))
                         or (cfg.rel_bias_impl == "auto"
                             and relik_fs_ok))):
                # Ingredients-fused path: no [B,H,Q,P]/[B,H,Q,K] HBM
                # tensors at all — bd, rel-shift, segment and mask biases
                # assemble in VMEM (fused_rel_attention_ingredients).
                # Eligibility mirrors the kernel's wraparound-safety bound
                # P ≥ Q+K (bi attention; uni's P=K+1 streams instead) and
                # excludes the bi_data per-example position stream.
                from bert_multimodal_transformer_tpu.ops.fused_attention \
                    import (fused_rel_attention_ingredients,
                            fused_rel_attention_ingredients_tp)

                rr = ((q_head.reshape(bsz, qlen2, h * dh)
                       + self.r_r_bias.reshape(-1)) * scale).astype(dt)
                if seg_mat is not None:
                    rs = ((q_head + self.r_s_bias) * scale).astype(dt)
                    sdelta = (self.seg_embed[1]
                              - self.seg_embed[0]).astype(dt)
                    ed = jnp.einsum("bqhf,hf->bhq", rs, sdelta,
                                    preferred_element_type=f32).astype(dt)
                    segd = (seg_diff[:, 0].astype(dt)
                            if seg_diff is not None
                            else seg_mat[..., 1].astype(dt))
                else:
                    # Mask/seg-free callers stream dense zero blocks; the
                    # driver workload always has both, so no static
                    # no-seg/no-mask kernel variant is carried for it.
                    ed = jnp.zeros((bsz, h, qlen2), dt)
                    segd = jnp.zeros((bsz, qlen2, klen), dt)
                if mask_bias is not None:
                    maskb = mask_bias[:, 0]
                elif attn_mask is not None:
                    maskb = (-(MASK_VERY_NEG
                               * attn_mask.astype(f32))).astype(dt)[:, 0]
                else:
                    maskb = jnp.zeros((bsz, qlen2, klen), dt)
                dropout_rng = None
                if not deterministic and cfg.dropout > 0:
                    dropout_rng = self.make_rng("dropout")
                ik_kwargs = dict(
                    n_heads=h,
                    scale=scale,
                    dropout_rate=cfg.dropout,
                    dropout_rng=dropout_rng,
                    deterministic=deterministic,
                )
                ik_args = (
                    rw,
                    rr,
                    k_head_r.astype(dt).reshape(-1, h * dh),
                    k_head.astype(dt).reshape(bsz, klen, h * dh),
                    v_head.astype(dt).reshape(bsz, klen, h * dh),
                    ed, segd, maskb,
                )
                if cfg.tp_attention_mesh is not None:
                    ctx = fused_rel_attention_ingredients_tp(
                        *ik_args, mesh=cfg.tp_attention_mesh, **ik_kwargs)
                else:
                    ctx = fused_rel_attention_ingredients(
                        *ik_args, **ik_kwargs)
                return ctx.reshape(bsz, qlen2, h, dh)
            rr = ((q_head + self.r_r_bias) * scale).astype(dt)
            bd = jnp.einsum(bd_eq, rr, k_head_r.astype(dt),
                            preferred_element_type=f32).astype(dt)
            ebias = rel_shift(bd, klen)
            if seg_mat is not None:
                rs = ((q_head + self.r_s_bias) * scale).astype(dt)
                ef_raw = jnp.einsum("bqhf,shf->bhqs", rs,
                                    self.seg_embed.astype(dt),
                                    preferred_element_type=f32)
                if seg_diff is not None:
                    # one-hot contraction == select (seg_mat is one-hot
                    # over {same, diff}): picks identical values, fuses
                    # into the ebias assembly instead of a [B,H,Q,K]
                    # einsum materialization per layer.
                    ef = jnp.where(seg_diff, ef_raw[..., 1:2],
                                   ef_raw[..., 0:1]).astype(dt)
                else:
                    ef = jnp.einsum("bqks,bhqs->bhqk", seg_mat.astype(f32),
                                    ef_raw).astype(dt)
                ebias = ebias + ef
            if mask_bias is not None:
                ebias = ebias + mask_bias
            elif attn_mask is not None:
                ebias = ebias - (MASK_VERY_NEG
                                 * attn_mask.astype(f32)).astype(dt)
            dropout_rng = None
            if not deterministic and cfg.dropout > 0:
                dropout_rng = self.make_rng("dropout")
            if cfg.tp_attention_mesh is not None:
                # heads sharded over the mesh model axis: shard_map'd
                # kernel (ops/fused_attention.py TP wrappers); the
                # sharded q/k/v/r einsums already produced head-sharded
                # operands, so entry is reshard-free.
                from bert_multimodal_transformer_tpu.ops.fused_attention \
                    import fused_rel_attention_tp

                ctx = fused_rel_attention_tp(
                    rw.reshape(bsz, qlen2, h * dh),
                    k_head.astype(dt).reshape(bsz, klen, h * dh),
                    v_head.astype(dt).reshape(bsz, klen, h * dh),
                    ebias,
                    mesh=cfg.tp_attention_mesh,
                    n_heads=h,
                    scale=scale,
                    dropout_rate=cfg.dropout,
                    dropout_rng=dropout_rng,
                    deterministic=deterministic,
                )
            else:
                ctx = fused_rel_attention(
                    rw.reshape(bsz, qlen2, h * dh),
                    k_head.astype(dt).reshape(bsz, klen, h * dh),
                    v_head.astype(dt).reshape(bsz, klen, h * dh),
                    ebias,
                    n_heads=h,
                    scale=scale,
                    dropout_rate=cfg.dropout,
                    dropout_rng=dropout_rng,
                    deterministic=deterministic,
                )
            return ctx.reshape(bsz, qlen2, h, dh)

        rw = (q_head + self.r_w_bias).astype(self.dtype)
        rr = (q_head + self.r_r_bias).astype(self.dtype)
        bd = jnp.einsum(bd_eq, rr,
                        k_head_r.astype(self.dtype),
                        preferred_element_type=f32)
        bd = rel_shift(bd, klen)
        if seg_mat is None:
            ef = 0.0
        else:
            rs = (q_head + self.r_s_bias).astype(self.dtype)
            ef_raw = jnp.einsum("bqhf,shf->bhqs", rs,
                                self.seg_embed.astype(self.dtype),
                                preferred_element_type=f32)
            ef = jnp.einsum("bqks,bhqs->bhqk", seg_mat.astype(f32), ef_raw)

        ac = jnp.einsum("bqhf,bkhf->bhqk", rw, k_head,
                        preferred_element_type=f32)
        score = (ac + bd + ef) * scale
        if attn_mask is not None:
            score = score - MASK_VERY_NEG * attn_mask.astype(f32)
        probs = jax.nn.softmax(score, axis=-1)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        if head_mask is not None:
            # HF applies the head mask after attention dropout.
            probs = probs * head_mask.astype(probs.dtype).reshape(1, -1, 1, 1)
        attn_vec = jnp.einsum("bhqk,bkhf->bqhf", probs.astype(self.dtype),
                              v_head)
        if output_attentions:
            # post-dropout, post-head-mask probs (HF rel_attn_core contract,
            # reference surfaces them via xlnet.py:401-429).
            return attn_vec, probs.astype(f32)
        return attn_vec

    def _post_attention(self, h, attn_vec, deterministic):
        b_, q_ = attn_vec.shape[0], attn_vec.shape[1]
        out = jnp.einsum("bqe,de->bqd", attn_vec.reshape(b_, q_, -1),
                         self.o.astype(self.dtype))
        out = self.out_dropout(out, deterministic=deterministic)
        return self.layer_norm(out + h)

    def __call__(
        self,
        h: jax.Array,                      # [B, Q, D] content stream
        g: Optional[jax.Array],            # [B, M, D] query stream or None
        attn_mask_h: Optional[jax.Array],  # [B, 1, Q, K]
        attn_mask_g: Optional[jax.Array],
        r: jax.Array,                      # [P, D] pos emb ([B, P, D] bi_data)
        seg_mat: Optional[jax.Array],      # [B, Q, K, 2]
        mems: Optional[jax.Array] = None,  # [B, mlen, D]
        target_mapping: Optional[jax.Array] = None,  # [B, M, Q]
        head_mask: Optional[jax.Array] = None,       # [H], 1=keep
        *,
        deterministic: bool = True,
        output_attentions: bool = False,
        mask_bias_h: Optional[jax.Array] = None,  # [B,1,Q,K] −1e30·mask @ dt
        mask_bias_g: Optional[jax.Array] = None,
        seg_diff: Optional[jax.Array] = None,      # [B,1,Q,K] bool
    ):
        dt = self.dtype
        cat = h if mems is None else jnp.concatenate(
            [mems.astype(dt), h], axis=1)

        cfg = self.config
        nh, dh = cfg.n_head, cfg.d_head
        bsz, qlen = h.shape[0], h.shape[1]
        klen = cat.shape[1]
        if (cfg.pack_qkv and mems is None
                and cfg.tp_attention_mesh is None):
            # Opt-in (measured −3.8% at xlnet-base b256, so split dots
            # stay the default — BENCHMARKS.md "XLNet step attribution"):
            # mems-free fine-tuning lets q/k/v read the same input, so
            # run ONE [D, 3·H·Dh] projection dot instead of three
            # [D, H·Dh] dots — the parameters stay separate
            # (checkpoint/convert layout unchanged); only the runtime
            # contraction is packed. Each output element reduces over
            # the same D values as the split dots, so results are
            # element-for-element identical math. Unavailable under mems
            # (k/v read cat ≠ h) and under head-sharded TP (weights are
            # sharded [D, H·Dh/mp]; a lane concat would cross shards).
            w_qkv = jnp.concatenate(
                [self.q, self.k, self.v], axis=1).astype(dt)
            qkv = jnp.einsum("bqd,de->bqe", h, w_qkv)
            e = nh * dh
            q_head_h = qkv[..., :e].reshape(bsz, qlen, nh, dh)
            k_head = qkv[..., e:2 * e].reshape(bsz, klen, nh, dh)
            v_head = qkv[..., 2 * e:].reshape(bsz, klen, nh, dh)
        else:
            q_head_h = jnp.einsum("bqd,de->bqe", h,
                                  self.q.astype(dt)).reshape(
                                      bsz, qlen, nh, dh)
            k_head = jnp.einsum("bkd,de->bke", cat,
                                self.k.astype(dt)).reshape(
                                    bsz, klen, nh, dh)
            v_head = jnp.einsum("bkd,de->bke", cat,
                                self.v.astype(dt)).reshape(
                                    bsz, klen, nh, dh)
        if r.ndim == 3:  # bi_data: per-example position stream [B, P, D]
            k_head_r = jnp.einsum("bpd,de->bpe", r.astype(dt),
                                  self.r.astype(dt)).reshape(
                                      bsz, -1, nh, dh)
        else:
            k_head_r = jnp.einsum("pd,de->pe", r.astype(dt),
                                  self.r.astype(dt)).reshape(-1, nh, dh)

        attn_out_h = self._rel_attn_core(
            q_head_h, k_head, v_head, k_head_r, seg_mat, attn_mask_h,
            deterministic, head_mask, output_attentions,
            mask_bias=mask_bias_h, seg_diff=seg_diff)
        if output_attentions:
            attn_vec_h, attn_prob_h = attn_out_h
        else:
            attn_vec_h, attn_prob_h = attn_out_h, None
        out_h = self._post_attention(h, attn_vec_h, deterministic)

        out_g, attn_prob_g = None, None
        if g is not None:
            q_head_g = jnp.einsum("bmd,de->bme", g,
                                  self.q.astype(dt)).reshape(
                                      bsz, g.shape[1], nh, dh)
            if target_mapping is not None:
                # project query positions onto content positions
                q_head_g = jnp.einsum("bmhf,bmq->bqhf", q_head_g,
                                      target_mapping.astype(dt))
                attn_out_g = self._rel_attn_core(
                    q_head_g, k_head, v_head, k_head_r, seg_mat,
                    attn_mask_g, deterministic, head_mask,
                    output_attentions, mask_bias=mask_bias_g,
                    seg_diff=seg_diff)
                if output_attentions:
                    # HF returns the projected-q-space probs un-projected
                    attn_vec_g, attn_prob_g = attn_out_g
                else:
                    attn_vec_g = attn_out_g
                attn_vec_g = jnp.einsum("bqhf,bmq->bmhf", attn_vec_g,
                                        target_mapping.astype(dt))
            else:
                attn_out_g = self._rel_attn_core(
                    q_head_g, k_head, v_head, k_head_r, seg_mat,
                    attn_mask_g, deterministic, head_mask,
                    output_attentions, mask_bias=mask_bias_g,
                    seg_diff=seg_diff)
                if output_attentions:
                    attn_vec_g, attn_prob_g = attn_out_g
                else:
                    attn_vec_g = attn_out_g
            out_g = self._post_attention(g, attn_vec_g, deterministic)

        if output_attentions:
            attn_prob = (attn_prob_h if attn_prob_g is None
                         else (attn_prob_h, attn_prob_g))
            return out_h, out_g, attn_prob
        return out_h, out_g


class XLNetFeedForward(nn.Module):
    """position-wise FFN with post-LN residual (HF XLNetFeedForward)."""

    config: XLNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        out = nn.Dense(cfg.d_inner, dtype=self.dtype, kernel_init=init,
                       name="layer_1")(x)
        out = ACT2FN[cfg.ff_activation](out)
        out = nn.Dropout(rate=cfg.dropout)(out, deterministic=deterministic)
        out = nn.Dense(cfg.d_model, dtype=self.dtype, kernel_init=init,
                       name="layer_2")(out)
        out = nn.Dropout(rate=cfg.dropout)(out, deterministic=deterministic)
        return LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(
            out + x)


class XLNetLayer(nn.Module):
    config: XLNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, g, attn_mask_h, attn_mask_g, r, seg_mat,
                 mems=None, target_mapping=None, head_mask=None,
                 deterministic=True, output_attentions=False,
                 mask_bias_h=None, mask_bias_g=None, seg_diff=None):
        # deterministic is positional (not kw-only) so nn.remat can mark it
        # static for the rematerialized stack; the precomputed fused-path
        # forms (mask_bias_*/seg_diff, see _rel_attn_core) trail it so the
        # static argnums stay (10, 11).
        attn_out = XLNetRelativeAttention(
            self.config, self.dtype, name="rel_attn")(
            h, g, attn_mask_h, attn_mask_g, r, seg_mat, mems,
            target_mapping, head_mask, deterministic=deterministic,
            output_attentions=output_attentions, mask_bias_h=mask_bias_h,
            mask_bias_g=mask_bias_g, seg_diff=seg_diff)
        if output_attentions:
            out_h, out_g, attn_prob = attn_out
        else:
            out_h, out_g = attn_out
        ff = XLNetFeedForward(self.config, self.dtype, name="ff")
        out_h = ff(out_h, deterministic=deterministic)
        if out_g is not None:
            out_g = ff(out_g, deterministic=deterministic)
        if output_attentions:
            return out_h, out_g, attn_prob
        return out_h, out_g


class MagXLNetModel(nn.Module):
    """XLNet backbone with MAG injected before layer ``injection_index``
    (reference MAG_XLNetModel, xlnet.py:15-429)."""

    config: XLNetConfig
    multimodal_config: MultimodalConfig
    visual_dim: int
    acoustic_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                      # [B, Q]
        visual: jax.Array,                         # [B, Q, Dv]
        acoustic: jax.Array,                       # [B, Q, Da]
        attention_mask: Optional[jax.Array] = None,  # [B, Q], 1=keep
        mems: Optional[Sequence[jax.Array]] = None,  # n_layer × [B, M, D]
        perm_mask: Optional[jax.Array] = None,       # [B, Q, Q], 1=cannot see
        target_mapping: Optional[jax.Array] = None,  # [B, M, Q]
        token_type_ids: Optional[jax.Array] = None,  # [B, Q]
        input_mask: Optional[jax.Array] = None,      # [B, Q], 1=padding
        head_mask: Optional[jax.Array] = None,       # [L, H] or [H], 1=keep
        inputs_embeds: Optional[jax.Array] = None,   # [B, Q, D]
        use_cache: bool = False,
        *,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        cfg = self.config
        if output_attentions and self.remat:
            raise ValueError(
                "output_attentions is incompatible with remat (the "
                "rematerialized stack discards per-layer probs)")
        mm_cfg = self.multimodal_config
        if (input_ids is None) == (inputs_embeds is None):
            raise ValueError(
                "specify exactly one of input_ids or inputs_embeds")
        b, qlen = (input_ids.shape if input_ids is not None
                   else inputs_embeds.shape[:2])
        mlen = 0
        if mems is not None and mems[0] is not None:
            mlen = mems[0].shape[1]
        klen = mlen + qlen
        f32 = jnp.float32

        # ---- attention-mask algebra (reference xlnet.py:247-298),
        # batch-first: masks are [B, 1, Q, K] floats with 1 = masked. ----
        if cfg.attn_type == "uni":
            attn_mask = causal_attn_mask(qlen, mlen, cfg.same_length)
            attn_mask = attn_mask[None, None]  # [1,1,Q,K]
        elif cfg.attn_type == "bi":
            attn_mask = None
        else:
            raise ValueError(f"Unsupported attention type {cfg.attn_type}")

        assert input_mask is None or attention_mask is None, (
            "use only one of input_mask (1=pad) or attention_mask (0=pad)")
        if input_mask is None and attention_mask is not None:
            input_mask = 1.0 - attention_mask.astype(f32)
        data_mask = None
        if input_mask is not None:
            data_mask = input_mask.astype(f32)[:, None, :]  # [B, 1(Q), Q]
        if perm_mask is not None:
            pm = perm_mask.astype(f32)  # [B, Q, Q]
            data_mask = pm if data_mask is None else data_mask + pm
        if data_mask is not None:
            if mlen > 0:
                mems_mask = jnp.zeros((b, data_mask.shape[1], mlen), f32)
                data_mask = jnp.concatenate([mems_mask, data_mask], axis=2)
            dm = data_mask[:, None]  # [B, 1(H), Q?, K]
            attn_mask = dm if attn_mask is None else attn_mask + dm
        if attn_mask is not None:
            attn_mask = (attn_mask > 0).astype(f32)
            # content stream may always see itself (−eye trick,
            # xlnet.py:288-295)
            eye = jnp.eye(qlen, dtype=f32)
            if mlen > 0:
                eye = jnp.concatenate(
                    [jnp.zeros((qlen, mlen), f32), eye], axis=1)
            non_tgt_mask = ((attn_mask - eye[None, None]) > 0).astype(f32)
        else:
            non_tgt_mask = None

        # ---- embeddings & streams (xlnet.py:300-313) ----
        embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                         embedding_init=nn.initializers.normal(
                             stddev=cfg.initializer_range),
                         dtype=self.dtype, name="word_embedding")
        if inputs_embeds is not None:
            word_emb_k = inputs_embeds.astype(self.dtype)
            embed(jnp.zeros((1, 1), jnp.int32))  # materialize params
        else:
            word_emb_k = embed(input_ids)
        dropout = nn.Dropout(rate=cfg.dropout)
        output_h = dropout(word_emb_k, deterministic=deterministic)
        output_g = None
        if target_mapping is not None:
            mask_emb = self.param(
                "mask_emb", nn.initializers.normal(cfg.initializer_range),
                (1, 1, cfg.d_model), jnp.float32)
            m = target_mapping.shape[1]
            word_emb_q = jnp.broadcast_to(
                mask_emb.astype(self.dtype), (b, m, cfg.d_model))
            output_g = dropout(word_emb_q, deterministic=deterministic)

        # ---- segment matrix (xlnet.py:315-329) ----
        seg_mat, seg_diff = None, None
        if token_type_ids is not None:
            if mlen > 0:
                mem_pad = jnp.zeros((b, mlen), token_type_ids.dtype)
                cat_ids = jnp.concatenate([mem_pad, token_type_ids], axis=1)
            else:
                cat_ids = token_type_ids
            diff = (token_type_ids[:, :, None] != cat_ids[:, None, :])
            seg_mat = jax.nn.one_hot(diff.astype(jnp.int32), 2, dtype=f32)
            seg_diff = diff[:, None]  # [B,1,Q,K] bool behind the one-hot

        # ---- relative positions (xlnet.py:331-333) ----
        pos_emb = relative_positional_encoding(
            qlen, klen, cfg.d_model, cfg.attn_type, cfg.clamp_len,
            bi_data=cfg.bi_data, dtype=self.dtype)
        if cfg.bi_data:
            # fwd/bwd position streams split over batch halves (reference
            # xlnet.py:126-141 / HF relative_positional_encoding with
            # bsz//2 per stream): first B/2 examples read forward
            # positions, last B/2 read backward positions.
            if b % 2 != 0:
                raise ValueError(
                    f"bi_data=True needs an even batch size, got {b}")
            fwd = jnp.broadcast_to(pos_emb[0],
                                   (b // 2,) + pos_emb[0].shape)
            bwd = jnp.broadcast_to(pos_emb[1],
                                   (b // 2,) + pos_emb[1].shape)
            pos_emb = jnp.concatenate([fwd, bwd], axis=0)  # [B, P, D]
        pos_emb = dropout(pos_emb, deterministic=deterministic)

        # ---- MAG + layer stack (xlnet.py:362-388) ----
        mag = MAG(hidden_size=cfg.d_model, visual_dim=self.visual_dim,
                  acoustic_dim=self.acoustic_dim,
                  beta_shift=mm_cfg.beta_shift,
                  dropout_prob=mm_cfg.dropout_prob,
                  use_fused_kernel=mm_cfg.use_fused_kernel, name="MAG")

        # Hoist the fused path's layer-independent ebias ingredients out of
        # the layer loop (see XLNetRelativeAttention._rel_attn_core): the
        # −1e30·mask product and the seg one-hot→select conversion are the
        # same for all n_layer layers, and remat boundaries stop XLA from
        # CSE-ing them across layers (~0.2 ms/layer of copies at b256).
        mask_bias_h = mask_bias_g = None
        fused_path = (cfg.attention_impl == "fused" and head_mask is None
                      and not output_attentions)
        if fused_path:
            if non_tgt_mask is not None:
                mask_bias_h = (-(MASK_VERY_NEG * non_tgt_mask)).astype(
                    self.dtype)
            if attn_mask is not None and target_mapping is not None:
                mask_bias_g = (-(MASK_VERY_NEG * attn_mask)).astype(
                    self.dtype)
        else:
            seg_diff = None

        if mems is None:
            mems = [None] * cfg.n_layer
        new_mems = []
        keep_mems = (cfg.mem_len is not None and cfg.mem_len > 0
                     and use_cache)

        layer_cls = XLNetLayer
        if self.remat:
            # deterministic/output_attentions are args[10]/args[11] (flax
            # remat counts self as args[0]).
            layer_cls = nn.remat(XLNetLayer, static_argnums=(10, 11))

        hidden_states = [] if output_hidden_states else None
        attentions = [] if output_attentions else None
        for i in range(cfg.n_layer):
            if keep_mems:
                new_mems.append(self._cache_mem(output_h, mems[i]))
            if i == mm_cfg.injection_index:
                output_h = mag(output_h, visual.astype(self.dtype),
                               acoustic.astype(self.dtype),
                               deterministic=deterministic)
            if output_hidden_states:
                # per-layer INPUT states, (h, g) pairs under two-stream
                # (reference xlnet.py:401-429 / HF XLNetModel)
                hidden_states.append(
                    (output_h, output_g) if output_g is not None
                    else output_h)
            hm = None
            if head_mask is not None:
                hm = head_mask[i] if head_mask.ndim == 2 else head_mask
            layer_out = layer_cls(
                cfg, self.dtype, name=f"layer_{i}")(
                output_h, output_g, non_tgt_mask, attn_mask, pos_emb,
                seg_mat, mems[i], target_mapping, hm, deterministic,
                output_attentions, mask_bias_h, mask_bias_g, seg_diff)
            if output_attentions:
                output_h, output_g, attn_prob = layer_out
                attentions.append(attn_prob)
            else:
                output_h, output_g = layer_out
        if output_hidden_states:
            hidden_states.append(
                (output_h, output_g) if output_g is not None else output_h)

        output = dropout(output_g if output_g is not None else output_h,
                         deterministic=deterministic)
        outputs = (output, tuple(new_mems) if keep_mems else None)
        if output_hidden_states:
            outputs = outputs + (tuple(hidden_states),)
        if output_attentions:
            outputs = outputs + (tuple(attentions),)
        return outputs

    def _cache_mem(self, curr_out: jax.Array,
                   prev_mem: Optional[jax.Array]) -> jax.Array:
        """Functional mems update (reference cache_mem, xlnet.py:81-91):
        truncate current output to reuse_len, append to memory, keep the
        last mem_len steps; gradients stopped."""
        cfg = self.config
        if cfg.reuse_len is not None and cfg.reuse_len > 0:
            curr_out = curr_out[:, :cfg.reuse_len]
        if prev_mem is None:
            new_mem = curr_out[:, -cfg.mem_len:]
        else:
            new_mem = jnp.concatenate([prev_mem, curr_out],
                                      axis=1)[:, -cfg.mem_len:]
        return jax.lax.stop_gradient(new_mem)


class SequenceSummary(nn.Module):
    """HF SequenceSummary with XLNet config: take the LAST token (XLNet
    packs [CLS] last with left-padding — multimodal_driver.py:182-201),
    Linear proj, tanh, dropout (reference xlnet.py:438,508)."""

    config: XLNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, *, deterministic: bool = True):
        cfg = self.config
        out = hidden[:, -1]
        out = nn.Dense(cfg.d_model, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(
                           stddev=cfg.initializer_range),
                       name="summary")(out)
        out = jnp.tanh(out)
        out = nn.Dropout(rate=cfg.summary_last_dropout)(
            out, deterministic=deterministic)
        return out


class MagXLNetForSequenceClassification(nn.Module):
    """SequenceSummary + logits projection over MagXLNetModel (reference
    MAG_XLNetForSequenceClassification, xlnet.py:432-527)."""

    config: XLNetConfig
    multimodal_config: MultimodalConfig
    visual_dim: int
    acoustic_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        visual: jax.Array,
        acoustic: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        mems: Optional[Sequence[jax.Array]] = None,
        perm_mask: Optional[jax.Array] = None,
        target_mapping: Optional[jax.Array] = None,
        input_mask: Optional[jax.Array] = None,
        head_mask: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        use_cache: bool = False,
        *,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        cfg = self.config
        transformer_outputs = MagXLNetModel(
            cfg, self.multimodal_config, self.visual_dim, self.acoustic_dim,
            self.dtype, self.remat, name="transformer")(
            input_ids, visual, acoustic, attention_mask=attention_mask,
            mems=mems, perm_mask=perm_mask, target_mapping=target_mapping,
            token_type_ids=token_type_ids, input_mask=input_mask,
            head_mask=head_mask, inputs_embeds=inputs_embeds,
            use_cache=use_cache, deterministic=deterministic,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions)
        output = transformer_outputs[0]
        summary = SequenceSummary(cfg, self.dtype, name="sequence_summary")(
            output, deterministic=deterministic)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(
                              stddev=cfg.initializer_range),
                          name="logits_proj")(summary)
        logits = logits.astype(jnp.float32)
        # reference surface: (logits,) + transformer_outputs[1:]
        # (xlnet.py:510-513) — under use_cache that INCLUDES the updated
        # mems so segment recurrence can be driven through the classifier;
        # without it only hidden_states/attentions (if asked) follow.
        extras = (transformer_outputs[1:] if use_cache
                  else transformer_outputs[2:])
        if labels is not None:
            # internal MSE/CE loss switch (reference xlnet.py:515-524)
            from bert_multimodal_transformer_tpu.training.losses import (
                sequence_classification_loss,
            )

            loss = sequence_classification_loss(logits, labels,
                                                cfg.num_labels)
            return (loss, logits) + extras
        if extras:
            # reference returns (logits,) + transformer extras
            # (xlnet.py:510-513)
            return (logits,) + extras
        return logits
