"""Experiment: move the XLNet rel-attention bias assembly INTO the kernel.

The production fused rel-attention path (models/xlnet.py:_rel_attn_core
fused branch) assembles a per-layer [B,H,Q,K] ebias in XLA — bd einsum
[B,H,Q,P] (P=Q+K), rel_shift (a pad/reshape relayout), segment-ef select,
mask add — and streams it through HBM into the kernel; the backward
streams a [B,H,Q,K] debias back out and XLA transposes the assembly
(unshift pad + two einsums). That is the one remaining [B,H,Q,·] HBM
tensor family in the XLNet step (~90 MB/layer fwd + ~120 MB/layer bwd of
traffic at b256 bf16).

This probes a kernel that takes the assembly INGREDIENTS instead:

  rw [B,Q,D]   q + r_w_bias                 (content term, as today)
  rr [B,Q,D]   (q + r_r_bias)·scale         (position term query)
  r  [P,D]     k_head_r = pos_emb·W_r       (shared across batch!)
  ed [B,H,Q]   scale·(q+r_s_bias)·(seg₁−seg₀)  (segment-ef delta)
  segd [B,Q,K] seg-difference mask (0/1)
  maskb [B,Q,K] −1e30·attn_mask

and computes per grid row, all in VMEM: ac dots, bd dots ([H,Q,P]
scratch), the relative shift as a LOG-SHIFT (6 masked lane-rolls of the
whole [H,Q,P] block — out[q,k] = bd[q, Q−q+k], and the per-row shift
amount a_q = Q−q decomposes into its bits; wraparound is provably
harmless because k < K ≤ P−a_q), the segment/mask bias adds, softmax,
PRNG dropout, PV. The backward recomputes, unshifts ds with the mirrored
log-shift (zero-pad K→P; wrapped elements come from the zero region),
and emits d_rw, d_rr, dk, dv, d_ed — plus d_r ACCUMULATED across the
whole grid into a single [P,D] block (constant out index_map; grid steps
run sequentially on a TPU core).

Math note: the reference ef term is a per-(h,q) one-hot select between
ef₀ and ef₁ (seg-same vs seg-diff). ef₀ is constant along k for fixed
(h,q) ⇒ softmax-invariant, and its exact gradient is zero (softmax-VJP
rows sum to 0), so the kernel only needs the DELTA ed = ef₁−ef₀ times
the 0/1 segd mask. Outputs differ from the streamed path only by fp
rounding of the dropped constant.

Usage: python tools/exp_rel_inkernel.py            # TPU timing + parity
       INTERPRET=1 python tools/exp_rel_inkernel.py  # CPU parity only
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

if os.environ.get("INTERPRET") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("INTERPRET") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bert_multimodal_transformer_tpu.models.xlnet import rel_shift
from bert_multimodal_transformer_tpu.ops.fused_attention import (
    fused_rel_attention,
)

B, H, Q, K, DH, NB = 256, 12, 50, 50, 64, 8
P = Q + K
D = H * DH
SCALE = DH ** -0.5
RATE = 0.1
f32 = jnp.float32
INTERPRET = os.environ.get("INTERPRET") == "1"

# Bits of the per-row left-shift amount a_q = Q - q ∈ [1, Q].
SHIFT_BITS = [1 << i for i in range(Q.bit_length())]


def _thresh(rate):
    return np.uint32(min(int(round(rate * 4294967296.0)), 4294967295))


def _log_shift(x):
    """x [H, Q, P] → out [H, Q, K] with out[h,q,k] = x[h,q, (Q-q)+k].

    Left-rolls row q by a_q = Q-q via bit decomposition: 6 full-block
    masked rolls instead of Q per-row slices. Wraparound never reaches
    k < K because a_q ≤ Q ⇒ P - a_q ≥ K."""
    qidx = jax.lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)
    a = Q - qidx
    for amt in SHIFT_BITS:
        rolled = jnp.concatenate([x[..., amt:], x[..., :amt]], axis=-1)
        x = jnp.where((a & amt) != 0, rolled, x)
    return x[..., :K]


def _log_unshift(ds):
    """Transpose of _log_shift: ds [H, Q, K] → z [H, Q, P] with
    z[h,q,(Q-q)+k] = ds[h,q,k], zeros elsewhere. Right-rolls the zero-
    padded block; wrapped elements provably come from the zero tail."""
    z = jnp.concatenate(
        [ds, jnp.zeros((ds.shape[0], Q, P - K), ds.dtype)], axis=-1)
    qidx = jax.lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)
    a = Q - qidx
    for amt in SHIFT_BITS:
        rolled = jnp.concatenate([z[..., P - amt:], z[..., :P - amt]],
                                 axis=-1)
        z = jnp.where((a & amt) != 0, rolled, z)
    return z


def _fwd_kernel(seed_ref, maskb_ref, segd_ref, ed_ref, rw_ref, rr_ref,
                r_ref, k_ref, v_ref, o_ref, s_ref, b2_ref, *, rate):
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    for b in range(NB):
        for h in range(H):
            rw = rw_ref[b, :, h * DH:(h + 1) * DH]
            kh = k_ref[b, :, h * DH:(h + 1) * DH]
            s_ref[h] = jax.lax.dot_general(
                rw, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            rr = rr_ref[b, :, h * DH:(h + 1) * DH]
            rh = r_ref[:, h * DH:(h + 1) * DH]
            b2_ref[h] = jax.lax.dot_general(
                rr, rh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        sh = _log_shift(b2_ref[:])
        ed = ed_ref[b].astype(f32)[:, :, None]               # [H, Q, 1]
        segd = segd_ref[b].astype(f32)[None]                 # [1, Q, K]
        maskb = maskb_ref[b].astype(f32)[None]
        s = s_ref[:] * SCALE + sh + ed * segd + maskb
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        pc = p.astype(rw_ref.dtype)
        outs = []
        for h in range(H):
            v = v_ref[b, :, h * DH:(h + 1) * DH]
            o = jax.lax.dot_general(pc[h], v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)


def _fwd_save_kernel(seed_ref, maskb_ref, segd_ref, ed_ref, rw_ref,
                     rr_ref, r_ref, k_ref, v_ref, o_ref, p_ref, pd_ref,
                     s_ref, b2_ref, *, rate):
    """Forward that also writes pre/post-dropout probs (bf16) so the
    backward can skip the ac/bd dots, log-shift, softmax and PRNG."""
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    for b in range(NB):
        for h in range(H):
            rw = rw_ref[b, :, h * DH:(h + 1) * DH]
            kh = k_ref[b, :, h * DH:(h + 1) * DH]
            s_ref[h] = jax.lax.dot_general(
                rw, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            rr = rr_ref[b, :, h * DH:(h + 1) * DH]
            rh = r_ref[:, h * DH:(h + 1) * DH]
            b2_ref[h] = jax.lax.dot_general(
                rr, rh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        sh = _log_shift(b2_ref[:])
        ed = ed_ref[b].astype(f32)[:, :, None]
        segd = segd_ref[b].astype(f32)[None]
        maskb = maskb_ref[b].astype(f32)[None]
        s = s_ref[:] * SCALE + sh + ed * segd + maskb
        p = jax.nn.softmax(s, axis=-1)
        p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(rw_ref.dtype)
        outs = []
        for h in range(H):
            v = v_ref[b, :, h * DH:(h + 1) * DH]
            o = jax.lax.dot_general(pc[h], v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)


def _bwd_saved_kernel(p_ref, pd_ref, segd_ref, rw_ref, rr_ref, r_ref,
                      k_ref, v_ref, g_ref,
                      drw_ref, drr_ref, dk_ref, dv_ref, ded_ref, dr_ref,
                      t_ref):
    """Saved-probs backward: no ac/bd dots, no shift, no softmax, no
    PRNG — just the ds chain, unshift, and the six grad dot families."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[...] = jnp.zeros_like(dr_ref)

    for b in range(NB):
        dvs = []
        for h in range(H):
            v = v_ref[b, :, h * DH:(h + 1) * DH]
            g = g_ref[b, :, h * DH:(h + 1) * DH]
            dv = jax.lax.dot_general(pd_ref[b, h], g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                  # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)
        p = p_ref[b].astype(f32)
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)      # [H,Q,K] f32
        segd = segd_ref[b].astype(f32)[None]
        ded_ref[b] = jnp.sum(ds * segd, axis=-1).astype(ded_ref.dtype)
        z = _log_unshift(ds).astype(rw_ref.dtype)            # [H,Q,P]
        dsc = (ds * SCALE).astype(rw_ref.dtype)
        drws, drrs, dks = [], [], []
        for h in range(H):
            kh = k_ref[b, :, h * DH:(h + 1) * DH]
            rw = rw_ref[b, :, h * DH:(h + 1) * DH]
            rr = rr_ref[b, :, h * DH:(h + 1) * DH]
            rh = r_ref[:, h * DH:(h + 1) * DH]
            drw = jax.lax.dot_general(dsc[h], kh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            dk = jax.lax.dot_general(dsc[h], rw, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            drr = jax.lax.dot_general(z[h], rh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            dr = jax.lax.dot_general(z[h], rr, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dr_ref[:, h * DH:(h + 1) * DH] += dr
            drws.append(drw.astype(drw_ref.dtype))
            drrs.append(drr.astype(drr_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        drw_ref[b] = jnp.concatenate(drws, axis=-1)
        drr_ref[b] = jnp.concatenate(drrs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)


def _bwd_kernel(seed_ref, maskb_ref, segd_ref, ed_ref, rw_ref, rr_ref,
                r_ref, k_ref, v_ref, g_ref,
                drw_ref, drr_ref, dk_ref, dv_ref, ded_ref, dr_ref,
                s_ref, b2_ref, t_ref, *, rate):
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[...] = jnp.zeros_like(dr_ref)

    for b in range(NB):
        for h in range(H):
            rw = rw_ref[b, :, h * DH:(h + 1) * DH]
            kh = k_ref[b, :, h * DH:(h + 1) * DH]
            s_ref[h] = jax.lax.dot_general(
                rw, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            rr = rr_ref[b, :, h * DH:(h + 1) * DH]
            rh = r_ref[:, h * DH:(h + 1) * DH]
            b2_ref[h] = jax.lax.dot_general(
                rr, rh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        sh = _log_shift(b2_ref[:])
        ed = ed_ref[b].astype(f32)[:, :, None]
        segd = segd_ref[b].astype(f32)[None]
        maskb = maskb_ref[b].astype(f32)[None]
        s = s_ref[:] * SCALE + sh + ed * segd + maskb
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(rw_ref.dtype)
        dvs = []
        for h in range(H):
            v = v_ref[b, :, h * DH:(h + 1) * DH]
            g = g_ref[b, :, h * DH:(h + 1) * DH]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                  # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)
        t = pd * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)      # [H,Q,K] f32
        ded_ref[b] = jnp.sum(ds * segd, axis=-1).astype(ded_ref.dtype)
        z = _log_unshift(ds).astype(rw_ref.dtype)            # [H,Q,P]
        dsc = (ds * SCALE).astype(rw_ref.dtype)
        drws, drrs, dks = [], [], []
        for h in range(H):
            kh = k_ref[b, :, h * DH:(h + 1) * DH]
            rw = rw_ref[b, :, h * DH:(h + 1) * DH]
            rr = rr_ref[b, :, h * DH:(h + 1) * DH]
            rh = r_ref[:, h * DH:(h + 1) * DH]
            drw = jax.lax.dot_general(dsc[h], kh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            dk = jax.lax.dot_general(dsc[h], rw, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            drr = jax.lax.dot_general(z[h], rh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            dr = jax.lax.dot_general(z[h], rr, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dr_ref[:, h * DH:(h + 1) * DH] += dr
            drws.append(drw.astype(drw_ref.dtype))
            drrs.append(drr.astype(drr_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        drw_ref[b] = jnp.concatenate(drws, axis=-1)
        drr_ref[b] = jnp.concatenate(drrs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)


def _specs():
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    qk_spec = pl.BlockSpec((NB, Q, K), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    ed_spec = pl.BlockSpec((NB, H, Q), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((NB, Q, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((P, D), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return seed_spec, qk_spec, ed_spec, row_spec, r_spec


@functools.partial(jax.jit, static_argnames=("rate",))
def _fwd_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, rate):
    seed_spec, qk_spec, ed_spec, row_spec, r_spec = _specs()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid=(B // NB,),
        in_specs=[seed_spec, qk_spec, qk_spec, ed_spec, row_spec,
                  row_spec, r_spec, row_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
        scratch_shapes=[pltpu.VMEM((H, Q, K), f32),
                        pltpu.VMEM((H, Q, P), f32)],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q * (K + P + K) * DH + 8 * B * H * Q * K,
            bytes_accessed=rw.dtype.itemsize * B * Q * 4 * D,
            transcendentals=B * H * Q * K,
        ),
    )(seed, maskb, segd, ed, rw, rr, r, k, v)


@functools.partial(jax.jit, static_argnames=("rate",))
def _bwd_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, g, rate):
    seed_spec, qk_spec, ed_spec, row_spec, r_spec = _specs()
    dr_spec = pl.BlockSpec((P, D), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=(B // NB,),
        in_specs=[seed_spec, qk_spec, qk_spec, ed_spec, row_spec,
                  row_spec, r_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec, row_spec, row_spec, row_spec, ed_spec,
                   dr_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, K, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, K, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, H, Q), rw.dtype),
                   jax.ShapeDtypeStruct((P, D), f32)),
        scratch_shapes=[pltpu.VMEM((H, Q, K), f32),
                        pltpu.VMEM((H, Q, P), f32),
                        pltpu.VMEM((H, Q, K), f32)],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q * (K + P) * DH * 3 + 12 * B * H * Q * K,
            bytes_accessed=rw.dtype.itemsize * B * Q * 9 * D,
            transcendentals=B * H * Q * K,
        ),
    )(seed, maskb, segd, ed, rw, rr, r, k, v, g)


@functools.partial(jax.jit, static_argnames=("rate",))
def _fwd_save_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, rate):
    seed_spec, qk_spec, ed_spec, row_spec, r_spec = _specs()
    prob_spec = pl.BlockSpec((NB, H, Q, K), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    prob_shape = jax.ShapeDtypeStruct((B, H, Q, K), rw.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_save_kernel, rate=rate),
        grid=(B // NB,),
        in_specs=[seed_spec, qk_spec, qk_spec, ed_spec, row_spec,
                  row_spec, r_spec, row_spec, row_spec],
        out_specs=(row_spec, prob_spec, prob_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
                   prob_shape, prob_shape),
        scratch_shapes=[pltpu.VMEM((H, Q, K), f32),
                        pltpu.VMEM((H, Q, P), f32)],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q * (K + P + K) * DH + 8 * B * H * Q * K,
            bytes_accessed=rw.dtype.itemsize * B * Q * 4 * D,
            transcendentals=B * H * Q * K,
        ),
    )(seed, maskb, segd, ed, rw, rr, r, k, v)


@jax.jit
def _bwd_saved_pallas(p, pd, rw, rr, r, k, v, segd, g):
    _, qk_spec, ed_spec, row_spec, r_spec = _specs()
    prob_spec = pl.BlockSpec((NB, H, Q, K), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    dr_spec = pl.BlockSpec((P, D), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_saved_kernel,
        grid=(B // NB,),
        in_specs=[prob_spec, prob_spec, qk_spec, row_spec, row_spec,
                  r_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec, row_spec, row_spec, row_spec, ed_spec,
                   dr_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, Q, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, K, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, K, D), rw.dtype),
                   jax.ShapeDtypeStruct((B, H, Q), rw.dtype),
                   jax.ShapeDtypeStruct((P, D), f32)),
        scratch_shapes=[pltpu.VMEM((H, Q, K), f32)],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Q * (K + P) * DH * 2 + 8 * B * H * Q * K,
            bytes_accessed=rw.dtype.itemsize * B * Q * 9 * D,
            transcendentals=0,
        ),
    )(p, pd, segd, rw, rr, r, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def rel_attn_inkernel(rw, rr, r, k, v, ed, segd, maskb, rate, save,
                      seed):
    return _fwd_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, rate)


def _ik_fwd(rw, rr, r, k, v, ed, segd, maskb, rate, save, seed):
    if save:
        out, p, pd = _fwd_save_pallas(rw, rr, r, k, v, ed, segd, maskb,
                                      seed, rate)
        return out, (rw, rr, r, k, v, segd, p, pd)
    out = _fwd_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, rate)
    return out, (rw, rr, r, k, v, ed, segd, maskb, seed)


def _ik_bwd(rate, save, res, g):
    if save:
        rw, rr, r, k, v, segd, p, pd = res
        drw, drr, dk, dv, ded, dr = _bwd_saved_pallas(
            p, pd, rw, rr, r, k, v, segd, g)
        maskb_zero = jnp.zeros((B, Q, K), rw.dtype)
    else:
        rw, rr, r, k, v, ed, segd, maskb, seed = res
        drw, drr, dk, dv, ded, dr = _bwd_pallas(
            rw, rr, r, k, v, ed, segd, maskb, seed, g, rate)
        maskb_zero = jnp.zeros_like(maskb)
    return (drw, drr, dr.astype(r.dtype), dk, dv, ded,
            jnp.zeros_like(segd), maskb_zero,
            np.zeros((1, 1), jax.dtypes.float0))


rel_attn_inkernel.defvjp(_ik_fwd, _ik_bwd)


# ---- streamed-ebias twin: the production assembly + production kernel ----

def rel_attn_stream(rw, rr, r, k, v, ed, segd, maskb, rate, seed_key):
    bd = jnp.einsum("bqhf,phf->bhqp", rr.reshape(B, Q, H, DH),
                    r.reshape(P, H, DH), preferred_element_type=f32
                    ).astype(rw.dtype)
    ebias = rel_shift(bd, K)
    ef = jnp.where(segd[:, None].astype(bool), ed[:, :, :, None],
                   jnp.zeros((), rw.dtype))
    ebias = ebias + ef + maskb[:, None]
    return fused_rel_attention(
        rw, k, v, ebias, n_heads=H, scale=SCALE, dropout_rate=rate,
        dropout_rng=seed_key, deterministic=rate == 0.0)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.float32 if os.environ.get("DT") == "f32" else jnp.bfloat16
    rw = jnp.asarray(rng.randn(B, Q, D), dt)
    rr = jnp.asarray(rng.randn(B, Q, D) * SCALE, dt)
    r = jnp.asarray(rng.randn(P, D), dt)
    k = jnp.asarray(rng.randn(B, K, D), dt)
    v = jnp.asarray(rng.randn(B, K, D), dt)
    ed = jnp.asarray(rng.randn(B, H, Q) * SCALE, dt)
    segd = jnp.asarray(rng.randint(0, 2, (B, Q, K)), dt)
    maskb = jnp.zeros((B, Q, K), dt)
    seed = jnp.zeros((1, 1), jnp.int32)
    key = jax.random.PRNGKey(0)

    # ---- parity (dropout off): fwd + grads vs the streamed twin ----
    def loss_ik(args, save=False):
        return jnp.sum(rel_attn_inkernel(*args, segd, maskb, 0.0, save,
                                         seed).astype(f32))

    def loss_st(args):
        return jnp.sum(rel_attn_stream(*args, segd, maskb, 0.0,
                                       key).astype(f32))

    args = (rw, rr, r, k, v, ed)
    names = ("rw", "rr", "r", "k", "v", "ed")
    y_st, g_st = jax.value_and_grad(loss_st)(args)
    for save in (False, True):
        y_ik, g_ik = jax.value_and_grad(
            functools.partial(loss_ik, save=save))(args)
        print(f"fwd sum (save={save}): inkernel {y_ik:.4f} stream "
              f"{y_st:.4f} rel {abs(y_ik - y_st) / abs(y_st):.2e}")
        for n, a, b_ in zip(names, g_ik, g_st):
            a, b_ = a.astype(f32), b_.astype(f32)
            denom = float(jnp.max(jnp.abs(b_))) or 1.0
            print(f"  d{n:3s} max|Δ|/max|g| = "
                  f"{float(jnp.max(jnp.abs(a - b_))) / denom:.2e}")

    if INTERPRET:
        print("interpret mode: parity only, no timing")
        return

    # ---- timing: chained per-layer calls, grad of sum ----
    LAYERS = 12

    def bench(name, fn, n=30):
        @jax.jit
        def chain(rw_):
            tot = jnp.zeros((), f32)
            x = rw_
            for _ in range(LAYERS):
                out, grads = jax.value_and_grad(fn)((x, rr, r, k, v, ed))
                tot = tot + out
                x = x + (grads[0] * 1e-30).astype(x.dtype)
            return tot

        c = chain(rw)
        float(jax.device_get(c))
        t0 = time.perf_counter()
        for _ in range(n):
            c = chain(rw + (c * 1e-30).astype(dt))
        float(jax.device_get(c))
        ms = (time.perf_counter() - t0) / n / LAYERS * 1e3
        print(f"{name:10s} {ms:7.3f} ms/layer (fwd+bwd, {LAYERS} chained)")
        return ms

    def loss_ik_d(args, save=False):
        return jnp.sum(rel_attn_inkernel(*args, segd, maskb, RATE, save,
                                         seed).astype(f32))

    def loss_st_d(args):
        return jnp.sum(rel_attn_stream(*args, segd, maskb, RATE,
                                       key).astype(f32))

    for _ in range(2):
        bench("stream", loss_st_d)
        bench("inkernel", loss_ik_d)
        bench("ik_save", functools.partial(loss_ik_d, save=True))


if __name__ == "__main__":
    main()
