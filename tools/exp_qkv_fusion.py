"""Experiment: fuse the QKV projection gemm into the packed attention kernel.

Today (--attention_impl fused) each layer runs
    qkv = x @ W_qkv + b_qkv          # XLA gemm, [B*S, D] x [D, 3D]
    ctx = fused_attention_packed(qkv, ...)   # Pallas, reads qkv from HBM
so the [B, S, 3D] projection output round-trips HBM between the gemm and
the kernel (~59 MB each way at bert-base b256), and the [B, S, D] context
round-trips again before the output projection. This probes moving the
projection(s) inside the kernel:

  split        XLA gemm + packed kernel (copy of the shipped pair) — baseline
  fused_qkv    kernel computes qkv = x @ W + b in VMEM ([nb*S, D] x [D, 3D],
               weight block grid-invariant so it loads once), then the
               head-batched chain
  fused_qkvo   fused_qkv + the output projection ctx @ Wo + bo in VMEM
               (saves the ctx round-trip too)

x is passed flattened [B*S, D] (a free leading-dim collapse in XLA) so the
in-kernel projection dot has M = nb*S = 400 rows — full MXU row
utilization — instead of per-example M = 50.

All variants run save-probs mode with dropout (the in-model fwd config).
Numeric parity is asserted dropout-off.

The train-relevant comparison is fwd+bwd, timed via custom-VJP layer fns
(value_and_grad over a LAYERS-deep chain):

  split    XLA qkv gemm + fwd kernel; saved-probs bwd kernel -> dqkv;
           XLA gemms for dx / dW / db   (the shipped structure)
  fused_s  fwd kernel computes qkv in VMEM and ALSO emits it to HBM;
           bwd kernel reads the saved qkv, builds dqkv in VMEM, emits
           dqkv (for XLA's dW/db) and computes dx = dqkv @ W^T in-kernel
  fused_r  fwd kernel does NOT emit qkv; bwd kernel recomputes
           qkv = x @ W + b in VMEM (trades one extra in-kernel gemm for
           the qkv HBM round-trip), then as fused_s

dW stays an XLA gemm in all variants: accumulating a [D, 3D] f32 block
across the grid in VMEM doesn't fit alongside the rest at useful nb.

Usage: python tools/exp_qkv_fusion.py            # bert-base b256, TPU
       GEOM=large python tools/exp_qkv_fusion.py # bert-large b128
       INTERPRET=1 python tools/exp_qkv_fusion.py  # CPU parity check only
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

INTERPRET = os.environ.get("INTERPRET") == "1"
if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if INTERPRET:
    B, H, S, DH = 8, 4, 50, 64          # small: interpret mode is slow
elif os.environ.get("GEOM") == "large":
    B, H, S, DH = 128, 16, 50, 64
else:
    B, H, S, DH = 256, 12, 50, 64
NB = int(os.environ.get("NB", "4" if INTERPRET else "8"))
NB_BWD = int(os.environ.get("NB_BWD", "2" if INTERPRET else "4"))
D = H * DH
D3 = 3 * D
SCALE = DH ** -0.5
RATE = 0.1
f32 = jnp.float32
DTYPE = jnp.float32 if INTERPRET else jnp.bfloat16


def _thresh(rate):
    return np.uint32(min(int(round(rate * 4294967296.0)), 4294967295))


def _attn_chain(seed_ref, bias_ref, qkv_rows, o_rows, p_ref, pd_ref, s_ref,
                rate):
    """Head-batched chain for one nb-row block. qkv_rows [nb*S, 3D] value;
    writes o_rows [nb*S, D] (list assembled by caller), p/pd blocks."""
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    out_rows = []
    for b in range(NB):
        qkv_b = qkv_rows[b * S:(b + 1) * S]                 # [S, 3D]
        bias = bias_ref[b].astype(f32)                      # [1, S]
        for h in range(H):
            q = qkv_b[:, h * DH:(h + 1) * DH]
            k = qkv_b[:, D + h * DH:D + (h + 1) * DH]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = jax.nn.softmax(s_ref[:] * SCALE + bias[None], axis=-1)
        p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= _thresh(rate), p * inv_keep, 0.0)
        pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(qkv_b.dtype)
        outs = []
        for h in range(H):
            v = qkv_b[:, 2 * D + h * DH:2 * D + (h + 1) * DH]
            o = jax.lax.dot_general(pc[h], v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o)
        out_rows.append(jnp.concatenate(outs, axis=-1))     # [S, D] f32
    return jnp.concatenate(out_rows, axis=0)                # [nb*S, D] f32


def make_split_kernel(rate):
    def kernel(seed_ref, bias_ref, qkv_ref, o_ref, p_ref, pd_ref, s_ref):
        ctx = _attn_chain(seed_ref, bias_ref, qkv_ref[:], o_ref, p_ref,
                          pd_ref, s_ref, rate)
        o_ref[:] = ctx.astype(o_ref.dtype)
    return kernel


def make_fused_kernel(rate, out_proj):
    def kernel(seed_ref, bias_ref, x_ref, w_ref, b3_ref, *rest):
        if out_proj:
            wo_ref, bo_ref, o_ref, p_ref, pd_ref, s_ref = rest
        else:
            o_ref, p_ref, pd_ref, s_ref = rest
        qkv = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                     # [nb*S, 3D]
        qkv = (qkv + b3_ref[:].astype(f32)).astype(x_ref.dtype)
        ctx = _attn_chain(seed_ref, bias_ref, qkv, o_ref, p_ref, pd_ref,
                          s_ref, rate)
        if out_proj:
            out = jax.lax.dot_general(
                ctx.astype(x_ref.dtype), wo_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            o_ref[:] = (out + bo_ref[:].astype(f32)).astype(o_ref.dtype)
        else:
            o_ref[:] = ctx.astype(o_ref.dtype)
    return kernel


def _common_specs():
    bias_spec = pl.BlockSpec((NB, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    prob_spec = pl.BlockSpec((NB, H, S, S), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((NB * S, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return seed_spec, bias_spec, prob_spec, rows_spec


@functools.partial(jax.jit, static_argnames=("variant", "rate"))
def run(x, w, b3, wo, bo, bias, seed, variant, rate):
    """x [B*S, D] flat; returns (out [B*S, D], p, pd)."""
    seed_spec, bias_spec, prob_spec, rows_spec = _common_specs()
    prob_shape = jax.ShapeDtypeStruct((B, H, S, S), DTYPE)
    out_shape = (jax.ShapeDtypeStruct((B * S, D), DTYPE),
                 prob_shape, prob_shape)
    scratch = [pltpu.VMEM((H, S, S), f32)]
    cost = pl.CostEstimate(
        flops=4 * B * H * S * S * DH + 8 * B * H * S * S
        + (2 * B * S * D * D3 if variant != "split" else 0)
        + (2 * B * S * D * D if variant == "fused_qkvo" else 0),
        bytes_accessed=DTYPE.dtype.itemsize * B * S * (D3 + D),
        transcendentals=B * H * S * S,
    )
    if variant == "split":
        qkv = (jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
               + b3.astype(f32)).astype(DTYPE)
        qkv_spec = pl.BlockSpec((NB * S, D3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make_split_kernel(rate),
            grid=(B // NB,),
            in_specs=[seed_spec, bias_spec, qkv_spec],
            out_specs=(rows_spec, prob_spec, prob_spec),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=INTERPRET,
            cost_estimate=cost,
        )(seed, bias, qkv)
    w_spec = pl.BlockSpec((D, D3), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b3_spec = pl.BlockSpec((1, D3), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [seed_spec, bias_spec, rows_spec, w_spec, b3_spec]
    args = [seed, bias, x, w, b3]
    if variant == "fused_qkvo":
        wo_spec = pl.BlockSpec((D, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        bo_spec = pl.BlockSpec((1, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [wo_spec, bo_spec]
        args += [wo, bo]
    return pl.pallas_call(
        make_fused_kernel(rate, out_proj=(variant == "fused_qkvo")),
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=(rows_spec, prob_spec, prob_spec),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=INTERPRET,
        cost_estimate=cost,
    )(*args)


# ---------------- fwd+bwd (train-relevant) variants ----------------


def make_fused_emit_kernel(rate):
    """fused_qkv forward that also writes the VMEM-computed qkv to HBM
    (residual for the saved-qkv backward)."""
    def kernel(seed_ref, bias_ref, x_ref, w_ref, b3_ref, o_ref, qkv_out_ref,
               p_ref, pd_ref, s_ref):
        qkv = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        qkv = (qkv + b3_ref[:].astype(f32)).astype(x_ref.dtype)
        qkv_out_ref[:] = qkv
        ctx = _attn_chain(seed_ref, bias_ref, qkv, o_ref, p_ref, pd_ref,
                          s_ref, rate)
        o_ref[:] = ctx.astype(o_ref.dtype)
    return kernel


def _attn_bwd_chain(qkv_rows, g_rows, p_ref, pd_ref, t_ref, nbb):
    """Saved-probs attention backward for one nbb-row block; returns
    dqkv [nbb*S, 3D] in the compute dtype (head-batched ds chain, same
    math as _attn_bwd_packed_saved_kernel)."""
    cdtype = qkv_rows.dtype
    rows = []
    for b in range(nbb):
        qkv_b = qkv_rows[b * S:(b + 1) * S]
        g_b = g_rows[b * S:(b + 1) * S]
        dvs = []
        for h in range(H):
            v = qkv_b[:, 2 * D + h * DH:2 * D + (h + 1) * DH]
            g_h = g_b[:, h * DH:(h + 1) * DH]
            dv = jax.lax.dot_general(pd_ref[b, h], g_h,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv)
            t_ref[h] = jax.lax.dot_general(g_h, v,
                                           (((1,), (1,)), ((), ())),
                                           preferred_element_type=f32)
        p = p_ref[b].astype(f32)
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * SCALE
        ds_c = ds.astype(cdtype)
        dqs, dks = [], []
        for h in range(H):
            q = qkv_b[:, h * DH:(h + 1) * DH]
            k = qkv_b[:, D + h * DH:D + (h + 1) * DH]
            dqs.append(jax.lax.dot_general(ds_c[h], k,
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=f32))
            dks.append(jax.lax.dot_general(ds_c[h], q,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32))
        rows.append(jnp.concatenate(dqs + dks + dvs,
                                    axis=-1).astype(cdtype))
    return jnp.concatenate(rows, axis=0)


def make_split_bwd_kernel():
    def kernel(p_ref, pd_ref, qkv_ref, g_ref, dqkv_ref, t_ref):
        dqkv_ref[:] = _attn_bwd_chain(qkv_ref[:], g_ref[:], p_ref, pd_ref,
                                      t_ref, NB_BWD)
    return kernel


def make_fused_bwd_kernel(recompute):
    def kernel(p_ref, pd_ref, src_ref, w_ref, b3_ref, g_ref,
               dqkv_ref, dx_ref, t_ref):
        if recompute:
            qkv = jax.lax.dot_general(
                src_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            qkv = (qkv + b3_ref[:].astype(f32)).astype(src_ref.dtype)
        else:
            qkv = src_ref[:]
        dqkv = _attn_bwd_chain(qkv, g_ref[:], p_ref, pd_ref, t_ref, NB_BWD)
        dqkv_ref[:] = dqkv
        dx_ref[:] = jax.lax.dot_general(
            dqkv, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(dx_ref.dtype)
    return kernel


def _bwd_specs(nbb):
    rows_d = pl.BlockSpec((nbb * S, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    rows_d3 = pl.BlockSpec((nbb * S, D3), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    prob = pl.BlockSpec((nbb, H, S, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return rows_d, rows_d3, prob


@functools.partial(jax.jit, static_argnames=("rate",))
def _pl_packed_fwd(qkv, bias, seed, rate):
    seed_spec, bias_spec, prob_spec, rows_spec = _common_specs()
    qkv_spec = pl.BlockSpec((NB * S, D3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prob_shape = jax.ShapeDtypeStruct((B, H, S, S), DTYPE)
    return pl.pallas_call(
        make_split_kernel(rate),
        grid=(B // NB,),
        in_specs=[seed_spec, bias_spec, qkv_spec],
        out_specs=(rows_spec, prob_spec, prob_spec),
        out_shape=(jax.ShapeDtypeStruct((B * S, D), DTYPE),
                   prob_shape, prob_shape),
        scratch_shapes=[pltpu.VMEM((H, S, S), f32)],
        interpret=INTERPRET,
    )(seed, bias, qkv)


@functools.partial(jax.jit, static_argnames=("rate", "emit"))
def _pl_fused_fwd(x, w, b3, bias, seed, rate, emit):
    seed_spec, bias_spec, prob_spec, rows_spec = _common_specs()
    w_spec = pl.BlockSpec((D, D3), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b3_spec = pl.BlockSpec((1, D3), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    qkv_rows_spec = pl.BlockSpec((NB * S, D3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    prob_shape = jax.ShapeDtypeStruct((B, H, S, S), DTYPE)
    out_shape = [jax.ShapeDtypeStruct((B * S, D), DTYPE)]
    out_specs = [rows_spec]
    if emit:
        kernel = make_fused_emit_kernel(rate)
        out_shape.append(jax.ShapeDtypeStruct((B * S, D3), DTYPE))
        out_specs.append(qkv_rows_spec)
    else:
        kernel = make_fused_kernel(rate, out_proj=False)
    out_shape += [prob_shape, prob_shape]
    out_specs += [prob_spec, prob_spec]
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[seed_spec, bias_spec, rows_spec, w_spec, b3_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H, S, S), f32)],
        interpret=INTERPRET,
    )(seed, bias, x, w, b3)


@jax.jit
def _pl_split_bwd(p, pd, qkv, g):
    rows_d, rows_d3, prob = _bwd_specs(NB_BWD)
    return pl.pallas_call(
        make_split_bwd_kernel(),
        grid=(B // NB_BWD,),
        in_specs=[prob, prob, rows_d3, rows_d],
        out_specs=rows_d3,
        out_shape=jax.ShapeDtypeStruct((B * S, D3), DTYPE),
        scratch_shapes=[pltpu.VMEM((H, S, S), f32)],
        interpret=INTERPRET,
    )(p, pd, qkv, g)


@functools.partial(jax.jit, static_argnames=("recompute",))
def _pl_fused_bwd(p, pd, src, w, b3, g, recompute):
    rows_d, rows_d3, prob = _bwd_specs(NB_BWD)
    w_spec = pl.BlockSpec((D, D3), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b3_spec = pl.BlockSpec((1, D3), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    src_spec = rows_d if recompute else rows_d3
    return pl.pallas_call(
        make_fused_bwd_kernel(recompute),
        grid=(B // NB_BWD,),
        in_specs=[prob, prob, src_spec, w_spec, b3_spec, rows_d],
        out_specs=(rows_d3, rows_d),
        out_shape=(jax.ShapeDtypeStruct((B * S, D3), DTYPE),
                   jax.ShapeDtypeStruct((B * S, D), DTYPE)),
        scratch_shapes=[pltpu.VMEM((H, S, S), f32)],
        interpret=INTERPRET,
    )(p, pd, src, w, b3, g)


def _xla_dw_db(x, dqkv, wd, b3d):
    dw = jax.lax.dot_general(x, dqkv, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32).astype(wd)
    db3 = jnp.sum(dqkv.astype(f32), axis=0, keepdims=True).astype(b3d)
    return dw, db3


def make_layer(variant, rate, bias, seed):
    """custom-VJP layer fn f(x, w, b3) -> ctx [B*S, D] per variant."""

    @jax.custom_vjp
    def f(x, w, b3):
        return f_fwd(x, w, b3)[0]

    if variant == "split":
        def f_fwd(x, w, b3):
            qkv = (jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                       preferred_element_type=f32)
                   + b3.astype(f32)).astype(DTYPE)
            out, p, pd = _pl_packed_fwd(qkv, bias, seed, rate)
            return out, (x, w, b3, qkv, p, pd)

        def f_bwd(res, g):
            x, w, b3, qkv, p, pd = res
            dqkv = _pl_split_bwd(p, pd, qkv, g.astype(DTYPE))
            dx = jax.lax.dot_general(dqkv, w, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32
                                     ).astype(x.dtype)
            dw, db3 = _xla_dw_db(x, dqkv, w.dtype, b3.dtype)
            return dx, dw, db3
    elif variant == "fused_s":
        def f_fwd(x, w, b3):
            out, qkv, p, pd = _pl_fused_fwd(x, w, b3, bias, seed, rate,
                                            emit=True)
            return out, (x, w, b3, qkv, p, pd)

        def f_bwd(res, g):
            x, w, b3, qkv, p, pd = res
            dqkv, dx = _pl_fused_bwd(p, pd, qkv, w, b3, g.astype(DTYPE),
                                     recompute=False)
            dw, db3 = _xla_dw_db(x, dqkv, w.dtype, b3.dtype)
            return dx, dw, db3
    elif variant == "fused_r":
        def f_fwd(x, w, b3):
            out, p, pd = _pl_fused_fwd(x, w, b3, bias, seed, rate,
                                       emit=False)
            return out, (x, w, b3, p, pd)

        def f_bwd(res, g):
            x, w, b3, p, pd = res
            dqkv, dx = _pl_fused_bwd(p, pd, x, w, b3, g.astype(DTYPE),
                                     recompute=True)
            dw, db3 = _xla_dw_db(x, dqkv, w.dtype, b3.dtype)
            return dx, dw, db3
    else:
        raise ValueError(variant)

    f.defvjp(f_fwd, f_bwd)
    return f


@jax.jit
def ref_qkvo(x, w, b3, wo, bo, bias):
    """XLA reference for the fused_qkvo math, dropout off."""
    qkv = (jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + b3.astype(f32)).astype(DTYPE)
    qkv4 = qkv.reshape(B, S, D3)
    outs = []
    for h in range(H):
        q = qkv4[:, :, h * DH:(h + 1) * DH].astype(f32)
        k = qkv4[:, :, D + h * DH:D + (h + 1) * DH].astype(f32)
        v = qkv4[:, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
        s = jnp.einsum("bqd,bkd->bqk", q, k) * SCALE + bias.astype(f32)
        p = jax.nn.softmax(s, axis=-1).astype(DTYPE)
        outs.append(jnp.einsum("bqk,bkd->bqd", p.astype(f32),
                               v.astype(f32)))
    ctx = jnp.concatenate(outs, axis=-1).astype(DTYPE).reshape(B * S, D)
    out = (jax.lax.dot_general(ctx, wo, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + bo.astype(f32)).astype(DTYPE)
    return ctx, out


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B * S, D) * 0.5, DTYPE)
    w = jnp.asarray(rng.randn(D, D3) / np.sqrt(D), DTYPE)
    b3 = jnp.asarray(rng.randn(1, D3) * 0.01, DTYPE)
    wo = jnp.asarray(rng.randn(D, D) / np.sqrt(D), DTYPE)
    bo = jnp.asarray(rng.randn(1, D) * 0.01, DTYPE)
    bias = jnp.zeros((B, 1, S), f32)
    seed = jnp.zeros((1, 1), jnp.int32)

    # --- parity, dropout off ---
    ctx_ref, out_ref = ref_qkvo(x, w, b3, wo, bo, bias)
    o_split = run(x, w, b3, wo, bo, bias, seed, "split", 0.0)[0]
    o_fq = run(x, w, b3, wo, bo, bias, seed, "fused_qkv", 0.0)[0]
    o_fqo = run(x, w, b3, wo, bo, bias, seed, "fused_qkvo", 0.0)[0]

    def md(a, b):
        return float(jnp.max(jnp.abs(a.astype(f32) - b.astype(f32))))

    print(f"B={B} H={H} S={S} D={D} NB={NB} dtype={DTYPE.__name__} "
          f"interpret={INTERPRET}")
    print(f"parity ctx:  split vs ref   {md(o_split, ctx_ref):.2e}")
    print(f"parity ctx:  fused vs split {md(o_fq, o_split):.2e}")
    print(f"parity qkvo: fused vs ref   {md(o_fqo, out_ref):.2e}")

    # --- grad parity, dropout off ---
    def ref_ctx_loss(x_, w_, b3_):
        qkv = (jax.lax.dot_general(x_, w_, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
               + b3_.astype(f32)).astype(DTYPE)
        qkv4 = qkv.reshape(B, S, D3)
        outs = []
        for h in range(H):
            q = qkv4[:, :, h * DH:(h + 1) * DH].astype(f32)
            k = qkv4[:, :, D + h * DH:D + (h + 1) * DH].astype(f32)
            v = qkv4[:, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
            s = jnp.einsum("bqd,bkd->bqk", q, k) * SCALE
            p = jax.nn.softmax(s + bias.astype(f32), axis=-1)
            outs.append(jnp.einsum("bqk,bkd->bqd",
                                   p.astype(DTYPE).astype(f32),
                                   v.astype(f32)).astype(DTYPE))
        return jnp.sum(jnp.concatenate(outs, axis=-1).astype(f32))

    def rd(a, b):
        a = a.astype(f32)
        b = b.astype(f32)
        return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))

    g_ref = jax.jit(jax.grad(ref_ctx_loss, argnums=(0, 1, 2)))(x, w, b3)
    grads = {}
    for variant in ("split", "fused_s", "fused_r"):
        layer = make_layer(variant, 0.0, bias, seed)
        gv = jax.jit(jax.grad(
            lambda x_, w_, b3_: jnp.sum(layer(x_, w_, b3_).astype(f32)),
            argnums=(0, 1, 2)))(x, w, b3)
        grads[variant] = gv
        print(f"grad parity {variant:8s} vs ref (rel): "
              f"dx {rd(gv[0], g_ref[0]):.2e}  dw {rd(gv[1], g_ref[1]):.2e}"
              f"  db {rd(gv[2], g_ref[2]):.2e}")
    for variant in ("fused_s", "fused_r"):
        print(f"grad parity {variant:8s} vs split (rel): "
              f"dx {rd(grads[variant][0], grads['split'][0]):.2e}  "
              f"dw {rd(grads[variant][1], grads['split'][1]):.2e}")

    if INTERPRET:
        assert md(o_fq, o_split) < 1e-5
        assert md(o_fqo, out_ref) < 1e-3
        for variant in ("split", "fused_s", "fused_r"):
            for i in range(3):
                assert rd(grads[variant][i], g_ref[i]) < 1e-4, (variant, i)
        for variant in ("fused_s", "fused_r"):
            assert rd(grads[variant][0], grads["split"][0]) < 1e-5
            assert rd(grads[variant][1], grads["split"][1]) < 1e-5
        print("INTERPRET PARITY OK")
        return

    LAYERS = 12

    def bench(variant, rate, n=30):
        @jax.jit
        def chain(xx):
            for _ in range(LAYERS):
                out = run(xx, w, b3, wo, bo, bias, seed, variant, rate)
                xx = xx + (jnp.sum(out[0].astype(f32)) * 1e-30).astype(
                    DTYPE)
            return xx

        xx = chain(x)
        float(jnp.sum(xx.astype(f32)))
        t0 = time.perf_counter()
        for _ in range(n):
            xx = chain(xx)
        float(jnp.sum(xx.astype(f32)))
        dt = (time.perf_counter() - t0) / n / LAYERS * 1e3
        print(f"{variant:12s} rate={rate}: {dt:7.3f} ms/call "
              f"(incl. XLA gemm for split; {LAYERS} chained)")
        return dt

    print("--- forward only (save-probs, dropout on) ---")
    for _ in range(2):
        bench("split", RATE)
        bench("fused_qkv", RATE)
        bench("fused_qkvo", RATE)

    print("--- fwd+bwd via value_and_grad (save-probs, dropout on) ---")

    def bench_train(variant, n=20):
        layer = make_layer(variant, RATE, bias, seed)

        def loss_fn(xx, w_, b3_):
            for _ in range(LAYERS):
                xx = layer(xx, w_, b3_)
            return jnp.sum(xx.astype(f32))

        vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))
        xx = x
        loss, g = vg(xx, w, b3)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            xx = xx + (g[0] * 1e-30).astype(DTYPE)
            loss, g = vg(xx, w, b3)
        float(loss)
        dt = (time.perf_counter() - t0) / n / LAYERS * 1e3
        print(f"train {variant:8s}: {dt:7.3f} ms/layer fwd+bwd "
              f"(incl. XLA dW/db gemms; {LAYERS} chained)")
        return dt

    for _ in range(2):
        bench_train("split")
        bench_train("fused_s")
        bench_train("fused_r")


if __name__ == "__main__":
    main()
