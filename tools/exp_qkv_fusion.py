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
Numeric parity is asserted dropout-off. Forward only: if this wins, the
backward (dx = dqkv @ W^T, dW accumulated across the grid like the relik
kernel's d_r) follows the same recipe.

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
    if INTERPRET:
        assert md(o_fq, o_split) < 1e-5
        assert md(o_fqo, out_ref) < 1e-3
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

    for _ in range(2):
        bench("split", RATE)
        bench("fused_qkv", RATE)
        bench("fused_qkvo", RATE)


if __name__ == "__main__":
    main()
