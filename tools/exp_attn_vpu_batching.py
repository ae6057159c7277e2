"""Experiment: batch the fused-attention VPU work across heads.

The packed fwd kernel's per-(row, head) chain (QK dot, scale+bias,
softmax, PRNG draw, select, PV dot) runs 12-16 times sequentially per
batch row on tiny [50, 50] tiles — the device trace shows the kernel is
VPU/issue-bound, not MXU-bound (~0.2 us/head-iter vs ~0.03 us of MXU
work). This probes restructures that keep the dots per-head (their
operands are lane-slices of the packed block) but do the elementwise
chain ONCE per row on an [H, S, S] scratch: fewer, bigger VPU ops.

Variants (save-probs mode, dropout 0.1, matching the in-model config):
  loop         current per-head chain (copy of _attn_fwd_packed_kernel)
  vpu_batched  QK dots -> scratch [H,S,S]; one softmax/PRNG/select; PV loop
  vpu_nodrop   vpu_batched with dropout off (bounds the PRNG share)
  loop_nodrop  loop with dropout off

The dropout STREAM differs between loop and vpu_batched (one [H,S,S]
draw vs H [S,S] draws) — fine for a perf probe; an adoption would change
fwd/bwd/saved kernels together.

Usage: python tools/exp_attn_vpu_batching.py          # bert-base b256
       GEOM=large python tools/exp_attn_vpu_batching.py  # bert-large b128
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("GEOM") == "large":
    B, H, S, DH, NB = 128, 16, 50, 64, 8
else:
    B, H, S, DH, NB = 256, 12, 50, 64, 8
D = H * DH
SCALE = DH ** -0.5
RATE = 0.1
f32 = jnp.float32


def make_loop_kernel(rate):
    thresh = np.uint32(min(int(round(rate * 4294967296.0)), 4294967295))
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0

    def kernel(seed_ref, bias_ref, qkv_ref, o_ref, p_ref, pd_ref):
        for b in range(NB):
            if rate > 0:
                pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bias = bias_ref[b].astype(f32)
            outs = []
            for h in range(H):
                q = qkv_ref[b, :, h * DH:(h + 1) * DH]
                k = qkv_ref[b, :, D + h * DH:D + (h + 1) * DH]
                v = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32)
                s = s * SCALE + bias
                p = jax.nn.softmax(s, axis=-1)
                p_ref[b, h] = p.astype(p_ref.dtype)
                if rate > 0:
                    bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                         jnp.uint32)
                    p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
                pd_ref[b, h] = p.astype(pd_ref.dtype)
                o = jax.lax.dot_general(p.astype(q.dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
                outs.append(o.astype(o_ref.dtype))
            o_ref[b] = jnp.concatenate(outs, axis=-1)

    return kernel


def make_batched_kernel(rate):
    thresh = np.uint32(min(int(round(rate * 4294967296.0)), 4294967295))
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0

    def kernel(seed_ref, bias_ref, qkv_ref, o_ref, p_ref, pd_ref, s_ref):
        for b in range(NB):
            bias = bias_ref[b].astype(f32)  # [1, S]
            for h in range(H):
                q = qkv_ref[b, :, h * DH:(h + 1) * DH]
                k = qkv_ref[b, :, D + h * DH:D + (h + 1) * DH]
                s_ref[h] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            s = s_ref[:] * SCALE + bias[None]          # [H, S, S]
            p = jax.nn.softmax(s, axis=-1)
            p_ref[b] = p.astype(p_ref.dtype)
            if rate > 0:
                pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
                bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                     jnp.uint32)
                p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            pd = p.astype(pd_ref.dtype)
            pd_ref[b] = pd
            outs = []
            for h in range(H):
                v = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
                o = jax.lax.dot_general(pd[h], v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
                outs.append(o.astype(o_ref.dtype))
            o_ref[b] = jnp.concatenate(outs, axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "rate"))
def run(qkv, bias, seed, variant, rate):
    qkv_spec = pl.BlockSpec((NB, S, 3 * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NB, S, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    prob_spec = pl.BlockSpec((NB, H, S, S), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NB, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    prob_shape = jax.ShapeDtypeStruct((B, H, S, S), qkv.dtype)
    out_shape = (jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
                 prob_shape, prob_shape)
    scratch = []
    if variant == "vpu_batched":
        kernel = make_batched_kernel(rate)
        scratch = [pltpu.VMEM((H, S, S), f32)]
    else:
        kernel = make_loop_kernel(rate)
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[seed_spec, bias_spec, qkv_spec],
        out_specs=(out_spec, prob_spec, prob_spec),
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * DH + 8 * B * H * S * S,
            bytes_accessed=qkv.dtype.itemsize * B * S * (3 * D + D),
            transcendentals=B * H * S * S,
        ),
    )(seed, bias, qkv)


def main():
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, S, 3 * D), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S), jnp.float32)
    seed = jnp.zeros((1, 1), jnp.int32)

    LAYERS = 12  # chain N calls per jit to amortize tunnel dispatch

    def bench(variant, rate, n=30):
        @jax.jit
        def chain(x):
            for _ in range(LAYERS):
                out = run(x, bias, seed, variant, rate)
                x = x + (jnp.sum(out[0].astype(f32)) * 1e-30).astype(
                    jnp.bfloat16)
            return x

        x = chain(qkv)
        float(jnp.sum(x.astype(f32)))
        t0 = time.perf_counter()
        for _ in range(n):
            x = chain(x)
        float(jnp.sum(x.astype(f32)))
        dt = (time.perf_counter() - t0) / n / LAYERS * 1e3
        print(f"{variant:12s} rate={rate}: {dt:7.3f} ms/call "
              f"({LAYERS} chained)")
        return dt

    # numeric sanity: dropout-off outputs must agree exactly
    o1 = run(qkv, bias, seed, "loop", 0.0)[0]
    o2 = run(qkv, bias, seed, "vpu_batched", 0.0)[0]
    diff = float(jnp.max(jnp.abs(o1.astype(f32) - o2.astype(f32))))
    print(f"B={B} H={H} S={S} DH={DH} NB={NB}; "
          f"dropout-off max|loop-batched| = {diff:.2e}")

    for _ in range(2):  # twice: rule out one-off tunnel wedges
        bench("loop", RATE)
        bench("vpu_batched", RATE)
        bench("loop", 0.0)
        bench("vpu_batched", 0.0)


if __name__ == "__main__":
    main()
