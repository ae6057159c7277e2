"""Experiment: attribute the fused-attention BACKWARD kernel's time.

The in-model bwd kernel costs ~1.35 ms/layer vs 0.20 for the forward
(tools/trace_fused_attn.py). Chained standalone timing of the same
pallas_call (minus the ~0.75 ms dispatch floor) reproduces that, so this
tool times surgically modified copies of the bwd kernel to find where
the time goes: softmax recompute, each dot, the elementwise VJP chain.

All variants are intentionally WRONG math (pieces removed) — perf probes
only, never used by the framework.
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

B, H, S, DH = 256, 12, 50, 64
NB = 4
SCALE = 0.125
f32 = jnp.float32


def make_bwd_kernel(variant):
    def kernel(bias_ref, q_ref, k_ref, v_ref, g_ref,
               dq_ref, dk_ref, dv_ref):
        for b in range(NB):
            bias = bias_ref[b].astype(f32)
            for h in range(H):
                q = q_ref[b, h]
                k = k_ref[b, h]
                v = v_ref[b, h]
                g = g_ref[b, h]
                if variant == "no_recompute":
                    # skip QK dot + softmax entirely: p from g (garbage)
                    p = g[:, :S].astype(f32)
                else:
                    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=f32)
                    s = s * SCALE + bias
                    if variant == "no_softmax":
                        p = s                      # skip exp/max/sum chain
                    else:
                        p = jax.nn.softmax(s, axis=-1)
                pd_c = p.astype(q.dtype)
                dv = jax.lax.dot_general(pd_c, g, (((0,), (0,)), ((), ())),
                                         preferred_element_type=f32)
                dv_ref[b, h] = dv.astype(dv_ref.dtype)
                dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                          preferred_element_type=f32)
                if variant == "no_vjp_chain":
                    ds = dpd                       # skip t/rowsum/sub/mul
                else:
                    t = p * dpd
                    ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) \
                        * SCALE
                ds_c = ds.astype(q.dtype)
                if variant == "no_dqdk":
                    filler = ds_c[:, :1] * jnp.ones((1, DH), ds_c.dtype)
                    dq_ref[b, h] = filler
                    dk_ref[b, h] = filler
                else:
                    dq = jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                             preferred_element_type=f32)
                    dq_ref[b, h] = dq.astype(dq_ref.dtype)
                    dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                             preferred_element_type=f32)
                    dk_ref[b, h] = dk.astype(dk_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(q, k, v, g, bias, variant):
    qkv = pl.BlockSpec((NB, H, S, DH), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NB, 1, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_bwd_kernel(variant),
        grid=(B // NB,),
        in_specs=[bias_spec, qkv, qkv, qkv, qkv],
        out_specs=(qkv, qkv, qkv),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype)
                        for _ in range(3)),
    )(bias, q, k, v, g)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S), f32)

    def bench(variant, n=100):
        x = q
        out = run(x, k, v, g, bias, variant)
        float(jnp.sum(out[0].astype(f32)[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(x, k, v, g, bias, variant)
            x = out[0]
        float(jnp.sum(x.astype(f32)[0, 0, 0]))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{variant:14s}: {dt:.3f} ms/call")
        return dt

    full = bench("full")
    for v_ in ["no_softmax", "no_recompute", "no_vjp_chain", "no_dqdk"]:
        d = bench(v_)
        print(f"   -> {v_} saves {full - d:.3f} ms")


if __name__ == "__main__":
    main()
