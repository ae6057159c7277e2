"""Experiment: attribute the packed fused-attention FORWARD kernel time.

In-model the packed fwd kernel costs ~8.25 ms/step (12 layers, b256) vs
~3.3 ms for the old split-layout fwd — the packed variant absorbed the
lane-slice/concat relayouts that used to be HBM transposes. This tool
times surgically modified copies of the fwd kernel to find where the
time goes: 64-offset lane slicing of q/k/v, the prob-residual writes,
dropout PRNG, softmax, the dots, and the output concat.

All variants except "full" are intentionally WRONG math — perf probes
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
D = H * DH
NB = 8
SCALE = 0.125
RATE = 0.1
f32 = jnp.float32


def make_kernel(variant, save):
    thresh = np.uint32(min(int(round(RATE * 4294967296.0)), 4294967295))
    inv_keep = 1.0 / (1.0 - RATE)

    def kernel(seed_ref, bias_ref, qkv_ref, o_ref, *prob_refs):
        for b in range(NB):
            if variant != "no_dropout":
                pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * NB + b)
            bias = bias_ref[b].astype(f32)
            outs = []
            for h in range(H):
                if variant == "no_slice":
                    # always the 128-aligned first slab: measures what the
                    # 64-offset slicing costs
                    q = qkv_ref[b, :, 0:DH]
                    k = qkv_ref[b, :, D:D + DH]
                    v = qkv_ref[b, :, 2 * D:2 * D + DH]
                else:
                    q = qkv_ref[b, :, h * DH:(h + 1) * DH]
                    k = qkv_ref[b, :, D + h * DH:D + (h + 1) * DH]
                    v = qkv_ref[b, :, 2 * D + h * DH:2 * D + (h + 1) * DH]
                if variant == "no_dots":
                    p = (q[:, :S] + k[:, :S]).astype(f32)
                else:
                    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=f32)
                    s = s * SCALE + bias
                    if variant == "no_softmax":
                        p = s
                    else:
                        p = jax.nn.softmax(s, axis=-1)
                if save:
                    prob_refs[0][b, h] = p.astype(prob_refs[0].dtype)
                if variant != "no_dropout":
                    bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                         jnp.uint32)
                    p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
                    if save:
                        prob_refs[1][b, h] = p.astype(prob_refs[1].dtype)
                if variant == "no_dots":
                    o = p[:, :DH] * 1.0
                else:
                    o = jax.lax.dot_general(p.astype(q.dtype), v,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=f32)
                outs.append(o.astype(o_ref.dtype))
            if variant == "no_concat":
                o_ref[b, :, 0:DH] = outs[0]
            else:
                o_ref[b] = jnp.concatenate(outs, axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "save"))
def run(qkv, bias, seed, variant, save):
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
    out_shape = jax.ShapeDtypeStruct((B, S, D), qkv.dtype)
    out_specs = out_spec
    if save:
        prob_shape = jax.ShapeDtypeStruct((B, H, S, S), qkv.dtype)
        out_specs = (out_spec, prob_spec, prob_spec)
        out_shape = (out_shape, prob_shape, prob_shape)
    return pl.pallas_call(
        make_kernel(variant, save),
        grid=(B // NB,),
        in_specs=[seed_spec, bias_spec, qkv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
    )(seed, bias, qkv)


def main():
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, S, 3 * D), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S), jnp.float32)
    seed = jnp.zeros((1, 1), jnp.int32)

    def bench(variant, save, n=30):
        out = run(qkv, bias, seed, variant, save)
        o = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(o.astype(f32)))
        t0 = time.perf_counter()
        x = qkv
        for _ in range(n):
            out = run(x, bias, seed, variant, save)
            o = out[0] if isinstance(out, tuple) else out
            x = x + (jnp.sum(o.astype(f32)) * 1e-30).astype(jnp.bfloat16)
        float(jnp.sum(o.astype(f32)))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{variant:11s} save={int(save)}: {dt:7.3f} ms")
        return dt

    bench("full", True)
    bench("full", False)
    bench("no_slice", True)
    bench("no_dropout", True)
    bench("no_softmax", True)
    bench("no_concat", True)
    bench("no_dots", True)


if __name__ == "__main__":
    main()
