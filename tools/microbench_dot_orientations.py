"""Microbenchmark: MXU dot orientations inside a Pallas kernel at the
fused-attention geometry ([50,64]/[50,50] operands, bf16 in, f32 out).

Determines whether sublane-contracting dots (A'B, dimension_numbers
contracting (0,0)) pay a relayout penalty vs the canonical A@B — this
decides how the attention backward kernel should be structured.

Each variant runs the same dot DOTS_PER_PROG times per grid program over
the same VMEM blocks, so the measured delta is pure compute/relayout.
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

S, DH = 50, 64
REPS = 48          # dots per grid program (mimics nb*heads unroll)
GRID = 64


def make_kernel(mode):
    f32 = jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        acc = None   # matrix accumulator; one cheap reduce at the end
        for i in range(REPS):
            a = a_ref[i]
            b = b_ref[i]
            if mode == "qk":        # (1,1): contract lanes x lanes
                r = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32)
            elif mode == "pv":      # (1,0): canonical A@B
                r = jax.lax.dot_general(a[:, :S], b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
            elif mode == "t_sub":   # (0,0): contract sublanes (A'B)
                r = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
            else:
                raise ValueError(mode)
            acc = r if acc is None else acc + r
        o_ref[0] = jnp.sum(acc, axis=0, keepdims=True)[:, :1] * jnp.ones(
            (1, 128), f32)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(a, b, mode):
    return pl.pallas_call(
        make_kernel(mode),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((REPS, a.shape[1], a.shape[2]),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((REPS, b.shape[1], b.shape[2]),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, 1, 128), jnp.float32),
    )(a, b)


def main():
    rng = np.random.RandomState(0)

    def bench(mode, a_shape, b_shape, n=30):
        a = jnp.asarray(rng.randn(REPS, *a_shape), jnp.bfloat16)
        b = jnp.asarray(rng.randn(REPS, *b_shape), jnp.bfloat16)
        out = run(a, b, mode)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        x = a
        for _ in range(n):
            out = run(x, b, mode)
            # chain via a cheap dependency
            x = x + (jnp.sum(out) * 1e-30).astype(jnp.bfloat16)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n
        per_dot_us = dt / (GRID * REPS) * 1e6
        print(f"{mode:6s} a{a_shape} b{b_shape}: {dt*1e3:7.3f} ms "
              f"({per_dot_us:.3f} us/dot)")

    # fwd-style: scores = q·k' (contract lanes), pv = p·v (canonical)
    bench("qk", (S, DH), (S, DH))
    bench("pv", (S, S), (S, DH))
    # bwd-style transposed dots: dV = pd'·g, dK = ds'·q (contract sublanes)
    bench("t_sub", (S, S), (S, DH))
    bench("t_sub", (S, DH), (S, DH))


if __name__ == "__main__":
    main()
