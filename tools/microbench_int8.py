"""Feasibility microbench for int8 serving GEMMs on this TPU.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak). If XLA
maps an s8 x s8 -> s32 `lax.dot_general` onto that mode through this
tunnel/runtime, a quantized serving path (weights per-channel int8,
activations dynamically quantized) is worth building; if it lowers to a
widened bf16/int32 emulation, it is not. This prints the measured
ratio for the three serving-relevant shapes (bert-base b256 eval:
QKV/attn-out [12800,768]x[768,2304|768], FFN [12800,768]x[768,3072] and
back) so the decision is data, not doctrine.

Sync methodology: value-fetch chaining (CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        (12800, 768, 2304),   # packed QKV projection
        (12800, 768, 3072),   # FFN up
        (12800, 3072, 768),   # FFN down
    ]
    rng = np.random.RandomState(0)

    def bench(fn, x, w, n=30):
        carry = jnp.zeros((), jnp.float32)

        @jax.jit
        def step(c, x, w):
            out = fn(x, w)
            return c + out.astype(jnp.float32).ravel()[0] * 1e-30

        for _ in range(5):
            carry = step(carry, x, w)
        float(jax.device_get(carry))
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(carry, x, w)
        float(jax.device_get(carry))
        return (time.perf_counter() - t0) / n * 1e3

    for m, k, n in shapes:
        xb = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)

        def dot_bf16(x, w):
            return jax.lax.dot(x, w)

        def dot_i8(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t_b = bench(dot_bf16, xb, wb)
        t_i = bench(dot_i8, xi, wi)
        tflops = 2 * m * k * n / 1e12
        print(f"[{m}x{k}x{n}] bf16 {t_b:.3f} ms ({tflops / t_b * 1e3:.0f} "
              f"TFLOP/s) | int8 {t_i:.3f} ms ({tflops / t_i * 1e3:.0f} "
              f"TOPS) | ratio {t_b / t_i:.2f}x")


if __name__ == "__main__":
    main()
