"""Validate + time the fused Pallas MAG kernel on the real TPU.

Tests run the kernel in interpret mode on CPU (tests/test_mag_pallas.py);
this tool compiles it for the actual chip at bert-base geometry and checks
numerical parity against the plain-JAX gate, then times both.

Usage: python tools/check_fused_mag_tpu.py [rows]
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

    from bert_multimodal_transformer_tpu.ops.mag import (
        init_mag_params,
        mag_gate,
    )
    from bert_multimodal_transformer_tpu.ops.mag_pallas import mag_gate_fused

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256 * 50
    D, DV, DA = 768, 47, 74
    params = init_mag_params(jax.random.PRNGKey(0), D, DV, DA)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randn(rows, D), jnp.float32)
    visual = jnp.asarray(rng.randn(rows, DV), jnp.float32)
    acoustic = jnp.asarray(rng.randn(rows, DA), jnp.float32)

    plain = jax.jit(lambda p, t, v, a: mag_gate(p, t, v, a, beta_shift=1.0))
    fused = jax.jit(
        lambda p, t, v, a: mag_gate_fused(p, t, v, a, beta_shift=1.0))

    want = np.asarray(jax.device_get(plain(params, text, visual, acoustic)))
    got = np.asarray(jax.device_get(fused(params, text, visual, acoustic)))
    err = np.abs(got - want).max()
    print(f"max abs diff plain-vs-fused on TPU: {err:.3e}")
    assert err < 5e-4, "fused kernel diverges on hardware"

    def timeit(fn, n=20):
        out = fn(params, text, visual, acoustic)
        float(jax.device_get(out[0, 0]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(params, text, visual, acoustic)
        # value-fetch sync (tunnel's block_until_ready returns early)
        float(jax.device_get(out[0, 0]))
        return (time.perf_counter() - t0) / n

    tp = timeit(plain)
    tf = timeit(fused)
    print(f"rows={rows}: plain {tp*1e3:.3f} ms, fused {tf*1e3:.3f} ms, "
          f"speedup {tp/tf:.2f}x")

    # backward: fused Pallas bwd kernel vs plain VJP on hardware
    def loss_plain(p, t, v, a):
        return jnp.sum(mag_gate(p, t, v, a, beta_shift=1.0) ** 2)

    def loss_fused(p, t, v, a):
        return jnp.sum(mag_gate_fused(p, t, v, a, beta_shift=1.0) ** 2)

    gp = jax.jit(jax.grad(loss_plain))
    gf = jax.jit(jax.grad(loss_fused))
    want_g = jax.device_get(gp(params, text, visual, acoustic))
    got_g = jax.device_get(gf(params, text, visual, acoustic))
    gerr = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(jax.tree_util.tree_leaves(got_g),
                               jax.tree_util.tree_leaves(want_g)))
    print(f"max abs grad diff plain-vs-fused-bwd on TPU: {gerr:.3e}")
    assert gerr < 5e-2, "fused backward diverges on hardware"

    def timegrad(fn, n=10):
        out = fn(params, text, visual, acoustic)
        float(jax.device_get(out["b_hv"][0]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(params, text, visual, acoustic)
        float(jax.device_get(out["b_hv"][0]))
        return (time.perf_counter() - t0) / n

    tgp = timegrad(gp)
    tgf = timegrad(gf)
    print(f"grad: plain {tgp*1e3:.3f} ms, fused-bwd {tgf*1e3:.3f} ms, "
          f"speedup {tgp/tgf:.2f}x")


if __name__ == "__main__":
    main()
