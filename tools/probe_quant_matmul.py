"""Probe: does this TPU backend lower int8/fp8 dots to a faster MXU path?

Times the flagship serving GEMM shape ([B*S, D] x [D, 4D] at bert-base
b256 s50) in bf16, int8xint8->int32, and fp8(e4m3)xfp8->f32 through the
tunneled backend (value-fetch sync, bench.py methodology). The result
decides whether a quantized serving path is worth building: weight-only
int8 saves HBM but serving at b256 is compute-bound, so the lever is
real only if the int8/fp8 dot itself beats bf16.

Run: python tools/probe_quant_matmul.py  (real TPU, ~2-4 min)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)) * 0)  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)) * 0)
    return (time.perf_counter() - t0) / n


def main():
    m, k, n = 12800, 768, 3072
    flops = 2 * m * k * n
    rng = np.random.default_rng(0)
    x32 = rng.standard_normal((m, k), dtype=np.float32)
    w32 = rng.standard_normal((k, n), dtype=np.float32)

    results = {}

    xb = jnp.asarray(x32, jnp.bfloat16)
    wb = jnp.asarray(w32, jnp.bfloat16)
    f_bf16 = jax.jit(lambda a, b: jnp.dot(a, b))
    dt = _time(f_bf16, (xb, wb))
    results["bf16"] = dt

    xi = jnp.asarray(np.clip(x32 * 10, -127, 127).astype(np.int8))
    wi = jnp.asarray(np.clip(w32 * 10, -127, 127).astype(np.int8))
    f_int8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    try:
        dt = _time(f_int8, (xi, wi))
        results["int8"] = dt
    except Exception as e:  # noqa: BLE001
        results["int8"] = None
        print(f"int8 dot failed: {type(e).__name__}: {e}")

    try:
        xe = jnp.asarray(x32, jnp.float8_e4m3fn)
        we = jnp.asarray(w32, jnp.float8_e4m3fn)
        f_fp8 = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dt = _time(f_fp8, (xe, we))
        results["fp8_e4m3"] = dt
    except Exception as e:  # noqa: BLE001
        results["fp8_e4m3"] = None
        print(f"fp8 dot failed: {type(e).__name__}: {e}")

    base = results["bf16"]
    for name, dt in results.items():
        if dt is None:
            print(f"{name:10s}  unsupported")
        else:
            print(f"{name:10s}  {dt*1e3:8.3f} ms  "
                  f"{flops/dt/1e12:7.1f} TFLOP/s  "
                  f"{base/dt:5.2f}x vs bf16")


if __name__ == "__main__":
    main()
