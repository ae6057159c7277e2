"""A/B the rel_shift formulations on the TPU.

Device-trace attribution at Q=K=2048 (BENCH_TRACE, 2026-08-20) showed
the reshape-chain rel_shift (models/xlnet.py:55-64 — view [B,H,Q,P] as
[B,H,P,Q], drop a row, view back, slice) is lowered by XLA to physical
relayout copies costing ~300 ms of the 471 ms XLNet train step (fwd AND
bwd transpose). The shift is pure indexing with the closed form

    out[b,h,q,k] = x[b,h,q, (P - K) + k - q]

i.e. a per-row shifted window — expressible as one gather
(take_along_axis on the minor axis). This tool times fwd and fwd+bwd of
both forms at several geometries and checks they agree bit-for-bit.

Run on the real TPU: python tools/exp_rel_shift.py
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

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))

    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift

    def rel_shift_gather(x, klen):
        b, h, q, p = x.shape
        idx = ((p - klen) + jnp.arange(klen)[None, :]
               - jnp.arange(q)[:, None])            # [Q, K]
        return jnp.take_along_axis(
            x, idx[None, None].astype(jnp.int32), axis=3,
            mode="promise_in_bounds")

    rng = np.random.RandomState(0)
    for (b, hh, q, klen) in ((4, 12, 2048, 2048), (4, 12, 1024, 1024),
                             (256, 12, 50, 50)):
        p = q + klen
        x = jnp.asarray(rng.randn(b, hh, q, p), jnp.bfloat16)

        a = np.asarray(jax.device_get(rel_shift(x, klen)), np.float32)
        g = np.asarray(jax.device_get(rel_shift_gather(x, klen)),
                       np.float32)
        np.testing.assert_array_equal(a, g)

        def chain(fn, grad=False):
            if grad:
                def loss(x_):
                    return jnp.sum(fn(x_, klen).astype(jnp.float32)
                                   * 1e-6)
                step = jax.jit(jax.grad(loss))

                def run(x_):
                    return step(x_)[..., :1, :1]
            else:
                stepf = jax.jit(lambda x_: fn(x_, klen))

                def run(x_):
                    return stepf(x_)[..., :1, :1]
            out = run(x)
            float(jnp.sum(out.astype(jnp.float32)))  # warm
            n = 10
            t0 = time.perf_counter()
            carry = x
            acc = 0.0
            for _ in range(n):
                o = run(carry)
                acc = float(jnp.sum(o.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / n
            del acc
            return dt * 1e3

        for grad in (False, True):
            t_chain = chain(rel_shift, grad)
            t_gather = chain(rel_shift_gather, grad)
            tag = "fwd+bwd" if grad else "fwd"
            print(f"[{b},{hh},{q},{p}] {tag}: reshape-chain "
                  f"{t_chain:8.2f} ms  gather {t_gather:8.2f} ms  "
                  f"({t_chain / t_gather:4.2f}x)", flush=True)


if __name__ == "__main__" and not os.environ.get("EXP_PADDED"):
    main()


def padded_variant():
    """Variant C: produce bd at width P+1 (pad the positional axis by
    one zero) so the shift-chain's intermediate width is P (128-aligned
    when P is) instead of the odd P-1. Same closed form
    out[i,k] = x[i, q+k-i]."""
    import jax
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift

    def rel_shift_padded(x, klen):
        b, h, q, p = x.shape  # x width P+1 already (padded producer)
        x = x.reshape(b, h, p, q)
        x = x[:, :, 1:, :]
        x = x.reshape(b, h, q, p - 1)
        return x[:, :, :, :klen]

    rng = np.random.RandomState(0)
    for (bb, hh, q, klen) in ((4, 12, 2048, 2048), (4, 12, 1024, 1024)):
        p = q + klen
        x = jnp.asarray(rng.randn(bb, hh, q, p), jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        a = np.asarray(jax.device_get(rel_shift(x, klen)), np.float32)
        c = np.asarray(jax.device_get(rel_shift_padded(xp, klen)),
                       np.float32)
        np.testing.assert_array_equal(a, c)

        import time as _t

        def bench(fn, inp):
            f = jax.jit(lambda t: jnp.sum(
                fn(t, klen).astype(jnp.float32) * 1e-6))
            float(jax.device_get(f(inp)))
            n = 10
            t0 = _t.perf_counter()
            for _ in range(n):
                out = f(inp)
            float(jax.device_get(out))
            return (_t.perf_counter() - t0) / n * 1e3

        t_a = bench(rel_shift, x)
        t_c = bench(rel_shift_padded, xp)
        print(f"[{bb},{hh},{q},{p}] fwd+reduce: chain {t_a:7.2f} ms  "
              f"padded-chain {t_c:7.2f} ms ({t_a / t_c:4.2f}x)",
              flush=True)


if __name__ == "__main__" and os.environ.get("EXP_PADDED"):
    padded_variant()
