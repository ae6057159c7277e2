"""Hardware canary: ingredients flash-streamed rel attention (the
long-S XLNet tier, ops/fused_attention.py `_fused_rel_attention_ik_fs`).

Interpret mode cannot catch the Mosaic lowering/VMEM bug classes this
repo keeps finding (CLAUDE.md), and this tier adds a new corner —
dynamic-start position-window loads/accumulates asserted with
``pl.multiple_of`` — so before any reach claim the kernels must fly
here. Sections:

  1. plan resolution (compile probes) at xlnet-base Q=K=1024/2048;
  2. fwd parity vs the einsum score assembly (bf16);
  3. grads for all six differentiable inputs vs einsum (dropout off) —
     exercises the head-outermost backward grid's d_r revisit chain on
     real silicon;
  4. same-seed dropout replay (two identical calls bit-equal, train
     loss finite);
  5. fwd / fwd+bwd timing vs the production assembly+fs path (the
     numbers motivating the tier: BENCHMARKS.md "Long-sequence
     scaling" attributes ~70% of the Q=K=2048 step to rel_shift
     relayouts).

Run on the TPU: python tools/check_relik_fs_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _inputs(b, q_len, k_len, n_heads, dh, seed=0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    d = n_heads * dh
    p = q_len + k_len
    scale = 1.0 / dh ** 0.5
    rw = jnp.asarray(rng.randn(b, q_len, d) * 0.2, dtype)
    rr = jnp.asarray(rng.randn(b, q_len, d) * 0.2 * scale, dtype)
    r = jnp.asarray(rng.randn(p, d) * 0.2, dtype)
    k = jnp.asarray(rng.randn(b, k_len, d) * 0.2, dtype)
    v = jnp.asarray(rng.randn(b, k_len, d) * 0.2, dtype)
    ed = jnp.asarray(rng.randn(b, n_heads, q_len) * 0.1 * scale, dtype)
    segd = jnp.asarray(rng.randint(0, 2, (b, q_len, k_len)), dtype)
    maskb = np.zeros((b, q_len, k_len), np.float32)
    maskb[:, :, -3:] = -30000.0
    return rw, rr, r, k, v, ed, segd, jnp.asarray(maskb, dtype), scale


def _ref_ebias(rr, r, ed, segd, maskb, n_heads):
    b, q_len, d = rr.shape
    p_len = r.shape[0]
    k_len = segd.shape[2]
    dh = d // n_heads
    bd = jnp.einsum("bqhf,phf->bhqp",
                    rr.reshape(b, q_len, n_heads, dh).astype(jnp.float32),
                    r.reshape(p_len, n_heads, dh).astype(jnp.float32))
    x = bd.reshape(b, n_heads, p_len, q_len)[:, :, 1:, :]
    eb = x.reshape(b, n_heads, q_len, p_len - 1)[..., :k_len]
    return (eb + ed.astype(jnp.float32)[:, :, :, None]
            * segd.astype(jnp.float32)[:, None]
            + maskb.astype(jnp.float32)[:, None])


def _ref_forward(rw, rr, r, k, v, ed, segd, maskb, n_heads, scale):
    b, q_len, d = rw.shape
    k_len = k.shape[1]
    dh = d // n_heads
    eb = _ref_ebias(rr, r, ed, segd, maskb, n_heads)
    score = jnp.einsum(
        "bqhf,bkhf->bhqk", rw.reshape(b, q_len, n_heads, dh),
        k.reshape(b, k_len, n_heads, dh),
        preferred_element_type=jnp.float32) * scale + eb
    p = jax.nn.softmax(score, axis=-1)
    out = jnp.einsum("bhqk,bkhf->bqhf", p.astype(rw.dtype),
                     v.reshape(b, k_len, n_heads, dh),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, q_len, d).astype(rw.dtype)


def main():
    import bert_multimodal_transformer_tpu.ops.fused_attention as fa

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))
    n_heads, dh = 12, 64
    d = n_heads * dh
    ok = True

    # ---- 1: plan resolution (compile probes fwd+bwd) -------------------
    plans = {}
    for s in (1024, 2048):
        t0 = time.perf_counter()
        plan = fa._resolve_relik_fs_plan(
            4, n_heads, s, s, 2 * s, d, 2, rate=0.1,
            scale=1.0 / dh ** 0.5, dtype=jnp.bfloat16)
        plans[s] = plan
        print(f"[1] plan Q=K={s}: {plan} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if plan is None:
            ok = False

    # ---- 2+3: parity and grads (dropout off) ---------------------------
    b, s = 4, 1024
    rw, rr, r, k, v, ed, segd, maskb, scale = _inputs(b, s, s, n_heads,
                                                      dh)

    def f_new(rw_, rr_, r_, k_, v_, ed_):
        return jnp.sum(jnp.tanh(fa.fused_rel_attention_ingredients(
            rw_, rr_, r_, k_, v_, ed_, segd, maskb, n_heads=n_heads,
            scale=scale, tier="fs").astype(jnp.float32)))

    def f_ref(rw_, rr_, r_, k_, v_, ed_):
        return jnp.sum(jnp.tanh(_ref_forward(
            rw_, rr_, r_, k_, v_, ed_, segd, maskb, n_heads,
            scale).astype(jnp.float32)))

    out_new = np.asarray(jax.device_get(
        fa.fused_rel_attention_ingredients(
            rw, rr, r, k, v, ed, segd, maskb, n_heads=n_heads,
            scale=scale, tier="fs")), np.float32)
    out_ref = np.asarray(jax.device_get(_ref_forward(
        rw, rr, r, k, v, ed, segd, maskb, n_heads, scale)), np.float32)
    err = float(np.max(np.abs(out_new - out_ref)))
    print(f"[2] fwd parity Q=K={s} b{b} bf16: max|d| {err:.2e}",
          flush=True)
    if err > 5e-2:
        ok = False

    argnums = (0, 1, 2, 3, 4, 5)
    gn = jax.jit(jax.grad(f_new, argnums=argnums))(rw, rr, r, k, v, ed)
    gr = jax.jit(jax.grad(f_ref, argnums=argnums))(rw, rr, r, k, v, ed)
    for name, a, bb in zip(("rw", "rr", "r", "k", "v", "ed"), gr, gn):
        a = np.asarray(jax.device_get(a), np.float32)
        bb = np.asarray(jax.device_get(bb), np.float32)
        scale_ref = float(np.max(np.abs(a))) + 1e-6
        rel = float(np.max(np.abs(bb - a))) / scale_ref
        print(f"[3] grad d{name}: rel max|d| {rel:.2e} "
              f"(ref scale {scale_ref:.2e})", flush=True)
        if rel > 3e-2:
            ok = False

    # ---- 4: same-seed dropout replay -----------------------------------
    rng_drop = jax.random.PRNGKey(7)

    def loss_drop(rw_):
        return jnp.sum(fa.fused_rel_attention_ingredients(
            rw_, rr, r, k, v, ed, segd, maskb, n_heads=n_heads,
            scale=scale, dropout_rate=0.1, dropout_rng=rng_drop,
            deterministic=False, tier="fs").astype(jnp.float32))

    l1 = float(jax.device_get(jax.jit(loss_drop)(rw)))
    l2 = float(jax.device_get(jax.jit(loss_drop)(rw)))
    gdrop = jax.jit(jax.grad(loss_drop))(rw)
    gfin = bool(np.isfinite(np.asarray(jax.device_get(gdrop),
                                       np.float32)).all())
    print(f"[4] dropout: loss replay {l1:.6f} == {l2:.6f} "
          f"({'bit-equal' if l1 == l2 else 'MISMATCH'}), "
          f"grad finite={gfin}", flush=True)
    if l1 != l2 or not gfin:
        ok = False

    # ---- 5: timing vs production assembly + streamed-fs ----------------
    for (b2, s2) in ((4, 1024), (4, 2048)):
        rw2, rr2, r2, k2, v2, ed2, segd2, maskb2, sc2 = _inputs(
            b2, s2, s2, n_heads, dh, seed=s2)

        def fb_ing(rw_, rr_, r_, k_, v_, ed_):
            def f(*a):
                return jnp.sum(fa.fused_rel_attention_ingredients(
                    *a, segd2, maskb2, n_heads=n_heads, scale=sc2,
                    tier="fs").astype(jnp.float32))
            val, gs = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5))(
                rw_, rr_, r_, k_, v_, ed_)
            return val + sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

        def fb_prod(rw_, rr_, r_, k_, v_, ed_):
            def f(*a):
                rw_i, rr_i, r_i, k_i, v_i, ed_i = a
                eb = _ref_ebias(rr_i, r_i, ed_i, segd2, maskb2,
                                n_heads).astype(rw_i.dtype)
                return jnp.sum(fa.fused_rel_attention(
                    rw_i, k_i, v_i, eb, n_heads=n_heads,
                    scale=sc2).astype(jnp.float32))
            val, gs = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5))(
                rw_, rr_, r_, k_, v_, ed_)
            return val + sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

        for tag, fn in (("ing", fb_ing), ("prod", fb_prod)):
            jf = jax.jit(fn)
            try:
                t0 = time.perf_counter()
                float(jax.device_get(jf(rw2, rr2, r2, k2, v2, ed2)))
                tc = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                print(f"[5] Q=K={s2} {tag}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                ok = False
                continue
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                out = jf(rw2, rr2, r2, k2, v2, ed2)
            float(jax.device_get(out))
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"[5] Q=K={s2} b{b2} fwd+bwd {tag}: {dt:8.2f} ms "
                  f"(compile+first {tc:.1f}s)", flush=True)

    print("RELIK_FS_TPU_CANARY " + ("OK" if ok else "FAILED"),
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
