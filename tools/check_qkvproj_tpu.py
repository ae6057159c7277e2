"""Hardware validation of fused_attention_qkvproj (QKV projection fused
into the packed attention kernel) on the real TPU.

Checks (both backward variants — recompute-qkv and saved-qkv):
  1. dropout-off forward/grad parity vs the split structure
     (XLA gemm + fused_attention_packed) at bf16
  2. in-kernel dropout: same-seed replay determinism and E[out]
     preservation vs the dropout-off output
  3. recompute-vs-saved backward agreement under dropout (same seed)

Sync methodology: value-fetch (CLAUDE.md — block_until_ready returns
early on the tunneled backend).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_packed, fused_attention_qkvproj)

    assert jax.default_backend() == "tpu", jax.default_backend()
    B, H, S, DH = 256, 12, 50, 64
    D = H * DH
    scale = 1.0 / DH ** 0.5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, D) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.bfloat16)
    b3 = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.bfloat16)
    mask_np = np.ones((B, S), np.int32)
    mask_np[0, 40:] = 0
    mask = jnp.asarray(mask_np)
    f32 = jnp.float32
    ok = True

    def split_out(x, w, b3):
        qkv = (jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                                   preferred_element_type=f32)
               .astype(x.dtype) + b3.astype(x.dtype))
        return fused_attention_packed(qkv, mask, n_heads=H, scale=scale)

    def loss_of(f):
        return jax.jit(jax.value_and_grad(
            lambda *a: jnp.sum(f(*a).astype(f32) ** 2), argnums=(0, 1, 2)))

    ls, gs = loss_of(split_out)(x, w, b3)
    ls = float(ls)
    for qr in (False, True):
        def fused_out(x, w, b3, _qr=qr):
            return fused_attention_qkvproj(x, w, b3, mask, n_heads=H,
                                           scale=scale, qkv_residual=_qr)

        lf, gf = loss_of(fused_out)(x, w, b3)
        rel = abs(float(lf) - ls) / abs(ls)
        print(f"[qr={qr}] dropout-off loss rel diff vs split: {rel:.2e}")
        ok &= rel < 2e-2
        for name, a, b in zip("x w b3".split(), gs, gf):
            rd = float(jnp.max(jnp.abs(a.astype(f32) - b.astype(f32)))
                       / (jnp.max(jnp.abs(a.astype(f32))) + 1e-9))
            print(f"[qr={qr}] d{name} rel diff vs split: {rd:.2e}")
            ok &= rd < 5e-2

    # dropout: replay determinism + E[out] preservation
    key = jax.random.PRNGKey(42)
    drop = jax.jit(lambda x, w, b3: fused_attention_qkvproj(
        x, w, b3, mask, n_heads=H, scale=scale, dropout_rate=0.1,
        dropout_rng=key, deterministic=False))
    o1 = np.asarray(drop(x, w, b3)).astype(np.float32)
    o2 = np.asarray(drop(x, w, b3)).astype(np.float32)
    replay = float(np.max(np.abs(o1 - o2)))
    print(f"same-seed replay max diff: {replay:.2e}")
    ok &= replay == 0.0
    base = np.asarray(jax.jit(
        lambda x, w, b3: fused_attention_qkvproj(
            x, w, b3, mask, n_heads=H, scale=scale))(x, w, b3)
    ).astype(np.float32)
    ratio = float(np.mean(np.abs(o1)) / np.mean(np.abs(base)))
    print(f"E[|out|] dropout/no-dropout ratio: {ratio:.4f}")
    # Dropout preserves E[out], not E[|out|]: keep-and-rescale inflates
    # the variance of each output element by ~(1-keep)/keep relative,
    # so for the near-zero-mean outputs here E[|out|] grows by
    # ~sqrt(1 + 0.1/0.9) ≈ 1.054 at rate 0.1 (measured 1.052; the relik
    # checker's same probe measures 1.045). A missing 1/keep rescale
    # would land at ~0.95, a doubled one at ~1.17 — both outside:
    ok &= 1.0 < ratio < 1.10

    # recompute vs saved backward agreement under dropout (same seed)
    def drop_loss(qr):
        return jax.jit(jax.grad(
            lambda x, w, b3: jnp.sum(fused_attention_qkvproj(
                x, w, b3, mask, n_heads=H, scale=scale, dropout_rate=0.1,
                dropout_rng=key, deterministic=False,
                qkv_residual=qr).astype(f32) ** 2), argnums=(0, 1, 2)))

    gr = drop_loss(False)(x, w, b3)
    gsv = drop_loss(True)(x, w, b3)
    for name, a, b in zip("x w b3".split(), gr, gsv):
        rd = float(jnp.max(jnp.abs(a.astype(f32) - b.astype(f32)))
                   / (jnp.max(jnp.abs(a.astype(f32))) + 1e-9))
        print(f"recompute-vs-saved d{name} rel diff (dropout on): {rd:.2e}")
        ok &= rd < 1e-2

    print("QKVPROJ HW CHECK:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
