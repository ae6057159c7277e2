"""Hardware validation + microbenchmark of the fused attention kernel
(ops/fused_attention.py) on the real TPU.

Checks:
  1. dropout-off forward/grad parity vs the plain einsum path
  2. in-kernel dropout: same-seed replay determinism, drop-fraction ≈
     rate, E[out] preservation, and fwd/bwd PRNG-replay consistency via
     a finite-difference probe through the stochastic graph
  3. microbenchmark fwd+bwd at the bench geometry (b256 h12 s50 dh64)

Sync methodology: value-fetch chaining (CLAUDE.md — block_until_ready
returns early on the tunneled backend).
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

    from bert_multimodal_transformer_tpu.ops.attention import (
        dot_product_attention, extended_attention_mask)
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention)

    B, H, S, DH = 256, 12, 50, 64
    scale = 1.0 / DH ** 0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    mask_np = np.ones((B, S), np.int32)
    mask_np[:, 45:] = 0
    mask = jnp.asarray(mask_np)
    bias = extended_attention_mask(mask)

    # ---- 1. dropout-off parity --------------------------------------
    ref = dot_product_attention(q, k, v, bias, scale=scale)
    out = fused_attention(q, k, v, mask, scale=scale)
    d = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                              - out.astype(jnp.float32))))
    print(f"fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(
            dot_product_attention(q, k, v, bias, scale=scale)
            .astype(jnp.float32)))

    def loss_new(q, k, v):
        return jnp.sum(jnp.square(
            fused_attention(q, k, v, mask, scale=scale)
            .astype(jnp.float32)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gr, gn):
        rel = (float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))
               / max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))), 1e-9))
        print(f"grad d{name} parity: max rel diff = {rel:.3e}")
        assert rel < 5e-2, (name, rel)

    # ---- 2. in-kernel dropout ----------------------------------------
    rate = 0.5
    key = jax.random.PRNGKey(7)
    o1 = fused_attention(q, k, v, None, scale=scale, dropout_rate=rate,
                         dropout_rng=key, deterministic=False)
    o2 = fused_attention(q, k, v, None, scale=scale, dropout_rate=rate,
                         dropout_rng=key, deterministic=False)
    same = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                 - o2.astype(jnp.float32))))
    print(f"same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same
    o3 = fused_attention(q, k, v, None, scale=scale, dropout_rate=rate,
                         dropout_rng=jax.random.PRNGKey(8),
                         deterministic=False)
    assert float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                 - o3.astype(jnp.float32)))) > 0.0

    # drop fraction: measure via a probe where probs@V reduces to the
    # kept-mask row-sums — with V = identity-ish ones and uniform probs,
    # E[out] = E[sum_k keep_k * p_k / keep] = 1. Use mean preservation.
    ones_v = jnp.ones_like(v)
    base = fused_attention(q, k * 0, ones_v, None, scale=scale)
    drop = fused_attention(q, k * 0, ones_v, None, scale=scale,
                           dropout_rate=rate, dropout_rng=key,
                           deterministic=False)
    mean_base = float(jnp.mean(base.astype(jnp.float32)))
    mean_drop = float(jnp.mean(drop.astype(jnp.float32)))
    print(f"E[out] preservation under dropout: base={mean_base:.4f} "
          f"drop={mean_drop:.4f}")
    assert abs(mean_drop - mean_base) < 0.02 * abs(mean_base)
    # with uniform probs (k=0), each output elem = (1/keep)·(kept/S);
    # variance across elems reveals the actual drop fraction:
    kept_frac = jnp.mean(
        (jnp.abs(drop.astype(jnp.float32)) > 1e-6).astype(jnp.float32))
    # every row keeps ~S/2 of S entries → outputs are almost never 0
    print(f"nonzero output fraction: {float(kept_frac):.4f}")

    # fwd/bwd replay consistency: grad of sum(out * c) wrt v must equal
    # (dropped probs)^T c — verify with a directional finite difference
    # in v (linear in v, so FD is exact up to bf16 rounding).
    c = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)

    def g(vv):
        return jnp.sum(fused_attention(
            q, k, vv, None, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False).astype(jnp.float32) *
            c.astype(jnp.float32))

    dv = jax.grad(g)(v)
    dirn = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    eps = 0.5
    fd = (g(v + eps * dirn) - g(v - eps * dirn)) / (2 * eps)
    an = float(jnp.sum(dv.astype(jnp.float32) * dirn.astype(jnp.float32)))
    rel = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"bwd PRNG replay: directional FD vs grad rel diff = {rel:.3e}")
    assert rel < 5e-2, rel

    # ---- 2b. save-probs backward vs recompute backward ---------------
    def g_mode(vv, save):
        return jnp.sum(fused_attention(
            q, k, vv, None, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False,
            save_probs=save).astype(jnp.float32) * c.astype(jnp.float32))

    dv_save = jax.grad(lambda vv: g_mode(vv, True))(v)
    dv_rec = jax.grad(lambda vv: g_mode(vv, False))(v)
    rel = (float(jnp.max(jnp.abs(dv_save.astype(jnp.float32)
                                 - dv_rec.astype(jnp.float32))))
           / max(float(jnp.max(jnp.abs(dv_rec.astype(jnp.float32)))), 1e-9))
    print(f"save-mode vs recompute-mode dV (dropout on): rel {rel:.3e}")
    assert rel < 5e-2, rel

    # ---- 2c. packed-layout variant ------------------------------------
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_packed)
    qkv = jnp.stack([jnp.moveaxis(t, 1, 2) for t in (q, k, v)],
                    axis=2).reshape(B, S, 3 * H * DH)
    out_p = fused_attention_packed(qkv, mask, n_heads=H, scale=scale)
    ref_flat = jnp.moveaxis(ref, 1, 2).reshape(B, S, H * DH)
    d = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                              - ref_flat.astype(jnp.float32))))
    print(f"packed fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    for save in (False, True):
        def loss_packed(qkv_):
            return jnp.sum(jnp.square(fused_attention_packed(
                qkv_, mask, n_heads=H, scale=scale, save_probs=save)
                .astype(jnp.float32)))

        gp = jax.grad(loss_packed)(qkv)
        # reference grad via the split einsum path, repacked
        gr_packed = jnp.stack(
            [jnp.moveaxis(t, 1, 2) for t in gr], axis=2).reshape(
                B, S, 3 * H * DH)
        rel = (float(jnp.max(jnp.abs(gp.astype(jnp.float32)
                                     - gr_packed.astype(jnp.float32))))
               / max(float(jnp.max(jnp.abs(
                   gr_packed.astype(jnp.float32)))), 1e-9))
        print(f"packed grad parity (save={save}): max rel = {rel:.3e}")
        assert rel < 5e-2, (save, rel)

    o1p = fused_attention_packed(qkv, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    o2p = fused_attention_packed(qkv, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    same = float(jnp.max(jnp.abs(o1p.astype(jnp.float32)
                                 - o2p.astype(jnp.float32))))
    print(f"packed same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same
    # packed fwd/bwd PRNG replay through the stochastic graph (recompute)
    cp = jnp.stack([jnp.moveaxis(t, 1, 2) for t in (c, c, c)],
                   axis=2).reshape(B, S, 3 * H * DH)

    def gpk(qkv_):
        return jnp.sum(fused_attention_packed(
            qkv_, None, n_heads=H, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False,
            save_probs=False).astype(jnp.float32)
            * cp[:, :, :H * DH].astype(jnp.float32))

    dqkv = jax.grad(gpk)(qkv)
    # perturb only the v-columns: out is linear in v, so central FD is
    # exact up to bf16 rounding (q/k would make the probe nonlinear)
    dirn_np = np.zeros(qkv.shape, np.float32)
    dirn_np[:, :, 2 * H * DH:] = rng.randn(B, S, H * DH)
    dirn = jnp.asarray(dirn_np, jnp.bfloat16)
    eps = 0.5
    fd = (gpk(qkv + eps * dirn) - gpk(qkv - eps * dirn)) / (2 * eps)
    an = float(jnp.sum(dqkv.astype(jnp.float32)
                       * dirn.astype(jnp.float32)))
    rel = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"packed bwd PRNG replay: FD vs grad rel diff = {rel:.3e}")
    assert rel < 5e-2, rel

    # ---- 2d. rel-bias (XLNet) variant --------------------------------
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_rel_attention)
    D = H * DH
    qp = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    kp = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    vp = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    eb = jnp.asarray(rng.randn(B, H, S, S) * 0.3, jnp.float32)

    def rel_ref(q_, k_, v_, eb_):
        qh = q_.reshape(B, S, H, DH)
        kh = k_.reshape(B, S, H, DH)
        vh = v_.reshape(B, S, H, DH)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        score = score * scale + eb_
        probs = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs.astype(q_.dtype), vh)
        return ctx.reshape(B, S, D)

    out_rel = fused_rel_attention(qp, kp, vp, eb, n_heads=H, scale=scale)
    ref_rel = rel_ref(qp, kp, vp, eb)
    dr = float(jnp.max(jnp.abs(out_rel.astype(jnp.float32)
                               - ref_rel.astype(jnp.float32))))
    print(f"rel fwd parity (bf16, no dropout): max|diff| = {dr:.3e}")
    assert dr < 2e-2, dr

    for save in (False, True):
        def loss_rel_ref(q_, k_, v_, eb_):
            return jnp.sum(jnp.square(rel_ref(q_, k_, v_, eb_)
                                      .astype(jnp.float32)))

        def loss_rel_new(q_, k_, v_, eb_):
            return jnp.sum(jnp.square(fused_rel_attention(
                q_, k_, v_, eb_, n_heads=H, scale=scale,
                save_probs=save).astype(jnp.float32)))

        grr = jax.grad(loss_rel_ref, argnums=(0, 1, 2, 3))(qp, kp, vp, eb)
        grn = jax.grad(loss_rel_new, argnums=(0, 1, 2, 3))(qp, kp, vp, eb)
        for name, a_, b_ in zip(["q", "k", "v", "ebias"], grr, grn):
            rel_d = (float(jnp.max(jnp.abs(a_.astype(jnp.float32)
                                           - b_.astype(jnp.float32))))
                     / max(float(jnp.max(jnp.abs(
                         a_.astype(jnp.float32)))), 1e-9))
            print(f"rel grad d{name} (save={save}): max rel = {rel_d:.3e}")
            assert rel_d < 5e-2, (name, save, rel_d)

    o1r = fused_rel_attention(qp, kp, vp, eb, n_heads=H, scale=scale,
                              dropout_rate=rate, dropout_rng=key,
                              deterministic=False)
    o2r = fused_rel_attention(qp, kp, vp, eb, n_heads=H, scale=scale,
                              dropout_rate=rate, dropout_rng=key,
                              deterministic=False)
    same = float(jnp.max(jnp.abs(o1r.astype(jnp.float32)
                                 - o2r.astype(jnp.float32))))
    print(f"rel same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same

    # rel fwd/bwd PRNG replay: perturb only v (linear) — FD exact
    cr = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)

    def grel(vv):
        return jnp.sum(fused_rel_attention(
            qp, kp, vv, eb, n_heads=H, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False,
            save_probs=False).astype(jnp.float32)
            * cr.astype(jnp.float32))

    dvr = jax.grad(grel)(vp)
    dirn_r = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    fd = (grel(vp + 0.5 * dirn_r) - grel(vp - 0.5 * dirn_r)) / 1.0
    an = float(jnp.sum(dvr.astype(jnp.float32)
                       * dirn_r.astype(jnp.float32)))
    rel_d = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"rel bwd PRNG replay: FD vs grad rel diff = {rel_d:.3e}")
    assert rel_d < 5e-2, rel_d

    # ---- 2e. head-blocked long-seq variant (S=512) --------------------
    # Beyond the full-H scoped-VMEM fit the packed entry reroutes onto
    # the head-blocked grid (ops/fused_attention.py::_resolve_hb) — the
    # S=512 geometry that failed to compile pre-guard (BENCHMARKS.md
    # "Long-sequence scaling"). Validate parity + dropout replay on the
    # real lowering (interpret mode cannot catch Mosaic block-rule bugs).
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_hb, fused_attention_fits)
    BL, SL = 8, 512
    assert not fused_attention_fits(H, SL, H * DH, 2)
    hb = _resolve_hb(H, SL, H * DH, 2)
    print(f"head-blocked S={SL}: hb = {hb}")
    ql = jnp.asarray(rng.randn(BL, H, SL, DH), jnp.bfloat16)
    kl = jnp.asarray(rng.randn(BL, H, SL, DH), jnp.bfloat16)
    vl = jnp.asarray(rng.randn(BL, H, SL, DH), jnp.bfloat16)
    mask_l = np.ones((BL, SL), np.int32)
    mask_l[:, 500:] = 0
    mask_l = jnp.asarray(mask_l)
    qkv_l = jnp.stack([jnp.moveaxis(t, 1, 2) for t in (ql, kl, vl)],
                      axis=2).reshape(BL, SL, 3 * H * DH)
    ref_l = dot_product_attention(ql, kl, vl,
                                  extended_attention_mask(mask_l),
                                  scale=scale)
    ref_l_flat = jnp.moveaxis(ref_l, 1, 2).reshape(BL, SL, H * DH)
    out_l = fused_attention_packed(qkv_l, mask_l, n_heads=H, scale=scale)
    d = float(jnp.max(jnp.abs(out_l.astype(jnp.float32)
                              - ref_l_flat.astype(jnp.float32))))
    print(f"hb fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    def loss_hb_ref(qkv_):
        qq, kk, vv = [jnp.moveaxis(
            qkv_.reshape(BL, SL, 3, H, DH)[:, :, i], 2, 1)
            for i in range(3)]
        return jnp.sum(jnp.square(dot_product_attention(
            qq, kk, vv, extended_attention_mask(mask_l), scale=scale)
            .astype(jnp.float32)))

    def loss_hb_new(qkv_):
        return jnp.sum(jnp.square(fused_attention_packed(
            qkv_, mask_l, n_heads=H, scale=scale).astype(jnp.float32)))

    gr_l = jax.grad(loss_hb_ref)(qkv_l)
    gn_l = jax.grad(loss_hb_new)(qkv_l)
    rel = (float(jnp.max(jnp.abs(gn_l.astype(jnp.float32)
                                 - gr_l.astype(jnp.float32))))
           / max(float(jnp.max(jnp.abs(gr_l.astype(jnp.float32)))), 1e-9))
    print(f"hb grad parity: max rel = {rel:.3e}")
    assert rel < 5e-2, rel

    o1l = fused_attention_packed(qkv_l, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    o2l = fused_attention_packed(qkv_l, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    same = float(jnp.max(jnp.abs(o1l.astype(jnp.float32)
                                 - o2l.astype(jnp.float32))))
    print(f"hb same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same

    def ghb(qkv_):
        return jnp.sum(fused_attention_packed(
            qkv_, None, n_heads=H, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False).astype(jnp.float32))

    dqkv_l = jax.grad(ghb)(qkv_l)
    dirn_np = np.zeros(qkv_l.shape, np.float32)
    dirn_np[:, :, 2 * H * DH:] = rng.randn(BL, SL, H * DH)
    dirn_l = jnp.asarray(dirn_np, jnp.bfloat16)
    fd = (ghb(qkv_l + 0.5 * dirn_l) - ghb(qkv_l - 0.5 * dirn_l)) / 1.0
    an = float(jnp.sum(dqkv_l.astype(jnp.float32)
                       * dirn_l.astype(jnp.float32)))
    rel = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"hb bwd PRNG replay: FD vs grad rel diff = {rel:.3e}")
    assert rel < 5e-2, rel

    # ---- 2f. head-blocked rel-bias variant (XLNet, S=512) --------------
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_rel_hb, fused_rel_attention_fits)
    D = H * DH
    assert not fused_rel_attention_fits(H, SL, SL, D, 2, 2)
    hb_r = _resolve_rel_hb(H, SL, SL, D, 2, 2)
    print(f"rel head-blocked Q=K={SL}: hb = {hb_r}")
    qr = jnp.asarray(rng.randn(BL, SL, D), jnp.bfloat16)
    kr = jnp.asarray(rng.randn(BL, SL, D), jnp.bfloat16)
    vr = jnp.asarray(rng.randn(BL, SL, D), jnp.bfloat16)
    ebr = jnp.asarray(rng.randn(BL, H, SL, SL) * 0.3, jnp.bfloat16)

    def rel_ref_l(q_, k_, v_, eb_):
        qh = q_.reshape(BL, SL, H, DH)
        kh = k_.reshape(BL, SL, H, DH)
        vh = v_.reshape(BL, SL, H, DH)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(score * scale + eb_.astype(jnp.float32),
                               axis=-1)
        return jnp.einsum("bhqk,bkhf->bqhf", probs.astype(q_.dtype),
                          vh).reshape(BL, SL, D)

    out_rhb = fused_rel_attention(qr, kr, vr, ebr, n_heads=H, scale=scale)
    ref_rhb = rel_ref_l(qr, kr, vr, ebr)
    d = float(jnp.max(jnp.abs(out_rhb.astype(jnp.float32)
                              - ref_rhb.astype(jnp.float32))))
    print(f"rel hb fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    def loss_rhb_ref(q_, k_, v_, eb_):
        return jnp.sum(jnp.square(rel_ref_l(q_, k_, v_, eb_)
                                  .astype(jnp.float32)))

    def loss_rhb_new(q_, k_, v_, eb_):
        return jnp.sum(jnp.square(fused_rel_attention(
            q_, k_, v_, eb_, n_heads=H, scale=scale)
            .astype(jnp.float32)))

    grr = jax.grad(loss_rhb_ref, argnums=(0, 1, 2, 3))(qr, kr, vr, ebr)
    grn = jax.grad(loss_rhb_new, argnums=(0, 1, 2, 3))(qr, kr, vr, ebr)
    for name, a_, b_ in zip(["q", "k", "v", "ebias"], grr, grn):
        rel_d = (float(jnp.max(jnp.abs(a_.astype(jnp.float32)
                                       - b_.astype(jnp.float32))))
                 / max(float(jnp.max(jnp.abs(
                     a_.astype(jnp.float32)))), 1e-9))
        print(f"rel hb grad d{name}: max rel = {rel_d:.3e}")
        assert rel_d < 5e-2, (name, rel_d)

    o1rh = fused_rel_attention(qr, kr, vr, ebr, n_heads=H, scale=scale,
                               dropout_rate=rate, dropout_rng=key,
                               deterministic=False)
    o2rh = fused_rel_attention(qr, kr, vr, ebr, n_heads=H, scale=scale,
                               dropout_rate=rate, dropout_rng=key,
                               deterministic=False)
    same = float(jnp.max(jnp.abs(o1rh.astype(jnp.float32)
                                 - o2rh.astype(jnp.float32))))
    print(f"rel hb same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same

    def grelhb(vv):
        return jnp.sum(fused_rel_attention(
            qr, kr, vv, ebr, n_heads=H, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False).astype(jnp.float32))

    dvrh = jax.grad(grelhb)(vr)
    dirn_rh = jnp.asarray(rng.randn(BL, SL, D), jnp.bfloat16)
    fd = (grelhb(vr + 0.5 * dirn_rh) - grelhb(vr - 0.5 * dirn_rh)) / 1.0
    an = float(jnp.sum(dvrh.astype(jnp.float32)
                       * dirn_rh.astype(jnp.float32)))
    rel_d = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"rel hb bwd PRNG replay: FD vs grad rel diff = {rel_d:.3e}")
    assert rel_d < 5e-2, rel_d

    # ---- 2g. flash-streamed long-seq variant (S=768) -------------------
    # Beyond the head-blocked reach (bwd S=768 allocates 16.10 MB scoped,
    # BENCHMARKS.md) the packed entry reroutes onto the flash-streamed
    # kernels (online softmax over kb blocks, dropout replay per
    # (row, head-block, q-block, k-block)). Validate the real lowering.
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_fs_plan, _resolve_hb_plan)
    BF, SF = 4, 768
    hb_plan = _resolve_hb_plan(BF, H, SF, H * DH, 2, rate=rate,
                               scale=scale)
    fs_plan = _resolve_fs_plan(BF, H, SF, H * DH, 2, rate=rate,
                               scale=scale)
    print(f"flash-streamed S={SF}: hb plan = {hb_plan}, "
          f"fs plan = {fs_plan}")
    assert fs_plan is not None
    qf = jnp.asarray(rng.randn(BF, H, SF, DH), jnp.bfloat16)
    kf = jnp.asarray(rng.randn(BF, H, SF, DH), jnp.bfloat16)
    vf = jnp.asarray(rng.randn(BF, H, SF, DH), jnp.bfloat16)
    mask_f = np.ones((BF, SF), np.int32)
    mask_f[:, 700:] = 0
    mask_f = jnp.asarray(mask_f)
    qkv_f = jnp.stack([jnp.moveaxis(t, 1, 2) for t in (qf, kf, vf)],
                      axis=2).reshape(BF, SF, 3 * H * DH)
    ref_f = dot_product_attention(qf, kf, vf,
                                  extended_attention_mask(mask_f),
                                  scale=scale)
    ref_f_flat = jnp.moveaxis(ref_f, 1, 2).reshape(BF, SF, H * DH)
    out_f = fused_attention_packed(qkv_f, mask_f, n_heads=H, scale=scale)
    d = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                              - ref_f_flat.astype(jnp.float32))))
    print(f"fs fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    def loss_fs_ref(qkv_):
        qq, kk, vv = [jnp.moveaxis(
            qkv_.reshape(BF, SF, 3, H, DH)[:, :, i], 2, 1)
            for i in range(3)]
        return jnp.sum(jnp.square(dot_product_attention(
            qq, kk, vv, extended_attention_mask(mask_f), scale=scale)
            .astype(jnp.float32)))

    def loss_fs_new(qkv_):
        return jnp.sum(jnp.square(fused_attention_packed(
            qkv_, mask_f, n_heads=H, scale=scale).astype(jnp.float32)))

    gr_f = jax.grad(loss_fs_ref)(qkv_f)
    gn_f = jax.grad(loss_fs_new)(qkv_f)
    rel = (float(jnp.max(jnp.abs(gn_f.astype(jnp.float32)
                                 - gr_f.astype(jnp.float32))))
           / max(float(jnp.max(jnp.abs(gr_f.astype(jnp.float32)))), 1e-9))
    print(f"fs grad parity: max rel = {rel:.3e}")
    assert rel < 5e-2, rel

    o1f = fused_attention_packed(qkv_f, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    o2f = fused_attention_packed(qkv_f, None, n_heads=H, scale=scale,
                                 dropout_rate=rate, dropout_rng=key,
                                 deterministic=False)
    same = float(jnp.max(jnp.abs(o1f.astype(jnp.float32)
                                 - o2f.astype(jnp.float32))))
    print(f"fs same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same

    def gfs(qkv_):
        return jnp.sum(fused_attention_packed(
            qkv_, None, n_heads=H, scale=scale, dropout_rate=rate,
            dropout_rng=key, deterministic=False).astype(jnp.float32))

    dqkv_f = jax.grad(gfs)(qkv_f)
    dirn_np = np.zeros(qkv_f.shape, np.float32)
    dirn_np[:, :, 2 * H * DH:] = rng.randn(BF, SF, H * DH)
    dirn_f = jnp.asarray(dirn_np, jnp.bfloat16)
    fd = (gfs(qkv_f + 0.5 * dirn_f) - gfs(qkv_f - 0.5 * dirn_f)) / 1.0
    an = float(jnp.sum(dqkv_f.astype(jnp.float32)
                       * dirn_f.astype(jnp.float32)))
    rel = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"fs bwd PRNG replay: FD vs grad rel diff = {rel:.3e}")
    assert rel < 5e-2, rel

    # ---- 2h. rel flash-streamed variant (XLNet, Q=K=1024) --------------
    # Past the rel head-blocked reach the XLNet dispatch flash-streams
    # kb-column key blocks with per-block ebias slices.
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_rel_fs_plan, _resolve_rel_hb_plan)
    BR2, SR2 = 2, 1024
    rhb = _resolve_rel_hb_plan(BR2, H, SR2, SR2, H * DH, 2, 2,
                               rate=rate, scale=scale)
    rfs = _resolve_rel_fs_plan(BR2, H, SR2, SR2, H * DH, 2,
                               rate=rate, scale=scale)
    print(f"rel flash-streamed Q=K={SR2}: hb plan = {rhb}, "
          f"fs plan = {rfs}")
    assert rfs is not None
    qr2 = jnp.asarray(rng.randn(BR2, SR2, D), jnp.bfloat16)
    kr2 = jnp.asarray(rng.randn(BR2, SR2, D), jnp.bfloat16)
    vr2 = jnp.asarray(rng.randn(BR2, SR2, D), jnp.bfloat16)
    ebr2 = jnp.asarray(rng.randn(BR2, H, SR2, SR2) * 0.5, jnp.bfloat16)

    def rel_ref_fs(q_, k_, v_, eb_):
        qh = q_.reshape(BR2, SR2, H, DH)
        kh = k_.reshape(BR2, SR2, H, DH)
        vh = v_.reshape(BR2, SR2, H, DH)
        s = (jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
             + eb_.astype(jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhf->bqhf", p.astype(q_.dtype),
                          vh).reshape(BR2, SR2, D)

    out_r2 = fused_rel_attention(qr2, kr2, vr2, ebr2, n_heads=H,
                                 scale=scale)
    ref_r2 = rel_ref_fs(qr2, kr2, vr2, ebr2)
    d = float(jnp.max(jnp.abs(out_r2.astype(jnp.float32)
                              - ref_r2.astype(jnp.float32))))
    print(f"rel fs fwd parity (bf16, no dropout): max|diff| = {d:.3e}")
    assert d < 2e-2, d

    def loss_rfs_ref(q_, k_, v_, eb_):
        return jnp.sum(jnp.square(
            rel_ref_fs(q_, k_, v_, eb_).astype(jnp.float32)))

    def loss_rfs_new(q_, k_, v_, eb_):
        return jnp.sum(jnp.square(fused_rel_attention(
            q_, k_, v_, eb_, n_heads=H, scale=scale)
            .astype(jnp.float32)))

    gr = jax.grad(loss_rfs_ref, argnums=(0, 1, 2, 3))(qr2, kr2, vr2,
                                                      ebr2)
    gn = jax.grad(loss_rfs_new, argnums=(0, 1, 2, 3))(qr2, kr2, vr2,
                                                      ebr2)
    for name, a, b in zip("qkve", gr, gn):
        rel_d = (float(jnp.max(jnp.abs(b.astype(jnp.float32)
                                       - a.astype(jnp.float32))))
                 / max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))),
                       1e-9))
        print(f"rel fs grad d{name}: max rel = {rel_d:.3e}")
        assert rel_d < 5e-2, (name, rel_d)

    o1r2 = fused_rel_attention(qr2, kr2, vr2, ebr2, n_heads=H,
                               scale=scale, dropout_rate=rate,
                               dropout_rng=key, deterministic=False)
    o2r2 = fused_rel_attention(qr2, kr2, vr2, ebr2, n_heads=H,
                               scale=scale, dropout_rate=rate,
                               dropout_rng=key, deterministic=False)
    same = float(jnp.max(jnp.abs(o1r2.astype(jnp.float32)
                                 - o2r2.astype(jnp.float32))))
    print(f"rel fs same-seed replay: max|diff| = {same:.3e}")
    assert same == 0.0, same

    def grelfs(vv):
        return jnp.sum(fused_rel_attention(
            qr2, kr2, vv, ebr2, n_heads=H, scale=scale,
            dropout_rate=rate, dropout_rng=key,
            deterministic=False).astype(jnp.float32))

    dvr2 = jax.grad(grelfs)(vr2)
    dirn_r2 = jnp.asarray(rng.randn(BR2, SR2, D), jnp.bfloat16)
    fd = (grelfs(vr2 + 0.5 * dirn_r2) - grelfs(vr2 - 0.5 * dirn_r2)) / 1.0
    an = float(jnp.sum(dvr2.astype(jnp.float32)
                       * dirn_r2.astype(jnp.float32)))
    rel_d = abs(float(fd) - an) / max(abs(an), 1e-9)
    print(f"rel fs bwd PRNG replay: FD vs grad rel diff = {rel_d:.3e}")
    assert rel_d < 5e-2, rel_d

    # ---- 3. microbenchmark -------------------------------------------
    def bench(fn, label, n=50):
        carry = jnp.zeros((), jnp.float32)

        @jax.jit
        def step(c, q, k, v):
            return fn(q + c * 1e-30, k, v)

        for _ in range(5):
            carry = step(carry, q, k, v)
        float(jax.device_get(carry))
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(carry, q, k, v)
        float(jax.device_get(carry))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label}: {dt:.3f} ms")
        return dt

    key2 = jax.random.PRNGKey(5)

    def fwdbwd_ein(q, k, v):
        def f(q, k, v):
            return jnp.sum(jnp.square(dot_product_attention(
                q, k, v, bias, scale=scale, dropout_rate=0.1,
                dropout_rng=key2, deterministic=False)
                .astype(jnp.float32)))
        l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return l + sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                       for g in grads)

    def fwdbwd_fused(q, k, v):
        def f(q, k, v):
            return jnp.sum(jnp.square(fused_attention(
                q, k, v, mask, scale=scale, dropout_rate=0.1,
                dropout_rng=key2, deterministic=False)
                .astype(jnp.float32)))
        l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return l + sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                       for g in grads)

    t_e = bench(fwdbwd_ein, "einsum attention fwd+bwd (dropout on)")
    t_f = bench(fwdbwd_fused, "fused  attention fwd+bwd (dropout on)")
    print(f"speedup: {t_e / t_f:.2f}x")


if __name__ == "__main__":
    main()
