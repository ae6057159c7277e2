"""Probe: flash-streamed INGREDIENTS rel-attention forward.

Device-trace attribution (BENCHMARKS.md "Long-sequence scaling") showed
the XLNet Q=K=2048 step is ~70% relayout: the host-side ebias assembly
(bd einsum → rel_shift → segment/mask adds) materializes O(S²) HBM
tensors per layer, and rel_shift's dim-mixing reshapes lower to
physical copies (~300 ms of the 471 ms step). The full-H tier already
solves this in-kernel (`fused_rel_attention_ingredients` assembles the
score bias in VMEM), but it is gated on the whole row fitting.

This tool prototypes the missing tier: a flash-streamed forward whose
(qb, kb) block loop assembles bd IN VMEM —

    bd_shifted[q, k] = rr[q] · r[Q − q + k]

per block via one [qb, dh]×[dh, qb+kb] dot against a dynamically-sliced
window of the (once-padded) positional keys, followed by a per-row
log-shift (log₂ qb conditional rolls) — plus the segment and mask
terms, feeding the standard online-softmax recurrence. Nothing
[B,H,Q,P]- or [B,H,Q,K]-sized ever exists in HBM.

Stages:
  1. interpret-mode parity vs a plain-jnp reference (runs on CPU);
  2. TPU compile probe (the repo's six Mosaic bug classes make this the
     real test — dynamic-start sublane loads are the risky new corner);
  3. hardware timing vs the production path (host ebias assembly +
     `_fused_rel_attention_fs` forward) at Q=K=1024/2048.

Forward-only, dropout-free: this is a DIRECTION probe, not a product
path — the backward (in-kernel unshift + dynamic-start dr scatter-add)
is the remaining work if the numbers justify it.

Run: python tools/exp_relik_fs_probe.py          (TPU: probe + time)
     EXP_INTERPRET=1 python tools/exp_relik_fs_probe.py   (CPU parity)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bert_multimodal_transformer_tpu.ops.pallas_util import (  # noqa: E402
    pallas_call,
)


def _row_shift(x, qb: int, kb: int):
    """x [qb, w] → [qb, kb] with out[qi, k] = x[qi, (qb−qi) + k]
    (per-row left-roll by qb−qi ∈ [1, qb], then the first kb columns).
    The +1 relative to the natural qb−1−qi offset comes from loading
    the position-key slab from the 8-ALIGNED base one row below the
    mathematically-tight start — Mosaic requires dynamic sublane
    starts to be provable multiples of 8."""
    qidx = jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
    a = qb - qidx
    for amt in [1 << i for i in range(qb.bit_length())]:
        rolled = jnp.concatenate([x[:, amt:], x[:, :amt]], axis=-1)
        x = jnp.where((a & amt) != 0, rolled, x)
    return x[:, :kb]


def _fwd_relik_fs_kernel(rw_ref, rr_ref, k_ref, v_ref, r_ref, ed_ref,
                         segd_ref, colm_ref, o_ref, *,
                         hb: int, dh: int, nb: int, kb: int,
                         q_len: int):
    """Grid (B//nb, H//hb, Q//qb). Per (row, head-block, q-block):
    stream the key row in kb blocks, assembling each block's score bias
    from the raw ingredients in VMEM."""
    f32 = jnp.float32
    qb = rw_ref.shape[1]
    k_len = k_ref.shape[1]
    n_kb = k_len // kb
    q0 = pl.program_id(2) * qb
    NEG = jnp.asarray(-65500.0, f32)

    for b in range(nb):
        rws = [rw_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        rrs = [rr_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        m = jnp.full((hb, qb), -jnp.inf, f32)
        l = jnp.zeros((hb, qb), f32)
        acc = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            ksl = slice(ki * kb, (ki + 1) * kb)
            # position-key window for this (q-block, k-block): row qi
            # needs positions (q_len − q0 − qi) + k. Start the slab at
            # the 8-ALIGNED q_len − q0 − qb + k0 (every term a multiple
            # of 8 — Mosaic rejects unprovable dynamic sublane starts),
            # one row below the tight start; _row_shift compensates
            # with the qb−qi offset. End = q_len − q0 + k0 + kb ≤ P, so
            # no padding row is needed.
            # every term is a static multiple of 8, but q0 carries a
            # program_id Mosaic can't reason through — assert the
            # alignment with the pl.multiple_of hint
            s0 = pl.multiple_of(q_len - q0 - qb + ki * kb, 8)
            sbs = []
            for h in range(hb):
                slab = r_ref[pl.ds(s0, qb + kb),
                             h * dh:(h + 1) * dh]        # [qb+kb, dh]
                bd = jax.lax.dot_general(
                    rrs[h], slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)          # [qb, qb+kb]
                k = k_ref[b, ksl, h * dh:(h + 1) * dh]
                ac = jax.lax.dot_general(
                    rws[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)          # [qb, kb]
                sbs.append(ac + _row_shift(bd, qb, kb))
            sb = jnp.stack(sbs)                          # [hb, qb, kb]
            # segment term: ed[h, q] where seg differs, else 0
            # (ed comes in 4-D [B, n_hb, hb, Q] — the 8-sublane block
            # rule needs the -2 dim equal to the full array dim)
            segd = segd_ref[b, :, ksl].astype(f32)[None]  # [1, qb, kb]
            sb = sb + ed_ref[b, 0].astype(f32)[:, :, None] * segd
            # column mask + non-target diagonal (-eye)
            colm = colm_ref[b, 0, ksl].astype(f32)[None, None]  # [1,1,kb]
            kidx = jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 1) \
                + ki * kb
            qgidx = jax.lax.broadcasted_iota(jnp.int32, (qb, kb), 0) + q0
            eye = (kidx == qgidx).astype(f32)[None]
            sb = sb + (colm + eye) * NEG
            m_new = jnp.maximum(m, jnp.max(sb, axis=-1))
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(sb - m_new[..., None])
            l = l * alpha + jnp.sum(e, axis=-1)
            ec = e.astype(rw_ref.dtype)
            for h in range(hb):
                v = v_ref[b, ksl, h * dh:(h + 1) * dh]
                pv = jax.lax.dot_general(
                    ec[h], v, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                acc[h] = acc[h] * alpha[h][:, None] + pv
            m = m_new
        o_ref[b] = jnp.concatenate(
            [(acc[h] / l[h][:, None]).astype(o_ref.dtype)
             for h in range(hb)], axis=-1)


def relik_fs_forward(rw, rr, k, v, r_keys, ed, segd, colm, *, n_heads,
                     hb, qb, kb, interpret):
    """rw/rr [B, Q, H·Dh] (scale pre-folded into rr), k/v [B, K, H·Dh],
    r_keys [P, H·Dh] (P = Q + K), ed [B, H, Q], segd [B, Q, K] (0/1),
    colm [B, K] (1 = masked) → [B, Q, H·Dh]."""
    b, q_len, d = rw.shape
    k_len = k.shape[1]
    dh = d // n_heads
    nb = 1
    n_hb = n_heads // hb
    n_qb = q_len // qb
    grid = (b // nb, n_hb, n_qb)

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    specs = [
        blk((nb, qb, hb * dh), lambda i, h, qi: (i, qi, h)),   # rw
        blk((nb, qb, hb * dh), lambda i, h, qi: (i, qi, h)),   # rr
        blk((nb, k_len, hb * dh), lambda i, h, qi: (i, 0, h)),  # k
        blk((nb, k_len, hb * dh), lambda i, h, qi: (i, 0, h)),  # v
        blk((r_keys.shape[0], hb * dh), lambda i, h, qi: (0, h)),  # r
        # ed 4-D [B, n_hb, hb, Q], block (nb, 1, hb, qb): axis -2 equals
        # the full hb dim, satisfying the 8-sublane block rule
        blk((nb, 1, hb, qb), lambda i, h, qi: (i, h, 0, qi)),  # ed
        blk((nb, qb, k_len), lambda i, h, qi: (i, qi, 0)),     # segd
        # colm 3-D [B, 1, K] so the -2 block dim equals the full dim
        blk((nb, 1, k_len), lambda i, h, qi: (i, 0, 0)),       # colm
    ]
    out_spec = blk((nb, qb, hb * dh), lambda i, h, qi: (i, qi, h))
    ed = ed.reshape(b, n_hb, hb, q_len)
    colm = colm.reshape(b, 1, k_len)
    kernel = functools.partial(
        _fwd_relik_fs_kernel, hb=hb, dh=dh, nb=nb, kb=kb, q_len=q_len)
    return pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_len, d), rw.dtype),
        interpret=interpret,
    )(rw, rr, k, v, r_keys, ed, segd, colm)


def reference_forward(rw, rr, k, v, r, ed, segd, colm, n_heads):
    """Plain-jnp twin of the kernel math (the streamed path's algebra
    with scale pre-folded): scores = rw·kᵀ + shift(rr·rᵀ) + ed·segd
    + (colm + eye)·(−65500); softmax; P·V."""
    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift

    b, q_len, d = rw.shape
    k_len = k.shape[1]
    dh = d // n_heads
    rwh = rw.reshape(b, q_len, n_heads, dh)
    rrh = rr.reshape(b, q_len, n_heads, dh)
    kh = k.reshape(b, k_len, n_heads, dh)
    vh = v.reshape(b, k_len, n_heads, dh)
    rh = r.reshape(-1, n_heads, dh)
    ac = jnp.einsum("bqhf,bkhf->bhqk", rwh, kh,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bqhf,phf->bhqp", rrh, rh,
                    preferred_element_type=jnp.float32)
    sb = ac + rel_shift(bd, k_len)
    sb = sb + ed.astype(jnp.float32)[:, :, :, None] \
        * segd.astype(jnp.float32)[:, None]
    eye = jnp.eye(q_len, k_len, dtype=jnp.float32)
    sb = sb + (colm.astype(jnp.float32)[:, None, None]
               + eye[None, None]) * -65500.0
    p = jax.nn.softmax(sb, axis=-1)
    out = jnp.einsum("bhqk,bkhf->bqhf", p.astype(rw.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, q_len, d).astype(rw.dtype)


def _inputs(b, q_len, k_len, n_heads, dh, seed=0, dtype=jnp.bfloat16):
    r_ = np.random.RandomState(seed)
    d = n_heads * dh
    p = q_len + k_len
    rw = jnp.asarray(r_.randn(b, q_len, d) * 0.2, dtype)
    rr = jnp.asarray(r_.randn(b, q_len, d) * 0.2, dtype)
    k = jnp.asarray(r_.randn(b, k_len, d) * 0.2, dtype)
    v = jnp.asarray(r_.randn(b, k_len, d) * 0.2, dtype)
    r = jnp.asarray(r_.randn(p, d) * 0.2, dtype)
    ed = jnp.asarray(r_.randn(b, n_heads, q_len) * 0.1, dtype)
    segd = jnp.asarray(r_.randint(0, 2, (b, q_len, k_len)), dtype)
    colm = np.zeros((b, k_len), np.float32)
    colm[:, -3:] = 1.0  # a few masked key columns
    return rw, rr, k, v, r, ed, segd, jnp.asarray(colm, dtype)


def main():
    interpret = bool(os.environ.get("EXP_INTERPRET"))
    if interpret:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))

    # ---- stage 1: parity (tiny geometry, interpret on CPU) -------------
    n_heads, dh = 4, 64
    b, q_len, k_len = 2, 256, 256
    hb, qb, kb = 2, 128, 128
    rw, rr, k, v, r, ed, segd, colm = _inputs(b, q_len, k_len, n_heads,
                                              dh)
    want = np.asarray(jax.device_get(reference_forward(
        rw, rr, k, v, r, ed, segd, colm, n_heads)), np.float32)
    got = np.asarray(jax.device_get(relik_fs_forward(
        rw, rr, k, v, r, ed, segd, colm, n_heads=n_heads, hb=hb,
        qb=qb, kb=kb, interpret=interpret)), np.float32)
    err = float(np.max(np.abs(got - want)))
    print(f"parity [{b},{n_heads},{q_len},{k_len}] "
          f"(hb={hb},qb={qb},kb={kb}, "
          f"{'interpret' if interpret else 'TPU'}): max|Δ| {err:.2e}",
          flush=True)
    assert err <= 5e-2, err  # bf16 exp/softmax band
    if interpret:
        print("INTERPRET PARITY OK")
        return

    # ---- stage 2+3: TPU compile probe + timing vs production path ------
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _fused_rel_attention_fs,
    )
    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift

    n_heads, dh = 12, 64
    for (b, s, hb, qb, kb) in ((4, 1024, 2, 256, 256),
                               (4, 2048, 2, 256, 512)):
        q_len = k_len = s
        rw, rr, k, v, r, ed, segd, colm = _inputs(b, q_len, k_len,
                                                  n_heads, dh, seed=s)
        ing = jax.jit(lambda *a: jnp.sum(relik_fs_forward(
            *a, n_heads=n_heads, hb=hb, qb=qb, kb=kb,
            interpret=False).astype(jnp.float32)))

        def production(rw_, rr_, k_, v_, r_, ed_, segd_, colm_):
            # the shipped path: host ebias assembly + streamed fs kernel
            rrh = rr_.reshape(b, q_len, n_heads, dh)
            rh = r_.reshape(-1, n_heads, dh)
            bd4 = jnp.einsum("bqhf,phf->bhqp", rrh, rh,
                             preferred_element_type=jnp.float32
                             ).astype(rw_.dtype)
            ebias = rel_shift(bd4, k_len).astype(jnp.float32)
            ebias = ebias + ed_.astype(jnp.float32)[:, :, :, None] \
                * segd_.astype(jnp.float32)[:, None]
            eye = jnp.eye(q_len, k_len, dtype=jnp.float32)
            ebias = ebias + (colm_.astype(jnp.float32)[:, None, None]
                             + eye[None, None]) * -65500.0
            out = _fused_rel_attention_fs(
                rw_, k_, v_, ebias.astype(rw_.dtype),
                jnp.zeros((1, 1), jnp.int32), 1.0, 0.0, n_heads, hb,
                qb, kb, False)
            return jnp.sum(out.astype(jnp.float32))

        prod = jax.jit(production)

        def bench(f, tag):
            try:
                t_compile0 = time.perf_counter()
                out = f(rw, rr, k, v, r, ed, segd, colm)
                float(jax.device_get(out))
                t_compile = time.perf_counter() - t_compile0
            except Exception as e:
                print(f"[{b},{n_heads},{s}] {tag}: COMPILE/RUN FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                return None
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(rw, rr, k, v, r, ed, segd, colm)
            float(jax.device_get(out))
            dt = (time.perf_counter() - t0) / n
            print(f"[{b},{n_heads},{s}] {tag}: {dt * 1e3:8.2f} ms "
                  f"(compile+first {t_compile:.1f}s)", flush=True)
            return dt

        t_ing = bench(ing, "ingredients")
        t_prod = bench(prod, "production(assembly+fs)")
        if t_ing and t_prod:
            print(f"[{b},{n_heads},{s}] ingredients speedup: "
                  f"{t_prod / t_ing:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
