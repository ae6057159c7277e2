"""Fused short-seq attention kernel (ops/fused_attention.py) vs the plain
einsum path (ops/attention.py — HF BertSelfAttention semantics, vendored
by the reference at bert.py:17).

CPU runs exercise the kernel through the Pallas interpreter; the dropout
path falls back to the plain einsum math off-TPU (the interpreter stubs
the hardware PRNG), so the in-kernel dropout itself is validated on real
silicon by tools/check_fused_attention_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_multimodal_transformer_tpu.ops.attention import (
    dot_product_attention,
    extended_attention_mask,
)
from bert_multimodal_transformer_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_packed,
    fused_rel_attention,
)

B, H, S, DH = 3, 4, 50, 64
SCALE = 1.0 / DH ** 0.5


def _inputs(dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, S, DH), dtype)
    k = jnp.asarray(rng.randn(B, H, S, DH), dtype)
    v = jnp.asarray(rng.randn(B, H, S, DH), dtype)
    mask = np.ones((B, S), np.int32)
    mask[0, 40:] = 0
    mask[2, 10:] = 0
    return q, k, v, jnp.asarray(mask)


def test_forward_matches_einsum_fp32():
    q, k, v, mask = _inputs()
    ref = dot_product_attention(q, k, v, extended_attention_mask(mask),
                                scale=SCALE)
    out = fused_attention(q, k, v, mask, scale=SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_forward_matches_einsum_bf16():
    q, k, v, mask = _inputs(jnp.bfloat16)
    ref = dot_product_attention(q, k, v, extended_attention_mask(mask),
                                scale=SCALE)
    out = fused_attention(q, k, v, mask, scale=SCALE)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_forward_no_mask():
    q, k, v, _ = _inputs()
    ref = dot_product_attention(q, k, v, None, scale=SCALE)
    out = fused_attention(q, k, v, None, scale=SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_grads_match_plain_vjp():
    q, k, v, mask = _inputs()
    bias = extended_attention_mask(mask)

    def f_ref(q, k, v):
        return jnp.sum(jnp.tanh(
            dot_product_attention(q, k, v, bias, scale=SCALE)))

    def f_new(q, k, v):
        return jnp.sum(jnp.tanh(
            fused_attention(q, k, v, mask, scale=SCALE)))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(f_new, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_save_probs_grads_match_plain_vjp():
    # save_probs=True stores the softmax probs in forward and the backward
    # skips the QK+softmax recompute; grads must match the plain VJP (and
    # hence the recompute backward) with dropout off.
    q, k, v, mask = _inputs()
    bias = extended_attention_mask(mask)

    def f_ref(q, k, v):
        return jnp.sum(jnp.tanh(
            dot_product_attention(q, k, v, bias, scale=SCALE)))

    def f_new(q, k, v):
        return jnp.sum(jnp.tanh(
            fused_attention(q, k, v, mask, scale=SCALE, save_probs=True)))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(f_new, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_save_probs_forward_value_matches_under_grad():
    # Under jax.value_and_grad the save-mode forward kernel (which also
    # writes the prob residuals) produces the value; it must match the
    # recompute-mode forward exactly in fp32.
    q, k, v, mask = _inputs()

    def f(save):
        def inner(qq):
            return jnp.sum(fused_attention(qq, k, v, mask, scale=SCALE,
                                           save_probs=save))
        return jax.value_and_grad(inner)(q)

    (val_s, g_s), (val_r, g_r) = f(True), f(False)
    np.testing.assert_allclose(float(val_s), float(val_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               atol=1e-5, rtol=1e-5)


def _pack(q, k, v):
    # [B,H,S,Dh] ×3 → [B,S,3·H·Dh] with the reshape(B,S,3,H,Dh) packing
    b, h, s, dh = q.shape
    stacked = jnp.stack([jnp.moveaxis(t, 1, 2) for t in (q, k, v)],
                        axis=2)                      # [B,S,3,H,Dh]
    return stacked.reshape(b, s, 3 * h * dh)


@pytest.mark.parametrize("save", [False, True])
def test_packed_forward_and_grads_match_einsum(save):
    q, k, v, mask = _inputs()
    bias = extended_attention_mask(mask)
    qkv = _pack(q, k, v)

    def f_ref(qkv_):
        b, s, _ = qkv_.shape
        qq, kk, vv = [jnp.moveaxis(qkv_.reshape(b, s, 3, H, DH)[:, :, i],
                                   2, 1) for i in range(3)]
        ctx = dot_product_attention(qq, kk, vv, bias, scale=SCALE)
        return jnp.sum(jnp.tanh(jnp.moveaxis(ctx, 1, 2).reshape(b, s, -1)))

    def f_new(qkv_):
        return jnp.sum(jnp.tanh(fused_attention_packed(
            qkv_, mask, n_heads=H, scale=SCALE, save_probs=save)))

    vr, gr = jax.value_and_grad(f_ref)(qkv)
    vn, gn = jax.value_and_grad(f_new)(qkv)
    np.testing.assert_allclose(float(vn), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                               atol=1e-5, rtol=1e-5)


def test_packed_dropout_offtpu_fallback():
    q, k, v, mask = _inputs()
    qkv = _pack(q, k, v)
    key = jax.random.PRNGKey(7)
    out = fused_attention_packed(qkv, mask, n_heads=H, scale=SCALE,
                                 dropout_rate=0.25, dropout_rng=key,
                                 deterministic=False)
    ctx = dot_product_attention(
        q, k, v, extended_attention_mask(mask), scale=SCALE,
        dropout_rate=0.25, dropout_rng=key, deterministic=False)
    ref = jnp.moveaxis(ctx, 1, 2).reshape(B, S, H * DH)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_fits_hb_extends_fused_range():
    """Head-blocking carries the packed fused path beyond the full-H
    [H,S,S] scoped-VMEM fit: at bert-base bf16 geometry the full kernel
    tops out near S≈380 (the S=512 compile failure in BENCHMARKS.md
    "Long-sequence scaling"), the head-blocked grid reaches S=768."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_hb, fused_attention_fits, fused_attention_fits_hb)

    assert fused_attention_fits(12, 50, 768)
    assert not fused_attention_fits(12, 512, 768)
    assert fused_attention_fits_hb(12, 512, 768)
    assert _resolve_hb(12, 512, 768, 2) == 4
    assert fused_attention_fits_hb(12, 768, 768)
    assert _resolve_hb(12, 768, 768, 2) == 2
    # beyond every head-blocked fit → callers fall back to flash/einsum
    assert not fused_attention_fits_hb(12, 1024, 768)
    # hb·Dh must tile to 128 lanes: at Dh=64 odd head-blocks are skipped
    assert _resolve_hb(12, 768, 768, 2) % 2 == 0


def test_fits_bounds_both_passes():
    """fused_attention_fits must bound the recompute BACKWARD footprint
    (two [H,S,S] scratches + qkv/g/dqkv rows), not just the forward: a
    fwd-only check admitted S≈272-470 at base bf16 geometry whose
    backward could not compile (~18-25 MB per program). The boundary is
    S=256 full-H; beyond, the head-blocked grid takes over seamlessly."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_hb, fused_attention_fits)

    assert fused_attention_fits(12, 256, 768)
    assert not fused_attention_fits(12, 272, 768)
    assert _resolve_hb(12, 272, 768, 2) == 6
    assert _resolve_hb(12, 320, 768, 2) == 6


def _fake_probe(monkeypatch, table):
    """Install a fake compile probe: table maps (pass, hb, nb) -> bool
    (default False). Returns the call log."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = []

    def fake(pass_name, s, d, n_heads, hb, nb, rate, scale, dtype):
        calls.append((pass_name, hb, nb))
        return table.get((pass_name, hb, nb), False)

    monkeypatch.setattr(fa, "_probe_enabled", lambda: True)
    monkeypatch.setattr(fa, "_hb_kernel_compiles", fake)
    return calls


def test_hb_plan_walks_nb_on_compile_failure(monkeypatch):
    """The S=320 hardware table: fwd compiles at nb=2 but not the
    arithmetic pick nb=4 (16.96 MB scoped); the plan must walk nb down
    instead of shipping a kernel that cannot compile."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = _fake_probe(monkeypatch, {
        ("fwd", 6, 2): True, ("bwd", 6, 1): True})
    plan = fa._resolve_hb_plan(8, 12, 320, 768, 2, rate=0.1)
    assert plan == (6, 2, 1)
    assert ("fwd", 6, 4) in calls  # arithmetic pick tried first


def test_hb_plan_walks_hb_when_bwd_never_compiles(monkeypatch):
    """The S=448 hardware table: hb=4 bwd fails even at nb=1 (18.28 MB);
    the plan must degrade to the next divisor (hb=2) rather than fail."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    table = {("fwd", 4, nb): True for nb in (1, 2, 4, 8)}
    table.update({("fwd", 2, nb): True for nb in (1, 2, 4, 8)})
    table[("bwd", 2, 4)] = True
    calls = _fake_probe(monkeypatch, table)
    plan = fa._resolve_hb_plan(8, 12, 448, 768, 2, rate=0.1)
    assert plan is not None and plan[0] == 2
    assert ("bwd", 4, 1) in calls  # hb=4 was tried and rejected


def test_hb_plan_none_when_nothing_compiles(monkeypatch):
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    _fake_probe(monkeypatch, {})
    assert fa._resolve_hb_plan(8, 12, 512, 768, 2, rate=0.1) is None
    # the model gate consults the same plan
    assert not fa.fused_attention_fits_hb(12, 512, 768, 2, batch=8,
                                          rate=0.1)


def test_hb_plan_forced_nb_not_walked(monkeypatch):
    """A user-forced FUSED_ATTN_NB_* block size that cannot compile must
    surface as no-fit, not silently shrink."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = _fake_probe(monkeypatch, {("fwd", 6, 2): True,
                                      ("bwd", 6, 1): True})
    assert fa._resolve_hb_plan(8, 12, 320, 768, 2, rate=0.1,
                               nb_fwd=4) is None
    assert ("fwd", 6, 2) not in calls  # no walk below the forced value


def test_rel_hb_plan_walks_and_gates(monkeypatch):
    """The rel twin: plan walks nb/hb on compile failure and the XLNet
    gate (fused_rel_attention_fits_hb) consults it."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = []

    def fake(pass_name, q_len, k_len, d, n_heads, hb, nb, rate, scale,
             dtype, eb_dtype):
        calls.append((pass_name, hb, nb))
        return (pass_name, hb, nb) in {("fwd", 2, 1), ("bwd", 2, 1)}

    monkeypatch.setattr(fa, "_probe_enabled", lambda: True)
    monkeypatch.setattr(fa, "_rel_hb_kernel_compiles", fake)
    plan = fa._resolve_rel_hb_plan(8, 12, 512, 512, 768, 2)
    assert plan == (2, 1, 1)
    assert fa.fused_rel_attention_fits_hb(12, 512, 512, 768, 2, batch=8)
    monkeypatch.setattr(fa, "_rel_hb_kernel_compiles",
                        lambda *a, **k: False)
    assert fa._resolve_rel_hb_plan(8, 12, 512, 512, 768, 2) is None


def _fake_rel_full_probe(monkeypatch, fails):
    """Install a fake full-H rel compile probe: ``fails`` is a set of
    (pass_name, save) pairs that never compile at ANY nb; everything
    else compiles. Returns the call log of (pass_name, nb, save)."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = []

    def fake(pass_name, q_len, k_len, d, n_heads, nb, rate, scale,
             dtype, eb_dtype, save):
        calls.append((pass_name, nb, save))
        return (pass_name, save) not in fails

    monkeypatch.setattr(fa, "_probe_enabled", lambda: True)
    monkeypatch.setattr(fa, "_rel_full_kernel_compiles", fake)
    return calls


def test_rel_full_plan_demotes_saved_on_compile_failure(monkeypatch):
    """The r4b mems hardware table (Q=50, K=562, b=32, bf16): the saved
    backward allocates 16.41 MB scoped VMEM and fails to compile while
    the recompute pair fits — the plan must demote auto-saved mode to
    recompute instead of shipping the OOM."""
    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = _fake_rel_full_probe(monkeypatch, {("bwd", True)})
    plan = fa._resolve_rel_full_plan(
        32, 12, 50, 562, 768, 2, rate=0.1, scale=0.125,
        dtype=jnp.bfloat16, eb_dtype=jnp.bfloat16, nb_fwd=None,
        nb_bwd=None, save=True, save_forced=False)
    assert plan is not None and plan[2] is False
    assert any(c == ("bwd", 1, True) for c in calls)  # saved probed to nb=1
    assert any(c[0] == "bwd" and c[2] is False for c in calls)


def test_rel_full_plan_forced_save_surfaces_as_no_fit(monkeypatch):
    """FUSED_ATTN_SAVE=1-style forced saved mode that cannot compile
    must return None (no silent mode change), matching the forced-nb
    contract of the hb resolver."""
    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    _fake_rel_full_probe(monkeypatch, {("bwd", True)})
    assert fa._resolve_rel_full_plan(
        32, 12, 50, 562, 768, 2, rate=0.1, scale=0.125,
        dtype=jnp.bfloat16, eb_dtype=jnp.bfloat16, nb_fwd=None,
        nb_bwd=None, save=True, save_forced=True) is None


def test_rel_full_plan_falls_to_hb_when_nothing_compiles(monkeypatch):
    """When even the recompute pair cannot compile at nb=1 the plan is
    None and the entry point must degrade to the head-blocked grid —
    verified end-to-end against the plain einsum math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    _fake_rel_full_probe(monkeypatch, {("fwd", True), ("bwd", True),
                                       ("fwd", False), ("bwd", False)})
    monkeypatch.setattr(fa, "_rel_hb_kernel_compiles",
                        lambda *a, **k: True)
    rng = np.random.default_rng(0)
    b, h, q_len, k_len, d = 2, 12, 64, 64, 768
    q = jnp.asarray(rng.standard_normal((b, q_len, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, k_len, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, k_len, d)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((b, h, q_len, k_len)) * 0.1,
                     jnp.float32)
    out = fa.fused_rel_attention(q, k, v, eb, n_heads=h, scale=0.125,
                                 deterministic=True, interpret=True)
    qh = q.reshape(b, q_len, h, d // h)
    kh = k.reshape(b, k_len, h, d // h)
    vh = v.reshape(b, k_len, h, d // h)
    score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * 0.125 + eb
    ref = jnp.einsum("bhqk,bkhf->bqhf", jax.nn.softmax(score, axis=-1),
                     vh).reshape(b, q_len, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_rel_entry_einsum_terminal_tier(monkeypatch):
    """When every kernel tier's compile probe rejects the geometry the
    entry must degrade to plain einsum math with a warning — not raise
    inside the jit (the r4b mems bench died on exactly this ladder)."""
    import warnings as _w

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    _fake_rel_full_probe(monkeypatch, {("fwd", True), ("bwd", True),
                                       ("fwd", False), ("bwd", False)})
    monkeypatch.setattr(fa, "_rel_hb_kernel_compiles",
                        lambda *a, **k: False)
    monkeypatch.setattr(fa, "_resolve_rel_fs_plan", lambda *a, **k: None)
    rng = np.random.default_rng(1)
    b, h, q_len, k_len, d = 2, 12, 64, 64, 768
    q = jnp.asarray(rng.standard_normal((b, q_len, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, k_len, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, k_len, d)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((b, h, q_len, k_len)) * 0.1,
                     jnp.float32)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        out = fa.fused_rel_attention(q, k, v, eb, n_heads=h, scale=0.125,
                                     deterministic=True, interpret=True)
    assert any("falling back to einsum" in str(c.message) for c in caught)
    qh = q.reshape(b, q_len, h, d // h)
    kh = k.reshape(b, k_len, h, d // h)
    vh = v.reshape(b, k_len, h, d // h)
    score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * 0.125 + eb
    ref = jnp.einsum("bhqk,bkhf->bqhf", jax.nn.softmax(score, axis=-1),
                     vh).reshape(b, q_len, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rel_full_plan_probe_off_passes_arithmetic_through(monkeypatch):
    """Off-TPU the plan returns the arithmetic knobs unchanged — the
    interpret path has no scoped-VMEM limit to verify against."""
    import jax.numpy as jnp
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    monkeypatch.setattr(fa, "_probe_enabled", lambda: False)
    plan = fa._resolve_rel_full_plan(
        32, 12, 50, 562, 768, 2, rate=0.1, scale=0.125,
        dtype=jnp.bfloat16, eb_dtype=jnp.bfloat16, nb_fwd=None,
        nb_bwd=None, save=True, save_forced=False)
    assert plan is not None and plan[2] is True
    # nb picks must equal what the kernels would choose internally
    n_fwd = fa._pick_nb_packed(
        32, fa._rel_row_bytes(50, 562, 768, 12, 2, 2),
        fixed_bytes=fa._scratch_bytes(12, 50, 562))
    n_bwd = fa._pick_nb_packed(
        32, 2 * fa._rel_row_bytes(50, 562, 768, 12, 2, 2),
        fixed_bytes=fa._scratch_bytes(12, 50, 562))
    assert plan == (n_fwd, n_bwd, True)


def test_hb_plan_arithmetic_when_probe_off(monkeypatch):
    """Off-TPU (or FUSED_ATTN_PROBE=0) the plan is pure arithmetic —
    the CPU/interpret path has no scoped-VMEM limit."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    plan = fa._resolve_hb_plan(8, 12, 320, 768, 2, rate=0.1)
    assert plan is not None and plan[0] == fa._resolve_hb(12, 320, 768, 2)


def test_hb_env_override_validated(monkeypatch):
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_hb)

    monkeypatch.setenv("FUSED_ATTN_HB", "5")
    with pytest.raises(ValueError, match="must divide"):
        _resolve_hb(12, 512, 768, 2)
    monkeypatch.setenv("FUSED_ATTN_HB", "2")
    assert _resolve_hb(12, 512, 768, 2) == 2
    monkeypatch.setenv("FUSED_ATTN_HB", "12")
    # forced block that cannot fit → None (callers fall back)
    assert _resolve_hb(12, 512, 768, 2) is None


def test_packed_head_blocked_matches_einsum_and_full(monkeypatch):
    """Shrinking the VMEM budget below the full-H kernel's footprint
    must reroute fused_attention_packed onto the head-blocked grid with
    identical fp32 values and grads (same whole-row softmax math, grid
    split over head blocks)."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    q, k, v, mask = _inputs()
    bias = extended_attention_mask(mask)
    qkv = _pack(q, k, v)

    def f_ref(qkv_):
        b, s, _ = qkv_.shape
        qq, kk, vv = [jnp.moveaxis(qkv_.reshape(b, s, 3, H, DH)[:, :, i],
                                   2, 1) for i in range(3)]
        ctx = dot_product_attention(qq, kk, vv, bias, scale=SCALE)
        return jnp.sum(jnp.tanh(jnp.moveaxis(ctx, 1, 2).reshape(b, s, -1)))

    def f_new(qkv_):
        return jnp.sum(jnp.tanh(fused_attention_packed(
            qkv_, mask, n_heads=H, scale=SCALE)))

    vr, gr = jax.value_and_grad(f_ref)(qkv)
    v_full, g_full = jax.value_and_grad(f_new)(qkv)

    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "600000")
    assert not fa.fused_attention_fits(H, S, H * DH, 4)
    assert fa._resolve_hb(H, S, H * DH, 4) == 2
    v_hb, g_hb = jax.value_and_grad(f_new)(qkv)

    np.testing.assert_allclose(float(v_hb), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_hb), np.asarray(gr),
                               atol=1e-5, rtol=1e-5)
    # vs the full-H kernel the head-blocked grid is bit-identical
    np.testing.assert_allclose(float(v_hb), float(v_full), rtol=0)
    np.testing.assert_allclose(np.asarray(g_hb), np.asarray(g_full),
                               atol=0, rtol=0)


def test_packed_head_blocked_no_fit_raises(monkeypatch):
    """Beyond every kernel tier (budget shrunk so nothing fits) the
    entry degrades to einsum math with a trace-time warning instead of
    raising — an unprobeable geometry must not kill a training run."""
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(2, S, 3 * H * DH), jnp.float32)
    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "100000")
    with pytest.warns(UserWarning, match="falling back to einsum"):
        out = fused_attention_packed(qkv, None, n_heads=H, scale=SCALE)
    q, k, v = (qkv.reshape(2, S, 3, H, DH)[:, :, i].transpose(0, 2, 1, 3)
               for i in range(3))
    ref = dot_product_attention(q, k, v, None, scale=SCALE)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ref.transpose(0, 2, 1, 3).reshape(2, S, H * DH)),
        atol=1e-5, rtol=1e-5)


def test_model_dispatch_head_blocked_equals_einsum(monkeypatch):
    """Model-level: with the budget shrunk so only the head-blocked
    variant fits, BertSelfAttention must still take the fused path
    (fused_attention_fits_hb gate) and match the einsum model."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    cfg = dataclasses.replace(BertConfig.tiny(), hidden_size=256,
                              num_attention_heads=4,
                              intermediate_size=512)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    rng = np.random.RandomState(5)
    batch, seq = 2, 20
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)),
                      jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = np.ones((batch, seq), np.int32)
    mask[1, 15:] = 0
    mask = jnp.asarray(mask)
    seg = jnp.zeros((batch, seq), jnp.int32)

    m_ein = MagBertForSequenceClassification(cfg, mm, visual_dim=5,
                                             acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    out_e = m_ein.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)

    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "300000")
    d = cfg.hidden_size
    assert not fa.fused_attention_fits(4, seq, d, 4)
    assert fa.fused_attention_fits_hb(4, seq, d, 4)
    cfg_f = dataclasses.replace(cfg, attention_impl="fused")
    m_fus = MagBertForSequenceClassification(cfg_f, mm, visual_dim=5,
                                             acoustic_dim=7)
    out_f = m_fus.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("save", [False, True])
def test_rel_attention_matches_einsum_with_bias_grad(save):
    # fused_rel_attention vs the XLNet-style einsum score assembly:
    # softmax(q·kᵀ·scale + ebias) with a differentiable full bias.
    rng = np.random.RandomState(5)
    K = S + 14                                      # qlen != klen (mems)
    q = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    k = jnp.asarray(rng.randn(B, K, H * DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, K, H * DH), jnp.float32)
    ebias = jnp.asarray(rng.randn(B, H, S, K) * 0.3, jnp.float32)

    def f_ref(q_, k_, v_, eb):
        qh = q_.reshape(B, S, H, DH)
        kh = k_.reshape(B, K, H, DH)
        vh = v_.reshape(B, K, H, DH)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * SCALE + eb
        probs = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs, vh)
        return jnp.sum(jnp.tanh(ctx.reshape(B, S, H * DH)))

    def f_new(q_, k_, v_, eb):
        return jnp.sum(jnp.tanh(fused_rel_attention(
            q_, k_, v_, eb, n_heads=H, scale=SCALE, save_probs=save)))

    vr, gr = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v,
                                                             ebias)
    vn, gn = jax.value_and_grad(f_new, argnums=(0, 1, 2, 3))(q, k, v,
                                                             ebias)
    np.testing.assert_allclose(float(vn), float(vr), rtol=1e-6)
    for name, a, b in zip("qkve", gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_rel_attention_dropout_offtpu_fallback_runs():
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    ebias = jnp.zeros((B, H, S, S), jnp.float32)
    out = fused_rel_attention(q, k, v, ebias, n_heads=H, scale=SCALE,
                              dropout_rate=0.3,
                              dropout_rng=jax.random.PRNGKey(0),
                              deterministic=False)
    assert out.shape == (B, S, H * DH)
    assert np.isfinite(np.asarray(out)).all()
    # mean-preserving in expectation: crude sanity band
    base = fused_rel_attention(q, k, v, ebias, n_heads=H, scale=SCALE)
    ratio = float(jnp.mean(jnp.abs(out)) / jnp.mean(jnp.abs(base)))
    assert 0.5 < ratio < 2.0, ratio


@pytest.mark.parametrize("save,nb", [(False, None), (True, None),
                                     (False, 1), (True, 1)])
def test_rel_attention_ingredients_matches_assembled(save, nb):
    # fused_rel_attention_ingredients (bd/rel-shift/segment/mask built in
    # VMEM) vs the einsum score assembly, incl. grads for ALL six
    # differentiable inputs (notably the grid-accumulated d_r and the
    # segment-delta d_ed). qlen != klen covers the mems-extended case.
    # nb=1 forces a multi-step grid so the cross-grid d_r accumulation
    # (zero-init at program 0 + constant-index-map revisiting) is
    # exercised — with the auto nb the whole batch fits one program.
    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_rel_attention_ingredients)

    rng = np.random.RandomState(11)
    K = S + 14                                      # klen (mems)
    P = S + K                                       # bi position stream
    rw = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    rr = jnp.asarray(rng.randn(B, S, H * DH) * SCALE, jnp.float32)
    r = jnp.asarray(rng.randn(P, H * DH), jnp.float32)
    k = jnp.asarray(rng.randn(B, K, H * DH), jnp.float32)
    v = jnp.asarray(rng.randn(B, K, H * DH), jnp.float32)
    ed = jnp.asarray(rng.randn(B, H, S) * SCALE, jnp.float32)
    segd = jnp.asarray(rng.randint(0, 2, (B, S, K)), jnp.float32)
    maskb = jnp.asarray(-1e9 * (rng.rand(B, S, K) < 0.1), jnp.float32)

    def f_ref(rw_, rr_, r_, k_, v_, ed_):
        bd = jnp.einsum("bqhf,phf->bhqp", rr_.reshape(B, S, H, DH),
                        r_.reshape(P, H, DH))
        ebias = rel_shift(bd, K) + ed_[:, :, :, None] * segd[:, None] \
            + maskb[:, None]
        qh = rw_.reshape(B, S, H, DH)
        kh = k_.reshape(B, K, H, DH)
        vh = v_.reshape(B, K, H, DH)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * SCALE + ebias
        probs = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs, vh)
        return jnp.sum(jnp.tanh(ctx.reshape(B, S, H * DH)))

    def f_new(rw_, rr_, r_, k_, v_, ed_):
        return jnp.sum(jnp.tanh(fused_rel_attention_ingredients(
            rw_, rr_, r_, k_, v_, ed_, segd, maskb, n_heads=H,
            scale=SCALE, save_probs=save, nb_fwd=nb, nb_bwd=nb)))

    argnums = (0, 1, 2, 3, 4, 5)
    vr, gr = jax.value_and_grad(f_ref, argnums=argnums)(rw, rr, r, k, v,
                                                        ed)
    vn, gn = jax.value_and_grad(f_new, argnums=argnums)(rw, rr, r, k, v,
                                                        ed)
    np.testing.assert_allclose(float(vn), float(vr), rtol=1e-6)
    for name, a, b in zip(("rw", "rr", "r", "k", "v", "ed"), gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_rel_attention_ingredients_rejects_short_position_stream():
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_rel_attention_ingredients)

    rw = jnp.zeros((B, S, H * DH), jnp.float32)
    with pytest.raises(ValueError, match="P"):
        fused_rel_attention_ingredients(
            rw, rw, jnp.zeros((S + 1, H * DH)), rw, rw,
            jnp.zeros((B, H, S)), jnp.zeros((B, S, S)),
            jnp.zeros((B, S, S)), n_heads=H, scale=SCALE)


def test_rel_attention_ingredients_dropout_offtpu_fallback_runs():
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_rel_attention_ingredients)

    rng = np.random.RandomState(12)
    P = 2 * S
    rw = jnp.asarray(rng.randn(B, S, H * DH), jnp.float32)
    rr = jnp.asarray(rng.randn(B, S, H * DH) * SCALE, jnp.float32)
    r = jnp.asarray(rng.randn(P, H * DH), jnp.float32)
    ed = jnp.zeros((B, H, S), jnp.float32)
    zmask = jnp.zeros((B, S, S), jnp.float32)
    out = fused_rel_attention_ingredients(
        rw, rr, r, rw, rw, ed, zmask, zmask, n_heads=H, scale=SCALE,
        dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(0),
        deterministic=False)
    assert out.shape == (B, S, H * DH)
    assert np.isfinite(np.asarray(out)).all()
    base = fused_rel_attention_ingredients(
        rw, rr, r, rw, rw, ed, zmask, zmask, n_heads=H, scale=SCALE)
    ratio = float(jnp.mean(jnp.abs(out)) / jnp.mean(jnp.abs(base)))
    assert 0.5 < ratio < 2.0, ratio


@pytest.mark.parametrize("rel_bias_impl", ["stream", "inkernel"])
def test_xlnet_model_fused_equals_einsum_deterministic(rel_bias_impl):
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        MultimodalConfig, XLNetConfig)
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification)

    cfg = XLNetConfig.tiny(vocab_size=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=1)
    rng = np.random.RandomState(8)
    batch, seq = 4, 12
    ids = jnp.asarray(rng.randint(0, 64, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask_np = np.ones((batch, seq), np.int32)
    mask_np[1, :4] = 0                      # XLNet left-pads
    mask = jnp.asarray(mask_np)
    seg = jnp.zeros((batch, seq), jnp.int32)

    m_ein = MagXLNetForSequenceClassification(cfg, mm, visual_dim=5,
                                              acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    cfg_f = dataclasses.replace(cfg, attention_impl="fused",
                                rel_bias_impl=rel_bias_impl)
    m_fus = MagXLNetForSequenceClassification(cfg_f, mm, visual_dim=5,
                                              acoustic_dim=7)
    out_e = m_ein.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    out_f = m_fus.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


def test_rel_fits_hb_ranges():
    """The rel-bias kernels get the same head-blocked extension as the
    packed ones; K includes mems, so long memory also routes through the
    fit gates (before these gates the XLNet fused dispatch would FAIL TO
    COMPILE at S=512 — same scoped-VMEM OOM as the packed kernel)."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _resolve_rel_hb, fused_rel_attention_fits,
        fused_rel_attention_fits_hb)

    assert fused_rel_attention_fits(12, 50, 50, 768)
    assert not fused_rel_attention_fits(12, 512, 512, 768)
    assert fused_rel_attention_fits_hb(12, 512, 512, 768)
    assert _resolve_rel_hb(12, 512, 512, 768, 2) == 2
    # the streamed ebias/debias blocks cap the reach earlier than the
    # packed kernels (S=768) and long mems exceed it at S=512 — both
    # fall back to the einsum path via the model gate
    assert not fused_rel_attention_fits_hb(12, 768, 768, 768)
    assert not fused_rel_attention_fits_hb(12, 512, 1024, 768)


def test_rel_head_blocked_matches_einsum_and_full(monkeypatch):
    B2, S2 = 3, 40
    D = H * DH
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(B2, S2, D), jnp.float32)
    k = jnp.asarray(rng.randn(B2, S2, D), jnp.float32)
    v = jnp.asarray(rng.randn(B2, S2, D), jnp.float32)
    eb = jnp.asarray(rng.randn(B2, H, S2, S2) * 0.3, jnp.float32)

    def rel_ref(q_, k_, v_, eb_):
        qh = q_.reshape(B2, S2, H, DH)
        kh = k_.reshape(B2, S2, H, DH)
        vh = v_.reshape(B2, S2, H, DH)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(score * SCALE + eb_, axis=-1)
        return jnp.einsum("bhqk,bkhf->bqhf", probs.astype(q_.dtype),
                          vh).reshape(B2, S2, D)

    def loss_ref(q_, k_, v_, eb_):
        return jnp.sum(jnp.tanh(rel_ref(q_, k_, v_, eb_)))

    def loss_new(q_, k_, v_, eb_):
        return jnp.sum(jnp.tanh(fused_rel_attention(
            q_, k_, v_, eb_, n_heads=H, scale=SCALE)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, eb)
    g_full = jax.grad(loss_new, argnums=(0, 1, 2, 3))(q, k, v, eb)

    from bert_multimodal_transformer_tpu.ops import fused_attention as fa
    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "700000")
    assert not fa.fused_rel_attention_fits(H, S2, S2, D, 4, 4)
    assert fa._resolve_rel_hb(H, S2, S2, D, 4, 4) == 2
    g_hb = jax.grad(loss_new, argnums=(0, 1, 2, 3))(q, k, v, eb)
    for name, a, b_full, b_hb in zip("qkve", gr, g_full, g_hb):
        np.testing.assert_allclose(np.asarray(b_hb), np.asarray(a),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"d{name} vs einsum")
        # vs the full-H kernel the head-blocked grid is bit-identical
        np.testing.assert_allclose(np.asarray(b_hb), np.asarray(b_full),
                                   atol=0, rtol=0,
                                   err_msg=f"d{name} vs full kernel")


def _xlnet_hb_geometry():
    """XLNet geometry whose d_head=64 admits head-blocking (the tiny
    preset's d_head=16 never can: hb·16 is not a 128-lane multiple for
    any hb ≤ n_head)."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import XLNetConfig

    return dataclasses.replace(XLNetConfig.tiny(vocab_size=64),
                               d_model=256, n_head=4, d_inner=128)


@pytest.mark.parametrize("budget,expect_fused",
                         [("300000", True), ("50000", False)])
def test_xlnet_model_head_blocked_and_beyond_fit(monkeypatch, budget,
                                                 expect_fused):
    """Model-level: under a budget where only the head-blocked rel
    kernel fits, the fused XLNet must match einsum; under a budget where
    NOTHING fits, the gate must fall back to the einsum path (identical
    outputs) instead of failing to compile."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import MultimodalConfig
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification)
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    cfg = _xlnet_hb_geometry()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=1)
    rng = np.random.RandomState(8)
    batch, seq = 2, 12
    ids = jnp.asarray(rng.randint(0, 64, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask_np = np.ones((batch, seq), np.int32)
    mask_np[1, :4] = 0
    mask = jnp.asarray(mask_np)
    seg = jnp.zeros((batch, seq), jnp.int32)

    m_ein = MagXLNetForSequenceClassification(cfg, mm, visual_dim=5,
                                              acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    out_e = m_ein.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)

    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", budget)
    assert not fa.fused_rel_attention_fits(4, seq, seq, 256, 4, 4)
    assert (fa._resolve_rel_hb(4, seq, seq, 256, 4, 4)
            is not None) == expect_fused
    cfg_f = dataclasses.replace(cfg, attention_impl="fused")
    m_fus = MagXLNetForSequenceClassification(cfg_f, mm, visual_dim=5,
                                              acoustic_dim=7)
    out_f = m_fus.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["bi_data", "uni"])
def test_inkernel_ineligible_variants_fall_back_to_stream(variant):
    """bi_data (per-example position streams, k_head_r.ndim==4) and uni
    attention (P = K+1 < Q+K breaks the log-shift wraparound bound) must
    fall back to the streamed assembly under rel_bias_impl="inkernel"
    and still match the einsum path."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        MultimodalConfig, XLNetConfig)
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification)

    extra = {"bi_data": True} if variant == "bi_data" else {
        "attn_type": "uni"}
    cfg = dataclasses.replace(XLNetConfig.tiny(vocab_size=64), **extra)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=1)
    rng = np.random.RandomState(14)
    batch, seq = 4, 10
    ids = jnp.asarray(rng.randint(0, 64, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = jnp.ones((batch, seq), jnp.int32)
    seg = jnp.zeros((batch, seq), jnp.int32)

    m_ein = MagXLNetForSequenceClassification(cfg, mm, visual_dim=5,
                                              acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    out_e = m_ein.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    cfg_ik = dataclasses.replace(cfg, attention_impl="fused",
                                 rel_bias_impl="inkernel")
    m_ik = MagXLNetForSequenceClassification(cfg_ik, mm, visual_dim=5,
                                             acoustic_dim=7)
    out_ik = m_ik.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out_ik), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("rel_bias_impl", ["stream", "inkernel"])
def test_xlnet_model_fused_two_stream_equals_einsum(rel_bias_impl):
    """The query stream (perm_mask + target_mapping) goes through the
    same _rel_attn_core, so both fused bias impls must match einsum on
    the full two-stream forward."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        MultimodalConfig, XLNetConfig)
    from bert_multimodal_transformer_tpu.models.xlnet import MagXLNetModel

    cfg = XLNetConfig.tiny(vocab_size=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=1)
    rng = np.random.RandomState(13)
    batch, seq, m_ = 4, 12, 3
    ids = jnp.asarray(rng.randint(0, 64, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = jnp.ones((batch, seq), jnp.int32)
    seg = jnp.zeros((batch, seq), jnp.int32)
    tmap = np.zeros((batch, m_, seq), np.float32)
    for b_ in range(batch):
        for m in range(m_):
            tmap[b_, m, 2 * m] = 1.0
    perm = rng.rand(batch, seq, seq).round().astype(np.float32)

    m_ein = MagXLNetModel(cfg, mm, visual_dim=5, acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask,
                        token_type_ids=seg, perm_mask=jnp.asarray(perm),
                        target_mapping=jnp.asarray(tmap))["params"]
    kwargs = dict(attention_mask=mask, token_type_ids=seg,
                  perm_mask=jnp.asarray(perm),
                  target_mapping=jnp.asarray(tmap), deterministic=True)
    out_e, _ = m_ein.apply({"params": params}, ids, vis, aco, **kwargs)
    cfg_f = dataclasses.replace(cfg, attention_impl="fused",
                                rel_bias_impl=rel_bias_impl)
    m_fus = MagXLNetModel(cfg_f, mm, visual_dim=5, acoustic_dim=7)
    out_f, _ = m_fus.apply({"params": params}, ids, vis, aco, **kwargs)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("rel_bias_impl", ["stream", "inkernel"])
def test_xlnet_model_fused_grads_match_einsum(rel_bias_impl):
    """Training-mode grads, attention dropout forced to 0 so the streams
    agree; hidden dropouts share the rng."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        MultimodalConfig, XLNetConfig)
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification)

    cfg = dataclasses.replace(XLNetConfig.tiny(vocab_size=64), dropout=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.3,
                          injection_index=1)
    rng = np.random.RandomState(9)
    batch, seq = 4, 10
    ids = jnp.asarray(rng.randint(0, 64, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = jnp.ones((batch, seq), jnp.int32)
    seg = jnp.zeros((batch, seq), jnp.int32)
    labels = jnp.asarray(rng.randn(batch), jnp.float32)

    def make_loss(model):
        def loss_fn(params):
            logits = model.apply(
                {"params": params}, ids, vis, aco, attention_mask=mask,
                token_type_ids=seg, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean((logits.reshape(-1) - labels) ** 2)
        return loss_fn

    m_ein = MagXLNetForSequenceClassification(cfg, mm, visual_dim=5,
                                              acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    cfg_f = dataclasses.replace(cfg, attention_impl="fused",
                                rel_bias_impl=rel_bias_impl)
    m_fus = MagXLNetForSequenceClassification(cfg_f, mm, visual_dim=5,
                                              acoustic_dim=7)
    le, ge = jax.value_and_grad(make_loss(m_ein))(params)
    lf, gf = jax.value_and_grad(make_loss(m_fus))(params)
    np.testing.assert_allclose(float(lf), float(le), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ge),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


def test_batch_not_divisible_by_eight_covers_all_rows():
    """Regression: _pick_nb clamps to 8 AFTER finding a divisor; with
    b=12 the old order picked nb=8 → grid of 1 → rows 8-11 never
    written."""
    rng = np.random.RandomState(12)
    b = 12
    q = jnp.asarray(rng.randn(b, H, S, DH), jnp.float32)
    k = jnp.asarray(rng.randn(b, H, S, DH), jnp.float32)
    v = jnp.asarray(rng.randn(b, H, S, DH), jnp.float32)
    ref = dot_product_attention(q, k, v, None, scale=SCALE)
    out = fused_attention(q, k, v, None, scale=SCALE)
    np.testing.assert_allclose(np.asarray(out[8:]), np.asarray(ref[8:]),
                               atol=1e-6, rtol=1e-6)
    qkv = _pack(q, k, v)
    out_p = fused_attention_packed(qkv, None, n_heads=H, scale=SCALE)
    ref_p = jnp.moveaxis(ref, 1, 2).reshape(b, S, H * DH)
    np.testing.assert_allclose(np.asarray(out_p[8:]),
                               np.asarray(ref_p[8:]),
                               atol=1e-6, rtol=1e-6)


def test_nb_picker_accounts_for_scratch():
    """The head-batched [H,S,S] f32 scratches are per-program VMEM; the
    nb pickers must subtract them from the budget BEFORE the per-row
    division, or long-seq shapes that fit pre-restructure now exceed
    VMEM (review finding). At S=256/H=12 the recompute-bwd scratch pair
    is ~6.3 MB — more than half the 12 MB budget."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _pick_nb, _pick_nb_packed, _scratch_bytes)

    s, h, dh, b = 128, 12, 64, 256
    scratch2 = _scratch_bytes(h, s, s, 2)
    assert scratch2 == 2 * h * 128 * 128 * 4
    nb_without = _pick_nb(b, 7, h, s, dh)
    nb_with = _pick_nb(b, 7, h, s, dh, fixed_bytes=scratch2)
    assert nb_with <= nb_without
    # the block estimate must fit the reduced budget (or floor at 1 row)
    block = h * s * max(dh, 128) * 2
    assert (nb_with == 1
            or 2 * 7 * block * nb_with + scratch2 <= 12 * 1024 * 1024)
    # a scratch bigger than half the budget must shrink nb vs before
    big = _scratch_bytes(h, 256, 256, 2)                 # ~6.3 MB
    assert _pick_nb_packed(b, 512 * 1024, fixed_bytes=big) < \
        _pick_nb_packed(b, 512 * 1024, fixed_bytes=0)
    assert _pick_nb_packed(b, 10 * 1024 * 1024,
                           fixed_bytes=4 * 1024 * 1024) == 1
    assert _pick_nb_packed(b, 1024, fixed_bytes=0) == 8


def test_dropout_requires_rng():
    q, k, v, mask = _inputs()
    with pytest.raises(ValueError):
        fused_attention(q, k, v, mask, scale=SCALE, dropout_rate=0.1,
                        deterministic=False)


def test_dropout_offtpu_fallback_matches_einsum_stream():
    # Off-TPU the dropout path routes to dot_product_attention with the
    # same rng — exact equality documents the fallback.
    q, k, v, mask = _inputs()
    key = jax.random.PRNGKey(11)
    out = fused_attention(q, k, v, mask, scale=SCALE, dropout_rate=0.25,
                          dropout_rng=key, deterministic=False)
    ref = dot_product_attention(
        q, k, v, extended_attention_mask(mask), scale=SCALE,
        dropout_rate=0.25, dropout_rng=key, deterministic=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_full_model_fused_equals_einsum_deterministic():
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)

    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    rng = np.random.RandomState(3)
    batch = 4
    seq = 20
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = np.ones((batch, seq), np.int32)
    mask[1, 15:] = 0
    mask = jnp.asarray(mask)
    seg = jnp.zeros((batch, seq), jnp.int32)

    m_ein = MagBertForSequenceClassification(cfg, mm, visual_dim=5,
                                             acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    cfg_f = dataclasses.replace(cfg, attention_impl="fused")
    m_fus = MagBertForSequenceClassification(cfg_f, mm, visual_dim=5,
                                             acoustic_dim=7)
    out_e = m_ein.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    out_f = m_fus.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=1e-5, rtol=1e-5)


def test_full_model_fused_train_step_runs_and_grads_match():
    """Training-mode grads through the fused path == einsum path when the
    attention-prob dropout rate is 0 (hidden dropout still active, same
    rng stream for both models)."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)

    cfg = dataclasses.replace(BertConfig.tiny(),
                              attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    rng = np.random.RandomState(4)
    batch, seq = 4, 16
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(batch, seq, 5), jnp.float32)
    aco = jnp.asarray(rng.randn(batch, seq, 7), jnp.float32)
    mask = jnp.ones((batch, seq), jnp.int32)
    seg = jnp.zeros((batch, seq), jnp.int32)
    labels = jnp.asarray(rng.randn(batch), jnp.float32)

    def make_loss(model):
        def loss_fn(params):
            logits = model.apply(
                {"params": params}, ids, vis, aco, attention_mask=mask,
                token_type_ids=seg, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(9)})
            return jnp.mean((logits.reshape(-1) - labels) ** 2)
        return loss_fn

    m_ein = MagBertForSequenceClassification(cfg, mm, visual_dim=5,
                                             acoustic_dim=7)
    params = m_ein.init(jax.random.PRNGKey(0), ids, vis, aco, mask, seg)[
        "params"]
    cfg_f = dataclasses.replace(cfg, attention_impl="fused")
    m_fus = MagBertForSequenceClassification(cfg_f, mm, visual_dim=5,
                                             acoustic_dim=7)

    le, ge = jax.value_and_grad(make_loss(m_ein))(params)
    lf, gf = jax.value_and_grad(make_loss(m_fus))(params)
    np.testing.assert_allclose(float(lf), float(le), atol=1e-5, rtol=1e-5)
    flat_e = jax.tree_util.tree_leaves(ge)
    flat_f = jax.tree_util.tree_leaves(gf)
    for a, b in zip(flat_e, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# QKV-projection mega-fusion (fused_attention_qkvproj)
# ---------------------------------------------------------------------------

def _qkvproj_inputs(seed=0):
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_qkvproj)  # noqa: F401  (import check)

    d = H * DH
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(d, 3 * d) / np.sqrt(d), jnp.float32)
    b3 = jnp.asarray(rng.randn(3 * d) * 0.01, jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, 40:] = 0
    return x, w, b3, jnp.asarray(mask)


def _qkvproj_split_loss(x, w, b3, mask):
    qkv = (jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(x.dtype) + b3.astype(x.dtype))
    out = fused_attention_packed(qkv, mask, n_heads=H, scale=SCALE)
    return jnp.sum(out.astype(jnp.float32) ** 2)


@pytest.mark.parametrize("qkv_residual", [False, True])
def test_qkvproj_matches_split_fwd_and_grads(qkv_residual):
    """The in-kernel projection (both backward variants: recompute-qkv
    and saved-qkv) must match the split XLA-gemm + packed-kernel
    structure in value and in all three gradients."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_qkvproj)

    x, w, b3, mask = _qkvproj_inputs()

    def fused_loss(x, w, b3):
        out = fused_attention_qkvproj(x, w, b3, mask, n_heads=H,
                                      scale=SCALE,
                                      qkv_residual=qkv_residual)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    ls, gs = jax.value_and_grad(
        lambda *a: _qkvproj_split_loss(*a, mask), argnums=(0, 1, 2))(
            x, w, b3)
    lf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(x, w, b3)
    np.testing.assert_allclose(float(ls), float(lf), rtol=1e-6)
    for name, a, b in zip("x w b3".split(), gs, gf):
        rd = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert rd < 1e-5, (name, rd)


def test_qkvproj_shape_validation():
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_attention_qkvproj)

    x, w, b3, mask = _qkvproj_inputs()
    with pytest.raises(ValueError, match="qkv kernel"):
        fused_attention_qkvproj(x, w[:, :-1], b3, mask, n_heads=H,
                                scale=SCALE)
    with pytest.raises(ValueError, match="qkv bias"):
        fused_attention_qkvproj(x, w, b3[:-1], mask, n_heads=H,
                                scale=SCALE)
    with pytest.raises(ValueError, match="divisible"):
        fused_attention_qkvproj(x, w, b3, mask, n_heads=7, scale=SCALE)


def test_qkvproj_model_level_parity():
    """MagBert with qkv_fusion on/off: identical param trees (the
    _DenseParams module reproduces nn.Dense's names/shapes/init, so
    checkpoints and converters are unaffected) and identical logits."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig, MultimodalConfig)
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification)

    cfg = dataclasses.replace(BertConfig.tiny(vocab_size=64),
                              attention_impl="fused",
                              hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 64, (4, 12)).astype(np.int32)
    vis = rng.randn(4, 12, 3).astype(np.float32)
    ac = rng.randn(4, 12, 5).astype(np.float32)

    models = {
        qf: MagBertForSequenceClassification(
            dataclasses.replace(cfg, qkv_fusion=qf, qkv_residual=qf),
            mm, visual_dim=3, acoustic_dim=5)
        for qf in (False, True)
    }
    variables = models[False].init(jax.random.PRNGKey(0), ids, vis, ac)
    var_fused = models[True].init(jax.random.PRNGKey(0), ids, vis, ac)
    for (pa, la), lb in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves(var_fused)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(pa))

    out_split = models[False].apply(variables, ids, vis, ac,
                                    deterministic=True)
    out_fused = models[True].apply(variables, ids, vis, ac,
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_split), atol=1e-5)


# -- flash-streamed (fs) tier: the dropout-preserving long-seq kernels ------

FS_B, FS_H, FS_S, FS_DH = 2, 2, 256, 64
FS_D = FS_H * FS_DH
FS_SCALE = 1.0 / FS_DH ** 0.5


def _fs_inputs(seed=0):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(FS_B, FS_S, 3 * FS_D).astype(np.float32))
    mask = np.ones((FS_B, FS_S), np.int32)
    mask[0, -40:] = 0
    g = jnp.asarray(rng.randn(FS_B, FS_S, FS_D).astype(np.float32))
    return qkv, jnp.asarray(mask), g


def _fs_ref(qkv, mask):
    q, k, v = [jnp.moveaxis(
        qkv.reshape(FS_B, FS_S, 3, FS_H, FS_DH)[:, :, i], 2, 1)
        for i in range(3)]
    ctx = dot_product_attention(q, k, v, extended_attention_mask(mask),
                                scale=FS_SCALE)
    return jnp.moveaxis(ctx, 1, 2).reshape(FS_B, FS_S, FS_D)


@pytest.mark.parametrize("qb,kb", [(128, 128), (128, 256), (256, 128),
                                   (256, 256)])
def test_fs_matches_einsum_all_blockings(qb, kb):
    """Online-softmax recurrence + grid-revisited dk/dv accumulation at
    every (q-block, k-block) shape, fp32 interpret mode: fwd and grads
    must match the whole-row softmax reference to fp32 precision."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _fused_attention_packed_fs)

    qkv, mask, g = _fs_inputs()
    bias = ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, :]
    seed = jnp.zeros((1, 1), jnp.int32)

    def fs(x):
        return _fused_attention_packed_fs(x, bias, seed, float(FS_SCALE),
                                          0.0, FS_H, 2, qb, kb, True)

    np.testing.assert_allclose(np.asarray(fs(qkv)),
                               np.asarray(_fs_ref(qkv, mask)),
                               atol=2e-5, rtol=2e-5)
    dref = jax.grad(lambda x: jnp.vdot(_fs_ref(x, mask), g))(qkv)
    dfs = jax.grad(lambda x: jnp.vdot(fs(x), g))(qkv)
    np.testing.assert_allclose(np.asarray(dfs), np.asarray(dref),
                               atol=3e-5, rtol=3e-5)


def test_fs_plan_resolution():
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    # min 128-lane-aligned head block: dh=64 -> hb=2; off-TPU the first
    # (qb, kb) candidate is used
    assert fa._resolve_fs_plan(8, 12, 768, 768, 2) == (2, 256, 256)
    assert fa._resolve_fs_plan(8, 12, 1024, 768, 2) == (2, 256, 512)
    # S not divisible by 128 -> no fs tier
    assert fa._resolve_fs_plan(8, 12, 700, 768, 2) is None
    # no 128-aligned head block (dh=16, n_heads=2 -> hb=8 impossible)
    assert fa._resolve_fs_plan(8, 2, 256, 32, 2) is None
    assert fa.fused_attention_fits_fs(12, 1024, 768, 2, batch=8)
    assert not fa.fused_attention_fits_fs(12, 700, 768, 2, batch=8)


def test_fs_probe_walk(monkeypatch):
    """On TPU the (qb, kb) choice is compile-verified best-first: if the
    big blocks fail to compile the plan walks to smaller ones, and a
    geometry where nothing compiles reports no-fit."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = []

    def fake(pass_name, s, d, n_heads, hb, qb, kb, rate, scale, dtype):
        calls.append((pass_name, qb, kb))
        return (qb, kb) == (128, 128)

    monkeypatch.setattr(fa, "_probe_enabled", lambda: True)
    monkeypatch.setattr(fa, "_fs_kernel_compiles", fake)
    assert fa._resolve_fs_plan(8, 12, 512, 768, 2) == (2, 128, 128)
    assert ("fwd", 256, 512) in calls  # best candidate tried first
    monkeypatch.setattr(fa, "_fs_kernel_compiles",
                        lambda *a, **k: False)
    assert fa._resolve_fs_plan(8, 12, 512, 768, 2) is None
    assert not fa.fused_attention_fits_fs(12, 512, 768, 2, batch=8)


def test_packed_dispatch_routes_to_fs(monkeypatch):
    """When neither the full-H kernel nor a head-blocked plan fits, the
    packed entry must land on the flash-streamed tier (not raise) and
    still match the reference."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    qkv, mask, _ = _fs_inputs()
    monkeypatch.setattr(fa, "fused_attention_fits",
                        lambda *a, **k: False)
    monkeypatch.setattr(fa, "_resolve_hb_plan", lambda *a, **k: None)
    out = fa.fused_attention_packed(qkv, mask, n_heads=FS_H,
                                    scale=FS_SCALE)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_fs_ref(qkv, mask)),
                               atol=2e-5, rtol=2e-5)
    # beyond even the fs tier the entry degrades to einsum math (warns)
    monkeypatch.setattr(fa, "_resolve_fs_plan", lambda *a, **k: None)
    with pytest.warns(UserWarning, match="falling back to einsum"):
        out = fa.fused_attention_packed(qkv, mask, n_heads=FS_H,
                                        scale=FS_SCALE)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_fs_ref(qkv, mask)),
                               atol=1e-5, rtol=1e-5)


# -- rel flash-streamed tier (XLNet long-seq / long-mems) --------------------

RF_B, RF_Q, RF_K, RF_H, RF_DH = 2, 256, 384, 2, 64   # K>Q: mems asymmetry
RF_D = RF_H * RF_DH
RF_SCALE = 1.0 / RF_DH ** 0.5


def _rel_fs_inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(RF_B, RF_Q, RF_D).astype(np.float32))
    k = jnp.asarray(rng.randn(RF_B, RF_K, RF_D).astype(np.float32))
    v = jnp.asarray(rng.randn(RF_B, RF_K, RF_D).astype(np.float32))
    eb = jnp.asarray((rng.randn(RF_B, RF_H, RF_Q, RF_K) * 0.5)
                     .astype(np.float32))
    g = jnp.asarray(rng.randn(RF_B, RF_Q, RF_D).astype(np.float32))
    return q, k, v, eb, g


def _rel_fs_ref(q, k, v, eb):
    qh = q.reshape(RF_B, RF_Q, RF_H, RF_DH)
    kh = k.reshape(RF_B, RF_K, RF_H, RF_DH)
    vh = v.reshape(RF_B, RF_K, RF_H, RF_DH)
    s = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * RF_SCALE + eb
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhf->bqhf", p, vh).reshape(RF_B, RF_Q, RF_D)


@pytest.mark.parametrize("qb,kb", [(128, 128), (256, 128)])
def test_rel_fs_matches_einsum(qb, kb):
    """Rel flash-streamed fwd + ALL four grads (incl. the differentiable
    ebias cotangent) vs the whole-row softmax reference, fp32 interpret
    mode, asymmetric Q/K (mems)."""
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        _fused_rel_attention_fs)

    q, k, v, eb, g = _rel_fs_inputs()
    seed = jnp.zeros((1, 1), jnp.int32)

    def fs(q_, k_, v_, eb_):
        return _fused_rel_attention_fs(q_, k_, v_, eb_, seed,
                                       float(RF_SCALE), 0.0, RF_H, 2,
                                       qb, kb, True)

    np.testing.assert_allclose(np.asarray(fs(q, k, v, eb)),
                               np.asarray(_rel_fs_ref(q, k, v, eb)),
                               atol=2e-5, rtol=2e-5)
    dref = jax.grad(lambda *a: jnp.vdot(_rel_fs_ref(*a), g),
                    argnums=(0, 1, 2, 3))(q, k, v, eb)
    dfs = jax.grad(lambda *a: jnp.vdot(fs(*a), g),
                   argnums=(0, 1, 2, 3))(q, k, v, eb)
    for a, b in zip(dref, dfs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-5)


def test_rel_fs_plan_and_dispatch(monkeypatch):
    """Plan resolution honors Q/K divisibility separately, and the
    public entry lands on the fs tier when the hb plan is unavailable
    (long mems) instead of raising."""
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    assert fa._resolve_rel_fs_plan(8, 12, 512, 1024, 768, 2) \
        == (2, 256, 512)
    assert fa._resolve_rel_fs_plan(8, 12, 512, 592, 768, 2) is None
    assert fa.fused_rel_attention_fits_fs(12, 512, 1024, 768, 2, 2,
                                          batch=8)

    q, k, v, eb, _ = _rel_fs_inputs()
    monkeypatch.setattr(fa, "fused_rel_attention_fits",
                        lambda *a, **kw: False)
    monkeypatch.setattr(fa, "_resolve_rel_hb_plan",
                        lambda *a, **kw: None)
    out = fa.fused_rel_attention(q, k, v, eb, n_heads=RF_H,
                                 scale=RF_SCALE)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_rel_fs_ref(q, k, v, eb)),
                               atol=2e-5, rtol=2e-5)
    # beyond even the fs tier the entry degrades to einsum math (warns)
    monkeypatch.setattr(fa, "_resolve_rel_fs_plan",
                        lambda *a, **kw: None)
    with pytest.warns(UserWarning, match="falling back to einsum"):
        out = fa.fused_rel_attention(q, k, v, eb, n_heads=RF_H,
                                     scale=RF_SCALE)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_rel_fs_ref(q, k, v, eb)),
                               atol=1e-5, rtol=1e-5)


def test_rel_fs_probe_walk(monkeypatch):
    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    calls = []

    def fake(pass_name, q_len, k_len, d, n_heads, hb, qb, kb, rate,
             scale, dtype, eb_dtype):
        calls.append((pass_name, qb, kb))
        return (qb, kb) == (128, 128)

    monkeypatch.setattr(fa, "_probe_enabled", lambda: True)
    monkeypatch.setattr(fa, "_rel_fs_kernel_compiles", fake)
    assert fa._resolve_rel_fs_plan(8, 12, 512, 512, 768, 2) \
        == (2, 128, 128)
    assert ("fwd", 256, 512) in calls
    monkeypatch.setattr(fa, "_rel_fs_kernel_compiles",
                        lambda *a, **kw: False)
    assert fa._resolve_rel_fs_plan(8, 12, 512, 512, 768, 2) is None


@pytest.mark.parametrize("geom", [
    # (S, K, P, qb, kb): K=S (no mems) multi-block, and K>S (mems-like)
    (256, 256, 512, 128, 128),
    (128, 384, 512, 128, 128),
])
def test_rel_attention_ingredients_fs_matches_assembled(geom):
    # The ingredients FLASH-STREAMED tier (bd assembled per (qb, kb)
    # block from a dynamically-sliced position window + per-row
    # log-shift) vs the einsum score assembly, incl. grads for all six
    # differentiable inputs — notably d_r (window accumulator + one
    # dynamic-start accumulate per program, revisited across rows AND
    # q-blocks on the head-outermost backward grid) and the
    # segment-delta d_ed. Forced via tier="fs"/fs_plan so the small CPU
    # geometry exercises multi-q-block, multi-k-block streaming.
    from bert_multimodal_transformer_tpu.models.xlnet import rel_shift
    from bert_multimodal_transformer_tpu.ops.fused_attention import (
        fused_rel_attention_ingredients)

    S_, K, P, qb, kb = geom
    H_, DH_ = 4, 32
    B_ = 2
    scale = 1.0 / DH_ ** 0.5
    hb = 4                                          # _fs_min_hb(4, 32)
    rng = np.random.RandomState(17)
    rw = jnp.asarray(rng.randn(B_, S_, H_ * DH_), jnp.float32)
    rr = jnp.asarray(rng.randn(B_, S_, H_ * DH_) * scale, jnp.float32)
    r = jnp.asarray(rng.randn(P, H_ * DH_), jnp.float32)
    k = jnp.asarray(rng.randn(B_, K, H_ * DH_), jnp.float32)
    v = jnp.asarray(rng.randn(B_, K, H_ * DH_), jnp.float32)
    ed = jnp.asarray(rng.randn(B_, H_, S_) * scale, jnp.float32)
    segd = jnp.asarray(rng.randint(0, 2, (B_, S_, K)), jnp.float32)
    maskb = jnp.asarray(-1e9 * (rng.rand(B_, S_, K) < 0.1), jnp.float32)

    def f_ref(rw_, rr_, r_, k_, v_, ed_):
        bd = jnp.einsum("bqhf,phf->bhqp", rr_.reshape(B_, S_, H_, DH_),
                        r_.reshape(P, H_, DH_))
        ebias = rel_shift(bd, K) + ed_[:, :, :, None] * segd[:, None] \
            + maskb[:, None]
        qh = rw_.reshape(B_, S_, H_, DH_)
        kh = k_.reshape(B_, K, H_, DH_)
        vh = v_.reshape(B_, K, H_, DH_)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh) * scale + ebias
        probs = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs, vh)
        return jnp.sum(jnp.tanh(ctx.reshape(B_, S_, H_ * DH_)))

    def f_new(rw_, rr_, r_, k_, v_, ed_):
        return jnp.sum(jnp.tanh(fused_rel_attention_ingredients(
            rw_, rr_, r_, k_, v_, ed_, segd, maskb, n_heads=H_,
            scale=scale, tier="fs", fs_plan=(hb, qb, kb))))

    argnums = (0, 1, 2, 3, 4, 5)
    vr, gr = jax.value_and_grad(f_ref, argnums=argnums)(rw, rr, r, k, v,
                                                        ed)
    vn, gn = jax.value_and_grad(f_new, argnums=argnums)(rw, rr, r, k, v,
                                                        ed)
    np.testing.assert_allclose(float(vn), float(vr), rtol=1e-5)
    for name, a, b in zip(("rw", "rr", "r", "k", "v", "ed"), gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-5, err_msg=name)


def test_relik_fs_plan_resolution_offtpu():
    import bert_multimodal_transformer_tpu.ops.fused_attention as fa

    # xlnet-base Q=K=2048 bi geometry: first candidates off-TPU
    assert fa._resolve_relik_fs_plan(4, 12, 2048, 2048, 4096, 768, 2) \
        == (2, 256, 512)
    # P < Q+K (uni position stream) is out of reach by construction
    assert fa._resolve_relik_fs_plan(4, 12, 2048, 2048, 2049, 768, 2) \
        is None


def test_rel_attention_ingredients_auto_dispatches_past_full_fit():
    # tier=None must route a geometry whose full-H row cannot fit
    # scoped VMEM onto the fs kernels (not the full-H kernel) — the
    # arithmetic gate is fused_rel_attention_fits, mirrored here.
    import bert_multimodal_transformer_tpu.ops.fused_attention as fa

    assert not fa.fused_rel_attention_fits(12, 2048, 2048, 768, 2, 2)
    assert fa.fused_rel_attention_ingredients_fits_fs(
        12, 2048, 2048, 4096, 768, 2)
