"""Fused short-sequence attention Pallas kernel (softmax + prob-dropout
in VMEM, recompute backward).

Motivation (BENCHMARKS.md, NOTES_ROUND1.md gaps 3-4): at the reference's
geometry (seq 50, reference multimodal_driver.py:38) the einsum attention
path materializes per-layer [B, H, S, S] tensors in HBM three times over —
fp32 softmax probs saved for backward, the bf16 cast of the probs, and the
dropout keep-mask (HF BertSelfAttention semantics, attention-prob dropout,
vendored via reference bert.py:17). At batch 256 that is ~50 MB × 12
layers of write-then-read traffic per step plus the RNG cost of
generating 92M dropout bits with the XLA PRNG.

This kernel keeps the whole attention chain for one (batch row, all heads)
VMEM-resident:

  scores = (Q·Kᵀ)·scale + mask-bias   (fp32 on the MXU)
  probs  = softmax(scores)            (fp32, VPU)
  probs  = dropout(probs)             (TPU hardware PRNG, in-register)
  out    = probs·V                    (bf16 MXU pass, fp32 accumulate)

and the backward kernel *recomputes* probs (flash-attention-style) from
the same Q/K/V + the replayed PRNG stream instead of loading saved probs:
nothing of size [B, H, S, S] ever exists in HBM, in either pass. The
dropout mask replay works because Pallas' per-core PRNG is deterministic
given the seed: both kernels seed with (seed + batch_index) and generate
head-order-identical (S, S) draws.

Scope: S must fit in VMEM alongside H·S·Dh blocks (true for S up to ~1k
at bert-base geometry). Semantics match ops.attention.dot_product_attention
exactly when dropout is off (same op order, fp32 softmax, bf16 PV matmul);
with dropout on, the keep-mask distribution is identical (P(keep)=1-rate)
but the stream is the hardware PRNG, not jax.random — the reference fixes
no dropout stream either (torch CUDA RNG, reference multimodal_driver.py
:299-308 seeds it but the stream differs from ours regardless).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_threshold(rate: float) -> int:
    """uint32 threshold t such that P(bits >= t) = 1 - rate."""
    return min(int(round(rate * 4294967296.0)), 4294967295)


def _vmem_budget() -> int:
    """Per-program scoped-VMEM budget the kernels plan against. The XLA
    TPU scoped-vmem limit defaults to 16 MB (a kernel whose stack
    allocation exceeds it fails to COMPILE); plan to 15 MB for padding
    slack. Overridable for tests / tuned deployments via
    FUSED_ATTN_VMEM_BUDGET (bytes)."""
    return int(os.environ.get("FUSED_ATTN_VMEM_BUDGET",
                              15 * 1024 * 1024))


def fused_attention_fits(n_heads: int, s: int, d: int,
                         itemsize: int = 2) -> bool:
    """Whether the full-H short-seq fused kernels can compile at this
    geometry: the minimal-footprint mode (nb=1, recompute backward) of
    BOTH passes must fit the scoped-VMEM budget — fwd = one [H,S,S] f32
    score scratch plus the double-buffered qkv/out rows; bwd = TWO
    scratches plus the qkv/g/dqkv rows (the bwd check is what actually
    binds: it fails ~100 rows of S before the fwd does, and a fwd-only
    check would route S≈400-470 train steps onto a backward that cannot
    compile). The whole-row VMEM softmax is a short-sequence design;
    beyond ~S=370 at bert-base bf16 the packed entry head-blocks its
    grid instead (fused_attention_fits_hb), and beyond every fit callers
    fall back (flash for the dropout-free path, einsum otherwise) —
    models/bert.py does this. Measured: S=512 b32 eval failed to compile
    with a 20.41 MB stack allocation before this guard (BENCHMARKS.md
    "Long-sequence scaling")."""
    sub = (s + 15) // 16 * 16
    row_f = sub * 3 * d * itemsize + sub * d * itemsize
    row_b = 2 * sub * 3 * d * itemsize + sub * d * itemsize
    budget = _vmem_budget()
    return (_scratch_bytes(n_heads, s, s) + 2 * row_f <= budget
            and _scratch_bytes(n_heads, s, s, 2) + 2 * row_b <= budget)


def _hb_row_bytes(s: int, hb: int, dh: int, n_arrays: int,
                  itemsize: int) -> int:
    """Per-row VMEM of ``n_arrays`` [S, hb·Dh] column blocks
    (sublane/lane padded) used by the head-blocked packed kernels."""
    sub = (s + 15) // 16 * 16
    lane = (hb * dh + 127) // 128 * 128
    return n_arrays * sub * lane * itemsize


def _resolve_hb(n_heads: int, s: int, d: int, itemsize: int):
    """Head-block size for the head-blocked packed kernels: the largest
    divisor of ``n_heads`` whose forward AND recompute-backward programs
    fit the scoped-VMEM budget at nb=1 (scratch is [hb,S,S] f32 — one
    per pass fwd, two bwd — plus the double-buffered [S, hb·Dh] q/k/v/
    g/grad column blocks). hb·Dh must be a 128-lane multiple (Mosaic
    block rule on the minor axis), so at Dh=64 the candidates are the
    even divisors. Returns None when no head-block fits — callers fall
    back to flash (dropout-free) or einsum. ``FUSED_ATTN_HB`` overrides
    for tuning (must divide n_heads and fit)."""
    dh = d // n_heads
    budget = _vmem_budget()

    def fits(hb):
        if (hb * dh) % 128 != 0:
            return False
        fwd = (_scratch_bytes(hb, s, s)
               + 2 * _hb_row_bytes(s, hb, dh, 4, itemsize))
        bwd = (_scratch_bytes(hb, s, s, 2)
               + 2 * _hb_row_bytes(s, hb, dh, 7, itemsize))
        return fwd <= budget and bwd <= budget

    if "FUSED_ATTN_HB" in os.environ:
        hb = int(os.environ["FUSED_ATTN_HB"])
        if hb < 1 or n_heads % hb != 0:
            raise ValueError(
                f"FUSED_ATTN_HB={hb} must divide n_heads={n_heads}")
        return hb if fits(hb) else None
    for hb in range(n_heads, 0, -1):
        if n_heads % hb == 0 and fits(hb):
            return hb
    return None


def fused_attention_fits_hb(n_heads: int, s: int, d: int,
                            itemsize: int = 2, *,
                            batch: Optional[int] = None,
                            rate: float = 0.1,
                            scale: float = 1.0,
                            dtype=None) -> bool:
    """Whether ANY packed fused variant can compile at this geometry:
    the full-H kernel (``fused_attention_fits``) or the head-blocked
    grid (grid dim over H//hb head blocks, [hb,S,S] scratch per
    program). Head-blocking carries the fused path deep into the
    long-seq regime (S=640 at bert-base bf16 with the compile-verified
    plan); beyond, callers degrade to flash (dropout-free) or einsum.
    models/bert.py's non-TP packed dispatch gates on this; the TP and
    qkvproj paths still require the full-H fit (split kernels /
    in-kernel projection).

    On TPU the head-blocked answer is COMPILE-VERIFIED (``
    _resolve_hb_plan`` — see the probe note above): pass ``batch``/
    ``rate``/``scale``/``dtype`` so the probe compiles the exact
    production kernel; the defaults probe a representative train-mode
    configuration."""
    if fused_attention_fits(n_heads, s, d, itemsize):
        return True
    return _resolve_hb_plan(
        batch if batch is not None else 8, n_heads, s, d, itemsize,
        rate=rate, scale=scale,
        dtype=dtype if dtype is not None else jnp.bfloat16) is not None


def fused_rel_attention_fits(n_heads: int, q_len: int, k_len: int,
                             d: int, itemsize: int = 2,
                             eb_itemsize: int = 2) -> bool:
    """Whether the full-H rel-bias kernels (XLNet) can compile at this
    geometry: minimal-footprint mode (nb=1, recompute backward) — the
    [H,Q,K] f32 score scratch (one fwd, two bwd) plus the double-
    buffered q/k/v/g/grad rows and the streamed ebias/debias blocks —
    must fit the scoped-VMEM budget. k_len includes mems, so long
    memory ALSO outgrows the fit, not just long sequences."""
    budget = _vmem_budget()
    subq = (q_len + 15) // 16 * 16
    subk = (k_len + 15) // 16 * 16
    lane_k = (k_len + 127) // 128 * 128
    eb = n_heads * subq * lane_k * eb_itemsize
    row_f = (2 * subq * d + 2 * subk * d) * itemsize + eb
    row_b = (2 * subq * d + 4 * subk * d) * itemsize + 2 * eb
    fwd = _scratch_bytes(n_heads, q_len, k_len) + 2 * row_f
    bwd = _scratch_bytes(n_heads, q_len, k_len, 2) + 2 * row_b
    return fwd <= budget and bwd <= budget


def _resolve_rel_hb(n_heads: int, q_len: int, k_len: int, d: int,
                    itemsize: int, eb_itemsize: int = 2):
    """Head-block size for the head-blocked rel kernels (same contract
    as _resolve_hb: largest divisor of n_heads fitting both passes,
    hb·Dh tiling to 128 lanes, FUSED_ATTN_HB override)."""
    dh = d // n_heads
    budget = _vmem_budget()
    subq = (q_len + 15) // 16 * 16
    subk = (k_len + 15) // 16 * 16
    lane_k = (k_len + 127) // 128 * 128

    def fits(hb):
        if (hb * dh) % 128 != 0:
            return False
        lane_d = (hb * dh + 127) // 128 * 128
        eb = hb * subq * lane_k * eb_itemsize
        row_f = (subq + 2 * subk + subq) * lane_d * itemsize + eb
        row_b = (2 * subq + 4 * subk) * lane_d * itemsize + 2 * eb
        fwd = _scratch_bytes(hb, q_len, k_len) + 2 * row_f
        bwd = _scratch_bytes(hb, q_len, k_len, 2) + 2 * row_b
        return fwd <= budget and bwd <= budget

    if "FUSED_ATTN_HB" in os.environ:
        hb = int(os.environ["FUSED_ATTN_HB"])
        if hb < 1 or n_heads % hb != 0:
            raise ValueError(
                f"FUSED_ATTN_HB={hb} must divide n_heads={n_heads}")
        return hb if fits(hb) else None
    for hb in range(n_heads, 0, -1):
        if n_heads % hb == 0 and fits(hb):
            return hb
    return None


# -- compile-probe planning for the head-blocked kernels --------------------
#
# The arithmetic model above (scratch + double-buffered operand blocks)
# UNDER-predicts Mosaic's actual scoped-VMEM stack for the head-blocked
# kernels, and the misses are NOT monotonic in either S or nb — measured
# on hardware (tools/probe_hb_vmem.py, 2026-08-19, base geometry bf16):
# bwd S=448 hb=4 nb=1 allocates 18.28 MB (fails to compile) while
# S=512 hb=4 nb=1 fits; fwd S=320 hb=6 nb=4 allocates 16.96 MB (fails)
# while nb=2 fits; bwd S=320 hb=6 allocates MORE at nb=2 (22.06 MB)
# than at nb=4 (18.76 MB). No closed form fits that table, so on TPU the
# hb dispatch VERIFIES its planned (hb, nb) by AOT-compiling the
# standalone kernel (one remote compile per geometry/pass, cached here
# and in the persistent compilation cache) and walks DOWN — nb toward 1,
# then hb to the next divisor — until a configuration actually compiles.
# Off-TPU (interpret mode) there is no scoped limit and the arithmetic
# plan is used as-is. FUSED_ATTN_PROBE=0 disables verification.

_PROBE_CACHE: dict = {}


# Shared across the package's kernel modules (ops/pallas_util.py):
# every pallas_call ships vmem_limit_bytes=24MB headroom — see the
# docstring there for the measured in-context-promotion rationale.
from bert_multimodal_transformer_tpu.ops.pallas_util import (  # noqa: E402
    mosaic_vmem_limit as _mosaic_vmem_limit,
    pallas_call as _pallas_call,
)


def _probe_enabled() -> bool:
    import jax

    return (os.environ.get("FUSED_ATTN_PROBE", "1") == "1"
            and jax.default_backend() == "tpu")


def _hb_kernel_compiles(pass_name: str, s: int, d: int, n_heads: int,
                        hb: int, nb: int, rate: float, scale: float,
                        dtype) -> bool:
    """AOT-compile the standalone head-blocked kernel (b=nb → one grid
    step; the per-program scoped stack is grid-size-independent,
    verified in the probe table). Cached per geometry/pass."""
    import jax

    key = (pass_name, s, d, n_heads, hb, nb, float(rate), float(scale),
           jnp.dtype(dtype).str)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    qkv = jax.ShapeDtypeStruct((nb, s, 3 * d), dtype)
    bias = jax.ShapeDtypeStruct((nb, 1, s), jnp.float32)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_packed_hb_pallas.lower(
                qkv, bias, seed, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, interpret=False, nb=nb).compile()
        else:
            g = jax.ShapeDtypeStruct((nb, s, d), dtype)
            _bwd_packed_hb_pallas.lower(
                qkv, bias, seed, g, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, interpret=False, nb=nb).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _walk_nb(pass_name, b, s, d, n_heads, hb, nb0, rate, scale, dtype):
    """Largest nb ≤ nb0 (halving, keeping b % nb == 0) whose kernel
    compiles; None if even nb=1 does not."""
    nb = max(1, nb0)
    while nb >= 1:
        if b % nb == 0 and _hb_kernel_compiles(
                pass_name, s, d, n_heads, hb, nb, rate, scale, dtype):
            return nb
        nb //= 2
    return None


def _resolve_hb_plan(b: int, n_heads: int, s: int, d: int, itemsize: int,
                     rate: float = 0.1, scale: float = 1.0,
                     dtype=jnp.bfloat16, nb_fwd=None, nb_bwd=None):
    """(hb, nb_fwd, nb_bwd) for the head-blocked packed kernels, or None.

    The arithmetic (``_resolve_hb`` + ``_pick_nb_packed``) proposes;
    on TPU each pass is compile-verified (``_hb_kernel_compiles``) with
    nb walked toward 1 and hb toward the next divisor on failure.
    Explicit ``nb_fwd``/``nb_bwd`` (user-forced, e.g. FUSED_ATTN_NB_*)
    are passed through verified-but-not-walked: a forced block size that
    cannot compile surfaces as no-fit rather than silently shrinking."""
    dh = d // n_heads
    probe = _probe_enabled()

    if "FUSED_ATTN_HB" in os.environ:
        candidates = [_resolve_hb(n_heads, s, d, itemsize)]
        if candidates[0] is None:
            return None
    else:
        budget = _vmem_budget()

        def arith_fits(hb):
            if (hb * dh) % 128 != 0:
                return False
            fwd = (_scratch_bytes(hb, s, s)
                   + 2 * _hb_row_bytes(s, hb, dh, 4, itemsize))
            bwd = (_scratch_bytes(hb, s, s, 2)
                   + 2 * _hb_row_bytes(s, hb, dh, 7, itemsize))
            return fwd <= budget and bwd <= budget

        candidates = [hb for hb in range(n_heads, 0, -1)
                      if n_heads % hb == 0 and arith_fits(hb)]

    for hb in candidates:
        nb_f0 = nb_fwd if nb_fwd is not None else _pick_nb_packed(
            b, _hb_row_bytes(s, hb, dh, 4, itemsize),
            fixed_bytes=_scratch_bytes(hb, s, s))
        nb_b0 = nb_bwd if nb_bwd is not None else _pick_nb_packed(
            b, _hb_row_bytes(s, hb, dh, 7, itemsize),
            fixed_bytes=_scratch_bytes(hb, s, s, 2))
        if not probe:
            return hb, nb_f0, nb_b0
        if nb_fwd is not None:
            nb_f = nb_f0 if _hb_kernel_compiles(
                "fwd", s, d, n_heads, hb, nb_f0, rate, scale,
                dtype) else None
        else:
            nb_f = _walk_nb("fwd", b, s, d, n_heads, hb, nb_f0, rate,
                            scale, dtype)
        if nb_f is None:
            continue
        if nb_bwd is not None:
            nb_b = nb_b0 if _hb_kernel_compiles(
                "bwd", s, d, n_heads, hb, nb_b0, rate, scale,
                dtype) else None
        else:
            nb_b = _walk_nb("bwd", b, s, d, n_heads, hb, nb_b0, rate,
                            scale, dtype)
        if nb_b is None:
            continue
        return hb, nb_f, nb_b
    return None


def _rel_hb_kernel_compiles(pass_name: str, q_len: int, k_len: int,
                            d: int, n_heads: int, hb: int, nb: int,
                            rate: float, scale: float, dtype,
                            eb_dtype) -> bool:
    """Rel twin of ``_hb_kernel_compiles``: AOT-compile the standalone
    head-blocked rel kernel at b=nb. Cached per geometry/pass."""
    import jax

    key = ("rel", pass_name, q_len, k_len, d, n_heads, hb, nb,
           float(rate), float(scale), jnp.dtype(dtype).str,
           jnp.dtype(eb_dtype).str)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    q = jax.ShapeDtypeStruct((nb, q_len, d), dtype)
    kv = jax.ShapeDtypeStruct((nb, k_len, d), dtype)
    ebias = jax.ShapeDtypeStruct((nb, n_heads, q_len, k_len), eb_dtype)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_rel_hb_pallas.lower(
                q, kv, kv, ebias, seed, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, interpret=False, nb=nb).compile()
        else:
            g = jax.ShapeDtypeStruct((nb, q_len, d), dtype)
            _bwd_rel_hb_pallas.lower(
                q, kv, kv, ebias, seed, g, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, interpret=False, nb=nb).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _resolve_rel_hb_plan(b: int, n_heads: int, q_len: int, k_len: int,
                         d: int, itemsize: int, eb_itemsize: int = 2,
                         rate: float = 0.1, scale: float = 1.0,
                         dtype=jnp.bfloat16, eb_dtype=jnp.bfloat16,
                         nb_fwd=None, nb_bwd=None):
    """Rel twin of ``_resolve_hb_plan``: arithmetic proposes (hb, nb),
    the compile probe verifies and walks down on TPU."""
    dh = d // n_heads
    probe = _probe_enabled()
    subq = (q_len + 15) // 16 * 16
    subk = (k_len + 15) // 16 * 16
    lane_k = (k_len + 127) // 128 * 128

    if "FUSED_ATTN_HB" in os.environ:
        candidates = [_resolve_rel_hb(n_heads, q_len, k_len, d, itemsize,
                                      eb_itemsize)]
        if candidates[0] is None:
            return None
    else:
        budget = _vmem_budget()

        def arith_fits(hb):
            if (hb * dh) % 128 != 0:
                return False
            lane_d = (hb * dh + 127) // 128 * 128
            eb = hb * subq * lane_k * eb_itemsize
            row_f = (subq + 2 * subk + subq) * lane_d * itemsize + eb
            row_b = (2 * subq + 4 * subk) * lane_d * itemsize + 2 * eb
            return (_scratch_bytes(hb, q_len, k_len) + 2 * row_f <= budget
                    and _scratch_bytes(hb, q_len, k_len, 2) + 2 * row_b
                    <= budget)

        candidates = [hb for hb in range(n_heads, 0, -1)
                      if n_heads % hb == 0 and arith_fits(hb)]

    def walk(pass_name, nb0):
        nb = max(1, nb0)
        while nb >= 1:
            if b % nb == 0 and _rel_hb_kernel_compiles(
                    pass_name, q_len, k_len, d, n_heads, hb, nb, rate,
                    scale, dtype, eb_dtype):
                return nb
            nb //= 2
        return None

    for hb in candidates:
        lane_d = (hb * dh + 127) // 128 * 128
        eb = hb * subq * lane_k * eb_itemsize
        row_f = (subq + 2 * subk + subq) * lane_d * itemsize + eb
        row_b = (2 * subq + 4 * subk) * lane_d * itemsize + 2 * eb
        nb_f0 = nb_fwd if nb_fwd is not None else _pick_nb_packed(
            b, row_f, fixed_bytes=_scratch_bytes(hb, q_len, k_len))
        nb_b0 = nb_bwd if nb_bwd is not None else _pick_nb_packed(
            b, row_b, fixed_bytes=_scratch_bytes(hb, q_len, k_len, 2))
        if not probe:
            return hb, nb_f0, nb_b0
        if nb_fwd is not None:
            nb_f = nb_f0 if _rel_hb_kernel_compiles(
                "fwd", q_len, k_len, d, n_heads, hb, nb_f0, rate, scale,
                dtype, eb_dtype) else None
        else:
            nb_f = walk("fwd", nb_f0)
        if nb_f is None:
            continue
        if nb_bwd is not None:
            nb_b = nb_b0 if _rel_hb_kernel_compiles(
                "bwd", q_len, k_len, d, n_heads, hb, nb_b0, rate, scale,
                dtype, eb_dtype) else None
        else:
            nb_b = walk("bwd", nb_b0)
        if nb_b is None:
            continue
        return hb, nb_f, nb_b
    return None


def fused_rel_attention_fits_hb(n_heads: int, q_len: int, k_len: int,
                                d: int, itemsize: int = 2,
                                eb_itemsize: int = 2, *,
                                batch: Optional[int] = None,
                                rate: float = 0.1,
                                scale: float = 1.0,
                                dtype=None,
                                eb_dtype=None) -> bool:
    """Whether ANY rel-bias fused variant can compile at this geometry —
    the full-H kernel or the head-blocked grid. models/xlnet.py gates
    its fused dispatch on this and falls back to the einsum path beyond
    (rel attention has no flash analogue here: the streamed score bias
    is itself [B,H,Q,K]). On TPU the head-blocked answer is
    compile-verified (``_resolve_rel_hb_plan`` — see the probe note)."""
    if fused_rel_attention_fits(n_heads, q_len, k_len, d, itemsize,
                                eb_itemsize):
        return True
    return _resolve_rel_hb_plan(
        batch if batch is not None else 8, n_heads, q_len, k_len, d,
        itemsize, eb_itemsize, rate=rate, scale=scale,
        dtype=dtype if dtype is not None else jnp.bfloat16,
        eb_dtype=eb_dtype if eb_dtype is not None else jnp.bfloat16,
    ) is not None


def _rel_full_kernel_compiles(pass_name: str, q_len: int, k_len: int,
                              d: int, n_heads: int, nb: int, rate: float,
                              scale: float, dtype, eb_dtype,
                              save: bool) -> bool:
    """AOT-compile the standalone FULL-H rel kernel (b=nb → one grid
    step) in the requested residual mode. Cached per geometry/pass/mode.

    Why the full-H pair needs probing too: the saved-probs backward
    adds three [H,Q,K] blocks (p, pd, debias) to the row, and at
    mems-style geometries (small Q, long non-128 K) Mosaic's actual
    stack exceeds the sum-of-blocks model non-monotonically — measured
    2026-08-20: Q=50 K=562 b32 bf16 saved-bwd allocates 16.41 MB
    (fails) while the block model sums to 14.8 MB (the r4b
    mems_s50_m512_fused stage OOM; same failure class as the hb table
    in tools/probe_hb_vmem.py)."""
    import jax

    key = ("rel_full", pass_name, q_len, k_len, d, n_heads, nb,
           float(rate), float(scale), jnp.dtype(dtype).str,
           jnp.dtype(eb_dtype).str, bool(save))
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    q = jax.ShapeDtypeStruct((nb, q_len, d), dtype)
    kv = jax.ShapeDtypeStruct((nb, k_len, d), dtype)
    ebias = jax.ShapeDtypeStruct((nb, n_heads, q_len, k_len), eb_dtype)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_rel_pallas.lower(
                q, kv, kv, ebias, seed, scale=scale, rate=rate,
                n_heads=n_heads, interpret=False, nb=nb,
                save=save).compile()
        elif save:
            g = jax.ShapeDtypeStruct((nb, q_len, d), dtype)
            prob = jax.ShapeDtypeStruct((nb, n_heads, q_len, k_len),
                                        dtype)
            _bwd_rel_saved_pallas.lower(
                prob, prob, q, kv, kv, g, scale=scale, n_heads=n_heads,
                interpret=False, nb=nb).compile()
        else:
            g = jax.ShapeDtypeStruct((nb, q_len, d), dtype)
            _bwd_rel_pallas.lower(
                q, kv, kv, ebias, seed, g, scale=scale, rate=rate,
                n_heads=n_heads, interpret=False, nb=nb).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _resolve_rel_full_plan(b: int, n_heads: int, q_len: int, k_len: int,
                           d: int, itemsize: int, *, rate: float,
                           scale: float, dtype, eb_dtype, nb_fwd,
                           nb_bwd, save: bool, save_forced: bool):
    """(nb_fwd, nb_bwd, save_probs) for the full-H rel kernels, or None.

    ``nb_fwd``/``nb_bwd`` arrive already env-merged (non-None = user/env
    forced; _resolve_rel_hb_plan treats them the same way downstream) and
    ``save`` is the _resolve_knobs auto answer with ``save_forced``
    telling whether the user pinned it. On TPU both passes of the chosen
    residual mode are compile-verified: an auto-saved mode that cannot
    compile demotes to recompute (its backward drops the three [H,Q,K]
    prob blocks from the row), nb walks toward 1 on failure unless
    forced, and None means even recompute at nb=1 does not compile —
    the caller falls through to the head-blocked plan. A FORCED saved
    mode that cannot compile also returns None (surface as no-fit, not
    a silent mode change — same contract as forced nb in the hb
    resolver). Off-TPU the arithmetic knobs pass through unchanged."""

    def picks(save_mode):
        n_prob_f = (2 if rate > 0.0 else 1) if save_mode else 0
        f = nb_fwd if nb_fwd is not None else _pick_nb_packed(
            b, _rel_row_bytes(q_len, k_len, d, n_heads, n_prob_f,
                              itemsize),
            fixed_bytes=_scratch_bytes(n_heads, q_len, k_len))
        if nb_bwd is not None:
            w = nb_bwd
        elif save_mode:
            w = _pick_nb_packed(
                b, 2 * _rel_row_bytes(q_len, k_len, d, n_heads, 2,
                                      itemsize),
                fixed_bytes=_scratch_bytes(n_heads, q_len, k_len))
        else:
            w = _pick_nb_packed(
                b, 2 * _rel_row_bytes(q_len, k_len, d, n_heads, 1,
                                      itemsize),
                fixed_bytes=_scratch_bytes(n_heads, q_len, k_len, 2))
        return f, w

    if not _probe_enabled():
        f, w = picks(save)
        return f, w, save

    def walk(pass_name, nb0, forced, save_mode):
        if forced:
            return nb0 if _rel_full_kernel_compiles(
                pass_name, q_len, k_len, d, n_heads, nb0, rate, scale,
                dtype, eb_dtype, save_mode) else None
        nb = max(1, nb0)
        while nb >= 1:
            if b % nb == 0 and _rel_full_kernel_compiles(
                    pass_name, q_len, k_len, d, n_heads, nb, rate,
                    scale, dtype, eb_dtype, save_mode):
                return nb
            nb //= 2
        return None

    def plan(save_mode):
        f0, w0 = picks(save_mode)
        f = walk("fwd", f0, nb_fwd is not None, save_mode)
        if f is None:
            return None
        w = walk("bwd", w0, nb_bwd is not None, save_mode)
        if w is None:
            return None
        return f, w, save_mode

    if save:
        resolved = plan(True)
        if resolved is not None or save_forced:
            return resolved
    return plan(False)


# -- flash-streamed (fs) planning: the tier beyond head-blocking ------------


def _fs_min_hb(n_heads: int, dh: int):
    """Smallest head-block whose flat lane width is 128-aligned (the
    packed column slices address [·, hb·Dh] lanes)."""
    for hb in range(1, n_heads + 1):
        if n_heads % hb == 0 and (hb * dh) % 128 == 0:
            return hb
    return None


def _fs_candidates(s: int):
    """(qb, kb) block pairs, best-first: bigger kb keeps the QK/PV dots
    MXU-shaped; qb caps the per-program working set."""
    for kb in (512, 256, 128):
        if s % kb:
            continue
        for qb in (256, 128):
            if s % qb or qb > s:
                continue
            yield qb, kb


def _fs_kernel_compiles(pass_name: str, s: int, d: int, n_heads: int,
                        hb: int, qb: int, kb: int, rate: float,
                        scale: float, dtype) -> bool:
    """AOT-compile the standalone flash-streamed kernel (b=1 → one
    batch-grid step; the per-program scoped stack is grid-size-
    independent). Cached per geometry/pass like the hb probe."""
    import jax

    key = ("fs", pass_name, s, d, n_heads, hb, qb, kb, float(rate),
           float(scale), jnp.dtype(dtype).str)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    qkv = jax.ShapeDtypeStruct((1, s, 3 * d), dtype)
    bias = jax.ShapeDtypeStruct((1, 1, s), jnp.float32)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_packed_fs_pallas.lower(
                qkv, bias, seed, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                interpret=False).compile()
        else:
            o = jax.ShapeDtypeStruct((1, s, d), dtype)
            lse = jax.ShapeDtypeStruct((1, n_heads // hb, hb, s),
                                       jnp.float32)
            g = jax.ShapeDtypeStruct((1, s, d), dtype)
            _bwd_packed_fs_pallas.lower(
                qkv, bias, seed, o, lse, g, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                interpret=False).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _resolve_fs_plan(b: int, n_heads: int, s: int, d: int, itemsize: int,
                     rate: float = 0.1, scale: float = 1.0,
                     dtype=jnp.bfloat16):
    """(hb, qb, kb) for the flash-streamed packed kernels, or None.

    Requires S divisible by a 128-multiple block and a 128-lane-aligned
    head block. On TPU the (qb, kb) choice is compile-verified
    (``_fs_kernel_compiles``) best-first; off-TPU the first candidate
    is used (interpret mode has no scoped limit)."""
    del itemsize, b
    dh = d // n_heads
    hb = _fs_min_hb(n_heads, dh)
    if hb is None:
        return None
    probe = _probe_enabled()
    for qb, kb in _fs_candidates(s):
        if not probe:
            return hb, qb, kb
        if (_fs_kernel_compiles("fwd", s, d, n_heads, hb, qb, kb, rate,
                                scale, dtype)
                and _fs_kernel_compiles("bwd", s, d, n_heads, hb, qb,
                                        kb, rate, scale, dtype)):
            return hb, qb, kb
    return None


def fused_attention_fits_fs(n_heads: int, s: int, d: int,
                            itemsize: int = 2, *,
                            batch: Optional[int] = None,
                            rate: float = 0.1,
                            scale: float = 1.0,
                            dtype=None) -> bool:
    """Whether the flash-streamed packed kernels cover this geometry —
    the dropout-preserving long-sequence tier past the head-blocked
    reach (S>640 at base bf16; scratch is [hb, qb, kb], so S is
    HBM-bound). models/bert.py's packed dispatch takes fused →
    head-blocked → flash-streamed before degrading to the stock flash
    (dropout-free) or einsum."""
    return _resolve_fs_plan(
        batch if batch is not None else 8, n_heads, s, d, itemsize,
        rate=rate, scale=scale,
        dtype=dtype if dtype is not None else jnp.bfloat16) is not None


def _rel_fs_kernel_compiles(pass_name: str, q_len: int, k_len: int,
                            d: int, n_heads: int, hb: int, qb: int,
                            kb: int, rate: float, scale: float, dtype,
                            eb_dtype) -> bool:
    """Rel twin of ``_fs_kernel_compiles``."""
    import jax

    key = ("relfs", pass_name, q_len, k_len, d, n_heads, hb, qb, kb,
           float(rate), float(scale), jnp.dtype(dtype).str,
           jnp.dtype(eb_dtype).str)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    q = jax.ShapeDtypeStruct((1, q_len, d), dtype)
    kv = jax.ShapeDtypeStruct((1, k_len, d), dtype)
    ebias = jax.ShapeDtypeStruct((1, n_heads, q_len, k_len), eb_dtype)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_rel_fs_pallas.lower(
                q, kv, kv, ebias, seed, scale=scale, rate=rate,
                n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                interpret=False).compile()
        else:
            o = jax.ShapeDtypeStruct((1, q_len, d), dtype)
            lse = jax.ShapeDtypeStruct((1, n_heads // hb, hb, q_len),
                                       jnp.float32)
            g = jax.ShapeDtypeStruct((1, q_len, d), dtype)
            _bwd_rel_fs_pallas.lower(
                q, kv, kv, ebias, seed, o, lse, g, scale=scale,
                rate=rate, n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                interpret=False).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _resolve_rel_fs_plan(b: int, n_heads: int, q_len: int, k_len: int,
                         d: int, itemsize: int, eb_itemsize: int = 2,
                         rate: float = 0.1, scale: float = 1.0,
                         dtype=jnp.bfloat16, eb_dtype=jnp.bfloat16):
    """(hb, qb, kb) for the flash-streamed rel kernels, or None —
    Q block-divisible for qb, K (incl. mems) for kb."""
    del itemsize, eb_itemsize, b
    dh = d // n_heads
    hb = _fs_min_hb(n_heads, dh)
    if hb is None:
        return None
    probe = _probe_enabled()
    for kb in (512, 256, 128):
        if k_len % kb:
            continue
        for qb in (256, 128):
            if q_len % qb:
                continue
            if not probe:
                return hb, qb, kb
            if (_rel_fs_kernel_compiles("fwd", q_len, k_len, d, n_heads,
                                        hb, qb, kb, rate, scale, dtype,
                                        eb_dtype)
                    and _rel_fs_kernel_compiles("bwd", q_len, k_len, d,
                                                n_heads, hb, qb, kb,
                                                rate, scale, dtype,
                                                eb_dtype)):
                return hb, qb, kb
    return None


def fused_rel_attention_fits_fs(n_heads: int, q_len: int, k_len: int,
                                d: int, itemsize: int = 2,
                                eb_itemsize: int = 2, *,
                                batch: Optional[int] = None,
                                rate: float = 0.1,
                                scale: float = 1.0,
                                dtype=None,
                                eb_dtype=None) -> bool:
    """Whether the flash-streamed rel kernels cover this geometry — the
    dropout-preserving tier past the head-blocked Q=K=512 reach (the
    [B,H,Q,K] ebias stays an HBM stream; only [hb,qb,kb] slices ever
    enter VMEM). models/xlnet.py's fused dispatch takes full-H →
    head-blocked → flash-streamed before falling back to einsum."""
    return _resolve_rel_fs_plan(
        batch if batch is not None else 8, n_heads, q_len, k_len, d,
        itemsize, eb_itemsize, rate=rate, scale=scale,
        dtype=dtype if dtype is not None else jnp.bfloat16,
        eb_dtype=eb_dtype if eb_dtype is not None else jnp.bfloat16,
    ) is not None


def _resolve_knobs(b, n_heads, q_len, k_len, rate, itemsize,
                   nb_fwd, nb_bwd, save_probs, d=None):
    """Shared blocking/residual-mode knob resolution for the fused
    attention entry points. FUSED_ATTN_NB_FWD / FUSED_ATTN_NB_BWD /
    FUSED_ATTN_SAVE env vars override; save_probs auto mode saves the
    (padded, at the compute itemsize) prob residuals while they stay
    under ~256 MB per layer HBM — and, when ``d`` is passed, while the
    per-program prob blocks also leave the nb=1 row inside the
    scoped-VMEM budget (at mid-range S the saved-probs blocks alone can
    blow the 16 MB scoped limit that the recompute mode fits)."""
    if nb_fwd is None and "FUSED_ATTN_NB_FWD" in os.environ:
        nb_fwd = int(os.environ["FUSED_ATTN_NB_FWD"])
    if nb_bwd is None and "FUSED_ATTN_NB_BWD" in os.environ:
        nb_bwd = int(os.environ["FUSED_ATTN_NB_BWD"])
    if save_probs is None and "FUSED_ATTN_SAVE" in os.environ:
        save_probs = os.environ["FUSED_ATTN_SAVE"] == "1"
    if save_probs is None:
        sub = (q_len + 15) // 16 * 16
        lane = (k_len + 127) // 128 * 128
        n_prob = 2 if rate > 0.0 else 1
        save_probs = (b * n_heads * sub * lane * itemsize * n_prob
                      <= 256 * 1024 * 1024)
        if save_probs and d is not None:
            row = (sub * 3 * d * itemsize + sub * d * itemsize
                   + n_prob * n_heads * sub * lane * itemsize)
            save_probs = (_scratch_bytes(n_heads, q_len, k_len)
                          + 2 * row <= _vmem_budget())
    return nb_fwd, nb_bwd, bool(save_probs)


def _softmax_f32(scores: jax.Array) -> jax.Array:
    # jax.nn.softmax semantics (max-subtracted, fp32) — keep the exact op
    # order of the plain path so dropout-off results are bit-comparable.
    return jax.nn.softmax(scores, axis=-1)


def _attn_fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, o_ref,
                     *rest,
                     scale: float, rate: float, n_heads: int, nb: int,
                     save: bool = False):
    # save=True additionally writes the (pre-dropout) probs p and, when
    # dropout is active, the dropped/scaled probs pd — both bf16 — so the
    # backward can skip the QK-dot + softmax recompute (55% of its time,
    # tools/exp_bwd_variants.py).
    # The elementwise chain (scale+bias, softmax, PRNG, select) runs once
    # per row on the [H, S, S] scratch across all heads — per-head [50,50]
    # tiles are a fraction of a VPU issue, so H separate chains were
    # issue-overhead-dominated (tools/exp_attn_vpu_batching.py: the packed
    # twin measured 1.00 → 0.60 ms/call at bert-base b256).
    s_ref = rest[-1]                                        # [H,S,S] f32
    f32 = jnp.float32
    if save:
        p_ref = rest[0]
        pd_ref = rest[1] if rate > 0.0 else None
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)                      # [1, S]
        for h in range(n_heads):
            q = q_ref[b, h]                                 # [S, Dh]
            k = k_ref[b, h]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # [S, S]
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [H, S, S]
        if save:
            p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0.0:
            # Seed per GLOBAL batch row (not per program): forward and
            # backward may run with different nb blockings, and the mask
            # replay must not depend on the partitioning. One [H, S, S]
            # draw per row; the backward replays the same single draw.
            # (prng_random_bits returns *int32* on this JAX version —
            # bitcast to uint32 or the >= threshold test is vacuous.)
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            if save:
                pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(q_ref.dtype)
        for h in range(n_heads):
            o = jax.lax.dot_general(pc[h], v_ref[b, h],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            o_ref[b, h] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, s_ref, t_ref, *,
                     scale: float, rate: float, n_heads: int, nb: int):
    """Recompute backward. s_ref/t_ref are [H,S,S] f32 scratch; the
    softmax recompute and ds chain run once per row across all heads,
    replaying the forward's single per-row [H,S,S] PRNG draw (identical
    per-global-row seeding, so the keep-mask replays exactly even when
    fwd/bwd use different nb blockings)."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)
        for h in range(n_heads):
            s_ref[h] = jax.lax.dot_general(
                q_ref[b, h], k_ref[b, h], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [H, S, S]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(q_ref.dtype)
        for h in range(n_heads):
            g = g_ref[b, h]
            # dV = pdᵀ · g                                    [Sk, Dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dv_ref[b, h] = dv.astype(dv_ref.dtype)
            # d(pd) = g · Vᵀ                                  [Sq, Sk]
            t_ref[h] = jax.lax.dot_general(
                g, v_ref[b, h], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        # softmax VJP through the dropout, algebraically compacted:
        # dp = dpd⊙keepf, and p⊙dp = (p⊙keepf)⊙dpd = pd⊙dpd =: t, so
        #   ds = p ⊙ (dp − Σ_k dp⊙p) = t − p ⊙ Σ_k t
        # — the dp tensor never needs to be built.
        t = pd * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(q_ref.dtype)
        for h in range(n_heads):
            # dQ = ds · K                                     [Sq, Dh]
            dq = jax.lax.dot_general(ds_c[h], k_ref[b, h],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dq_ref[b, h] = dq.astype(dq_ref.dtype)
            # dK = dsᵀ · Q                                    [Sk, Dh]
            dk = jax.lax.dot_general(ds_c[h], q_ref[b, h],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk_ref[b, h] = dk.astype(dk_ref.dtype)


def _attn_bwd_saved_kernel(p_ref, pd_ref, q_ref, k_ref, v_ref, g_ref,
                           dq_ref, dk_ref, dv_ref, t_ref, *,
                           scale: float, n_heads: int, nb: int):
    """Backward from saved probs: no QK dot, no softmax, no PRNG.
    pd_ref is the dropped/scaled probs (== p_ref when dropout was off —
    the caller passes the same array twice in that case). t_ref is
    [H,S,S] f32 scratch; the ds chain runs once per row across heads."""
    f32 = jnp.float32
    for b in range(nb):
        for h in range(n_heads):
            g = g_ref[b, h]
            dv = jax.lax.dot_general(pd_ref[b, h], g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dv_ref[b, h] = dv.astype(dv_ref.dtype)
            t_ref[h] = jax.lax.dot_general(                  # dpd
                g, v_ref[b, h], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        # ds = t − p ⊙ Σ_k t with t = pd⊙dpd (see _attn_bwd_kernel)
        p = p_ref[b].astype(f32)                             # [H, S, S]
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(q_ref.dtype)
        for h in range(n_heads):
            dq = jax.lax.dot_general(ds_c[h], k_ref[b, h],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dq_ref[b, h] = dq.astype(dq_ref.dtype)
            dk = jax.lax.dot_general(ds_c[h], q_ref[b, h],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk_ref[b, h] = dk.astype(dk_ref.dtype)


def _attn_fwd_packed_kernel(seed_ref, bias_ref, qkv_ref, o_ref, *rest,
                            scale: float, rate: float, n_heads: int,
                            dh: int, nb: int, save: bool = False):
    """Packed-layout forward: qkv_ref is the raw QKV projection output
    [nb, S, 3·D] (column packing i·D + h·Dh + c, i.e. reshape(S,3,H,Dh)),
    o_ref is [nb, S, D]. Heads are static lane slices — the [B,S,H,Dh]
    ↔ [B,H,S,Dh] HBM transposes (7.1+4.9+3.4 ms/step at bert-base b256,
    tools/analyze_trace.py) never happen.

    The elementwise chain (scale+bias, softmax, PRNG, select) runs ONCE
    per row on the whole [H, S, S] score scratch instead of per head:
    the per-head [50, 50] tiles are a fraction of a VPU issue, so the
    per-op overhead of H separate chains dominated the kernel (measured
    1.00 → 0.60 ms/call at bert-base b256, tools/exp_attn_vpu_batching
    .py). Dropout accordingly draws one [H, S, S] block per row, seeded
    per (grid row) exactly like before — the recompute backward replays
    the identical stream."""
    s_ref = rest[-1]                                        # [H,S,S] f32
    f32 = jnp.float32
    d = n_heads * dh
    if save:
        p_ref = rest[0]
        pd_ref = rest[1] if rate > 0.0 else None
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)                      # [1, S]
        for h in range(n_heads):
            q = qkv_ref[b, :, h * dh:(h + 1) * dh]          # [S, Dh]
            k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # [S, S]
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [H, S, S]
        if save:
            p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            if save:
                pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(qkv_ref.dtype)
        outs = []
        for h in range(n_heads):
            v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)           # [S, D]


def _attn_bwd_packed_kernel(seed_ref, bias_ref, qkv_ref, g_ref, dqkv_ref,
                            s_ref, t_ref,
                            *, scale: float, rate: float, n_heads: int,
                            dh: int, nb: int):
    """Packed-layout recompute backward: g_ref [nb, S, D] (ctx grad in
    natural layout), dqkv_ref [nb, S, 3·D]. Same per-row seeding and
    single [H,S,S] draw as the packed forward (stream replay).
    s_ref/t_ref are [H,S,S] f32 scratch: the softmax recompute and the
    ds chain run once per row across all heads (see fwd docstring)."""
    f32 = jnp.float32
    d = n_heads * dh
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)
        for h in range(n_heads):
            q = qkv_ref[b, :, h * dh:(h + 1) * dh]
            k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [H, S, S]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(qkv_ref.dtype)
        dvs = []
        for h in range(n_heads):
            v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dqkv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        t = pd * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(qkv_ref.dtype)
        dqs, dks = [], []
        for h in range(n_heads):
            q = qkv_ref[b, :, h * dh:(h + 1) * dh]
            k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dqkv_ref.dtype))
            dks.append(dk.astype(dqkv_ref.dtype))
        dqkv_ref[b] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _attn_bwd_packed_saved_kernel(p_ref, pd_ref, qkv_ref, g_ref, dqkv_ref,
                                  t_ref,
                                  *, scale: float, n_heads: int, dh: int,
                                  nb: int):
    """Packed-layout backward from saved probs (no QK dot, softmax, PRNG).
    t_ref is [H,S,S] f32 scratch; the ds chain runs once per row across
    all heads (see fwd docstring)."""
    f32 = jnp.float32
    d = n_heads * dh
    for b in range(nb):
        dvs = []
        for h in range(n_heads):
            v = qkv_ref[b, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_ref[b, h], g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dqkv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = p_ref[b].astype(f32)                            # [H, S, S]
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(qkv_ref.dtype)
        dqs, dks = [], []
        for h in range(n_heads):
            q = qkv_ref[b, :, h * dh:(h + 1) * dh]
            k = qkv_ref[b, :, d + h * dh:d + (h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dqkv_ref.dtype))
            dks.append(dk.astype(dqkv_ref.dtype))
        dqkv_ref[b] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _attn_fwd_packed_hb_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref,
                               o_ref, s_ref, *, scale: float, rate: float,
                               hb: int, dh: int, nb: int, n_hb: int):
    """Head-blocked packed forward: grid (B//nb, H//hb); q_ref/k_ref/
    v_ref are [nb, S, hb·Dh] column-sliced views of the SAME packed
    [B, S, 3·D] projection output (three in_specs with q/k/v-part index
    maps), o_ref the [nb, S, hb·Dh] column block of the [B, S, D]
    context. The [hb, S, S] f32 scratch is what lets the fused path run
    where the full [H, S, S] block exceeds scoped VMEM (S>≈380 at base
    geometry — the long-sequence regime; the reference truncates at 50,
    multimodal_driver.py:45). Same whole-row softmax and elementwise
    chain as _attn_fwd_packed_kernel, batched over the hb heads.

    Dropout draws one [hb, S, S] block per (row, head-block), seeded
    ``seed + global_row·n_hb + j`` — the recompute backward replays the
    identical stream (hb is resolved once from static shapes, so fwd
    and bwd always agree; at hb=H, n_hb=1 this reduces to the full
    kernel's per-row stream)."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)                      # [1, S]
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]            # [S, Dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # [S, S]
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [hb, S, S]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0]
                            + (pl.program_id(0) * nb + b) * n_hb
                            + pl.program_id(1))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        pc = p.astype(q_ref.dtype)
        outs = []
        for h in range(hb):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)           # [S, hb·Dh]


def _attn_bwd_packed_hb_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref,
                               g_ref, dq_ref, dk_ref, dv_ref, s_ref, t_ref,
                               *, scale: float, rate: float, hb: int,
                               dh: int, nb: int, n_hb: int):
    """Head-blocked recompute backward twin of the hb forward: same
    (row, head-block) seeding and [hb, S, S] draw (stream replay);
    emits dq/dk/dv as three [nb, S, hb·Dh] column blocks (the caller
    concatenates into the packed [B, S, 3·D] cotangent — three separate
    outputs because the q/k/v column ranges of one head block are not
    contiguous in the packed layout)."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        bias = bias_ref[b].astype(f32)
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [hb, S, S]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0]
                            + (pl.program_id(0) * nb + b) * n_hb
                            + pl.program_id(1))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(q_ref.dtype)
        dvs = []
        for h in range(hb):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        t = pd * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(q_ref.dtype)
        dqs, dks = [], []
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dq_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)


def _attn_fwd_packed_fs_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref,
                               o_ref, lse_ref, s_ref, *, scale: float,
                               rate: float, hb: int, dh: int, nb: int,
                               n_hb: int, n_qb: int, kb: int):
    """Flash-streamed packed forward: grid (B//nb, H//hb, S//qb); each
    program owns a [nb, qb, hb·Dh] query block and streams the FULL key
    row in kb-column blocks with the online-softmax recurrence
    (running rowmax m, denominator l, rescaled accumulator) — scratch
    is [hb, qb, kb], never [·, S, S], so S is bounded by HBM rather
    than scoped VMEM. This is the long-sequence tier BEYOND the
    head-blocked kernels (S>640 at base bf16, BENCHMARKS.md), and
    unlike the stock flash kernel (ops/attention.py::flash_attention)
    it keeps the reference's attention-prob DROPOUT semantics
    (modeling.py:6-51 trains with it): dropout is applied to the
    unnormalized exp weights — mask ⊙ e(s−m)/keep accumulated against
    an UNdropped denominator l is algebraically identical to dropout
    on softmax probs — with one [hb, qb, kb] hardware-PRNG draw per
    (row, head-block, q-block, k-block), so the recompute backward
    replays the identical stream from the same seed formula.

    Emits the context block and the per-row log-sum-exp (m + log l)
    the backward needs to rebuild probabilities blockwise."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = q_ref.shape[1]
    s_len = k_ref.shape[1]
    n_kb = s_len // kb
    for b in range(nb):
        qs = [q_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        m = jnp.full((hb, qb), -jnp.inf, f32)
        l = jnp.zeros((hb, qb), f32)
        acc = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            # bias sliced at the REF (static kb window): slicing the
            # loaded value lowers to a gather Mosaic rejects (hardware
            # canary r4a; interpret mode cannot see it)
            bias_k = bias_ref[b, :, ki * kb:(ki + 1) * kb].astype(f32)
            for h in range(hb):
                k = k_ref[b, ki * kb:(ki + 1) * kb, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)              # [qb, kb]
            sb = s_ref[:] * scale + bias_k[None]             # [hb, qb, kb]
            m_new = jnp.maximum(m, jnp.max(sb, axis=-1))
            alpha = jnp.exp(m - m_new)                       # [hb, qb]
            e = jnp.exp(sb - m_new[..., None])
            l = l * alpha + jnp.sum(e, axis=-1)
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(0) * nb + b) * n_hb
                        + pl.program_id(1)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(e.shape),
                                     jnp.uint32)
                e = jnp.where(bits >= thresh, e * inv_keep, 0.0)
            ec = e.astype(q_ref.dtype)
            for h in range(hb):
                v = v_ref[b, ki * kb:(ki + 1) * kb, h * dh:(h + 1) * dh]
                pv = jax.lax.dot_general(
                    ec[h], v, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)              # [qb, Dh]
                acc[h] = acc[h] * alpha[h][:, None] + pv
            m = m_new
        o_ref[b] = jnp.concatenate(
            [(acc[h] / l[h][:, None]).astype(o_ref.dtype)
             for h in range(hb)], axis=-1)                   # [qb, hb·Dh]
        lse_ref[b, 0] = m + jnp.log(l)                       # [hb, qb]


def _attn_bwd_packed_fs_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref,
                               o_ref, lse_ref, g_ref, dq_ref, dk_ref,
                               dv_ref, s_ref, t_ref, *, scale: float,
                               rate: float, hb: int, dh: int, nb: int,
                               n_hb: int, n_qb: int, kb: int):
    """Flash-streamed recompute backward: same grid and (row,
    head-block, q-block, k-block) dropout seeding as the forward (bit
    replay); probabilities are rebuilt per kb block from the saved
    log-sum-exp (p = exp(s·scale + bias − lse), no second softmax
    pass), δ = Σ g⊙o per row supplies the softmax-backward rowsum
    (with dropout, rowsum(dp⊙p) ≡ rowsum(g⊙o) exactly). dq accumulates
    within the program; dk/dv are f32 output blocks REVISITED across
    the minormost (q-block) grid dimension — zero-initialized at
    q-block 0, accumulated by every program on the same (batch,
    head-block) row, which is the standard flash backward schedule."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = q_ref.shape[1]
    s_len = k_ref.shape[1]
    n_kb = s_len // kb

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for b in range(nb):
        lse = lse_ref[b, 0]                                  # [hb, qb]
        qs = [q_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        gs = [g_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        delta = jnp.stack(
            [jnp.sum(gs[h].astype(f32)
                     * o_ref[b, :, h * dh:(h + 1) * dh].astype(f32),
                     axis=-1) for h in range(hb)])           # [hb, qb]
        dqs = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            for h in range(hb):
                k = k_ref[b, ki * kb:(ki + 1) * kb, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            bias_k = bias_ref[b, :, ki * kb:(ki + 1) * kb].astype(f32)
            p = jnp.exp(s_ref[:] * scale + bias_k[None]
                        - lse[..., None])                    # [hb, qb, kb]
            for h in range(hb):
                v = v_ref[b, ki * kb:(ki + 1) * kb, h * dh:(h + 1) * dh]
                t_ref[h] = jax.lax.dot_general(              # dpd
                    gs[h], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)              # [qb, kb]
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(0) * nb + b) * n_hb
                        + pl.program_id(1)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                     jnp.uint32)
                keep = bits >= thresh
                pd = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, t_ref[:] * inv_keep, 0.0)
            else:
                pd = p
                dp = t_ref[:]
            ds = (p * (dp - delta[..., None])) * scale
            ds_c = ds.astype(q_ref.dtype)
            pd_c = pd.astype(q_ref.dtype)
            ksl = slice(ki * kb, (ki + 1) * kb)
            for h in range(hb):
                k = k_ref[b, ksl, h * dh:(h + 1) * dh]
                csl = slice(h * dh, (h + 1) * dh)
                dqs[h] = dqs[h] + jax.lax.dot_general(
                    ds_c[h], k, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)              # [qb, Dh]
                dk_ref[b, ksl, csl] += jax.lax.dot_general(
                    ds_c[h], qs[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)              # [kb, Dh]
                dv_ref[b, ksl, csl] += jax.lax.dot_general(
                    pd_c[h], gs[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        dq_ref[b] = jnp.concatenate(
            [dqs[h].astype(dq_ref.dtype) for h in range(hb)], axis=-1)


def _attn_fwd_rel_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref, o_ref,
                         *rest,
                         scale: float, rate: float, n_heads: int,
                         dh: int, nb: int, save: bool = False):
    """Packed-layout forward with a full per-head additive score bias
    (XLNet content stream: ebias = (bd + ef)·scale − BIG·mask, folded
    outside the kernel so only ONE [B,H,Q,K] tensor is streamed instead
    of the einsum path's ac/bd/ef/score/probs/keep-mask family).
    q_ref [nb,Q,D]; k_ref/v_ref [nb,K,D]; ebias_ref [nb,H,Q,K] f32.
      s = (q_h · k_hᵀ)·scale + ebias[h] ; softmax ; dropout ; ·v_h
    The elementwise chain runs once per row on the [H,Q,K] scratch —
    see _attn_fwd_packed_kernel's docstring; the single [H,Q,K] dropout
    draw per row is replayed identically by the recompute backward."""
    s_ref = rest[-1]                                        # [H,Q,K] f32
    f32 = jnp.float32
    if save:
        p_ref = rest[0]
        pd_ref = rest[1] if rate > 0.0 else None
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        for h in range(n_heads):
            q = q_ref[b, :, h * dh:(h + 1) * dh]            # [Q, Dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]            # [K, Dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # [Q, K]
        p = _softmax_f32(s_ref[:] * scale
                         + ebias_ref[b].astype(f32))        # [H, Q, K]
        if save:
            p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            if save:
                pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(q_ref.dtype)
        outs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)           # [Q, D]


def _attn_bwd_rel_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref, g_ref,
                         dq_ref, dk_ref, dv_ref, debias_ref, s_ref, t_ref,
                         *, scale: float, rate: float, n_heads: int,
                         dh: int, nb: int):
    """Recompute backward for the rel-bias kernel. Emits debias = dscore
    so the (bd, ef, mask) assembly outside differentiates through XLA.
    s_ref/t_ref are [H,Q,K] f32 scratch: softmax recompute + ds chain run
    once per row; the dropout stream replays the fwd's [H,Q,K] draw."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        for h in range(n_heads):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale
                         + ebias_ref[b].astype(f32))        # [H, Q, K]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(q_ref.dtype)
        dvs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        t = pd * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)     # dscore
        debias_ref[b] = ds.astype(debias_ref.dtype)
        ds_c = (ds * scale).astype(q_ref.dtype)
        dqs, dks = [], []
        for h in range(n_heads):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dq_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)


def _attn_bwd_rel_saved_kernel(p_ref, pd_ref, q_ref, k_ref, v_ref, g_ref,
                               dq_ref, dk_ref, dv_ref, debias_ref, t_ref,
                               *, scale: float, n_heads: int, dh: int,
                               nb: int):
    """Saved-probs backward for the rel-bias kernel. t_ref is [H,Q,K]
    f32 scratch; the ds chain runs once per row across all heads."""
    f32 = jnp.float32
    for b in range(nb):
        dvs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_ref[b, h], g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = p_ref[b].astype(f32)                            # [H, Q, K]
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)
        debias_ref[b] = ds.astype(debias_ref.dtype)
        ds_c = (ds * scale).astype(q_ref.dtype)
        dqs, dks = [], []
        for h in range(n_heads):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dq_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)


def _attn_fwd_rel_hb_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref,
                            o_ref, s_ref, *, scale: float, rate: float,
                            hb: int, dh: int, nb: int, n_hb: int):
    """Head-blocked rel-bias forward: grid (B//nb, H//hb); q/k/v/o are
    [nb, ·, hb·Dh] head-column blocks, ebias_ref the matching
    [nb, hb, Q, K] block. Same whole-row softmax as _attn_fwd_rel_kernel
    on an [hb, Q, K] scratch — this is what lets XLNet's fused path run
    where the full [H,Q,K] block exceeds scoped VMEM (long sequences OR
    long mems: K includes the memory length). Dropout is seeded per
    (row, head-block) exactly like _attn_fwd_packed_hb_kernel."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]            # [Q, Dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]            # [K, Dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # [Q, K]
        p = _softmax_f32(s_ref[:] * scale
                         + ebias_ref[b].astype(f32))        # [hb, Q, K]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0]
                            + (pl.program_id(0) * nb + b) * n_hb
                            + pl.program_id(1))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        pc = p.astype(q_ref.dtype)
        outs = []
        for h in range(hb):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)           # [Q, hb·Dh]


def _attn_bwd_rel_hb_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref,
                            g_ref, dq_ref, dk_ref, dv_ref, debias_ref,
                            s_ref, t_ref, *, scale: float, rate: float,
                            hb: int, dh: int, nb: int, n_hb: int):
    """Head-blocked recompute backward twin: replays the fwd's
    (row, head-block) dropout stream; dq/dk/dv/debias are the head-column
    (resp. head) blocks of the full cotangents — every block is written
    by exactly one program, no cross-program accumulation."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale
                         + ebias_ref[b].astype(f32))        # [hb, Q, K]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0]
                            + (pl.program_id(0) * nb + b) * n_hb
                            + pl.program_id(1))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(q_ref.dtype)
        dvs = []
        for h in range(hb):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                 # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        t = pd * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)     # dscore
        debias_ref[b] = ds.astype(debias_ref.dtype)
        ds_c = (ds * scale).astype(q_ref.dtype)
        dqs, dks = [], []
        for h in range(hb):
            q = q_ref[b, :, h * dh:(h + 1) * dh]
            k = k_ref[b, :, h * dh:(h + 1) * dh]
            dq = jax.lax.dot_general(ds_c[h], k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(ds_c[h], q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dqs.append(dq.astype(dq_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)


def _attn_fwd_rel_fs_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref,
                            o_ref, lse_ref, s_ref, *, scale: float,
                            rate: float, hb: int, dh: int, nb: int,
                            n_hb: int, n_qb: int, kb: int):
    """Flash-streamed rel-bias forward: the rel twin of
    ``_attn_fwd_packed_fs_kernel`` — grid (B//nb, H//hb, Q//qb), the
    FULL key row streamed in kb blocks with the online-softmax
    recurrence against the matching [hb, qb, kb] ebias slices. Extends
    XLNet's fused path past the head-blocked Q=K=512 reach (K includes
    mems) with the reference's prob-dropout semantics intact: one
    hardware-PRNG draw per (row, head-block, q-block, k-block), masks
    applied to the unnormalized exp weights against an undropped
    denominator."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = q_ref.shape[1]
    k_len = k_ref.shape[1]
    n_kb = k_len // kb
    for b in range(nb):
        qs = [q_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        m = jnp.full((hb, qb), -jnp.inf, f32)
        l = jnp.zeros((hb, qb), f32)
        acc = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            ksl = slice(ki * kb, (ki + 1) * kb)
            for h in range(hb):
                k = k_ref[b, ksl, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)              # [qb, kb]
            sb = (s_ref[:] * scale
                  + ebias_ref[b, :, :, ksl].astype(f32))     # [hb, qb, kb]
            m_new = jnp.maximum(m, jnp.max(sb, axis=-1))
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(sb - m_new[..., None])
            l = l * alpha + jnp.sum(e, axis=-1)
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(0) * nb + b) * n_hb
                        + pl.program_id(1)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(e.shape),
                                     jnp.uint32)
                e = jnp.where(bits >= thresh, e * inv_keep, 0.0)
            ec = e.astype(q_ref.dtype)
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
        lse_ref[b, 0] = m + jnp.log(l)


def _attn_bwd_rel_fs_kernel(seed_ref, ebias_ref, q_ref, k_ref, v_ref,
                            o_ref, lse_ref, g_ref, dq_ref, dk_ref,
                            dv_ref, debias_ref, s_ref, t_ref, *,
                            scale: float, rate: float, hb: int, dh: int,
                            nb: int, n_hb: int, n_qb: int, kb: int):
    """Flash-streamed rel recompute backward: dropout replay from the
    forward's seed formula, probabilities rebuilt per kb block from the
    saved log-sum-exp, δ = Σ g⊙o. debias (the differentiable score-bias
    cotangent, unscaled dscore exactly like the whole-row kernels) is
    written blockwise by the program that owns the q rows; dk/dv are
    f32 outputs revisited across the minormost (q-block) grid dim."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = q_ref.shape[1]
    k_len = k_ref.shape[1]
    n_kb = k_len // kb

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for b in range(nb):
        lse = lse_ref[b, 0]                                  # [hb, qb]
        qs = [q_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        gs = [g_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        delta = jnp.stack(
            [jnp.sum(gs[h].astype(f32)
                     * o_ref[b, :, h * dh:(h + 1) * dh].astype(f32),
                     axis=-1) for h in range(hb)])           # [hb, qb]
        dqs = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            ksl = slice(ki * kb, (ki + 1) * kb)
            for h in range(hb):
                k = k_ref[b, ksl, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            p = jnp.exp(s_ref[:] * scale
                        + ebias_ref[b, :, :, ksl].astype(f32)
                        - lse[..., None])                    # [hb, qb, kb]
            for h in range(hb):
                v = v_ref[b, ksl, h * dh:(h + 1) * dh]
                t_ref[h] = jax.lax.dot_general(              # dpd
                    gs[h], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(0) * nb + b) * n_hb
                        + pl.program_id(1)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                     jnp.uint32)
                keep = bits >= thresh
                pd = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, t_ref[:] * inv_keep, 0.0)
            else:
                pd = p
                dp = t_ref[:]
            ds = p * (dp - delta[..., None])                 # unscaled
            debias_ref[b, :, :, ksl] = ds.astype(debias_ref.dtype)
            ds_c = (ds * scale).astype(q_ref.dtype)
            pd_c = pd.astype(q_ref.dtype)
            for h in range(hb):
                k = k_ref[b, ksl, h * dh:(h + 1) * dh]
                csl = slice(h * dh, (h + 1) * dh)
                dqs[h] = dqs[h] + jax.lax.dot_general(
                    ds_c[h], k, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dk_ref[b, ksl, csl] += jax.lax.dot_general(
                    ds_c[h], qs[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dv_ref[b, ksl, csl] += jax.lax.dot_general(
                    pd_c[h], gs[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        dq_ref[b] = jnp.concatenate(
            [dqs[h].astype(dq_ref.dtype) for h in range(hb)], axis=-1)


def _scratch_bytes(h: int, q: int, k: int, n: int = 1) -> int:
    """Bytes of n [h, q, k] f32 VMEM scratch blocks (lane/sublane padded).
    Scratch is per-PROGRAM (reused across the nb rows), so it subtracts
    from the VMEM budget before the per-row division in the nb pickers."""
    return n * h * ((q + 15) // 16 * 16) * ((k + 127) // 128 * 128) * 4


def _pick_nb(b: int, n_arrays: int, h: int, s: int, dh: int,
             fixed_bytes: int = 0) -> int:
    """Rows per program: amortize per-program pipeline overhead while
    keeping double-buffered blocks comfortably inside ~12 MB of VMEM.
    ``fixed_bytes`` = per-program VMEM not proportional to nb (scratch,
    grid-invariant blocks)."""
    budget = 12 * 1024 * 1024 - fixed_bytes
    # bf16 blocks are padded to (…, mult-of-16 sublanes, 128 lanes)
    block = h * ((s + 15) // 16 * 16) * max(dh, 128) * 2
    # clamp BEFORE the divisibility walk — min() after it could return a
    # non-divisor and the grid would silently skip the tail rows
    nb = min(max(1, budget // (2 * n_arrays * block)), 8)
    while nb > 1 and b % nb != 0:
        nb -= 1
    return nb


def _specs(nb, h, s, dh):
    qkv = pl.BlockSpec((nb, h, s, dh), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((nb, 1, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return seed, bias, qkv


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret", "nb",
                                    "save"))
def _fwd_pallas(q, k, v, bias, seed, *, scale, rate, interpret, nb=None,
                save=False):
    b, h, s, dh = q.shape
    n_out = 1 + (save and (2 if rate > 0.0 else 1))
    if nb is None:
        nb = _pick_nb(b, 4 + n_out, h, s, dh,
                      fixed_bytes=_scratch_bytes(h, s, s))
    seed_spec, bias_spec, qkv_spec = _specs(nb, h, s, dh)
    prob_spec = pl.BlockSpec((nb, h, s, s), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = qkv_spec
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if save:
        # probs residuals stored at the compute dtype: bf16 training pays
        # 2 bytes/elem; fp32 paths keep full-precision grads
        prob_shape = jax.ShapeDtypeStruct((b, h, s, s), q.dtype)
        if rate > 0.0:
            out_specs = (qkv_spec, prob_spec, prob_spec)
            out_shape = (out_shape, prob_shape, prob_shape)
        else:
            out_specs = (qkv_spec, prob_spec)
            out_shape = (out_shape, prob_shape)
    flops_sm = 8 * b * h * s * s
    return _pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, rate=rate,
                          n_heads=h, nb=nb, save=save),
        grid=(b // nb,),
        in_specs=[seed_spec, bias_spec, qkv_spec, qkv_spec, qkv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((h, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * dh + flops_sm,
            bytes_accessed=q.dtype.itemsize * 4 * b * h * s * dh,
            transcendentals=b * h * s * s,
        ),
    )(seed, bias, q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret", "nb"))
def _bwd_pallas(q, k, v, bias, seed, g, *, scale, rate, interpret, nb=None):
    b, h, s, dh = q.shape
    if nb is None:
        nb = _pick_nb(b, 7, h, s, dh,
                      fixed_bytes=_scratch_bytes(h, s, s, 2))
    seed_spec, bias_spec, qkv_spec = _specs(nb, h, s, dh)
    return _pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, rate=rate,
                          n_heads=h, nb=nb),
        grid=(b // nb,),
        in_specs=[seed_spec, bias_spec, qkv_spec, qkv_spec, qkv_spec,
                  qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((h, s, s), jnp.float32),
                        pltpu.VMEM((h, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s * s * dh + 12 * b * h * s * s,
            bytes_accessed=q.dtype.itemsize * 7 * b * h * s * dh,
            transcendentals=b * h * s * s,
        ),
    )(seed, bias, q, k, v, g)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "nb"))
def _bwd_saved_pallas(p, pd, q, k, v, g, *, scale, interpret, nb=None):
    b, h, s, dh = q.shape
    if nb is None:
        nb = _pick_nb(b, 9, h, s, dh,
                      fixed_bytes=_scratch_bytes(h, s, s))
    _, _, qkv_spec = _specs(nb, h, s, dh)
    prob_spec = pl.BlockSpec((nb, h, s, s), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_attn_bwd_saved_kernel, scale=scale,
                          n_heads=h, nb=nb),
        grid=(b // nb,),
        in_specs=[prob_spec, prob_spec, qkv_spec, qkv_spec, qkv_spec,
                  qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((h, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * s * s * dh + 8 * b * h * s * s,
            bytes_accessed=q.dtype.itemsize * 7 * b * h * s * dh
            + 2 * 2 * b * h * s * s,
            transcendentals=0,
        ),
    )(p, pd, q, k, v, g)


def _pick_nb_packed(b: int, row_bytes: int, fixed_bytes: int = 0) -> int:
    """Rows per program from the actual per-row block footprint.
    ``fixed_bytes`` = per-program scratch / grid-invariant VMEM."""
    budget = 12 * 1024 * 1024 - fixed_bytes
    # clamp BEFORE the divisibility walk (see _pick_nb)
    nb = min(max(1, budget // (2 * row_bytes)), 8)
    while nb > 1 and b % nb != 0:
        nb -= 1
    return nb


def _packed_row_bytes(s: int, d3: int, h: int, n_prob: int,
                      itemsize: int) -> int:
    sub = (s + 15) // 16 * 16
    lane_s = (s + 127) // 128 * 128
    act = sub * d3 * itemsize                     # qkv or dqkv row
    return act + sub * (d3 // 3) * itemsize \
        + n_prob * h * sub * lane_s * itemsize


def _packed_specs(nb, s, d3, h):
    qkv = pl.BlockSpec((nb, s, d3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((nb, s, d3 // 3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    prob = pl.BlockSpec((nb, h, s, s), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((nb, 1, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return seed, bias, qkv, out, prob


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "interpret",
                                    "nb", "save"))
def _fwd_packed_pallas(qkv, bias, seed, *, scale, rate, n_heads, interpret,
                       nb=None, save=False):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_prob = (2 if rate > 0.0 else 1) if save else 0
    if nb is None:
        nb = _pick_nb_packed(
            b, _packed_row_bytes(s, d3, n_heads, n_prob, qkv.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, s, s))
    seed_spec, bias_spec, qkv_spec, out_spec, prob_spec = _packed_specs(
        nb, s, d3, n_heads)
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((b, s, d), qkv.dtype)
    if save:
        prob_shape = jax.ShapeDtypeStruct((b, n_heads, s, s), qkv.dtype)
        if rate > 0.0:
            out_specs = (out_spec, prob_spec, prob_spec)
            out_shape = (out_shape, prob_shape, prob_shape)
        else:
            out_specs = (out_spec, prob_spec)
            out_shape = (out_shape, prob_shape)
    return _pallas_call(
        functools.partial(_attn_fwd_packed_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb, save=save),
        grid=(b // nb,),
        in_specs=[seed_spec, bias_spec, qkv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n_heads, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * s * s * dh + 8 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (d3 + d),
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, qkv)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "interpret",
                                    "nb"))
def _bwd_packed_pallas(qkv, bias, seed, g, *, scale, rate, n_heads,
                       interpret, nb=None):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _packed_row_bytes(s, d3, n_heads, 0, qkv.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, s, s, 2))
    seed_spec, bias_spec, qkv_spec, out_spec, _ = _packed_specs(
        nb, s, d3, n_heads)
    return _pallas_call(
        functools.partial(_attn_bwd_packed_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb),
        grid=(b // nb,),
        in_specs=[seed_spec, bias_spec, qkv_spec, out_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n_heads, s, s), jnp.float32),
                        pltpu.VMEM((n_heads, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * s * s * dh + 12 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (2 * d3 + d),
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, qkv, g)


@functools.partial(jax.jit,
                   static_argnames=("scale", "n_heads", "interpret", "nb"))
def _bwd_packed_saved_pallas(p, pd, qkv, g, *, scale, n_heads, interpret,
                             nb=None):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _packed_row_bytes(s, d3, n_heads, 2, qkv.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, s, s))
    _, _, qkv_spec, out_spec, prob_spec = _packed_specs(nb, s, d3, n_heads)
    return _pallas_call(
        functools.partial(_attn_bwd_packed_saved_kernel, scale=scale,
                          n_heads=n_heads, dh=dh, nb=nb),
        grid=(b // nb,),
        in_specs=[prob_spec, prob_spec, qkv_spec, out_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n_heads, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n_heads * s * s * dh + 8 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (2 * d3 + d)
            + 2 * 2 * b * n_heads * s * s,
            transcendentals=0,
        ),
    )(p, pd, qkv, g)


def _hb_packed_specs(nb, s, hb, dh, n_hb):
    """Block specs for the head-blocked packed kernels: q/k/v are three
    [nb, S, hb·Dh] views of the same packed [B, S, 3·D] array (the q/k/v
    parts start at column-block 0, n_hb, 2·n_hb), ctx/grads use the
    matching [nb, S, hb·Dh] block of a [B, S, D] array. bias/seed are
    grid-invariant along the head-block axis (no re-fetch)."""
    def col(part):
        return pl.BlockSpec((nb, s, hb * dh),
                            lambda i, j, part=part: (i, 0, part * n_hb + j),
                            memory_space=pltpu.VMEM)
    out = pl.BlockSpec((nb, s, hb * dh), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((nb, 1, s), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    return seed, bias, col(0), col(1), col(2), out


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "interpret", "nb"))
def _fwd_packed_hb_pallas(qkv, bias, seed, *, scale, rate, n_heads, hb,
                          interpret, nb=None):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_hb = n_heads // hb
    if nb is None:
        nb = _pick_nb_packed(
            b, _hb_row_bytes(s, hb, dh, 4, qkv.dtype.itemsize),
            fixed_bytes=_scratch_bytes(hb, s, s))
    seed_spec, bias_spec, q_spec, k_spec, v_spec, out_spec = \
        _hb_packed_specs(nb, s, hb, dh, n_hb)
    return _pallas_call(
        functools.partial(_attn_fwd_packed_hb_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb),
        grid=(b // nb, n_hb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((hb, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * s * s * dh + 8 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (d3 + d),
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, qkv, qkv, qkv)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "interpret", "nb"))
def _bwd_packed_hb_pallas(qkv, bias, seed, g, *, scale, rate, n_heads, hb,
                          interpret, nb=None):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_hb = n_heads // hb
    if nb is None:
        nb = _pick_nb_packed(
            b, _hb_row_bytes(s, hb, dh, 7, qkv.dtype.itemsize),
            fixed_bytes=_scratch_bytes(hb, s, s, 2))
    seed_spec, bias_spec, q_spec, k_spec, v_spec, out_spec = \
        _hb_packed_specs(nb, s, hb, dh, n_hb)
    return _pallas_call(
        functools.partial(_attn_bwd_packed_hb_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb),
        grid=(b // nb, n_hb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec, out_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((b, s, d), qkv.dtype)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((hb, s, s), jnp.float32),
                        pltpu.VMEM((hb, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * s * s * dh + 12 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (2 * d3 + d),
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, qkv, qkv, qkv, g)


def _fs_packed_specs(nb, s, qb, hb, dh, n_hb):
    """Block specs for the flash-streamed packed kernels: grid
    (B//nb, H//hb, S//qb). The query/context/grad blocks are
    [nb, qb, hb·Dh] tiles of the packed [B, S, 3·D] projection (q part)
    or of a [B, S, D] array; the key/value blocks hold the FULL row
    ([nb, S, hb·Dh], q-block-invariant — fetched once per (batch,
    head-block)); lse is a [nb, 1, hb, qb] block of a [B, n_hb, hb, S]
    f32 array (4-D so the trailing block dims satisfy Mosaic's sublane
    rule — see the lse spec comment below)."""
    def col(part, full_rows):
        if full_rows:
            return pl.BlockSpec(
                (nb, s, hb * dh),
                lambda i, j, qi, part=part: (i, 0, part * n_hb + j),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (nb, qb, hb * dh),
            lambda i, j, qi, part=part: (i, qi, part * n_hb + j),
            memory_space=pltpu.VMEM)
    qblk = pl.BlockSpec((nb, qb, hb * dh), lambda i, j, qi: (i, qi, j),
                        memory_space=pltpu.VMEM)
    kvfull = pl.BlockSpec((nb, s, hb * dh), lambda i, j, qi: (i, 0, j),
                          memory_space=pltpu.VMEM)
    # lse lives 4-D [B, n_hb, hb, S] so the block's LAST TWO dims are
    # (hb, qb) with hb equal to the full array dim — a 3-D [B, H, S]
    # layout would need an (hb, qb) block of H, and hb (e.g. 2) violates
    # Mosaic's 8-sublane block rule (found on hardware, canary r4a; the
    # same rule class as the nb*S%8 bug in BENCHMARKS.md "QKV mega-fusion")
    lse = pl.BlockSpec((nb, 1, hb, qb), lambda i, j, qi: (i, j, 0, qi),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((nb, 1, s), lambda i, j, qi: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i, j, qi: (0, 0),
                        memory_space=pltpu.SMEM)
    return seed, bias, col(0, False), col(1, True), col(2, True), \
        qblk, kvfull, lse


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _fwd_packed_fs_pallas(qkv, bias, seed, *, scale, rate, n_heads, hb,
                          qb, kb, interpret, nb=1):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = s // qb
    (seed_spec, bias_spec, q_spec, k_spec, v_spec,
     qblk_spec, _, lse_spec) = _fs_packed_specs(nb, s, qb, hb, dh, n_hb)
    out, lse = _pallas_call(
        functools.partial(_attn_fwd_packed_fs_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb,
                          n_qb=n_qb, kb=kb),
        grid=(b // nb, n_hb, n_qb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec],
        out_specs=(qblk_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n_hb, hb, s), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * s * s * dh + 10 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (d3 + d),
            transcendentals=2 * b * n_heads * s * s,
        ),
    )(seed, bias, qkv, qkv, qkv)
    return out, lse


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _bwd_packed_fs_pallas(qkv, bias, seed, o, lse, g, *, scale, rate,
                          n_heads, hb, qb, kb, interpret, nb=1):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = s // qb
    (seed_spec, bias_spec, q_spec, k_spec, v_spec,
     qblk_spec, kvfull_spec, lse_spec) = _fs_packed_specs(
        nb, s, qb, hb, dh, n_hb)
    dq, dk, dv = _pallas_call(
        functools.partial(_attn_bwd_packed_fs_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb,
                          n_qb=n_qb, kb=kb),
        grid=(b // nb, n_hb, n_qb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec,
                  qblk_spec, lse_spec, qblk_spec],
        # dk/dv are revisited across the minormost (q-block) grid dim:
        # f32 accumulation across programs, cast by the caller
        out_specs=(qblk_spec, kvfull_spec, kvfull_spec),
        out_shape=(jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
                   jax.ShapeDtypeStruct((b, s, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, s, d), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32),
                        pltpu.VMEM((hb, qb, kb), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * s * s * dh + 14 * b * n_heads * s * s,
            bytes_accessed=qkv.dtype.itemsize * b * s * (2 * d3 + 2 * d)
            + 8 * b * s * d,
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, qkv, qkv, qkv, o, lse, g)
    return dq, dk, dv


def _rel_specs(nb, q_len, k_len, d, h):
    q = pl.BlockSpec((nb, q_len, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((nb, k_len, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    eb = pl.BlockSpec((nb, h, q_len, k_len), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return seed, eb, q, kv


def _rel_row_bytes(q_len, k_len, d, h, n_prob, itemsize):
    subq = (q_len + 15) // 16 * 16
    subk = (k_len + 15) // 16 * 16
    lane_k = (k_len + 127) // 128 * 128
    return (subq * d + 2 * subk * d) * itemsize \
        + h * subq * lane_k * 4 \
        + n_prob * h * subq * lane_k * itemsize


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "interpret",
                                    "nb", "save"))
def _fwd_rel_pallas(q, k, v, ebias, seed, *, scale, rate, n_heads,
                    interpret, nb=None, save=False):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    n_prob = (2 if rate > 0.0 else 1) if save else 0
    if nb is None:
        nb = _pick_nb_packed(
            b, _rel_row_bytes(q_len, k_len, d, n_heads, n_prob,
                              q.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, q_len, k_len))
    seed_spec, eb_spec, q_spec, kv_spec = _rel_specs(
        nb, q_len, k_len, d, n_heads)
    prob_spec = pl.BlockSpec((nb, n_heads, q_len, k_len),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = q_spec
    out_shape = jax.ShapeDtypeStruct((b, q_len, d), q.dtype)
    if save:
        prob_shape = jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                          q.dtype)
        if rate > 0.0:
            out_specs = (q_spec, prob_spec, prob_spec)
            out_shape = (out_shape, prob_shape, prob_shape)
        else:
            out_specs = (q_spec, prob_spec)
            out_shape = (out_shape, prob_shape)
    return _pallas_call(
        functools.partial(_attn_fwd_rel_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb, save=save),
        grid=(b // nb,),
        in_specs=[seed_spec, eb_spec, q_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * q_len * k_len * dh
            + 8 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (q_len + 2 * k_len) * d
            + 4 * b * n_heads * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "interpret",
                                    "nb"))
def _bwd_rel_pallas(q, k, v, ebias, seed, g, *, scale, rate, n_heads,
                    interpret, nb=None):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _rel_row_bytes(q_len, k_len, d, n_heads, 1,
                                  q.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, q_len, k_len, 2))
    seed_spec, eb_spec, q_spec, kv_spec = _rel_specs(
        nb, q_len, k_len, d, n_heads)
    debias_spec = pl.BlockSpec((nb, n_heads, q_len, k_len),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_attn_bwd_rel_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb),
        grid=(b // nb,),
        in_specs=[seed_spec, eb_spec, q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec, debias_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                        ebias.dtype)),
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32),
                        pltpu.VMEM((n_heads, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * q_len * k_len * dh
            + 12 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (3 * q_len + 4 * k_len)
            * d + 8 * b * n_heads * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v, g)


@functools.partial(jax.jit,
                   static_argnames=("scale", "n_heads", "interpret", "nb"))
def _bwd_rel_saved_pallas(p, pd, q, k, v, g, *, scale, n_heads, interpret,
                          nb=None):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _rel_row_bytes(q_len, k_len, d, n_heads, 2,
                                  q.dtype.itemsize),
            fixed_bytes=_scratch_bytes(n_heads, q_len, k_len))
    _, _, q_spec, kv_spec = _rel_specs(nb, q_len, k_len, d, n_heads)
    prob_spec = pl.BlockSpec((nb, n_heads, q_len, k_len),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_attn_bwd_rel_saved_kernel, scale=scale,
                          n_heads=n_heads, dh=dh, nb=nb),
        grid=(b // nb,),
        in_specs=[prob_spec, prob_spec, q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec, prob_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                        q.dtype)),
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n_heads * q_len * k_len * dh
            + 8 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (3 * q_len + 4 * k_len)
            * d + 6 * b * n_heads * q_len * k_len,
            transcendentals=0,
        ),
    )(p, pd, q, k, v, g)


def _rel_hb_specs(nb, q_len, k_len, hb, dh):
    q = pl.BlockSpec((nb, q_len, hb * dh), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((nb, k_len, hb * dh), lambda i, j: (i, 0, j),
                      memory_space=pltpu.VMEM)
    eb = pl.BlockSpec((nb, hb, q_len, k_len), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    return seed, eb, q, kv


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "interpret", "nb"))
def _fwd_rel_hb_pallas(q, k, v, ebias, seed, *, scale, rate, n_heads, hb,
                       interpret, nb=None):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    n_hb = n_heads // hb
    if nb is None:
        subq = (q_len + 15) // 16 * 16
        lane_k = (k_len + 127) // 128 * 128
        lane_d = (hb * dh + 127) // 128 * 128
        row = ((2 * subq + 2 * ((k_len + 15) // 16 * 16)) * lane_d
               * q.dtype.itemsize
               + hb * subq * lane_k * ebias.dtype.itemsize)
        nb = _pick_nb_packed(
            b, row, fixed_bytes=_scratch_bytes(hb, q_len, k_len))
    seed_spec, eb_spec, q_spec, kv_spec = _rel_hb_specs(
        nb, q_len, k_len, hb, dh)
    return _pallas_call(
        functools.partial(_attn_fwd_rel_hb_kernel, scale=scale, rate=rate,
                          hb=hb, dh=dh, nb=nb, n_hb=n_hb),
        grid=(b // nb, n_hb),
        in_specs=[seed_spec, eb_spec, q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_len, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((hb, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * q_len * k_len * dh
            + 8 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (q_len + 2 * k_len) * d
            + 4 * b * n_heads * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "interpret", "nb"))
def _bwd_rel_hb_pallas(q, k, v, ebias, seed, g, *, scale, rate, n_heads,
                       hb, interpret, nb=None):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    n_hb = n_heads // hb
    if nb is None:
        subq = (q_len + 15) // 16 * 16
        lane_k = (k_len + 127) // 128 * 128
        lane_d = (hb * dh + 127) // 128 * 128
        row = ((2 * subq + 4 * ((k_len + 15) // 16 * 16)) * lane_d
               * q.dtype.itemsize
               + 2 * hb * subq * lane_k * ebias.dtype.itemsize)
        nb = _pick_nb_packed(
            b, row, fixed_bytes=_scratch_bytes(hb, q_len, k_len, 2))
    seed_spec, eb_spec, q_spec, kv_spec = _rel_hb_specs(
        nb, q_len, k_len, hb, dh)
    return _pallas_call(
        functools.partial(_attn_bwd_rel_hb_kernel, scale=scale, rate=rate,
                          hb=hb, dh=dh, nb=nb, n_hb=n_hb),
        grid=(b // nb, n_hb),
        in_specs=[seed_spec, eb_spec, q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec, eb_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                        ebias.dtype)),
        scratch_shapes=[pltpu.VMEM((hb, q_len, k_len), jnp.float32),
                        pltpu.VMEM((hb, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * q_len * k_len * dh
            + 12 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (3 * q_len + 4 * k_len)
            * d + 8 * b * n_heads * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v, g)


def _rel_fs_specs(nb, q_len, k_len, qb, hb, dh):
    """Block specs for the flash-streamed rel kernels: grid
    (B//nb, H//hb, Q//qb). q/o/g/dq are [nb, qb, hb·Dh] tiles; k/v (and
    dk/dv) hold the full key row [nb, K, hb·Dh]; ebias/debias the
    [nb, hb, qb, K] slice owned by the program; lse a [nb, 1, hb, qb]
    block of [B, n_hb, hb, Q]."""
    qblk = pl.BlockSpec((nb, qb, hb * dh), lambda i, j, qi: (i, qi, j),
                        memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((nb, k_len, hb * dh), lambda i, j, qi: (i, 0, j),
                      memory_space=pltpu.VMEM)
    eb = pl.BlockSpec((nb, hb, qb, k_len),
                      lambda i, j, qi: (i, j, qi, 0),
                      memory_space=pltpu.VMEM)
    # 4-D lse [B, n_hb, hb, Q]: trailing block dims (hb, qb) with hb
    # equal to the full array dim — Mosaic's sublane rule (see
    # _fs_packed_specs)
    lse = pl.BlockSpec((nb, 1, hb, qb), lambda i, j, qi: (i, j, 0, qi),
                       memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i, j, qi: (0, 0),
                        memory_space=pltpu.SMEM)
    return seed, eb, qblk, kv, lse


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _fwd_rel_fs_pallas(q, k, v, ebias, seed, *, scale, rate, n_heads, hb,
                       qb, kb, interpret, nb=1):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = q_len // qb
    seed_spec, eb_spec, qblk_spec, kv_spec, lse_spec = _rel_fs_specs(
        nb, q_len, k_len, qb, hb, dh)
    return _pallas_call(
        functools.partial(_attn_fwd_rel_fs_kernel, scale=scale, rate=rate,
                          hb=hb, dh=dh, nb=nb, n_hb=n_hb, n_qb=n_qb,
                          kb=kb),
        grid=(b // nb, n_hb, n_qb),
        in_specs=[seed_spec, eb_spec, qblk_spec, kv_spec, kv_spec],
        out_specs=(qblk_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((b, q_len, d), q.dtype),
                   jax.ShapeDtypeStruct((b, n_hb, hb, q_len),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * q_len * k_len * dh
            + 10 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (q_len + 2 * k_len) * d
            + ebias.dtype.itemsize * b * n_heads * q_len * k_len,
            transcendentals=2 * b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _bwd_rel_fs_pallas(q, k, v, ebias, seed, o, lse, g, *, scale, rate,
                       n_heads, hb, qb, kb, interpret, nb=1):
    b, q_len, d = q.shape
    k_len = k.shape[1]
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = q_len // qb
    seed_spec, eb_spec, qblk_spec, kv_spec, lse_spec = _rel_fs_specs(
        nb, q_len, k_len, qb, hb, dh)
    return _pallas_call(
        functools.partial(_attn_bwd_rel_fs_kernel, scale=scale, rate=rate,
                          hb=hb, dh=dh, nb=nb, n_hb=n_hb, n_qb=n_qb,
                          kb=kb),
        grid=(b // nb, n_hb, n_qb),
        in_specs=[seed_spec, eb_spec, qblk_spec, kv_spec, kv_spec,
                  qblk_spec, lse_spec, qblk_spec],
        out_specs=(qblk_spec, kv_spec, kv_spec, eb_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v.shape, jnp.float32),
                   jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                        ebias.dtype)),
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32),
                        pltpu.VMEM((hb, qb, kb), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * q_len * k_len * dh
            + 14 * b * n_heads * q_len * k_len,
            bytes_accessed=q.dtype.itemsize * b * (3 * q_len + 4 * k_len)
            * d + 2 * ebias.dtype.itemsize * b * n_heads * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, ebias, q, k, v, o, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused_rel_attention_fs(q, k, v, ebias, seed, scale, rate, n_heads,
                            hb, qb, kb, interpret):
    out, _ = _fwd_rel_fs_pallas(q, k, v, ebias, seed, scale=scale,
                                rate=rate, n_heads=n_heads, hb=hb, qb=qb,
                                kb=kb, interpret=interpret)
    return out


def _frelfs_fwd(q, k, v, ebias, seed, scale, rate, n_heads, hb, qb, kb,
                interpret):
    out, lse = _fwd_rel_fs_pallas(q, k, v, ebias, seed, scale=scale,
                                  rate=rate, n_heads=n_heads, hb=hb,
                                  qb=qb, kb=kb, interpret=interpret)
    return out, (q, k, v, ebias, seed, out, lse)


def _frelfs_bwd(scale, rate, n_heads, hb, qb, kb, interpret, residuals,
                g):
    q, k, v, ebias, seed, out, lse = residuals
    dq, dk, dv, debias = _bwd_rel_fs_pallas(
        q, k, v, ebias, seed, out, lse, g, scale=scale, rate=rate,
        n_heads=n_heads, hb=hb, qb=qb, kb=kb, interpret=interpret)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return (dq, dk.astype(k.dtype), dv.astype(v.dtype), debias, dseed)


_fused_rel_attention_fs.defvjp(_frelfs_fwd, _frelfs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_rel_attention_hb(q, k, v, ebias, seed, scale, rate, n_heads,
                            hb, interpret, nb_fwd_bwd):
    # Head-blocked variant: always recompute backward (see
    # _fused_attention_packed_hb — nothing of size Q·K stays in HBM).
    return _fwd_rel_hb_pallas(q, k, v, ebias, seed, scale=scale,
                              rate=rate, n_heads=n_heads, hb=hb,
                              interpret=interpret, nb=nb_fwd_bwd[0])


def _frelhb_fwd(q, k, v, ebias, seed, scale, rate, n_heads, hb, interpret,
                nb_fwd_bwd):
    out = _fwd_rel_hb_pallas(q, k, v, ebias, seed, scale=scale, rate=rate,
                             n_heads=n_heads, hb=hb, interpret=interpret,
                             nb=nb_fwd_bwd[0])
    return out, (q, k, v, ebias, seed)


def _frelhb_bwd(scale, rate, n_heads, hb, interpret, nb_fwd_bwd,
                residuals, g):
    q, k, v, ebias, seed = residuals
    dq, dk, dv, debias = _bwd_rel_hb_pallas(
        q, k, v, ebias, seed, g, scale=scale, rate=rate, n_heads=n_heads,
        hb=hb, interpret=interpret, nb=nb_fwd_bwd[1])
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dq, dk, dv, debias, dseed


_fused_rel_attention_hb.defvjp(_frelhb_fwd, _frelhb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_rel_attention(q, k, v, ebias, seed, scale, rate, n_heads,
                         interpret, nb_fwd_bwd, save):
    return _fwd_rel_pallas(q, k, v, ebias, seed, scale=scale, rate=rate,
                           n_heads=n_heads, interpret=interpret,
                           nb=nb_fwd_bwd[0])


def _frel_fwd(q, k, v, ebias, seed, scale, rate, n_heads, interpret,
              nb_fwd_bwd, save):
    if save:
        outs = _fwd_rel_pallas(q, k, v, ebias, seed, scale=scale,
                               rate=rate, n_heads=n_heads,
                               interpret=interpret, nb=nb_fwd_bwd[0],
                               save=True)
        if rate > 0.0:
            out, p, pd = outs
        else:
            out, p = outs
            pd = p
        # ebias itself is NOT needed by the saved-probs backward — only
        # its dtype (for debias). A zero-size token keeps ~15 MB/layer of
        # [B,H,Q,K] residuals out of HBM.
        eb_token = jnp.zeros((0,), ebias.dtype)
        return out, (q, k, v, eb_token, p, pd)
    out = _fwd_rel_pallas(q, k, v, ebias, seed, scale=scale, rate=rate,
                          n_heads=n_heads, interpret=interpret,
                          nb=nb_fwd_bwd[0])
    return out, (q, k, v, ebias, seed)


def _frel_bwd(scale, rate, n_heads, interpret, nb_fwd_bwd, save,
              residuals, g):
    if save:
        q, k, v, eb_token, p, pd = residuals
        dq, dk, dv, ds = _bwd_rel_saved_pallas(
            p, pd, q, k, v, g, scale=scale, n_heads=n_heads,
            interpret=interpret, nb=nb_fwd_bwd[1])
        debias = ds.astype(eb_token.dtype)
    else:
        q, k, v, ebias, seed = residuals
        dq, dk, dv, debias = _bwd_rel_pallas(
            q, k, v, ebias, seed, g, scale=scale, rate=rate,
            n_heads=n_heads, interpret=interpret, nb=nb_fwd_bwd[1])
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dq, dk, dv, debias, dseed


_fused_rel_attention.defvjp(_frel_fwd, _frel_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_attention_packed(qkv, bias, seed, scale, rate, n_heads,
                            interpret, nb_fwd, nb_bwd, save):
    return _fwd_packed_pallas(qkv, bias, seed, scale=scale, rate=rate,
                              n_heads=n_heads, interpret=interpret,
                              nb=nb_fwd)


def _fap_fwd(qkv, bias, seed, scale, rate, n_heads, interpret, nb_fwd,
             nb_bwd, save):
    if save:
        outs = _fwd_packed_pallas(qkv, bias, seed, scale=scale, rate=rate,
                                  n_heads=n_heads, interpret=interpret,
                                  nb=nb_fwd, save=True)
        if rate > 0.0:
            out, p, pd = outs
        else:
            out, p = outs
            pd = p
        return out, (qkv, bias, p, pd)
    out = _fwd_packed_pallas(qkv, bias, seed, scale=scale, rate=rate,
                             n_heads=n_heads, interpret=interpret,
                             nb=nb_fwd)
    return out, (qkv, bias, seed)


def _fap_bwd(scale, rate, n_heads, interpret, nb_fwd, nb_bwd, save,
             residuals, g):
    if save:
        qkv, bias, p, pd = residuals
        dqkv = _bwd_packed_saved_pallas(p, pd, qkv, g, scale=scale,
                                        n_heads=n_heads,
                                        interpret=interpret, nb=nb_bwd)
    else:
        qkv, bias, seed = residuals
        dqkv = _bwd_packed_pallas(qkv, bias, seed, g, scale=scale,
                                  rate=rate, n_heads=n_heads,
                                  interpret=interpret, nb=nb_bwd)
    dbias = jnp.zeros_like(bias)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dqkv, dbias, dseed


_fused_attention_packed.defvjp(_fap_fwd, _fap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_attention_packed_hb(qkv, bias, seed, scale, rate, n_heads, hb,
                               interpret, nb_fwd, nb_bwd):
    # Head-blocked variant: always recompute backward (saving the
    # [B,H,S,S] probs at the geometries that need head-blocking would
    # exceed the residual cap anyway, and keeping nothing of size S² in
    # HBM is the point in the long-seq regime).
    return _fwd_packed_hb_pallas(qkv, bias, seed, scale=scale, rate=rate,
                                 n_heads=n_heads, hb=hb,
                                 interpret=interpret, nb=nb_fwd)


def _faph_fwd(qkv, bias, seed, scale, rate, n_heads, hb, interpret,
              nb_fwd, nb_bwd):
    out = _fwd_packed_hb_pallas(qkv, bias, seed, scale=scale, rate=rate,
                                n_heads=n_heads, hb=hb,
                                interpret=interpret, nb=nb_fwd)
    return out, (qkv, bias, seed)


def _faph_bwd(scale, rate, n_heads, hb, interpret, nb_fwd, nb_bwd,
              residuals, g):
    qkv, bias, seed = residuals
    dq, dk, dv = _bwd_packed_hb_pallas(qkv, bias, seed, g, scale=scale,
                                       rate=rate, n_heads=n_heads, hb=hb,
                                       interpret=interpret, nb=nb_bwd)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dbias = jnp.zeros_like(bias)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dqkv, dbias, dseed


_fused_attention_packed_hb.defvjp(_faph_fwd, _faph_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_attention_packed_fs(qkv, bias, seed, scale, rate, n_heads, hb,
                               qb, kb, interpret):
    out, _ = _fwd_packed_fs_pallas(qkv, bias, seed, scale=scale,
                                   rate=rate, n_heads=n_heads, hb=hb,
                                   qb=qb, kb=kb, interpret=interpret)
    return out


def _faps_fwd(qkv, bias, seed, scale, rate, n_heads, hb, qb, kb,
              interpret):
    out, lse = _fwd_packed_fs_pallas(qkv, bias, seed, scale=scale,
                                     rate=rate, n_heads=n_heads, hb=hb,
                                     qb=qb, kb=kb, interpret=interpret)
    # o and lse are the flash residuals (δ = Σ g⊙o and the blockwise
    # prob rebuild); everything S²-sized is recomputed
    return out, (qkv, bias, seed, out, lse)


def _faps_bwd(scale, rate, n_heads, hb, qb, kb, interpret, residuals, g):
    qkv, bias, seed, out, lse = residuals
    dq, dk, dv = _bwd_packed_fs_pallas(qkv, bias, seed, out, lse, g,
                                       scale=scale, rate=rate,
                                       n_heads=n_heads, hb=hb, qb=qb,
                                       kb=kb, interpret=interpret)
    dqkv = jnp.concatenate([dq, dk.astype(qkv.dtype),
                            dv.astype(qkv.dtype)], axis=-1)
    dbias = jnp.zeros_like(bias)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dqkv, dbias, dseed


_fused_attention_packed_fs.defvjp(_faps_fwd, _faps_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_attention(q, k, v, bias, seed, scale, rate, interpret,
                     nb_fwd, nb_bwd, save):
    # Primal (non-differentiated) call never materializes probs.
    return _fwd_pallas(q, k, v, bias, seed, scale=scale, rate=rate,
                       interpret=interpret, nb=nb_fwd)


def _fa_fwd(q, k, v, bias, seed, scale, rate, interpret, nb_fwd, nb_bwd,
            save):
    if save:
        outs = _fwd_pallas(q, k, v, bias, seed, scale=scale, rate=rate,
                           interpret=interpret, nb=nb_fwd, save=True)
        if rate > 0.0:
            out, p, pd = outs
        else:
            out, p = outs
            pd = p
        return out, (q, k, v, bias, p, pd)
    out = _fwd_pallas(q, k, v, bias, seed, scale=scale, rate=rate,
                      interpret=interpret, nb=nb_fwd)
    return out, (q, k, v, bias, seed)


def _fa_bwd(scale, rate, interpret, nb_fwd, nb_bwd, save, residuals, g):
    if save:
        q, k, v, bias, p, pd = residuals
        dq, dk, dv = _bwd_saved_pallas(p, pd, q, k, v, g, scale=scale,
                                       interpret=interpret, nb=nb_bwd)
        dbias = jnp.zeros_like(bias)
        dseed = np.zeros((1, 1), jax.dtypes.float0)
        return dq, dk, dv, dbias, dseed
    q, k, v, bias, seed = residuals
    dq, dk, dv = _bwd_pallas(q, k, v, bias, seed, g, scale=scale,
                             rate=rate, interpret=interpret, nb=nb_bwd)
    dbias = jnp.zeros_like(bias)   # mask bias carries no useful gradient
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(
    q: jax.Array,               # [B, H, S, Dh]
    k: jax.Array,
    v: jax.Array,
    attention_mask: Optional[jax.Array],   # [B, S] {0,1}, 1 = real token
    *,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: Optional[bool] = None,
    nb_fwd: Optional[int] = None,
    nb_bwd: Optional[int] = None,
    save_probs: Optional[bool] = None,
) -> jax.Array:
    """Fused attention with in-kernel prob-dropout and a fused backward.

    Drop-in for dot_product_attention minus head_mask (call sites fall
    back to the einsum path when head_mask is set). dropout_rate applies
    only when deterministic=False; the keep-mask comes from the TPU
    hardware PRNG seeded from ``dropout_rng``.

    save_probs: True → forward also writes the (pre/post-dropout) probs
    in bf16 so the backward skips the QK+softmax recompute (55% of bwd
    kernel time); False → flash-style recompute backward, nothing of size
    [B,H,S,S] in HBM (max memory headroom). None (auto): save while the
    per-layer prob residuals stay under ~256 MB, recompute beyond
    (bert-base b256 ≈ 100 MB → save; b1024 ≈ 400 MB → recompute, which
    is what lets b1024 train un-remat'ed). FUSED_ATTN_SAVE=0/1 overrides.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = 0.0 if deterministic else float(dropout_rate)
    b, _, s, _ = q.shape
    if attention_mask is None:
        bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        bias = ((1.0 - attention_mask.astype(jnp.float32))
                * -10000.0)[:, None, :]
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if rate > 0.0 and interpret:
        # The Pallas interpreter stubs prng_random_bits to zeros, which
        # would drop every probability. Off-TPU, use the plain einsum path
        # (same math, jax.random keep-mask — dropout streams are
        # backend-specific either way).
        from bert_multimodal_transformer_tpu.ops.attention import (
            dot_product_attention)
        return dot_product_attention(
            q, k, v, bias[:, None, :, :], scale=scale,
            dropout_rate=rate, dropout_rng=dropout_rng,
            deterministic=False)
    if rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    # Blocking override for tuning (in-model kernels are measured via
    # tools/trace_fused_attn.py; standalone timing hits the dispatch floor)
    nb_fwd, nb_bwd, save_probs = _resolve_knobs(
        b, q.shape[1], s, s, rate, q.dtype.itemsize, nb_fwd, nb_bwd,
        save_probs, d=q.shape[1] * q.shape[3])
    return _fused_attention(q, k, v, bias, seed, float(scale), rate,
                            bool(interpret), nb_fwd, nb_bwd, save_probs)


def fused_attention_packed(
    qkv: jax.Array,             # [B, S, 3·D] — raw packed-QKV projection
    attention_mask: Optional[jax.Array],   # [B, S] {0,1}, 1 = real token
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: Optional[bool] = None,
    nb_fwd: Optional[int] = None,
    nb_bwd: Optional[int] = None,
    save_probs: Optional[bool] = None,
) -> jax.Array:
    """fused_attention on the *natural* activation layout.

    Consumes the packed QKV projection output directly (column packing
    ``reshape(B,S,3,H,Dh)``, i.e. q then k then v, head-major within each)
    and returns the context in ``[B, S, D]`` — heads are sliced on the
    lane axis inside the kernel, so the ``[B,S,H,Dh] ↔ [B,H,S,Dh]``
    transposes of the split-tensor API (and their backward twins) never
    reach HBM. Same dropout/residual semantics and knobs as
    ``fused_attention``.

    Long sequences: when the full-H kernel's [H,S,S] scratch exceeds
    scoped VMEM (S>≈380 at base geometry) this entry transparently
    switches to the head-blocked grid (``_resolve_hb_plan``: [hb,S,S]
    scratch, recompute backward, dropout stream seeded per (row,
    head-block)) — compile-verified through S=640 at bert-base bf16 —
    and beyond that to the flash-streamed kernels
    (``_resolve_fs_plan``: online softmax over kb-column blocks,
    [hb,qb,kb] scratch, dropout replay per (row, head-block, q-block,
    k-block)), which keep the prob-dropout semantics at any S that
    fits HBM. Model dispatch gates on ``fused_attention_fits_hb`` /
    ``fused_attention_fits_fs`` and falls back to flash/einsum first;
    if the gates admit a geometry whose kernels the compile probes
    then all reject, the entry itself degrades to einsum math (with a
    trace-time warning) rather than raising inside the jit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = 0.0 if deterministic else float(dropout_rate)
    b, s, d3 = qkv.shape
    if d3 % 3 != 0:
        raise ValueError(
            f"packed QKV last dim must be 3·D, got {d3}")
    d = d3 // 3
    if d % n_heads != 0:
        # a mismatched n_heads would silently mis-slice head lanes
        raise ValueError(
            f"hidden dim {d} not divisible by n_heads={n_heads}")
    dh = d // n_heads
    if attention_mask is None:
        bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        bias = ((1.0 - attention_mask.astype(jnp.float32))
                * -10000.0)[:, None, :]
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if rate > 0.0 and interpret:
        # Off-TPU dropout: route through the einsum path (the interpreter
        # stubs the hardware PRNG) — layout conversion is fine off-TPU.
        from bert_multimodal_transformer_tpu.ops.attention import (
            dot_product_attention)
        q, k, v = [jnp.moveaxis(qkv.reshape(b, s, 3, n_heads, dh)[:, :, i],
                                2, 1) for i in range(3)]
        ctx = dot_product_attention(
            q, k, v, bias[:, None, :, :], scale=scale,
            dropout_rate=rate, dropout_rng=dropout_rng,
            deterministic=False)
        return jnp.moveaxis(ctx, 1, 2).reshape(b, s, d)
    if rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    nb_fwd, nb_bwd, save_probs = _resolve_knobs(
        b, n_heads, s, s, rate, qkv.dtype.itemsize, nb_fwd, nb_bwd,
        save_probs, d=qkv.shape[-1] // 3)
    if fused_attention_fits(n_heads, s, d, qkv.dtype.itemsize):
        return _fused_attention_packed(qkv, bias, seed, float(scale), rate,
                                       n_heads, bool(interpret), nb_fwd,
                                       nb_bwd, save_probs)
    plan = _resolve_hb_plan(b, n_heads, s, d, qkv.dtype.itemsize,
                            rate=rate, scale=float(scale),
                            dtype=qkv.dtype, nb_fwd=nb_fwd, nb_bwd=nb_bwd)
    if plan is not None:
        hb, nb_fwd, nb_bwd = plan
        return _fused_attention_packed_hb(qkv, bias, seed, float(scale),
                                          rate, n_heads, hb,
                                          bool(interpret), nb_fwd, nb_bwd)
    fs_plan = _resolve_fs_plan(b, n_heads, s, d, qkv.dtype.itemsize,
                               rate=rate, scale=float(scale),
                               dtype=qkv.dtype)
    if fs_plan is None:
        # Terminal tier: plain einsum math — same contract as the rel
        # entry (see fused_rel_attention). Reachable when the arithmetic
        # gates admit a geometry whose kernels the compile probes then
        # all reject; warn at trace time instead of killing the run.
        warnings.warn(
            f"fused attention: no kernel plan compiles at H={n_heads} "
            f"S={s} D={d} (full-H/head-blocked/flash-streamed all "
            "probed); falling back to einsum math for this geometry",
            stacklevel=2)
        qh, kh, vh = (qkv.reshape(b, s, 3, n_heads, dh)[:, :, i]
                      for i in range(3))
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        score = score * scale + bias[:, :, None, :]
        probs = jax.nn.softmax(score, axis=-1)
        if rate > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - rate,
                                        probs.shape)
            probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs.astype(qkv.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(b, s, d).astype(qkv.dtype)
    hb, qb, kb = fs_plan
    return _fused_attention_packed_fs(qkv, bias, seed, float(scale), rate,
                                      n_heads, hb, qb, kb,
                                      bool(interpret))


# ---------------------------------------------------------------------------
# QKV-projection mega-fusion: the packed kernel computes qkv = x·W + b in
# VMEM ([nb·S, D] × [D, 3D], weight block grid-invariant so it loads once)
# instead of consuming an XLA gemm's HBM output; the backward builds dqkv
# in VMEM, emits it once (for XLA's dW/db gemms) and computes
# dx = dqkv·Wᵀ in-kernel. Opt-in (BertConfig.qkv_fusion) pending hardware
# timing — tools/exp_qkv_fusion.py measures the fwd and fwd+bwd variants.
# Saved-probs backward only: beyond the prob-residual cap the public
# wrapper falls back to the split (XLA gemm + fused_attention_packed)
# structure, which keeps the recompute/fits-without-remat behavior.
# ---------------------------------------------------------------------------


def _attn_fwd_qkvproj_kernel(seed_ref, bias_ref, x_ref, w_ref, b3_ref,
                             *rest, scale: float, rate: float,
                             n_heads: int, dh: int, s: int, nb: int,
                             emit_qkv: bool, save: bool):
    """x_ref [nb, S, D] row block; w_ref [D, 3D] (grid-invariant);
    b3_ref [1, 3D]; o_ref [nb, S, D]; probs as in the packed kernel
    (written only when ``save`` — the non-differentiated primal never
    materializes them). The head-batched VPU chain is identical to
    _attn_fwd_packed_kernel — only the qkv source differs (VMEM
    projection vs HBM block). The projection dot runs per example
    ([S, D]×[D, 3D]): merging (nb, S) into one flat row dim would need
    an 8-aligned row count (Mosaic block rule) that nb·S=50·nb rarely
    satisfies; the per-dot cost is only the S→8-sublane pad (~12%)."""
    refs = list(rest)
    s_ref = refs.pop()                                      # [H,S,S] f32
    o_ref = refs.pop(0)
    qkv_out_ref = refs.pop(0) if emit_qkv else None
    p_ref = refs.pop(0) if save else None
    pd_ref = refs.pop(0) if save and rate > 0.0 else None
    f32 = jnp.float32
    d = n_heads * dh
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        qkv_b = jax.lax.dot_general(
            x_ref[b], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        qkv_b = (qkv_b + b3_ref[:].astype(f32)).astype(x_ref.dtype)
        if emit_qkv:
            qkv_out_ref[b] = qkv_b                          # [S, 3D]
        bias = bias_ref[b].astype(f32)                      # [1, S]
        for h in range(n_heads):
            q = qkv_b[:, h * dh:(h + 1) * dh]
            k = qkv_b[:, d + h * dh:d + (h + 1) * dh]
            s_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        p = _softmax_f32(s_ref[:] * scale + bias[None])     # [H, S, S]
        if save:
            p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            if save:
                pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(x_ref.dtype)
        row = []
        for h in range(n_heads):
            v = qkv_b[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            row.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(row, axis=-1)            # [S, D]


def _attn_bwd_qkvproj_kernel(p_ref, pd_ref, src_ref, w_ref, b3_ref, g_ref,
                             dqkv_ref, dx_ref, t_ref,
                             *, scale: float, n_heads: int, dh: int,
                             s: int, nb: int, recompute: bool):
    """Saved-probs backward; src_ref is the saved qkv [nb, S, 3D]
    (recompute=False) or x [nb, S, D] to re-project in VMEM
    (recompute=True — drops the qkv residual from HBM entirely). Emits
    dqkv (consumed by XLA's dW/db gemms) and dx = dqkv·Wᵀ in-kernel.
    The ds chain is _attn_bwd_packed_saved_kernel's, head-batched.
    Row blocks are 3-D per the Mosaic trailing-dims rule (see
    _qkvproj_specs); projection/dx dots run per example."""
    f32 = jnp.float32
    d = n_heads * dh
    for b in range(nb):
        if recompute:
            qkv_b = jax.lax.dot_general(
                src_ref[b], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            qkv_b = (qkv_b + b3_ref[:].astype(f32)).astype(src_ref.dtype)
        else:
            qkv_b = src_ref[b]
        g_b = g_ref[b]
        dvs = []
        for h in range(n_heads):
            v = qkv_b[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            g_h = g_b[:, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_ref[b, h], g_h,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(qkv_b.dtype))
            t_ref[h] = jax.lax.dot_general(g_h, v,                 # dpd
                                           (((1,), (1,)), ((), ())),
                                           preferred_element_type=f32)
        p = p_ref[b].astype(f32)
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = (t - p * jnp.sum(t, axis=-1, keepdims=True)) * scale
        ds_c = ds.astype(qkv_b.dtype)
        dqs, dks = [], []
        for h in range(n_heads):
            q = qkv_b[:, h * dh:(h + 1) * dh]
            k = qkv_b[:, d + h * dh:d + (h + 1) * dh]
            dqs.append(jax.lax.dot_general(
                ds_c[h], k, (((1,), (0,)), ((), ())),
                preferred_element_type=f32).astype(qkv_b.dtype))
            dks.append(jax.lax.dot_general(
                ds_c[h], q, (((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(qkv_b.dtype))
        dqkv_b = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [S, 3D]
        dqkv_ref[b] = dqkv_b
        dx_ref[b] = jax.lax.dot_general(
            dqkv_b, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(dx_ref.dtype)


def _qkvproj_fixed_bytes(d: int, h: int, s: int, itemsize: int,
                         n_scratch: int = 1) -> int:
    # resident weight + bias + score scratch(es)
    return d * 3 * d * itemsize + 3 * d * itemsize \
        + _scratch_bytes(h, s, s, n_scratch)


def _qkvproj_row_bytes(s: int, d: int, h: int, n_prob: int, itemsize: int,
                       emit_qkv: bool, n_act: int = 2) -> int:
    sub = (s + 15) // 16 * 16
    lane_s = (s + 127) // 128 * 128
    act = n_act * sub * d * itemsize              # x + out (or + g + dx)
    qkv_tmp = sub * 3 * d * 4                     # f32 projection accum
    probs = n_prob * h * sub * lane_s * itemsize
    emit = sub * 3 * d * itemsize if emit_qkv else 0
    return act + qkv_tmp + probs + emit


def _qkvproj_specs(nb, s, d, h):
    # Row blocks are 3-D (nb, s, d): Mosaic requires the last two block
    # dims to be (8, 128)-divisible OR equal to the array dims. A flat
    # (nb·s, d) block violates that whenever nb·s % 8 != 0 (e.g. s=50,
    # nb=2 → 100 rows — failed lowering on hardware); with the batch as
    # the leading block dim the trailing (s, d) always match the array.
    rows = pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    rows3 = pl.BlockSpec((nb, s, 3 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    w = pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((1, 3 * d), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    prob = pl.BlockSpec((nb, h, s, s), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((nb, 1, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return rows, rows3, w, b3, prob, bias, seed


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "interpret",
                                    "nb", "emit_qkv", "save"))
def _fwd_qkvproj_pallas(x, w, b3, bias, seed, *, scale, rate, n_heads,
                        interpret, nb=None, emit_qkv=False, save=True):
    b, s, d = x.shape
    dh = d // n_heads
    if nb is None:
        n_prob = (2 if rate > 0.0 else 1) if save else 0
        nb = _pick_nb_packed(
            b, _qkvproj_row_bytes(s, d, n_heads, n_prob, x.dtype.itemsize,
                                  emit_qkv),
            fixed_bytes=_qkvproj_fixed_bytes(d, n_heads, s,
                                             x.dtype.itemsize))
    rows, rows3, w_spec, b3_spec, prob, bias_spec, seed_spec = \
        _qkvproj_specs(nb, s, d, n_heads)
    prob_shape = jax.ShapeDtypeStruct((b, n_heads, s, s), x.dtype)
    out_shape = [jax.ShapeDtypeStruct((b, s, d), x.dtype)]
    out_specs = [rows]
    if emit_qkv:
        out_shape.append(jax.ShapeDtypeStruct((b, s, 3 * d), x.dtype))
        out_specs.append(rows3)
    if save:
        out_shape.append(prob_shape)
        out_specs.append(prob)
        if rate > 0.0:
            out_shape.append(prob_shape)
            out_specs.append(prob)
    outs = _pallas_call(
        functools.partial(_attn_fwd_qkvproj_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, s=s, nb=nb,
                          emit_qkv=emit_qkv, save=save),
        grid=(b // nb,),
        in_specs=[seed_spec, bias_spec, rows, w_spec, b3_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((n_heads, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * d * 3 * d
            + 4 * b * n_heads * s * s * dh + 8 * b * n_heads * s * s,
            bytes_accessed=x.dtype.itemsize * b * s * 2 * d
            + x.dtype.itemsize * d * 3 * d,
            transcendentals=b * n_heads * s * s,
        ),
    )(seed, bias, x, w, b3.reshape(1, 3 * d))
    return tuple(outs)


@functools.partial(jax.jit,
                   static_argnames=("scale", "n_heads", "interpret", "nb",
                                    "recompute"))
def _bwd_qkvproj_pallas(p, pd, src, w, b3, g, *, scale, n_heads,
                        interpret, nb=None, recompute=False):
    b, s, d = g.shape
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, _qkvproj_row_bytes(s, d, n_heads, 2, g.dtype.itemsize,
                                  emit_qkv=True, n_act=3)
            + (0 if recompute else 2 * s * d * g.dtype.itemsize),
            fixed_bytes=_qkvproj_fixed_bytes(d, n_heads, s,
                                             g.dtype.itemsize))
    rows, rows3, w_spec, b3_spec, prob, _, _ = _qkvproj_specs(
        nb, s, d, n_heads)
    src_spec = rows if recompute else rows3
    dqkv, dx = _pallas_call(
        functools.partial(_attn_bwd_qkvproj_kernel, scale=scale,
                          n_heads=n_heads, dh=dh, s=s, nb=nb,
                          recompute=recompute),
        grid=(b // nb,),
        in_specs=[prob, prob, src_spec, w_spec, b3_spec, rows],
        out_specs=(rows3, rows),
        out_shape=(jax.ShapeDtypeStruct((b, s, 3 * d), g.dtype),
                   jax.ShapeDtypeStruct((b, s, d), g.dtype)),
        scratch_shapes=[pltpu.VMEM((n_heads, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * s * d * 3 * d) * (2 if recompute else 1)
            + 8 * b * n_heads * s * s * dh + 8 * b * n_heads * s * s,
            bytes_accessed=g.dtype.itemsize * b * s * (4 * d + 3 * d)
            + g.dtype.itemsize * d * 3 * d,
            transcendentals=0,
        ),
    )(p, pd, src, w, b3.reshape(1, 3 * d), g)
    return dqkv, dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused_attention_qkvproj(x, w, b3, bias, seed, scale, rate, n_heads,
                             interpret, nb_fwd, nb_bwd, qkv_residual):
    # Primal (non-differentiated) call never materializes probs.
    return _fwd_qkvproj_pallas(x, w, b3, bias, seed, scale=scale,
                               rate=rate, n_heads=n_heads,
                               interpret=interpret, nb=nb_fwd,
                               save=False)[0]


def _faq_fwd(x, w, b3, bias, seed, scale, rate, n_heads, interpret,
             nb_fwd, nb_bwd, qkv_residual):
    outs = _fwd_qkvproj_pallas(x, w, b3, bias, seed, scale=scale,
                               rate=rate, n_heads=n_heads,
                               interpret=interpret, nb=nb_fwd,
                               emit_qkv=qkv_residual)
    outs = list(outs)
    out = outs.pop(0)
    qkv = outs.pop(0) if qkv_residual else None
    p = outs.pop(0)
    pd = outs.pop(0) if rate > 0.0 else p
    return out, (x, w, b3, qkv, p, pd, bias)


def _faq_bwd(scale, rate, n_heads, interpret, nb_fwd, nb_bwd, qkv_residual,
             residuals, g):
    x, w, b3, qkv, p, pd, bias = residuals
    b, s, d = x.shape
    g = g.astype(x.dtype)
    dqkv, dx = _bwd_qkvproj_pallas(
        p, pd, qkv if qkv_residual else x, w, b3, g, scale=scale,
        n_heads=n_heads, interpret=interpret, nb=nb_bwd,
        recompute=not qkv_residual)
    f32 = jnp.float32
    dw = jax.lax.dot_general(
        x.reshape(b * s, d), dqkv.reshape(b * s, 3 * d),
        (((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(w.dtype)
    db3 = jnp.sum(dqkv.astype(f32), axis=(0, 1)).astype(b3.dtype)
    dbias = jnp.zeros_like(bias)   # mask bias carries no useful gradient
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dx, dw, db3.reshape(b3.shape), dbias, dseed


_fused_attention_qkvproj.defvjp(_faq_fwd, _faq_bwd)


def fused_attention_qkvproj(
    x: jax.Array,               # [B, S, D] hidden states
    w: jax.Array,               # [D, 3D] packed QKV kernel (q|k|v cols)
    b3: jax.Array,              # [3D] packed QKV bias
    attention_mask: Optional[jax.Array],   # [B, S] {0,1}, 1 = real token
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: Optional[bool] = None,
    qkv_residual: bool = False,
    nb_fwd: Optional[int] = None,
    nb_bwd: Optional[int] = None,
) -> jax.Array:
    """fused_attention_packed with the QKV projection fused in.

    Instead of consuming an XLA gemm's [B, S, 3D] output from HBM, the
    kernel computes qkv = x·W + b in VMEM per grid block — as
    per-example [S, D]×[D, 3D] dots over 3-D (nb, S, D) row blocks
    (Mosaic's 8-sublane block rule forbids flat (nb·S, D) blocks when
    nb·S % 8 ≠ 0; the weight block is grid-invariant and loads once).
    The backward builds dqkv in VMEM, emits it once for XLA's dW/db
    gemms, and computes dx = dqkv·Wᵀ in-kernel. ``qkv_residual=True``
    additionally writes qkv to HBM in the forward so the backward skips
    the re-projection (classic save-vs-recompute trade; False drops the
    ~B·S·3D residual entirely). Saved-probs backward only — beyond the
    256 MB prob-residual cap this falls back to the split structure
    (XLA gemm + fused_attention_packed with its recompute backward).
    Dropout semantics, PRNG seeding and the head-batched VPU chain are
    identical to fused_attention_packed. Measured −8.6% vs the split
    default at bert-base b256 (BENCHMARKS.md "QKV mega-fusion"): Mosaic
    schedules the per-example projection dots worse than XLA's single
    [B·S, D] gemm — kept opt-in (BertConfig.qkv_fusion) with a green
    hardware canary (tools/check_qkvproj_tpu.py).
    """
    b, s, d = x.shape
    d3 = 3 * d
    if w.shape != (d, d3):
        raise ValueError(f"qkv kernel must be [{d}, {d3}], got {w.shape}")
    if b3.shape not in ((d3,), (1, d3)):
        raise ValueError(f"qkv bias must be [{d3}], got {b3.shape}")
    if d % n_heads != 0:
        raise ValueError(
            f"hidden dim {d} not divisible by n_heads={n_heads}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")

    def _split_fallback():
        qkv = (jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               .astype(x.dtype) + b3.reshape(d3).astype(x.dtype))
        return fused_attention_packed(
            qkv, attention_mask, n_heads=n_heads, scale=scale,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic, interpret=interpret)

    if rate > 0.0 and interpret:
        # off-TPU the interpreter stubs the hardware PRNG — the packed
        # entry point routes dropout through the einsum path
        return _split_fallback()
    _, _, save_probs = _resolve_knobs(b, n_heads, s, s, rate,
                                      x.dtype.itemsize, None, None, None)
    if not save_probs:
        # beyond the prob-residual cap the split path's recompute
        # backward is the memory-safe structure
        return _split_fallback()
    if rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    if attention_mask is None:
        bias = jnp.zeros((b, 1, s), jnp.float32)
    else:
        bias = ((1.0 - attention_mask.astype(jnp.float32))
                * -10000.0)[:, None, :]
    if nb_fwd is None and "FUSED_ATTN_NB_FWD" in os.environ:
        nb_fwd = int(os.environ["FUSED_ATTN_NB_FWD"])
    if nb_bwd is None and "FUSED_ATTN_NB_BWD" in os.environ:
        nb_bwd = int(os.environ["FUSED_ATTN_NB_BWD"])
    return _fused_attention_qkvproj(
        x, w, b3.reshape(1, d3), bias, seed, float(scale), rate, n_heads,
        bool(interpret), nb_fwd, nb_bwd, bool(qkv_residual))


def fused_rel_attention(
    q: jax.Array,               # [B, Q, D] packed head-major (bqhf flat)
    k: jax.Array,               # [B, K, D]
    v: jax.Array,               # [B, K, D]
    ebias: jax.Array,           # [B, H, Q, K] additive score bias (f32 ok)
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: Optional[bool] = None,
    nb_fwd: Optional[int] = None,
    nb_bwd: Optional[int] = None,
    save_probs: Optional[bool] = None,
) -> jax.Array:
    """Fused attention with a full per-head additive score bias.

    ``softmax(q_h·k_hᵀ·scale + ebias[:,h])`` with in-kernel prob-dropout,
    for attention variants whose score has extra terms (XLNet relative
    attention: ebias = (bd + ef)·scale − BIG·mask assembled outside; the
    reference's two-stream scores at xlnet.py:374-386 via HF XLNetLayer).
    ebias is differentiable — the backward kernels emit dscore for it.
    Layout contract matches the ``bqhf`` einsum family: reshaping
    [B,Q,H,Dh] ↔ [B,Q,D] is free.

    Long sequences / long mems: when the full-H kernel's [H,Q,K]
    scratch exceeds scoped VMEM this entry transparently switches to
    the head-blocked grid (``_resolve_rel_hb_plan``; recompute
    backward, dropout seeded per (row, head-block)) and beyond that to
    the flash-streamed kernels (``_resolve_rel_fs_plan``: online
    softmax over kb-column key blocks, [hb,qb,kb] scratch and ebias
    slices, dropout replay per (row, head-block, q-block, k-block)).
    models/xlnet.py gates on ``fused_rel_attention_fits_hb`` /
    ``fused_rel_attention_fits_fs`` and falls back to the einsum path
    first; if the gates admit a geometry whose kernels the compile
    probes then all reject, the entry itself degrades to einsum math
    (with a trace-time warning) rather than raising inside the jit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = 0.0 if deterministic else float(dropout_rate)
    b, q_len, d = q.shape
    if d % n_heads != 0:
        # a mismatched n_heads would silently mis-slice head lanes
        raise ValueError(
            f"hidden dim {d} not divisible by n_heads={n_heads}")
    dh = d // n_heads
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if rate > 0.0 and interpret:
        # Off-TPU dropout: plain einsum math, jax.random keep-mask.
        qh = q.reshape(b, q_len, n_heads, dh)
        kh = k.reshape(b, k.shape[1], n_heads, dh)
        vh = v.reshape(b, k.shape[1], n_heads, dh)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        score = score * scale + ebias.astype(jnp.float32)
        probs = jax.nn.softmax(score, axis=-1)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs.astype(q.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(b, q_len, d).astype(q.dtype)
    if rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    save_forced = (save_probs is not None
                   or "FUSED_ATTN_SAVE" in os.environ)
    nb_fwd, nb_bwd, save_probs = _resolve_knobs(
        b, n_heads, q_len, k.shape[1], rate, q.dtype.itemsize, nb_fwd,
        nb_bwd, save_probs)
    if fused_rel_attention_fits(n_heads, q_len, k.shape[1], d,
                                q.dtype.itemsize, ebias.dtype.itemsize):
        # The arithmetic fit models the recompute backward; the residual
        # MODE still needs compile verification (the saved backward's
        # [H,Q,K] prob blocks OOM'd scoped VMEM at Q=50 K=562 while the
        # block model said fit — see _rel_full_kernel_compiles). On
        # failure the plan demotes saved→recompute, walks nb down, and
        # returns None to fall through to the head-blocked grid.
        full_plan = _resolve_rel_full_plan(
            b, n_heads, q_len, k.shape[1], d, q.dtype.itemsize,
            rate=rate, scale=float(scale), dtype=q.dtype,
            eb_dtype=ebias.dtype, nb_fwd=nb_fwd, nb_bwd=nb_bwd,
            save=save_probs, save_forced=save_forced)
        if full_plan is not None:
            nb_f, nb_b, save_full = full_plan
            return _fused_rel_attention(q, k, v, ebias, seed,
                                        float(scale), rate, n_heads,
                                        bool(interpret), (nb_f, nb_b),
                                        save_full)
    plan = _resolve_rel_hb_plan(
        b, n_heads, q_len, k.shape[1], d, q.dtype.itemsize,
        ebias.dtype.itemsize, rate=rate, scale=float(scale),
        dtype=q.dtype, eb_dtype=ebias.dtype, nb_fwd=nb_fwd, nb_bwd=nb_bwd)
    if plan is not None:
        hb, nb_fwd, nb_bwd = plan
        return _fused_rel_attention_hb(q, k, v, ebias, seed, float(scale),
                                       rate, n_heads, hb, bool(interpret),
                                       (nb_fwd, nb_bwd))
    fs_plan = _resolve_rel_fs_plan(
        b, n_heads, q_len, k.shape[1], d, q.dtype.itemsize,
        ebias.dtype.itemsize, rate=rate, scale=float(scale),
        dtype=q.dtype, eb_dtype=ebias.dtype)
    if fs_plan is None:
        # Terminal tier: plain einsum math. Reachable when the
        # arithmetic fit admits a geometry whose kernels the compile
        # probes then all reject (the gate in models/xlnet.py cannot
        # predict probe outcomes) — e.g. a mems geometry whose K is not
        # 128-divisible, closing the fs ladder. Warn at trace time
        # rather than raise: this is a performance downgrade, not an
        # error, and it must not kill a training run. The dropout
        # stream differs from the kernels' hardware PRNG (impl detail,
        # not part of the op contract).
        warnings.warn(
            f"fused rel attention: no kernel plan compiles at "
            f"H={n_heads} Q={q_len} K={k.shape[1]} D={d} "
            "(full-H/head-blocked/flash-streamed all probed); "
            "falling back to einsum math for this geometry",
            stacklevel=2)
        qh = q.reshape(b, q_len, n_heads, dh)
        kh = k.reshape(b, k.shape[1], n_heads, dh)
        vh = v.reshape(b, k.shape[1], n_heads, dh)
        score = jnp.einsum("bqhf,bkhf->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
        score = score * scale + ebias.astype(jnp.float32)
        probs = jax.nn.softmax(score, axis=-1)
        if rate > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - rate,
                                        probs.shape)
            probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        ctx = jnp.einsum("bhqk,bkhf->bqhf", probs.astype(q.dtype), vh,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(b, q_len, d).astype(q.dtype)
    hb, qb, kb = fs_plan
    return _fused_rel_attention_fs(q, k, v, ebias, seed, float(scale),
                                   rate, n_heads, hb, qb, kb,
                                   bool(interpret))


# --------------------------------------------------------------------------
# Ingredients-fused rel attention: bias assembly inside the kernel
# --------------------------------------------------------------------------
# The streamed-ebias path above still materializes, per layer, the
# [B,H,Q,P] bd einsum output, the rel_shift relayout, and the [B,H,Q,K]
# ebias/debias streams in HBM (device-trace attribution: the assembly
# family is ~15% of the XLNet step at b256). This variant takes the raw
# ingredients instead and assembles the score bias in VMEM:
#
#   rw  [B,Q,D]  q + r_w_bias                      (content term)
#   rr  [B,Q,D]  (q + r_r_bias)·scale              (position query)
#   r   [P,D]    k_head_r = pos_emb·W_r            (shared across batch)
#   ed  [B,H,Q]  scale·(q+r_s_bias)·(seg₁−seg₀)    (segment-ef delta)
#   segd  [B,Q,K]  seg-difference mask (0/1)
#   maskb [B,Q,K]  additive mask bias (−1e30·mask), non-differentiable
#
# The relative shift out[q,k] = bd[q, Q−q+k] (the pad/reshape trick of
# models/xlnet.py::rel_shift, reference HF XLNetRelativeAttention) runs
# as a LOG-SHIFT: the per-row amount a_q = Q−q decomposes into its bits,
# each bit one masked lane-roll of the whole [H,Q,P] block. Wraparound
# is provably harmless (k < K ≤ P−a_q for P ≥ Q+K). The backward
# transposes it by right-rolling the zero-padded ds (wrapped elements
# come from the zero tail) and ACCUMULATES d_r across the grid into one
# [P,D] block (constant out index_map; grid steps are sequential).
#
# The reference ef term selects between ef₀ (seg-same) and ef₁
# (seg-diff) per (h,q,k); ef₀ is constant along k ⇒ softmax-invariant
# with exactly-zero gradient (softmax-VJP rows sum to 0), so only the
# delta ed·segd enters. Outputs differ from the streamed path only by
# fp rounding of the dropped constant (tools/exp_rel_inkernel.py: 1e-7
# rel at fp32). Dropout seeding/draws are identical to the streamed
# kernel (one [H,Q,K] draw per global row).


def _shift_bits(q_len: int):
    """Bit decomposition steps for per-row shift amounts in [1, q_len]."""
    return [1 << i for i in range(q_len.bit_length())]


def _log_shift(x, q_len: int, k_len: int):
    """x [H, Q, P] → [H, Q, K] with out[h,q,k] = x[h,q, (Q−q)+k]."""
    qidx = jax.lax.broadcasted_iota(jnp.int32, (1, q_len, 1), 1)
    a = q_len - qidx
    for amt in _shift_bits(q_len):
        rolled = jnp.concatenate([x[..., amt:], x[..., :amt]], axis=-1)
        x = jnp.where((a & amt) != 0, rolled, x)
    return x[..., :k_len]


def _log_unshift(ds, q_len: int, p_len: int):
    """Transpose of _log_shift: ds [H, Q, K] → z [H, Q, P] with
    z[h,q,(Q−q)+k] = ds[h,q,k], zeros elsewhere."""
    h, _, k_len = ds.shape
    z = jnp.concatenate(
        [ds, jnp.zeros((h, q_len, p_len - k_len), ds.dtype)], axis=-1)
    qidx = jax.lax.broadcasted_iota(jnp.int32, (1, q_len, 1), 1)
    a = q_len - qidx
    for amt in _shift_bits(q_len):
        rolled = jnp.concatenate(
            [z[..., p_len - amt:], z[..., :p_len - amt]], axis=-1)
        z = jnp.where((a & amt) != 0, rolled, z)
    return z


def _relik_scores(b, maskb_ref, segd_ref, ed_ref, rw_ref, rr_ref, r_ref,
                  k_ref, s_ref, b2_ref, *, scale, n_heads, dh, q_len,
                  k_len):
    """Shared fwd/bwd score assembly for one grid row: ac and bd dots
    into scratch, log-shift, segment/mask bias adds. Returns probs."""
    f32 = jnp.float32
    for h in range(n_heads):
        rw = rw_ref[b, :, h * dh:(h + 1) * dh]
        kh = k_ref[b, :, h * dh:(h + 1) * dh]
        s_ref[h] = jax.lax.dot_general(
            rw, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        rr = rr_ref[b, :, h * dh:(h + 1) * dh]
        rh = r_ref[:, h * dh:(h + 1) * dh]
        b2_ref[h] = jax.lax.dot_general(
            rr, rh, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    sh = _log_shift(b2_ref[:], q_len, k_len)
    ed = ed_ref[b].astype(f32)[:, :, None]                   # [H, Q, 1]
    segd = segd_ref[b].astype(f32)[None]                     # [1, Q, K]
    maskb = maskb_ref[b].astype(f32)[None]
    s = s_ref[:] * scale + sh + ed * segd + maskb
    return _softmax_f32(s)                                   # [H, Q, K]


def _attn_fwd_relik_kernel(seed_ref, maskb_ref, segd_ref, ed_ref, rw_ref,
                           rr_ref, r_ref, k_ref, v_ref, o_ref, *rest,
                           scale: float, rate: float, n_heads: int,
                           dh: int, nb: int, save: bool = False):
    s_ref, b2_ref = rest[-2], rest[-1]
    q_len, k_len = s_ref.shape[1], s_ref.shape[2]
    if save:
        p_ref = rest[0]
        pd_ref = rest[1] if rate > 0.0 else None
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    for b in range(nb):
        p = _relik_scores(b, maskb_ref, segd_ref, ed_ref, rw_ref, rr_ref,
                          r_ref, k_ref, s_ref, b2_ref, scale=scale,
                          n_heads=n_heads, dh=dh, q_len=q_len,
                          k_len=k_len)
        if save:
            p_ref[b] = p.astype(p_ref.dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            p = jnp.where(bits >= thresh, p * inv_keep, 0.0)
            if save:
                pd_ref[b] = p.astype(pd_ref.dtype)
        pc = p.astype(rw_ref.dtype)
        outs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            o = jax.lax.dot_general(pc[h], v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)


def _relik_grads(b, ds, segd, rw_ref, rr_ref, r_ref, k_ref,
                 drw_ref, drr_ref, dk_ref, ded_ref,
                 dr_ref, *, scale, n_heads, dh, q_len, p_len):
    """Shared bwd tail from ds (unscaled dscore): segment-delta grad,
    unshift, and the grad dot families. dv/t are handled by callers
    (they differ between saved and recompute variants)."""
    ded_ref[b] = jnp.sum(ds * segd, axis=-1).astype(ded_ref.dtype)
    z = _log_unshift(ds, q_len, p_len).astype(rw_ref.dtype)  # [H,Q,P]
    dsc = (ds * scale).astype(rw_ref.dtype)
    drws, drrs, dks = [], [], []
    for h in range(n_heads):
        kh = k_ref[b, :, h * dh:(h + 1) * dh]
        rw = rw_ref[b, :, h * dh:(h + 1) * dh]
        rr = rr_ref[b, :, h * dh:(h + 1) * dh]
        rh = r_ref[:, h * dh:(h + 1) * dh]
        drw = jax.lax.dot_general(dsc[h], kh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc[h], rw, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        drr = jax.lax.dot_general(z[h], rh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dr = jax.lax.dot_general(z[h], rr, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dr_ref[:, h * dh:(h + 1) * dh] += dr
        drws.append(drw.astype(drw_ref.dtype))
        drrs.append(drr.astype(drr_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
    drw_ref[b] = jnp.concatenate(drws, axis=-1)
    drr_ref[b] = jnp.concatenate(drrs, axis=-1)
    dk_ref[b] = jnp.concatenate(dks, axis=-1)


def _attn_bwd_relik_kernel(seed_ref, maskb_ref, segd_ref, ed_ref, rw_ref,
                           rr_ref, r_ref, k_ref, v_ref, g_ref,
                           drw_ref, drr_ref, dk_ref, dv_ref, ded_ref,
                           dr_ref, s_ref, b2_ref, t_ref, *,
                           scale: float, rate: float, n_heads: int,
                           dh: int, nb: int):
    """Recompute backward: replays the forward's per-row [H,Q,K] draw."""
    f32 = jnp.float32
    q_len, k_len = s_ref.shape[1], s_ref.shape[2]
    p_len = b2_ref.shape[2]
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[...] = jnp.zeros_like(dr_ref)

    for b in range(nb):
        p = _relik_scores(b, maskb_ref, segd_ref, ed_ref, rw_ref, rr_ref,
                          r_ref, k_ref, s_ref, b2_ref, scale=scale,
                          n_heads=n_heads, dh=dh, q_len=q_len,
                          k_len=k_len)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * nb + b)
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32)
            pd = jnp.where(bits >= thresh, p * inv_keep, 0.0)
        else:
            pd = p
        pd_c = pd.astype(rw_ref.dtype)
        dvs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_c[h], g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                  # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)
        t = pd * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)      # [H,Q,K]
        _relik_grads(b, ds, segd_ref[b].astype(f32)[None], rw_ref,
                     rr_ref, r_ref, k_ref, drw_ref,
                     drr_ref, dk_ref, ded_ref, dr_ref,
                     scale=scale, n_heads=n_heads, dh=dh, q_len=q_len,
                     p_len=p_len)


def _attn_bwd_relik_saved_kernel(p_ref, pd_ref, segd_ref, rw_ref, rr_ref,
                                 r_ref, k_ref, v_ref, g_ref,
                                 drw_ref, drr_ref, dk_ref, dv_ref,
                                 ded_ref, dr_ref, t_ref, *,
                                 scale: float, n_heads: int, dh: int,
                                 nb: int, p_len: int):
    """Saved-probs backward: no ac/bd dots, no shift, no softmax/PRNG."""
    f32 = jnp.float32
    q_len = t_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dr_ref[...] = jnp.zeros_like(dr_ref)

    for b in range(nb):
        dvs = []
        for h in range(n_heads):
            v = v_ref[b, :, h * dh:(h + 1) * dh]
            g = g_ref[b, :, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(pd_ref[b, h], g,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvs.append(dv.astype(dv_ref.dtype))
            t_ref[h] = jax.lax.dot_general(                  # dpd
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)
        p = p_ref[b].astype(f32)
        t = pd_ref[b].astype(f32) * t_ref[:]
        ds = t - p * jnp.sum(t, axis=-1, keepdims=True)
        _relik_grads(b, ds, segd_ref[b].astype(f32)[None],
                     rw_ref, rr_ref, r_ref, k_ref, drw_ref,
                     drr_ref, dk_ref, ded_ref, dr_ref,
                     scale=scale, n_heads=n_heads, dh=dh, q_len=q_len,
                     p_len=p_len)


def _relik_specs(nb, q_len, k_len, d, h, p_len):
    seed = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    qk = pl.BlockSpec((nb, q_len, k_len), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    ed = pl.BlockSpec((nb, h, q_len), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    row = pl.BlockSpec((nb, q_len, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((nb, k_len, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    r = pl.BlockSpec((p_len, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
    return seed, qk, ed, row, kv, r


def _relik_row_bytes(q_len, k_len, p_len, d, h, n_prob, itemsize):
    # per-ROW blocks: rw+rr+o, k+v, segd+maskb, probs. The [H,Q,K]/[H,Q,P]
    # f32 scratches and the grid-invariant r/dr blocks are per-PROGRAM —
    # callers pass them via fixed_bytes (_relik_fixed_bytes).
    subq = (q_len + 15) // 16 * 16
    subk = (k_len + 15) // 16 * 16
    lane_k = (k_len + 127) // 128 * 128
    return (3 * subq * d + 2 * subk * d) * itemsize \
        + 2 * subq * lane_k * itemsize \
        + n_prob * h * subq * lane_k * itemsize


def _relik_fixed_bytes(q_len, k_len, p_len, d, h, itemsize,
                       n_k_scratch, n_p_scratch, with_dr):
    subp = (p_len + 15) // 16 * 16
    return (_scratch_bytes(h, q_len, k_len, n_k_scratch)
            + _scratch_bytes(h, q_len, p_len, n_p_scratch)
            + subp * d * itemsize                    # r block
            + (subp * d * 4 if with_dr else 0))      # dr accumulator


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads",
                                    "interpret", "nb", "save"))
def _fwd_relik_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, *, scale,
                      rate, n_heads, interpret, nb=None, save=False):
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    dh = d // n_heads
    n_prob = (2 if rate > 0.0 else 1) if save else 0
    if nb is None:
        nb = _pick_nb_packed(
            b, _relik_row_bytes(q_len, k_len, p_len, d, n_heads, n_prob,
                                rw.dtype.itemsize),
            fixed_bytes=_relik_fixed_bytes(
                q_len, k_len, p_len, d, n_heads, rw.dtype.itemsize,
                n_k_scratch=1, n_p_scratch=1, with_dr=False))
    seed_spec, qk_spec, ed_spec, row_spec, kv_spec, r_spec = _relik_specs(
        nb, q_len, k_len, d, n_heads, p_len)
    out_specs, out_shape = row_spec, jax.ShapeDtypeStruct((b, q_len, d),
                                                          rw.dtype)
    if save:
        prob_spec = pl.BlockSpec((nb, n_heads, q_len, k_len),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        prob_shape = jax.ShapeDtypeStruct((b, n_heads, q_len, k_len),
                                          rw.dtype)
        if rate > 0.0:
            out_specs = (row_spec, prob_spec, prob_spec)
            out_shape = (out_shape, prob_shape, prob_shape)
        else:
            out_specs = (row_spec, prob_spec)
            out_shape = (out_shape, prob_shape)
    return _pallas_call(
        functools.partial(_attn_fwd_relik_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb, save=save),
        grid=(b // nb,),
        in_specs=[seed_spec, qk_spec, qk_spec, ed_spec, row_spec,
                  row_spec, r_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32),
                        pltpu.VMEM((n_heads, q_len, p_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_heads * q_len * (2 * k_len + p_len) * dh
            + 12 * b * n_heads * q_len * k_len,
            bytes_accessed=rw.dtype.itemsize * b * q_len * 5 * d,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, maskb, segd, ed, rw, rr, r, k, v)


def _relik_grad_shapes(rw, k, ed, r):
    return (jax.ShapeDtypeStruct(rw.shape, rw.dtype),        # drw
            jax.ShapeDtypeStruct(rw.shape, rw.dtype),        # drr
            jax.ShapeDtypeStruct(k.shape, k.dtype),          # dk
            jax.ShapeDtypeStruct(k.shape, k.dtype),          # dv
            jax.ShapeDtypeStruct(ed.shape, ed.dtype),        # ded
            jax.ShapeDtypeStruct(r.shape, jnp.float32))      # dr (accum)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads",
                                    "interpret", "nb"))
def _bwd_relik_pallas(rw, rr, r, k, v, ed, segd, maskb, seed, g, *,
                      scale, rate, n_heads, interpret, nb=None):
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _relik_row_bytes(q_len, k_len, p_len, d, n_heads, 1,
                                    rw.dtype.itemsize),
            fixed_bytes=_relik_fixed_bytes(
                q_len, k_len, p_len, d, n_heads, rw.dtype.itemsize,
                n_k_scratch=2, n_p_scratch=1, with_dr=True))
    seed_spec, qk_spec, ed_spec, row_spec, kv_spec, r_spec = _relik_specs(
        nb, q_len, k_len, d, n_heads, p_len)
    dr_spec = pl.BlockSpec((p_len, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_attn_bwd_relik_kernel, scale=scale, rate=rate,
                          n_heads=n_heads, dh=dh, nb=nb),
        grid=(b // nb,),
        in_specs=[seed_spec, qk_spec, qk_spec, ed_spec, row_spec,
                  row_spec, r_spec, kv_spec, kv_spec, row_spec],
        out_specs=(row_spec, row_spec, kv_spec, kv_spec, ed_spec,
                   dr_spec),
        out_shape=_relik_grad_shapes(rw, k, ed, r),
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32),
                        pltpu.VMEM((n_heads, q_len, p_len), jnp.float32),
                        pltpu.VMEM((n_heads, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n_heads * q_len * (k_len + p_len) * dh
            + 16 * b * n_heads * q_len * k_len,
            bytes_accessed=rw.dtype.itemsize * b * q_len * 10 * d,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, maskb, segd, ed, rw, rr, r, k, v, g)


@functools.partial(jax.jit,
                   static_argnames=("scale", "n_heads", "interpret",
                                    "nb"))
def _bwd_relik_saved_pallas(p, pd, rw, rr, r, k, v, segd, g, *, scale,
                            n_heads, interpret, nb=None):
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    dh = d // n_heads
    if nb is None:
        nb = _pick_nb_packed(
            b, 2 * _relik_row_bytes(q_len, k_len, p_len, d, n_heads, 2,
                                    rw.dtype.itemsize),
            fixed_bytes=_relik_fixed_bytes(
                q_len, k_len, p_len, d, n_heads, rw.dtype.itemsize,
                n_k_scratch=1, n_p_scratch=0, with_dr=True))
    _, qk_spec, ed_spec, row_spec, kv_spec, r_spec = _relik_specs(
        nb, q_len, k_len, d, n_heads, p_len)
    prob_spec = pl.BlockSpec((nb, n_heads, q_len, k_len),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    dr_spec = pl.BlockSpec((p_len, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    ed_shape = jax.ShapeDtypeStruct((b, n_heads, q_len), rw.dtype)
    return _pallas_call(
        functools.partial(_attn_bwd_relik_saved_kernel, scale=scale,
                          n_heads=n_heads, dh=dh, nb=nb, p_len=p_len),
        grid=(b // nb,),
        in_specs=[prob_spec, prob_spec, qk_spec, row_spec, row_spec,
                  r_spec, kv_spec, kv_spec, row_spec],
        out_specs=(row_spec, row_spec, kv_spec, kv_spec, ed_spec,
                   dr_spec),
        out_shape=(jax.ShapeDtypeStruct(rw.shape, rw.dtype),
                   jax.ShapeDtypeStruct(rw.shape, rw.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   ed_shape,
                   jax.ShapeDtypeStruct(r.shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((n_heads, q_len, k_len), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * q_len * (k_len + p_len) * dh
            + 10 * b * n_heads * q_len * k_len,
            bytes_accessed=rw.dtype.itemsize * b * q_len * 10 * d,
            transcendentals=0,
        ),
    )(p, pd, segd, rw, rr, r, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14))
def _fused_rel_attention_ik(rw, rr, r, k, v, ed, segd, maskb, seed,
                            scale, rate, n_heads, interpret, nb_fwd_bwd,
                            save):
    return _fwd_relik_pallas(rw, rr, r, k, v, ed, segd, maskb, seed,
                             scale=scale, rate=rate, n_heads=n_heads,
                             interpret=interpret, nb=nb_fwd_bwd[0])


def _frelik_fwd(rw, rr, r, k, v, ed, segd, maskb, seed, scale, rate,
                n_heads, interpret, nb_fwd_bwd, save):
    if save:
        outs = _fwd_relik_pallas(rw, rr, r, k, v, ed, segd, maskb, seed,
                                 scale=scale, rate=rate, n_heads=n_heads,
                                 interpret=interpret, nb=nb_fwd_bwd[0],
                                 save=True)
        if rate > 0.0:
            out, p, pd = outs
        else:
            out, p = outs
            pd = p
        return out, (rw, rr, r, k, v, segd, p, pd,
                     jnp.zeros((0,), ed.dtype),
                     jnp.zeros((0,), maskb.dtype))
    out = _fwd_relik_pallas(rw, rr, r, k, v, ed, segd, maskb, seed,
                            scale=scale, rate=rate, n_heads=n_heads,
                            interpret=interpret, nb=nb_fwd_bwd[0])
    return out, (rw, rr, r, k, v, ed, segd, maskb, seed)


def _frelik_bwd(scale, rate, n_heads, interpret, nb_fwd_bwd, save,
                residuals, g):
    if save:
        rw, rr, r, k, v, segd, p, pd, ed_token, maskb_token = residuals
        drw, drr, dk, dv, ded, dr = _bwd_relik_saved_pallas(
            p, pd, rw, rr, r, k, v, segd, g, scale=scale,
            n_heads=n_heads, interpret=interpret, nb=nb_fwd_bwd[1])
        ded = ded.astype(ed_token.dtype)
        maskb_zero = jnp.zeros((segd.shape), maskb_token.dtype)
    else:
        rw, rr, r, k, v, ed, segd, maskb, seed = residuals
        drw, drr, dk, dv, ded, dr = _bwd_relik_pallas(
            rw, rr, r, k, v, ed, segd, maskb, seed, g, scale=scale,
            rate=rate, n_heads=n_heads, interpret=interpret,
            nb=nb_fwd_bwd[1])
        maskb_zero = jnp.zeros_like(maskb)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return (drw, drr, dr.astype(r.dtype), dk, dv, ded,
            jnp.zeros_like(segd), maskb_zero, dseed)


_fused_rel_attention_ik.defvjp(_frelik_fwd, _frelik_bwd)


def fused_rel_attention_ingredients(
    rw: jax.Array,              # [B, Q, D]  q + r_w_bias (head-major flat)
    rr: jax.Array,              # [B, Q, D]  (q + r_r_bias)·scale
    r: jax.Array,               # [P, D]     k_head_r, P ≥ Q + K
    k: jax.Array,               # [B, K, D]
    v: jax.Array,               # [B, K, D]
    ed: jax.Array,              # [B, H, Q]  scale·(q+r_s_bias)·(seg₁−seg₀)
    segd: jax.Array,            # [B, Q, K]  seg-diff mask (0/1)
    maskb: jax.Array,           # [B, Q, K]  additive mask bias (non-diff)
    *,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: Optional[bool] = None,
    nb_fwd: Optional[int] = None,
    nb_bwd: Optional[int] = None,
    save_probs: Optional[bool] = None,
    tier: Optional[str] = None,
    fs_plan: Optional[tuple] = None,
) -> jax.Array:
    """XLNet relative attention with the score-bias assembly in VMEM.

    Semantically fused_rel_attention with
    ``ebias = rel_shift(rr·rᵀ) + ed·segd + maskb`` (and an irrelevant
    per-(h,q) constant dropped — softmax-invariant, zero gradient; see
    section comment). rw/rr/r/k/v/ed are differentiable; segd/maskb are
    not. Reference semantics: HF XLNetRelativeAttention.rel_attn_core
    via /root/reference/xlnet.py:330-390.

    Long sequences: past the full-H fit this entry switches to the
    ingredients flash-streamed kernels (``_resolve_relik_fs_plan``:
    bd assembled per (qb, kb) block from a dynamically-sliced position
    window + per-row log-shift — see the section comment below) and,
    beyond every plan, degrades to host-side ebias assembly + the
    tiered ``fused_rel_attention`` entry. ``tier`` forces "full"/"fs"
    (tests, tuning); ``fs_plan`` overrides the resolved (hb, qb, kb).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rate = 0.0 if deterministic else float(dropout_rate)
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    if d % n_heads != 0:
        raise ValueError(
            f"hidden dim {d} not divisible by n_heads={n_heads}")
    if p_len < q_len + k_len:
        raise ValueError(
            f"position stream P={p_len} < Q+K={q_len + k_len}: the "
            "log-shift wraparound-safety bound needs P ≥ Q+K")
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if rate > 0.0 and interpret:
        # Off-TPU dropout: plain einsum math, jax.random keep-mask.
        dh = d // n_heads
        bd = jnp.einsum("bqhf,phf->bhqp", rr.reshape(b, q_len, n_heads,
                                                     dh),
                        r.reshape(p_len, n_heads, dh),
                        preferred_element_type=jnp.float32)
        x = bd.reshape(b, n_heads, p_len, q_len)[:, :, 1:, :]
        ebias = x.reshape(b, n_heads, q_len, p_len - 1)[..., :k_len]
        ebias = (ebias + ed[:, :, :, None] * segd[:, None].astype(
            ed.dtype) + maskb[:, None].astype(ed.dtype))
        return fused_rel_attention(
            rw, k, v, ebias, n_heads=n_heads, scale=scale,
            dropout_rate=rate, dropout_rng=dropout_rng,
            deterministic=False, interpret=True)
    if rate > 0.0:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    use_full = (tier == "full"
                or (tier is None and fused_rel_attention_fits(
                    n_heads, q_len, k_len, d, rw.dtype.itemsize,
                    rw.dtype.itemsize)))
    if use_full:
        nb_fwd, nb_bwd, save_probs = _resolve_knobs(
            b, n_heads, q_len, k_len, rate, rw.dtype.itemsize, nb_fwd,
            nb_bwd, save_probs)
        return _fused_rel_attention_ik(rw, rr, r, k, v, ed, segd, maskb,
                                       seed, float(scale), rate, n_heads,
                                       bool(interpret), (nb_fwd, nb_bwd),
                                       save_probs)
    if fs_plan is None:
        fs_plan = _resolve_relik_fs_plan(
            b, n_heads, q_len, k_len, p_len, d, rw.dtype.itemsize,
            rate=rate, scale=float(scale), dtype=rw.dtype)
    if fs_plan is not None:
        hb, qb, kb = fs_plan
        # the 4-D ed layout keeps the (hb, qb) trailing block dims
        # inside Mosaic's 8-sublane rule; the reshape's VJP restores
        # [B, H, Q] for the caller automatically
        ed4 = ed.reshape(b, n_heads // hb, hb, q_len)
        return _fused_rel_attention_ik_fs(rw, rr, r, k, v, ed4, segd,
                                          maskb, seed, float(scale),
                                          rate, n_heads, hb, qb, kb,
                                          bool(interpret))
    # Terminal tier: assemble the ebias host-side (the pre-fs behavior)
    # and let the tiered ebias entry pick its own kernels/fallbacks.
    warnings.warn(
        f"ingredients rel attention: no flash-streamed kernel plan "
        f"compiles at H={n_heads} Q={q_len} K={k_len} P={p_len} D={d}; "
        "falling back to host-side ebias assembly for this geometry",
        stacklevel=2)
    dh = d // n_heads
    bd = jnp.einsum("bqhf,phf->bhqp", rr.reshape(b, q_len, n_heads, dh),
                    r.reshape(p_len, n_heads, dh),
                    preferred_element_type=jnp.float32)
    x = bd.reshape(b, n_heads, p_len, q_len)[:, :, 1:, :]
    ebias = x.reshape(b, n_heads, q_len, p_len - 1)[..., :k_len]
    ebias = (ebias + ed.astype(jnp.float32)[:, :, :, None]
             * segd.astype(jnp.float32)[:, None]
             + maskb.astype(jnp.float32)[:, None]).astype(rw.dtype)
    return fused_rel_attention(
        rw, k, v, ebias, n_heads=n_heads, scale=scale,
        dropout_rate=rate, dropout_rng=dropout_rng,
        deterministic=(rate == 0.0), interpret=interpret,
        nb_fwd=nb_fwd, nb_bwd=nb_bwd, save_probs=save_probs)


# --------------------------------------------------------------------------
# Flash-streamed ingredients rel attention: the long-S XLNet tier
# --------------------------------------------------------------------------
# The full-H ingredients kernel above is gated on the whole [H,Q,K] row
# fitting scoped VMEM; past that, XLNet's inkernel path used to fall
# back to host-side ebias assembly + the streamed-ebias fs kernel —
# which device-trace attribution showed is ~70% relayout at Q=K=2048
# (BENCHMARKS.md "Long-sequence scaling": rel_shift's dim-mixing
# reshapes of the [B,H,Q,P] bd tensor lower to physical copies, ~300 ms
# of the 471 ms step). This tier assembles bd INSIDE the flash-streamed
# (qb, kb) block loop instead:
#
#     bd_shifted[q, k] = rr[q] · r[(Q − q) + k]
#
# Per (q-block, k-block), one [qb, dh]×[dh, qb+kb] dot against a
# dynamically-sliced window of the position keys — the window start
# q_len − q0 − qb + ki·kb is a multiple of 8 by construction (q_len,
# qb, kb all 8-divisible) but carries a program_id Mosaic cannot reason
# through, so it is asserted with ``pl.multiple_of`` (the probe that
# validated this corner on hardware: tools/exp_relik_fs_probe.py,
# 1.67×/2.69× over assembly+fs at S=1024/2048) — then a per-row
# log-shift (log₂ qb conditional rolls) aligns rows. Nothing
# [B,H,Q,P]- or [B,H,Q,K]-sized exists in HBM OR VMEM.
#
# The backward reuses the forward's online-softmax residuals (context +
# 4-D lse) and transposes the block shift: z = _row_unshift_block(ds)
# feeds drr (z·r-window) and a [K+qb, hb·Dh] f32 window accumulator
# that lands in the [P, hb·Dh] d_r output with ONE dynamic-start
# accumulate per (row, head-block, q-block). d_r needs accumulation
# across rows AND q-blocks, so the backward grid runs the head-block
# dimension OUTERMOST — (H//hb, B//nb, Q//qb) — making every revisit
# sequence of its constant-index d_r block consecutive (dk/dv revisit
# across the minormost q-block dim exactly like the ebias fs backward).


def _row_shift_block(x, qb: int, kb: int):
    """x [qb, qb+kb] → [qb, kb] with out[qi, k] = x[qi, (qb−qi) + k]
    (per-row left-roll by qb−qi ∈ [1, qb] via bit-decomposed masked
    rolls, then the first kb columns)."""
    qidx = jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
    a = qb - qidx
    for amt in _shift_bits(qb):
        rolled = jnp.concatenate([x[:, amt:], x[:, :amt]], axis=-1)
        x = jnp.where((a & amt) != 0, rolled, x)
    return x[:, :kb]


def _row_unshift_block(ds, qb: int, kb: int):
    """Transpose of ``_row_shift_block``: ds [qb, kb] → z [qb, qb+kb]
    with z[qi, (qb−qi)+k] = ds[qi, k], zeros elsewhere (wrapped-in
    elements come from the qb-wide zero pad; qb−qi ≤ qb keeps every
    real element in range)."""
    w = qb + kb
    z = jnp.concatenate([ds, jnp.zeros((qb, qb), ds.dtype)], axis=-1)
    qidx = jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
    a = qb - qidx
    for amt in _shift_bits(qb):
        rolled = jnp.concatenate([z[:, w - amt:], z[:, :w - amt]],
                                 axis=-1)
        z = jnp.where((a & amt) != 0, rolled, z)
    return z


def _attn_fwd_relik_fs_kernel(seed_ref, maskb_ref, segd_ref, ed_ref,
                              rw_ref, rr_ref, r_ref, k_ref, v_ref,
                              o_ref, lse_ref, s_ref, *, scale: float,
                              rate: float, hb: int, dh: int, nb: int,
                              n_hb: int, n_qb: int, kb: int,
                              q_len: int):
    """Grid (B//nb, H//hb, Q//qb): stream the key row in kb blocks,
    assembling each block's score bias from the raw ingredients in
    VMEM, feeding the online-softmax recurrence. Dropout semantics and
    seeding formula identical to ``_attn_fwd_rel_fs_kernel``."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = rw_ref.shape[1]
    k_len = k_ref.shape[1]
    n_kb = k_len // kb
    q0 = pl.program_id(2) * qb
    for b in range(nb):
        rws = [rw_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        rrs = [rr_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        ed = ed_ref[b, 0].astype(f32)[:, :, None]            # [hb, qb, 1]
        m = jnp.full((hb, qb), -jnp.inf, f32)
        l = jnp.zeros((hb, qb), f32)
        acc = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        for ki in range(n_kb):
            ksl = slice(ki * kb, (ki + 1) * kb)
            # position-key window: row qi needs positions
            # (q_len − q0 − qi) + k; load from the 8-aligned base one
            # row below the tight start, _row_shift_block compensates.
            s0 = pl.multiple_of(q_len - q0 - qb + ki * kb, 8)
            shs = []
            for h in range(hb):
                kh = k_ref[b, ksl, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    rws[h], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)              # [qb, kb]
                slab = r_ref[pl.ds(s0, qb + kb),
                             h * dh:(h + 1) * dh]            # [qb+kb, dh]
                bd = jax.lax.dot_general(
                    rrs[h], slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)              # [qb, qb+kb]
                shs.append(_row_shift_block(bd, qb, kb))
            segd = segd_ref[b, :, ksl].astype(f32)[None]     # [1, qb, kb]
            maskb = maskb_ref[b, :, ksl].astype(f32)[None]
            sb = s_ref[:] * scale + jnp.stack(shs) + ed * segd + maskb
            m_new = jnp.maximum(m, jnp.max(sb, axis=-1))
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(sb - m_new[..., None])
            l = l * alpha + jnp.sum(e, axis=-1)
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(0) * nb + b) * n_hb
                        + pl.program_id(1)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(e.shape),
                                     jnp.uint32)
                e = jnp.where(bits >= thresh, e * inv_keep, 0.0)
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
        lse_ref[b, 0] = m + jnp.log(l)


def _attn_bwd_relik_fs_kernel(seed_ref, maskb_ref, segd_ref, ed_ref,
                              rw_ref, rr_ref, r_ref, k_ref, v_ref,
                              o_ref, lse_ref, g_ref, drw_ref, drr_ref,
                              dk_ref, dv_ref, ded_ref, dr_ref, s_ref,
                              t_ref, win_ref, *, scale: float,
                              rate: float, hb: int, dh: int, nb: int,
                              n_hb: int, n_qb: int, kb: int,
                              q_len: int):
    """Recompute backward on grid (H//hb, B//nb, Q//qb) — head-block
    OUTERMOST so the constant-index [P, hb·Dh] d_r block's revisits
    across (row, q-block) are consecutive. Probabilities rebuilt per kb
    block from the saved lse; dropout replayed from the forward's
    logical seed formula (grid ids remapped for the permuted order);
    dk/dv revisit across the minormost q-block dim; d_r accumulates a
    per-row [K+qb, hb·Dh] window in scratch and lands it with one
    dynamic-start accumulate."""
    f32 = jnp.float32
    if rate > 0.0:
        thresh = np.uint32(_dropout_threshold(rate))
        inv_keep = 1.0 / (1.0 - rate)
    qb = rw_ref.shape[1]
    k_len = k_ref.shape[1]
    n_kb = k_len // kb
    q0 = pl.program_id(2) * qb

    @pl.when(pl.program_id(2) == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _init_dr():
        dr_ref[...] = jnp.zeros_like(dr_ref)

    for b in range(nb):
        lse = lse_ref[b, 0]                                  # [hb, qb]
        rws = [rw_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        rrs = [rr_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        gs = [g_ref[b, :, h * dh:(h + 1) * dh] for h in range(hb)]
        ed = ed_ref[b, 0].astype(f32)[:, :, None]
        delta = jnp.stack(
            [jnp.sum(gs[h].astype(f32)
                     * o_ref[b, :, h * dh:(h + 1) * dh].astype(f32),
                     axis=-1) for h in range(hb)])           # [hb, qb]
        drws = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        drrs = [jnp.zeros((qb, dh), f32) for _ in range(hb)]
        dedacc = jnp.zeros((hb, qb), f32)
        win_ref[...] = jnp.zeros_like(win_ref)
        for ki in range(n_kb):
            ksl = slice(ki * kb, (ki + 1) * kb)
            s0 = pl.multiple_of(q_len - q0 - qb + ki * kb, 8)
            slabs, shs = [], []
            for h in range(hb):
                kh = k_ref[b, ksl, h * dh:(h + 1) * dh]
                s_ref[h] = jax.lax.dot_general(
                    rws[h], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                slab = r_ref[pl.ds(s0, qb + kb),
                             h * dh:(h + 1) * dh]
                slabs.append(slab)
                bd = jax.lax.dot_general(
                    rrs[h], slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                shs.append(_row_shift_block(bd, qb, kb))
            segd = segd_ref[b, :, ksl].astype(f32)[None]
            maskb = maskb_ref[b, :, ksl].astype(f32)[None]
            p = jnp.exp(s_ref[:] * scale + jnp.stack(shs) + ed * segd
                        + maskb - lse[..., None])            # [hb, qb, kb]
            for h in range(hb):
                v = v_ref[b, ksl, h * dh:(h + 1) * dh]
                t_ref[h] = jax.lax.dot_general(              # dpd
                    gs[h], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            if rate > 0.0:
                pltpu.prng_seed(
                    seed_ref[0, 0]
                    + (((pl.program_id(1) * nb + b) * n_hb
                        + pl.program_id(0)) * n_qb
                       + pl.program_id(2)) * n_kb + ki)
                bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                     jnp.uint32)
                keep = bits >= thresh
                pd = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, t_ref[:] * inv_keep, 0.0)
            else:
                pd = p
                dp = t_ref[:]
            ds = p * (dp - delta[..., None])                 # unscaled
            dedacc = dedacc + jnp.sum(ds * segd, axis=-1)
            dsc = (ds * scale).astype(rw_ref.dtype)
            pd_c = pd.astype(rw_ref.dtype)
            dsu = ds.astype(rw_ref.dtype)
            for h in range(hb):
                kh = k_ref[b, ksl, h * dh:(h + 1) * dh]
                csl = slice(h * dh, (h + 1) * dh)
                drws[h] = drws[h] + jax.lax.dot_general(
                    dsc[h], kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dk_ref[b, ksl, csl] += jax.lax.dot_general(
                    dsc[h], rws[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dv_ref[b, ksl, csl] += jax.lax.dot_general(
                    pd_c[h], gs[h], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                z = _row_unshift_block(dsu[h], qb, kb)       # [qb, qb+kb]
                drrs[h] = drrs[h] + jax.lax.dot_general(
                    z, slabs[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                win_ref[ki * kb:ki * kb + qb + kb, csl] += \
                    jax.lax.dot_general(
                        z, rrs[h], (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)          # [qb+kb, dh]
        drw_ref[b] = jnp.concatenate(
            [drws[h].astype(drw_ref.dtype) for h in range(hb)], axis=-1)
        drr_ref[b] = jnp.concatenate(
            [drrs[h].astype(drr_ref.dtype) for h in range(hb)], axis=-1)
        ded_ref[b, 0] = dedacc.astype(ded_ref.dtype)
        s0b = pl.multiple_of(q_len - q0 - qb, 8)
        dr_ref[pl.ds(s0b, k_len + qb), :] += win_ref[...]


def _relik_fs_specs(nb, q_len, k_len, qb, hb, dh, p_len, *, bwd):
    """Block specs for the ingredients flash-streamed kernels. The fwd
    grid is (B//nb, H//hb, Q//qb); the bwd grid permutes the head-block
    dimension OUTERMOST (see kernel docstring), so the index maps remap
    their argument order accordingly."""
    if bwd:
        def am(f):
            return lambda j, i, qi: f(i, j, qi)
    else:
        def am(f):
            return lambda i, j, qi: f(i, j, qi)
    seed = pl.BlockSpec((1, 1), am(lambda i, j, qi: (0, 0)),
                        memory_space=pltpu.SMEM)
    qk = pl.BlockSpec((nb, qb, k_len), am(lambda i, j, qi: (i, qi, 0)),
                      memory_space=pltpu.VMEM)
    # 4-D ed/ded/lse [B, n_hb, hb, Q]: trailing block dims (hb, qb)
    # with hb equal to the full array dim — Mosaic's sublane rule
    ed = pl.BlockSpec((nb, 1, hb, qb), am(lambda i, j, qi: (i, j, 0, qi)),
                      memory_space=pltpu.VMEM)
    qblk = pl.BlockSpec((nb, qb, hb * dh),
                        am(lambda i, j, qi: (i, qi, j)),
                        memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((nb, k_len, hb * dh),
                      am(lambda i, j, qi: (i, 0, j)),
                      memory_space=pltpu.VMEM)
    r = pl.BlockSpec((p_len, hb * dh), am(lambda i, j, qi: (0, j)),
                     memory_space=pltpu.VMEM)
    return seed, qk, ed, qblk, kv, r


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _fwd_relik_fs_pallas(rw, rr, r, k, v, ed4, segd, maskb, seed, *,
                         scale, rate, n_heads, hb, qb, kb, interpret,
                         nb=1):
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = q_len // qb
    seed_s, qk_s, ed_s, qblk_s, kv_s, r_s = _relik_fs_specs(
        nb, q_len, k_len, qb, hb, dh, p_len, bwd=False)
    return _pallas_call(
        functools.partial(_attn_fwd_relik_fs_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb,
                          n_qb=n_qb, kb=kb, q_len=q_len),
        grid=(b // nb, n_hb, n_qb),
        in_specs=[seed_s, qk_s, qk_s, ed_s, qblk_s, qblk_s, r_s, kv_s,
                  kv_s],
        out_specs=(qblk_s, ed_s),
        out_shape=(jax.ShapeDtypeStruct((b, q_len, d), rw.dtype),
                   jax.ShapeDtypeStruct((b, n_hb, hb, q_len),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_heads * q_len * k_len * dh
            * (3 * kb + qb) // kb
            + 12 * b * n_heads * q_len * k_len,
            bytes_accessed=rw.dtype.itemsize * b * q_len * 5 * d
            + 2 * rw.dtype.itemsize * b * q_len * k_len,
            transcendentals=2 * b * n_heads * q_len * k_len,
        ),
    )(seed, maskb, segd, ed4, rw, rr, r, k, v)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "n_heads", "hb",
                                    "qb", "kb", "interpret", "nb"))
def _bwd_relik_fs_pallas(rw, rr, r, k, v, ed4, segd, maskb, seed, o,
                         lse, g, *, scale, rate, n_heads, hb, qb, kb,
                         interpret, nb=1):
    b, q_len, d = rw.shape
    k_len, p_len = k.shape[1], r.shape[0]
    dh = d // n_heads
    n_hb = n_heads // hb
    n_qb = q_len // qb
    seed_s, qk_s, ed_s, qblk_s, kv_s, r_s = _relik_fs_specs(
        nb, q_len, k_len, qb, hb, dh, p_len, bwd=True)
    kv_f32 = pl.BlockSpec((nb, k_len, hb * dh),
                          lambda j, i, qi: (i, 0, j),
                          memory_space=pltpu.VMEM)
    dr_s = pl.BlockSpec((p_len, hb * dh), lambda j, i, qi: (0, j),
                        memory_space=pltpu.VMEM)
    return _pallas_call(
        functools.partial(_attn_bwd_relik_fs_kernel, scale=scale,
                          rate=rate, hb=hb, dh=dh, nb=nb, n_hb=n_hb,
                          n_qb=n_qb, kb=kb, q_len=q_len),
        grid=(n_hb, b // nb, n_qb),
        in_specs=[seed_s, qk_s, qk_s, ed_s, qblk_s, qblk_s, r_s, kv_s,
                  kv_s, qblk_s, ed_s, qblk_s],
        out_specs=(qblk_s, qblk_s, kv_f32, kv_f32, ed_s, dr_s),
        out_shape=(jax.ShapeDtypeStruct(rw.shape, rw.dtype),      # drw
                   jax.ShapeDtypeStruct(rw.shape, rw.dtype),      # drr
                   jax.ShapeDtypeStruct(k.shape, jnp.float32),    # dk
                   jax.ShapeDtypeStruct(v.shape, jnp.float32),    # dv
                   jax.ShapeDtypeStruct((b, n_hb, hb, q_len),
                                        rw.dtype),                # ded
                   jax.ShapeDtypeStruct(r.shape, jnp.float32)),   # dr
        scratch_shapes=[pltpu.VMEM((hb, qb, kb), jnp.float32),
                        pltpu.VMEM((hb, qb, kb), jnp.float32),
                        pltpu.VMEM((k_len + qb, hb * dh),
                                   jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_heads * q_len * k_len * dh
            * (7 * kb + 2 * qb) // kb
            + 16 * b * n_heads * q_len * k_len,
            bytes_accessed=rw.dtype.itemsize * b * q_len * 10 * d
            + 4 * rw.dtype.itemsize * b * q_len * k_len,
            transcendentals=b * n_heads * q_len * k_len,
        ),
    )(seed, maskb, segd, ed4, rw, rr, r, k, v, o, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14, 15))
def _fused_rel_attention_ik_fs(rw, rr, r, k, v, ed4, segd, maskb, seed,
                               scale, rate, n_heads, hb, qb, kb,
                               interpret):
    out, _ = _fwd_relik_fs_pallas(rw, rr, r, k, v, ed4, segd, maskb,
                                  seed, scale=scale, rate=rate,
                                  n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                                  interpret=interpret)
    return out


def _frelikfs_fwd(rw, rr, r, k, v, ed4, segd, maskb, seed, scale, rate,
                  n_heads, hb, qb, kb, interpret):
    out, lse = _fwd_relik_fs_pallas(rw, rr, r, k, v, ed4, segd, maskb,
                                    seed, scale=scale, rate=rate,
                                    n_heads=n_heads, hb=hb, qb=qb,
                                    kb=kb, interpret=interpret)
    return out, (rw, rr, r, k, v, ed4, segd, maskb, seed, out, lse)


def _frelikfs_bwd(scale, rate, n_heads, hb, qb, kb, interpret,
                  residuals, g):
    rw, rr, r, k, v, ed4, segd, maskb, seed, out, lse = residuals
    drw, drr, dk, dv, ded4, dr = _bwd_relik_fs_pallas(
        rw, rr, r, k, v, ed4, segd, maskb, seed, out, lse, g,
        scale=scale, rate=rate, n_heads=n_heads, hb=hb, qb=qb, kb=kb,
        interpret=interpret)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return (drw, drr, dr.astype(r.dtype), dk.astype(k.dtype),
            dv.astype(v.dtype), ded4.astype(ed4.dtype),
            jnp.zeros_like(segd), jnp.zeros_like(maskb), dseed)


_fused_rel_attention_ik_fs.defvjp(_frelikfs_fwd, _frelikfs_bwd)


def _relik_fs_kernel_compiles(pass_name: str, q_len: int, k_len: int,
                              p_len: int, d: int, n_heads: int, hb: int,
                              qb: int, kb: int, rate: float,
                              scale: float, dtype) -> bool:
    """Ingredients twin of ``_rel_fs_kernel_compiles``."""
    import jax

    key = ("relikfs", pass_name, q_len, k_len, p_len, d, n_heads, hb,
           qb, kb, float(rate), float(scale), jnp.dtype(dtype).str)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    rw = jax.ShapeDtypeStruct((1, q_len, d), dtype)
    kv = jax.ShapeDtypeStruct((1, k_len, d), dtype)
    r = jax.ShapeDtypeStruct((p_len, d), dtype)
    ed4 = jax.ShapeDtypeStruct((1, n_heads // hb, hb, q_len), dtype)
    qk = jax.ShapeDtypeStruct((1, q_len, k_len), dtype)
    seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    try:
        if pass_name == "fwd":
            _fwd_relik_fs_pallas.lower(
                rw, rw, r, kv, kv, ed4, qk, qk, seed, scale=scale,
                rate=rate, n_heads=n_heads, hb=hb, qb=qb, kb=kb,
                interpret=False).compile()
        else:
            o = jax.ShapeDtypeStruct((1, q_len, d), dtype)
            lse = jax.ShapeDtypeStruct((1, n_heads // hb, hb, q_len),
                                       jnp.float32)
            g = jax.ShapeDtypeStruct((1, q_len, d), dtype)
            _bwd_relik_fs_pallas.lower(
                rw, rw, r, kv, kv, ed4, qk, qk, seed, o, lse, g,
                scale=scale, rate=rate, n_heads=n_heads, hb=hb, qb=qb,
                kb=kb, interpret=False).compile()
        ok = True
    except Exception:  # noqa: BLE001 - any compile failure means "walk on"
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _resolve_relik_fs_plan(b: int, n_heads: int, q_len: int, k_len: int,
                           p_len: int, d: int, itemsize: int,
                           rate: float = 0.1, scale: float = 1.0,
                           dtype=jnp.bfloat16):
    """(hb, qb, kb) for the ingredients flash-streamed kernels, or
    None — Q divisible by qb, K by kb, q_len/qb/kb 8-divisible (the
    dynamic position-window alignment), P ≥ Q + K."""
    del itemsize, b
    dh = d // n_heads
    hb = _fs_min_hb(n_heads, dh)
    if hb is None or p_len < q_len + k_len:
        return None
    probe = _probe_enabled()
    for kb in (512, 256, 128):
        if k_len % kb:
            continue
        for qb in (256, 128):
            if q_len % qb:
                continue
            if not probe:
                return hb, qb, kb
            if (_relik_fs_kernel_compiles("fwd", q_len, k_len, p_len, d,
                                          n_heads, hb, qb, kb, rate,
                                          scale, dtype)
                    and _relik_fs_kernel_compiles("bwd", q_len, k_len,
                                                  p_len, d, n_heads, hb,
                                                  qb, kb, rate, scale,
                                                  dtype)):
                return hb, qb, kb
    return None


def fused_rel_attention_ingredients_fits_fs(
        n_heads: int, q_len: int, k_len: int, p_len: int, d: int,
        itemsize: int = 2, *, batch: Optional[int] = None,
        rate: float = 0.1, scale: float = 1.0, dtype=None) -> bool:
    """Whether the ingredients flash-streamed kernels cover this
    geometry — the long-S XLNet tier past the full-H ingredients
    reach: no [B,H,Q,P]/[B,H,Q,K] HBM tensors AND no whole-row VMEM
    scratch. models/xlnet.py's inkernel dispatch gates on this before
    degrading to host-side ebias assembly."""
    return _resolve_relik_fs_plan(
        batch if batch is not None else 8, n_heads, q_len, k_len,
        p_len, d, itemsize, rate=rate, scale=scale,
        dtype=dtype if dtype is not None else jnp.bfloat16) is not None


# --------------------------------------------------------------------------
# Tensor-parallel (head-sharded) wrappers
# --------------------------------------------------------------------------
# pallas_call is opaque to XLA's SPMD partitioner: with head-sharded
# operands GSPMD would all-gather and replicate the kernel per device.
# These wrappers shard_map the kernels over the mesh's model axis instead:
# each device runs the SAME kernel on its H/mp local heads (head-major
# flat packing ⇒ a contiguous model-axis chunk of the last dim is whole
# heads), so the sharded einsum projections around the kernel and the
# kernel itself stay head-sharded end to end. Beyond the reference
# (single-device, SURVEY §2d).

def fused_rel_attention_tp(
    q: jax.Array,               # [B, Q, D] head-major flat
    k: jax.Array,               # [B, K, D]
    v: jax.Array,               # [B, K, D]
    ebias: jax.Array,           # [B, H, Q, K]
    *,
    mesh,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jax.Array:
    """fused_rel_attention with heads sharded over ``model_axis``.

    q/k/v arrive sharded on their flat head axis (produced by einsums with
    P(None, model)-sharded weights under --tp_shard_attention,
    parallel/tp.py), ebias on its H axis — the shard_map in_specs match
    those shardings so no resharding happens on entry.
    """
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[model_axis]
    if n_heads % mp != 0:
        raise ValueError(
            f"n_heads={n_heads} not divisible by model axis size {mp}")
    local_heads = n_heads // mp
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    rng = dropout_rng if rate > 0.0 else jax.random.PRNGKey(0)

    def local(q, k, v, ebias, rng):
        # distinct dropout streams per head shard AND per data shard —
        # without the data fold every data shard would replay the same
        # per-local-row mask sequence (the kernel seeds by local row)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(model_axis))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        return fused_rel_attention(
            q, k, v, ebias, n_heads=local_heads, scale=scale,
            dropout_rate=rate, dropout_rng=rng if rate > 0.0 else None,
            deterministic=deterministic)

    act = P(data_axis, None, model_axis)
    # check_vma=False: pallas_call does not carry varying-mesh-axis
    # metadata, so shard_map's replication checker cannot see through it
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(act, act, act, P(data_axis, model_axis, None, None),
                  P()),
        out_specs=act, check_vma=False)
    return f(q, k, v, ebias, rng)


def fused_rel_attention_ingredients_tp(
    rw: jax.Array,              # [B, Q, D] head-major flat
    rr: jax.Array,              # [B, Q, D]
    r: jax.Array,               # [P, D]
    k: jax.Array,               # [B, K, D]
    v: jax.Array,               # [B, K, D]
    ed: jax.Array,              # [B, H, Q]
    segd: jax.Array,            # [B, Q, K]
    maskb: jax.Array,           # [B, Q, K]
    *,
    mesh,
    n_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jax.Array:
    """fused_rel_attention_ingredients with heads sharded over
    ``model_axis``. rw/rr/k/v arrive sharded on their flat head axis, r
    on its projection axis (the per-layer W_r is P(None, model)-sharded
    so pos_emb·W_r lands head-sharded), ed on H; segd/maskb are
    replicated row masks. d_r/d_ed grads stay head-sharded (the local
    kernel only ever touches its own head slice)."""
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[model_axis]
    if n_heads % mp != 0:
        raise ValueError(
            f"n_heads={n_heads} not divisible by model axis size {mp}")
    local_heads = n_heads // mp
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    rng = dropout_rng if rate > 0.0 else jax.random.PRNGKey(0)

    def local(rw, rr, r, k, v, ed, segd, maskb, rng):
        # per head shard AND per data shard (see fused_rel_attention_tp)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(model_axis))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        return fused_rel_attention_ingredients(
            rw, rr, r, k, v, ed, segd, maskb, n_heads=local_heads,
            scale=scale, dropout_rate=rate,
            dropout_rng=rng if rate > 0.0 else None,
            deterministic=deterministic)

    act = P(data_axis, None, model_axis)
    row = P(data_axis, None, None)
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(act, act, P(None, model_axis), act, act,
                  P(data_axis, model_axis, None), row, row, P()),
        out_specs=act, check_vma=False)
    return f(rw, rr, r, k, v, ed, segd, maskb, rng)


def fused_attention_tp(
    q: jax.Array,               # [B, H, S, Dh]
    k: jax.Array,
    v: jax.Array,
    attention_mask: Optional[jax.Array],   # [B, S] {0,1}, 1 = real token
    *,
    mesh,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jax.Array:
    """fused_attention (split-tensor API) with heads sharded over
    ``model_axis``. Used by the BERT TP-fused path — the packed-QKV
    variant's q|k|v column blocks cannot be head-aligned by a contiguous
    model-axis chunk, so TP takes the split layout."""
    from jax.sharding import PartitionSpec as P

    b, h, s, _ = q.shape
    mp = mesh.shape[model_axis]
    if h % mp != 0:
        raise ValueError(
            f"n_heads={h} not divisible by model axis size {mp}")
    rate = 0.0 if deterministic else float(dropout_rate)
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    rng = dropout_rng if rate > 0.0 else jax.random.PRNGKey(0)
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)

    def local(q, k, v, mask, rng):
        # per head shard AND per data shard (see fused_rel_attention_tp)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(model_axis))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        return fused_attention(
            q, k, v, mask, scale=scale,
            dropout_rate=rate, dropout_rng=rng if rate > 0.0 else None,
            deterministic=deterministic)

    act = P(data_axis, model_axis, None, None)
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(act, act, act, P(data_axis, None), P()),
        out_specs=act, check_vma=False)
    return f(q, k, v, attention_mask, rng)
