"""Shared Pallas-call plumbing for this package's TPU kernels.

Every ``pallas_call`` in the package (fused attention, fused MAG) ships
with a raised Mosaic scoped-VMEM limit — see ``pallas_call`` below for
why the headroom exists. Centralised here so the kernel modules don't
reach into each other's internals (the MAG kernels previously imported
``fused_attention._pallas_call``).
"""

from __future__ import annotations

import os

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mosaic_vmem_limit() -> int:
    """Mosaic scoped-VMEM limit for every kernel in this package
    (``FUSED_ATTN_MOSAIC_VMEM_LIMIT`` overrides; bytes)."""
    return int(os.environ.get("FUSED_ATTN_MOSAIC_VMEM_LIMIT",
                              str(24 * 1024 * 1024)))


def pallas_call(kernel, **kw):
    """``pl.pallas_call`` with this package's Mosaic compiler params.

    ``vmem_limit_bytes`` raises Mosaic's default 16 MB scoped-VMEM check
    to 24 MB. The headroom exists because the check is charged for more
    than the kernel's own stack: XLA may place a custom call's small
    OUTPUT buffers directly in VMEM (S(1) layouts) when a consumer
    prefers them there — a placement the standalone compile, and
    therefore the compile probes, never see. Measured 2026-08-20
    (session r4c): `_bwd_rel_saved_pallas` at Q=50 K=562 b32 bf16
    compiles standalone at EVERY grid size, but inside the full train
    step XLA promotes the [32,50,768] dq output into VMEM (+2.4 MB) and
    the scoped allocation hits 16.41 MB against the 16 MB default —
    the 6th non-closed-form instance, and one that no standalone probe
    can predict. The kernels' working sets still target
    FUSED_ATTN_VMEM_BUDGET (16 MB) via the plan resolvers; the raised
    limit is headroom for XLA's in-context placements, far below the
    128 MB physical VMEM."""
    if not kw.get("interpret", False):
        kw.setdefault("compiler_params", pltpu.CompilerParams(
            vmem_limit_bytes=mosaic_vmem_limit()))
    return pl.pallas_call(kernel, **kw)
