"""Fused Pallas TPU kernel for the MAG gate.

The gate (reference modeling.py:25-51) is bandwidth-bound: six small
matmuls, two row-norms, a clamp and a LayerNorm over the same [N, D] tile.
Unfused, each intermediate round-trips HBM; fused, one kernel keeps the
whole chain VMEM-resident per row-tile:

  grid: tiles of TILE_N rows over the flattened [B·S, D] stream; all six
  weight matrices stay resident in VMEM across the grid (~6 MB fp32 at
  bert-base geometry).

Modality features (MOSI: 47/74, MOSEI: 35/74) are zero-padded to the
128-lane boundary outside the kernel; the matching weight rows are
zero-padded too, so padded lanes contribute exactly nothing (the row-norms
are over the text dim D=768, which is already lane-aligned).

Backward: jax.custom_vjp with a hand-derived split — a second Pallas
kernel fuses the bandwidth-bound elementwise chain (LayerNorm backward →
α/norm-clamp backward → gate/ReLU backward, all recomputed from the saved
inputs in one VMEM-resident pass), emitting the four pre-activation
cotangents (dpv/dpa/ddv/dda) plus the text-side partial; the MXU-bound
weight/input gradient matmuls then run as plain XLA dots. An exact
recompute-through-``jax.vjp`` fallback remains available
(``MAG_FUSED_BWD=plain``) and the two are locked together by tests.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bert_multimodal_transformer_tpu.ops import mag as mag_ops
from bert_multimodal_transformer_tpu.ops.pallas_util import (
    pallas_call as _pallas_call,
)

LANE = 128
DEFAULT_TILE_N = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mag_kernel(t_ref, v_ref, a_ref,
                w_hv_v_ref, w_hv_t_ref, b_hv_ref,
                w_ha_a_ref, w_ha_t_ref, b_ha_ref,
                w_v_ref, b_v_ref, w_a_ref, b_a_ref,
                ln_gamma_ref, ln_beta_ref,
                out_ref, *, beta_shift: float):
    f32 = jnp.float32
    t = t_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    a = a_ref[:].astype(f32)

    def mm(x, w_ref):
        # HIGHEST precision to bit-track the plain-JAX gate (ops/mag.py):
        # the default bf16-pass MXU mode perturbs α through ‖H_m‖.
        return jnp.dot(x, w_ref[:].astype(f32), preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    gate_v = jnp.maximum(
        mm(v, w_hv_v_ref) + mm(t, w_hv_t_ref) + b_hv_ref[:].astype(f32), 0.0)
    gate_a = jnp.maximum(
        mm(a, w_ha_a_ref) + mm(t, w_ha_t_ref) + b_ha_ref[:].astype(f32), 0.0)
    h_m = (gate_v * (mm(v, w_v_ref) + b_v_ref[:].astype(f32))
           + gate_a * (mm(a, w_a_ref) + b_a_ref[:].astype(f32)))

    em_norm = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    hm_sq = jnp.sum(h_m * h_m, axis=-1, keepdims=True)
    hm_norm = jnp.sqrt(hm_sq)
    hm_norm = jnp.where(hm_norm == 0.0, 1.0, hm_norm)
    thresh = (em_norm / (hm_norm + mag_ops.EPS)) * beta_shift
    alpha = jnp.minimum(thresh, 1.0)

    fused = alpha * h_m + t
    mean = jnp.mean(fused, axis=-1, keepdims=True)
    centered = fused - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + 1e-5) * ln_gamma_ref[:].astype(f32) \
        + ln_beta_ref[:].astype(f32)
    out_ref[:] = y.astype(out_ref.dtype)


def _pad_cols(x, to):
    pad = to - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _pad_rows(x, to):
    pad = to - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.jit, static_argnames=("beta_shift", "tile_n",
                                             "interpret"))
def _mag_forward_pallas(params, text, visual, acoustic, *,
                        beta_shift: float, tile_n: int = DEFAULT_TILE_N,
                        interpret: bool = False):
    orig_shape = text.shape
    d = orig_shape[-1]
    dv = visual.shape[-1]
    da = acoustic.shape[-1]
    if d % LANE != 0:
        # Text dim must be lane-aligned for the row-norm/LN to be exact
        # without masking (768/1024 are). Fall back otherwise.
        return mag_ops.mag_gate(params, text, visual, acoustic,
                                beta_shift=beta_shift)

    n = 1
    for s in orig_shape[:-1]:
        n *= s
    t2 = text.reshape(n, d)
    dv_p = _round_up(max(dv, LANE), LANE)
    da_p = _round_up(max(da, LANE), LANE)
    v2 = _pad_cols(visual.reshape(n, dv), dv_p)
    a2 = _pad_cols(acoustic.reshape(n, da), da_p)

    n_p = _round_up(max(n, tile_n), tile_n)
    t2 = _pad_rows(t2, n_p)
    v2 = _pad_rows(v2, n_p)
    a2 = _pad_rows(a2, n_p)

    f32 = jnp.float32
    w = {k: jnp.asarray(p, f32) for k, p in params.items()}
    w_hv_v = _pad_rows(w["w_hv_v"], dv_p)
    w_ha_a = _pad_rows(w["w_ha_a"], da_p)
    w_v = _pad_rows(w["w_v"], dv_p)
    w_a = _pad_rows(w["w_a"], da_p)
    b_hv = w["b_hv"].reshape(1, d)
    b_ha = w["b_ha"].reshape(1, d)
    b_v = w["b_v"].reshape(1, d)
    b_a = w["b_a"].reshape(1, d)
    ln_g = w["ln_gamma"].reshape(1, d)
    ln_b = w["ln_beta"].reshape(1, d)

    grid = (n_p // tile_n,)

    def row_spec(cols):
        return pl.BlockSpec((tile_n, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out = _pallas_call(
        functools.partial(_mag_kernel, beta_shift=beta_shift),
        grid=grid,
        in_specs=[
            row_spec(d), row_spec(dv_p), row_spec(da_p),
            full_spec(w_hv_v.shape), full_spec(w["w_hv_t"].shape),
            full_spec(b_hv.shape),
            full_spec(w_ha_a.shape), full_spec(w["w_ha_t"].shape),
            full_spec(b_ha.shape),
            full_spec(w_v.shape), full_spec(b_v.shape),
            full_spec(w_a.shape), full_spec(b_a.shape),
            full_spec(ln_g.shape), full_spec(ln_b.shape),
        ],
        out_specs=row_spec(d),
        out_shape=jax.ShapeDtypeStruct((n_p, d), text.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * d * (2 * d + dv_p * 2 + da_p * 2) + 10 * n_p * d,
            bytes_accessed=4 * (n_p * (2 * d + dv_p + da_p)
                                + 2 * d * d + 4 * LANE * d),
            transcendentals=2 * n_p,
        ),
    )(t2, v2, a2, w_hv_v, w["w_hv_t"], b_hv, w_ha_a, w["w_ha_t"], b_ha,
      w_v, b_v, w_a, b_a, ln_g, ln_b)

    return out[:n].reshape(orig_shape)




def _mag_bwd_kernel(dy_ref, t_ref, v_ref, a_ref,
                    w_hv_v_ref, w_hv_t_ref, b_hv_ref,
                    w_ha_a_ref, w_ha_t_ref, b_ha_ref,
                    w_v_ref, b_v_ref, w_a_ref, b_a_ref,
                    ln_gamma_ref,
                    dpv_ref, dpa_ref, ddv_ref, dda_ref, dt_ref, xhat_ref,
                    *, beta_shift: float):
    """Backward elementwise chain, recomputed from inputs.

    Emits the cotangents at the matmul boundaries:
      dpv/dpa — ∂L/∂(gate pre-activations)  [tile, D]
      ddv/dda — ∂L/∂(displacement projections) [tile, D]
      dt      — the direct text-path cotangent (LN + ‖text‖ terms); the
                caller adds the dpv/dpa @ Wᵀ matmul terms
      x̂       — normalized LN input, for dγ/dβ reductions outside
    """
    f32 = jnp.float32
    eps = mag_ops.EPS
    dy = dy_ref[:].astype(f32)
    t = t_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    a = a_ref[:].astype(f32)

    def mm(x, w_ref):
        return jnp.dot(x, w_ref[:].astype(f32), preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    # ---- recompute forward intermediates ----
    pv = mm(v, w_hv_v_ref) + mm(t, w_hv_t_ref) + b_hv_ref[:].astype(f32)
    pa = mm(a, w_ha_a_ref) + mm(t, w_ha_t_ref) + b_ha_ref[:].astype(f32)
    gate_v = jnp.maximum(pv, 0.0)
    gate_a = jnp.maximum(pa, 0.0)
    dv_ = mm(v, w_v_ref) + b_v_ref[:].astype(f32)
    da_ = mm(a, w_a_ref) + b_a_ref[:].astype(f32)
    h_m = gate_v * dv_ + gate_a * da_

    em = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    hn = jnp.sqrt(jnp.sum(h_m * h_m, axis=-1, keepdims=True))
    hn1 = jnp.where(hn == 0.0, 1.0, hn)
    thresh = (em / (hn1 + eps)) * beta_shift
    alpha = jnp.minimum(thresh, 1.0)

    fused = alpha * h_m + t
    mu = jnp.mean(fused, axis=-1, keepdims=True)
    c = fused - mu
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    xhat = c * inv

    # ---- LayerNorm backward ----
    dxh = dy * ln_gamma_ref[:].astype(f32)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    df = inv * (dxh - m1 - xhat * m2)

    # ---- α / norm-clamp backward (modeling.py:32-43 semantics) ----
    dalpha = jnp.sum(df * h_m, axis=-1, keepdims=True)
    dhm = alpha * df
    # d/dx min(x, 1): 1 below, 0 above, 0.5 at the tie (matches
    # jnp.minimum's VJP so the fallback path is bit-compatible)
    dthresh = dalpha * jnp.where(
        thresh < 1.0, 1.0, jnp.where(thresh == 1.0, 0.5, 0.0))
    dem = dthresh * beta_shift / (hn1 + eps)
    dhn1 = -dthresh * beta_shift * em / ((hn1 + eps) * (hn1 + eps))
    live = (hn != 0.0).astype(f32)
    dhn = dhn1 * live
    em_safe = jnp.where(em == 0.0, 1.0, em)
    dt_norm = (dem / em_safe) * jnp.where(em == 0.0, 0.0, 1.0) * t
    dhm = dhm + (dhn / hn1) * live * h_m

    # ---- gate / displacement backward ----
    dgv = dhm * dv_
    dga = dhm * da_
    ddv = dhm * gate_v
    dda = dhm * gate_a
    dpv = dgv * (pv > 0.0).astype(f32)
    dpa = dga * (pa > 0.0).astype(f32)

    dpv_ref[:] = dpv
    dpa_ref[:] = dpa
    ddv_ref[:] = ddv
    dda_ref[:] = dda
    dt_ref[:] = df + dt_norm
    xhat_ref[:] = xhat


@functools.partial(jax.jit, static_argnames=("beta_shift", "tile_n",
                                             "interpret"))
def _mag_backward_pallas(params, text, visual, acoustic, dy, *,
                         beta_shift: float, tile_n: int = DEFAULT_TILE_N,
                         interpret: bool = False):
    """Fused backward. Returns (dparams, dtext, dvisual, dacoustic)."""
    orig_shape = text.shape
    d = orig_shape[-1]
    dv_dim = visual.shape[-1]
    da_dim = acoustic.shape[-1]
    f32 = jnp.float32

    n = 1
    for s in orig_shape[:-1]:
        n *= s
    t2 = text.reshape(n, d)
    dy2 = dy.reshape(n, d)
    dv_p = _round_up(max(dv_dim, LANE), LANE)
    da_p = _round_up(max(da_dim, LANE), LANE)
    v2 = _pad_cols(visual.reshape(n, dv_dim), dv_p)
    a2 = _pad_cols(acoustic.reshape(n, da_dim), da_p)

    n_p = _round_up(max(n, tile_n), tile_n)
    t2p = _pad_rows(t2, n_p)
    dy2p = _pad_rows(dy2, n_p)
    v2p = _pad_rows(v2, n_p)
    a2p = _pad_rows(a2, n_p)

    w = {k: jnp.asarray(p, f32) for k, p in params.items()}
    w_hv_v = _pad_rows(w["w_hv_v"], dv_p)
    w_ha_a = _pad_rows(w["w_ha_a"], da_p)
    w_v_pad = _pad_rows(w["w_v"], dv_p)
    w_a_pad = _pad_rows(w["w_a"], da_p)
    b_hv = w["b_hv"].reshape(1, d)
    b_ha = w["b_ha"].reshape(1, d)
    b_v = w["b_v"].reshape(1, d)
    b_a = w["b_a"].reshape(1, d)
    ln_g = w["ln_gamma"].reshape(1, d)

    grid = (n_p // tile_n,)

    def row_spec(cols):
        return pl.BlockSpec((tile_n, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = _pallas_call(
        functools.partial(_mag_bwd_kernel, beta_shift=beta_shift),
        grid=grid,
        in_specs=[
            row_spec(d), row_spec(d), row_spec(dv_p), row_spec(da_p),
            full_spec(w_hv_v.shape), full_spec(w["w_hv_t"].shape),
            full_spec(b_hv.shape),
            full_spec(w_ha_a.shape), full_spec(w["w_ha_t"].shape),
            full_spec(b_ha.shape),
            full_spec(w_v_pad.shape), full_spec(b_v.shape),
            full_spec(w_a_pad.shape), full_spec(b_a.shape),
            full_spec(ln_g.shape),
        ],
        out_specs=tuple(row_spec(d) for _ in range(6)),
        out_shape=tuple(jax.ShapeDtypeStruct((n_p, d), f32)
                        for _ in range(6)),
        interpret=interpret,
    )(dy2p, t2p, v2p, a2p, w_hv_v, w["w_hv_t"], b_hv, w_ha_a, w["w_ha_t"],
      b_ha, w_v_pad, b_v, w_a_pad, b_a, ln_g)
    dpv, dpa, ddv, dda, dt_partial, xhat = [o[:n] for o in outs]

    # ---- MXU-bound reductions/matmuls, left to XLA ----
    hi = jax.lax.Precision.HIGHEST

    def dot(x, y):
        return jnp.dot(x, y, preferred_element_type=f32, precision=hi)

    t32 = t2.astype(f32)
    v32 = visual.reshape(n, dv_dim).astype(f32)
    a32 = acoustic.reshape(n, da_dim).astype(f32)
    dy32 = dy2.astype(f32)

    dt = dt_partial + dot(dpv, w["w_hv_t"].T) + dot(dpa, w["w_ha_t"].T)
    dvis = dot(dpv, w["w_hv_v"].T) + dot(ddv, w["w_v"].T)
    dac = dot(dpa, w["w_ha_a"].T) + dot(dda, w["w_a"].T)

    dparams = {
        "w_hv_v": dot(v32.T, dpv), "w_hv_t": dot(t32.T, dpv),
        "b_hv": jnp.sum(dpv, axis=0),
        "w_ha_a": dot(a32.T, dpa), "w_ha_t": dot(t32.T, dpa),
        "b_ha": jnp.sum(dpa, axis=0),
        "w_v": dot(v32.T, ddv), "b_v": jnp.sum(ddv, axis=0),
        "w_a": dot(a32.T, dda), "b_a": jnp.sum(dda, axis=0),
        "ln_gamma": jnp.sum(dy32 * xhat, axis=0),
        "ln_beta": jnp.sum(dy32, axis=0),
    }
    dparams = {k: g.astype(params[k].dtype) for k, g in dparams.items()}
    return (dparams,
            dt.reshape(orig_shape).astype(text.dtype),
            dvis.reshape(visual.shape).astype(visual.dtype),
            dac.reshape(acoustic.shape).astype(acoustic.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mag_gate_fused(params, text, visual, acoustic, beta_shift, interpret):
    return _mag_forward_pallas(params, text, visual, acoustic,
                               beta_shift=beta_shift, interpret=interpret)


def _fwd(params, text, visual, acoustic, beta_shift, interpret):
    out = _mag_forward_pallas(params, text, visual, acoustic,
                              beta_shift=beta_shift, interpret=interpret)
    return out, (params, text, visual, acoustic)


def _bwd(beta_shift, interpret, residuals, g):
    import os

    params, text, visual, acoustic = residuals
    # Same lane-alignment constraint as the forward (see
    # _mag_forward_pallas): unaligned text dims fall back to the exact
    # plain-JAX VJP. MAG_FUSED_BWD=plain forces that path; note the env var
    # is read at TRACE time — a jitted train step bakes the choice at its
    # first compilation.
    if (text.shape[-1] % LANE != 0
            or os.environ.get("MAG_FUSED_BWD", "pallas") == "plain"):
        # exact recompute through the plain gate's VJP (debug fallback)
        _, vjp = jax.vjp(
            lambda p, t, v, a: mag_ops.mag_gate(p, t, v, a,
                                                beta_shift=beta_shift),
            params, text, visual, acoustic)
        return vjp(g)
    return _mag_backward_pallas(params, text, visual, acoustic, g,
                                beta_shift=beta_shift, interpret=interpret)


_mag_gate_fused.defvjp(_fwd, _bwd)


def mag_gate_fused(params: Mapping[str, jax.Array], text: jax.Array,
                   visual: jax.Array, acoustic: jax.Array, *,
                   beta_shift: float = 1.0,
                   interpret: bool = False) -> jax.Array:
    """Drop-in fused replacement for ops.mag.mag_gate (same semantics).

    On non-TPU backends the Mosaic kernel cannot compile; interpret mode is
    forced so --use_fused_mag stays usable in CPU smoke runs."""
    params = dict(params)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    return _mag_gate_fused(params, text, visual, acoustic, beta_shift,
                           interpret)
