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

Backward: jax.custom_vjp whose backward recomputes via the plain-JAX gate's
VJP — the backward is matmul-dominated and XLA-fused; only the forward is
bandwidth-critical in the fine-tune loop (it runs under eval/predict too).
Gradient parity with ops/mag.py is therefore exact by construction.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bert_multimodal_transformer_tpu.ops import mag as mag_ops

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

    out = pl.pallas_call(
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mag_gate_fused(params, text, visual, acoustic, beta_shift, interpret):
    return _mag_forward_pallas(params, text, visual, acoustic,
                               beta_shift=beta_shift, interpret=interpret)


def _fwd(params, text, visual, acoustic, beta_shift, interpret):
    out = _mag_forward_pallas(params, text, visual, acoustic,
                              beta_shift=beta_shift, interpret=interpret)
    return out, (params, text, visual, acoustic)


def _bwd(beta_shift, interpret, residuals, g):
    params, text, visual, acoustic = residuals
    _, vjp = jax.vjp(
        lambda p, t, v, a: mag_ops.mag_gate(p, t, v, a,
                                            beta_shift=beta_shift),
        params, text, visual, acoustic)
    return vjp(g)


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
