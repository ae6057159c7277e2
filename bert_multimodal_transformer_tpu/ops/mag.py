"""Multimodal Adaptation Gate (MAG) — functional core.

TPU-native re-derivation of the paper op implemented by the reference at
``modeling.py:25-51``:

    g_v = ReLU([visual; text] W_hv + b_hv)
    g_a = ReLU([acoustic; text] W_ha + b_ha)
    H_m = g_v ⊙ (visual W_v + b_v) + g_a ⊙ (acoustic W_a + b_a)
    α   = min(‖text‖₂ / (‖H_m‖₂ + 1e-6) · β, 1)   with ‖H_m‖₂ = 0 → 1
    out = Dropout(LayerNorm(α · H_m + text))

Instead of materializing the concatenations ([visual; text] at
modeling.py:27-28), the concat-matmuls are decomposed into partial matmuls
(x @ W = v @ W_v-part + t @ W_t-part) so each operand hits the MXU with a
clean [*, D] layout and no gather/copy. All math is done in float32
regardless of the compute dtype: the op is tiny next to the encoder, and the
norm/clamp chain (modeling.py:32-43) is precision-sensitive.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

EPS = 1e-6


def mag_norms(text_f32: jax.Array, h_m: jax.Array, beta_shift: float) -> jax.Array:
    """The α scale factor of the gate (modeling.py:32-43 semantics).

    ``text_f32``/``h_m``: [..., D] float32. Returns α of shape [..., 1].
    """
    em_norm = jnp.linalg.norm(text_f32, axis=-1)
    hm_norm = jnp.linalg.norm(h_m, axis=-1)
    # ‖H_m‖ == 0 → use 1.0 (reference guard at modeling.py:35-36).
    hm_norm = jnp.where(hm_norm == 0.0, jnp.ones_like(hm_norm), hm_norm)
    thresh = (em_norm / (hm_norm + EPS)) * beta_shift
    alpha = jnp.minimum(thresh, 1.0)
    return alpha[..., None]


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm with torch-default eps 1e-5 (nn.LayerNorm at
    modeling.py:22 uses the torch default, unlike BERT's 1e-12)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def mag_gate(
    params: Mapping[str, jax.Array],
    text: jax.Array,
    visual: jax.Array,
    acoustic: jax.Array,
    *,
    beta_shift: float = 1.0,
) -> jax.Array:
    """Plain-JAX MAG gate (pre-dropout). Shapes: text [..., D],
    visual [..., Dv], acoustic [..., Da]; returns [..., D].

    ``params`` keys (all row-major ``x @ W`` layout):
      w_hv_v [Dv, D], w_hv_t [D, D], b_hv [D]   — split of reference W_hv
      w_ha_a [Da, D], w_ha_t [D, D], b_ha [D]   — split of reference W_ha
      w_v [Dv, D], b_v [D]; w_a [Da, D], b_a [D]
      ln_gamma [D], ln_beta [D]
    """
    f32 = jnp.float32
    t = text.astype(f32)
    v = visual.astype(f32)
    a = acoustic.astype(f32)

    # Matmul precision follows the compute dtype: fp32 models (golden /
    # parity tests, reference-exact runs) get HIGHEST — on TPU the default
    # bf16-pass would perturb α through ‖H_m‖. bf16 training gets the
    # default pass: the surrounding encoder is already bf16-pass, and
    # HIGHEST's 6-pass emulation made this single gate cost ~2.6 ms/step
    # (3% of the b256 train step) for ~30 GFLOPs of math.
    precision = (jax.lax.Precision.HIGHEST
                 if text.dtype == jnp.float32 else None)

    def mm(x, w):
        return jnp.dot(x, w.astype(f32), preferred_element_type=f32,
                       precision=precision)

    gate_v = jax.nn.relu(mm(v, params["w_hv_v"]) + mm(t, params["w_hv_t"])
                         + params["b_hv"].astype(f32))
    gate_a = jax.nn.relu(mm(a, params["w_ha_a"]) + mm(t, params["w_ha_t"])
                         + params["b_ha"].astype(f32))

    h_m = (gate_v * (mm(v, params["w_v"]) + params["b_v"].astype(f32))
           + gate_a * (mm(a, params["w_a"]) + params["b_a"].astype(f32)))

    alpha = mag_norms(t, h_m, beta_shift)
    fused = alpha * h_m + t
    out = layer_norm(fused, params["ln_gamma"].astype(f32),
                     params["ln_beta"].astype(f32))
    return out.astype(text.dtype)


def init_mag_params(key: jax.Array, text_dim: int, visual_dim: int,
                    acoustic_dim: int, dtype=jnp.float32) -> dict:
    """Kaiming-uniform linear init matching torch nn.Linear defaults
    (reference leaves MAG randomly initialized: bert.py:249 init_weights
    keeps MAG outside the pretrained checkpoint)."""
    keys = jax.random.split(key, 8)

    def linear(k, fan_in, fan_out):
        bound = 1.0 / jnp.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        return w, b

    # W_hv acts on [visual; text]: split rows into the visual part then text
    # part (torch cat order at modeling.py:27 is (visual, text)).
    w_hv, b_hv = linear(keys[0], visual_dim + text_dim, text_dim)
    w_ha, b_ha = linear(keys[1], acoustic_dim + text_dim, text_dim)
    w_v, b_v = linear(keys[2], visual_dim, text_dim)
    w_a, b_a = linear(keys[3], acoustic_dim, text_dim)
    return {
        "w_hv_v": w_hv[:visual_dim], "w_hv_t": w_hv[visual_dim:], "b_hv": b_hv,
        "w_ha_a": w_ha[:acoustic_dim], "w_ha_t": w_ha[acoustic_dim:],
        "b_ha": b_ha,
        "w_v": w_v, "b_v": b_v,
        "w_a": w_a, "b_a": b_a,
        "ln_gamma": jnp.ones((text_dim,), dtype),
        "ln_beta": jnp.zeros((text_dim,), dtype),
    }
