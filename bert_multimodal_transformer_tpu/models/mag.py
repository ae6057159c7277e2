"""MAG as a Flax module.

Public API mirror of the reference's ``MAG(hidden_size, beta_shift,
dropout_prob)`` with ``forward(text_embedding, visual, acoustic)``
(modeling.py:6-51), rebuilt as a Flax linen module whose compute core is
either the plain-JAX functional gate (ops/mag.py) or the fused Pallas TPU
kernel (ops/mag_pallas.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bert_multimodal_transformer_tpu.ops import mag as mag_ops


def _torch_linear_init(fan_in: int):
    """Kaiming-uniform weight + uniform bias, torch nn.Linear defaults —
    the reference MAG's linears are torch-default initialized
    (modeling.py:15-19, never loaded from a checkpoint)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MAG(nn.Module):
    """Multimodal Adaptation Gate.

    Attributes:
      hidden_size: text/hidden width D (reference ctor arg, modeling.py:7).
      visual_dim / acoustic_dim: modality feature widths (the reference reads
        these from global_configs VISUAL_DIM/ACOUSTIC_DIM at modeling.py:15-19;
        here they are explicit so MOSI/MOSEI presets need no module edits).
      beta_shift: α clamp scale (modeling.py:38).
      dropout_prob: output dropout (modeling.py:23,47).
      use_fused_kernel: route through the fused Pallas TPU kernel.
    """

    hidden_size: int
    visual_dim: int
    acoustic_dim: int
    beta_shift: float = 1.0
    dropout_prob: float = 0.5
    use_fused_kernel: bool = False

    def setup(self):
        d, dv, da = self.hidden_size, self.visual_dim, self.acoustic_dim
        # Concat-matmul decomposition of reference W_hv/W_ha; see ops/mag.py.
        init_hv = _torch_linear_init(dv + d)
        init_ha = _torch_linear_init(da + d)
        self.w_hv_v = self.param("w_hv_v", init_hv, (dv, d))
        self.w_hv_t = self.param("w_hv_t", init_hv, (d, d))
        self.b_hv = self.param("b_hv", init_hv, (d,))
        self.w_ha_a = self.param("w_ha_a", init_ha, (da, d))
        self.w_ha_t = self.param("w_ha_t", init_ha, (d, d))
        self.b_ha = self.param("b_ha", init_ha, (d,))
        self.w_v = self.param("w_v", _torch_linear_init(dv), (dv, d))
        self.b_v = self.param("b_v", _torch_linear_init(dv), (d,))
        self.w_a = self.param("w_a", _torch_linear_init(da), (da, d))
        self.b_a = self.param("b_a", _torch_linear_init(da), (d,))
        self.ln_gamma = self.param("ln_gamma", nn.initializers.ones, (d,))
        self.ln_beta = self.param("ln_beta", nn.initializers.zeros, (d,))

    def _params_dict(self):
        return {
            "w_hv_v": self.w_hv_v, "w_hv_t": self.w_hv_t, "b_hv": self.b_hv,
            "w_ha_a": self.w_ha_a, "w_ha_t": self.w_ha_t, "b_ha": self.b_ha,
            "w_v": self.w_v, "b_v": self.b_v,
            "w_a": self.w_a, "b_a": self.b_a,
            "ln_gamma": self.ln_gamma, "ln_beta": self.ln_beta,
        }

    @nn.compact
    def __call__(self, text_embedding: jax.Array, visual: jax.Array,
                 acoustic: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        params = self._params_dict()
        if self.use_fused_kernel:
            from bert_multimodal_transformer_tpu.ops import mag_pallas
            fused = mag_pallas.mag_gate_fused(
                params, text_embedding, visual, acoustic,
                beta_shift=self.beta_shift)
        else:
            fused = mag_ops.mag_gate(
                params, text_embedding, visual, acoustic,
                beta_shift=self.beta_shift)
        # Dropout last, as in the reference (modeling.py:47-49).
        fused = nn.Dropout(rate=self.dropout_prob)(
            fused, deterministic=deterministic)
        return fused
