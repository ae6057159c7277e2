"""Activation registry.

Parity surface for the reference's ACT2FN table (bert.py:60-70), which maps
"gelu" / "relu" / "swish" / "gelu_new" / "mish" to callables. BERT-base uses
exact (erf) gelu via HF transformers 3.0.2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x):
    """Exact erf-based GELU (HF transformers.activations.gelu)."""
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x):
    """Tanh-approximate GELU (HF transformers.activations.gelu_new)."""
    return jax.nn.gelu(x, approximate=True)


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    """x * tanh(softplus(x)) — defined (unused) by the reference at
    bert.py:60-61."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACT2FN = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "swish": swish,
    "gelu_new": gelu_new,
    "mish": mish,
}
