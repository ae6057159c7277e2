"""Loss functions.

The reference's classifier heads compute an internal loss when ``labels``
is passed: MSE for num_labels==1 (regression) else CrossEntropy
(bert.py:313-322, xlnet.py:515-524). The training driver instead computes
MSE externally (multimodal_driver.py:371-373); both paths exist here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """MSELoss(logits.view(-1), labels.view(-1))."""
    return jnp.mean(jnp.square(logits.reshape(-1).astype(jnp.float32)
                               - labels.reshape(-1).astype(jnp.float32)))


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss(logits.view(-1, C), labels.view(-1))."""
    num_classes = logits.shape[-1]
    logits = logits.reshape(-1, num_classes).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def sequence_classification_loss(logits: jax.Array, labels: jax.Array,
                                 num_labels: int) -> jax.Array:
    """The reference's num_labels switch: 1 → MSE (regression), else CE."""
    if num_labels == 1:
        return mse_loss(logits, labels)
    return cross_entropy_loss(logits, labels)
