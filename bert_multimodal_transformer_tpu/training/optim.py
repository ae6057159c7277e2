"""Optimizer and LR schedule.

Mirrors the reference's prep_for_training optimizer block
(multimodal_driver.py:327-350): decoupled-weight-decay AdamW with
weight_decay 0.01 on every parameter except biases and LayerNorm
scales/biases, and a linear warmup→linear decay-to-zero schedule
(HF get_linear_schedule_with_warmup semantics).

Implemented with optax; the no-decay rule becomes a pytree mask.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def linear_warmup_decay_schedule(
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
) -> optax.Schedule:
    """LR = lr · step/warmup for step < warmup, then linear decay to 0 at
    total_steps (exact HF get_linear_schedule_with_warmup shape used at
    multimodal_driver.py:346-350)."""
    warmup_steps = max(int(warmup_steps), 0)
    total_steps = max(int(total_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        decay = (total_steps - step) / jnp.maximum(
            1.0, float(total_steps - warmup_steps))
        frac = jnp.where(step < warmup_steps, warm, decay)
        return learning_rate * jnp.clip(frac, 0.0, 1.0)

    return schedule


def _no_decay(path: tuple) -> bool:
    """True for params excluded from weight decay. The reference excludes
    names containing 'bias', 'LayerNorm.bias', 'LayerNorm.weight'
    (multimodal_driver.py:329-343). In this pytree: any leaf named bias/
    b_* / beta / gamma / scale, or living under a LayerNorm-ish module."""
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1]
    # reference rule: any parameter whose name contains "bias" (covers
    # XLNet's r_w_bias/r_r_bias/r_s_bias too), plus LayerNorm params
    # (multimodal_driver.py:329-343).
    if "bias" in leaf or leaf in ("beta", "gamma", "scale"):
        return True
    if leaf.startswith("b_") or leaf.startswith("ln_"):
        return True
    if any("LayerNorm" in n or "layer_norm" in n for n in names):
        return True
    return False


def decay_mask(params: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_decay(path), params)


def make_optimizer(
    learning_rate: float,
    num_train_steps: int,
    warmup_proportion: float = 0.1,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    max_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW with HF defaults (betas 0.9/0.999, eps 1e-6 — HF AdamW default,
    used by the reference at multimodal_driver.py:345) and warmup schedule.

    ``max_grad_norm`` adds optional clipping (the reference never clips;
    default 0 = off)."""
    schedule = linear_warmup_decay_schedule(
        learning_rate, int(warmup_proportion * num_train_steps),
        num_train_steps)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
