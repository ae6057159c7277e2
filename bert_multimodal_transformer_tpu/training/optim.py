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


def adamw_hf(
    schedule: optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    mask=None,
) -> optax.GradientTransformation:
    """AdamW with the exact update rule of the reference's optimizer
    (``transformers.AdamW`` from 3.0.2, multimodal_driver.py:345), which
    differs from ``optax.adamw`` in two ways:

    1. eps is added to sqrt(v) BEFORE bias correction — the step is
       ``lr·√(1−β₂ᵗ)/(1−β₁ᵗ) · m/(√v + eps)``, so the effective epsilon is
       larger during early steps (optax uses ``m̂/(√v̂ + eps)``);
    2. decoupled weight decay is applied to the POST-adam-update parameter
       (``p ← p_adam − lr·wd·p_adam``), not the pre-update one.

    Returns additive updates (chain-compatible); state is
    ``optax.ScaleByAdamState`` so opt-state pytrees stay checkpointable.
    """

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32), mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_hf requires params")
        # Schedule index = completed updates (reference: scheduler.step()
        # called AFTER optimizer.step() → update k uses λ(k−1)).
        lr = schedule(state.count)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, grads)
        count = state.count + 1
        t = count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

        decay_on = (mask(params) if mask is not None
                    else jax.tree_util.tree_map(lambda _: True, params))

        def leaf_update(m, v, p, dec):
            adam = -step_size * m / (jnp.sqrt(v) + eps)
            p_mid = p + adam
            if dec and weight_decay > 0.0:
                return adam - lr * weight_decay * p_mid
            return adam

        updates = jax.tree_util.tree_map(
            leaf_update, mu, nu, params, decay_on)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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

    Uses the HF-exact update rule (``adamw_hf``) so training trajectories
    match the reference step for step (tests/test_trajectory_torch.py).

    ``max_grad_norm`` adds optional clipping (the reference never clips;
    default 0 = off)."""
    schedule = linear_warmup_decay_schedule(
        learning_rate, int(warmup_proportion * num_train_steps),
        num_train_steps)
    tx = adamw_hf(
        schedule,
        b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
