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


def _scale_by_adam_hf(b1: float, b2: float,
                      eps: float) -> optax.GradientTransformation:
    """optax.scale_by_adam with the reference's eps placement.

    transformers-3.0.2 AdamW computes ``√bc₂/bc₁ · m/(√v + eps)`` — eps
    added BEFORE bias correction — and that is written here in exactly
    torch's association: ``denom = √v + eps`` with a CONSTANT eps, then
    one scalar multiplier ``s₀ = √bc₂/bc₁``.

    Perf note (measured, do not "simplify"): keeping eps a compile-time
    constant and feeding only ONE traced scalar into the per-leaf math is
    worth ~5.6 ms/step at bert-base b256 on TPU. The algebraically equal
    ``m̂/(√v̂ + eps/√bc₂)`` form makes eps a runtime scalar and drops the
    step from 3441 to ~3175 ex/s — XLA stops fusing the update into the
    backward-matmul epilogues (see NOTES_ROUND2.md, ab_bisect experiment).
    """

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, grads)
        count = state.count + 1
        t = count.astype(jnp.float32)
        s0 = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        updates = jax.tree_util.tree_map(
            lambda m, v: s0 * (m / (jnp.sqrt(v) + eps)), mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _add_hf_decayed_weights(schedule: optax.Schedule, weight_decay: float,
                            mask=None) -> optax.GradientTransformation:
    """The reference's decoupled weight decay, which applies to the
    POST-adam-update parameter: p′ = (p − lr·u)(1 − lr·wd). As an additive
    term before the final −lr scaling that is
    ``u ← u·(1 − lr·wd) + wd·p`` (then −lr·(·) reproduces it exactly).
    Needs lr, so it tracks the schedule with its own count, like optax's
    schedule-aware transforms."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params):
        if params is None:
            raise ValueError("adamw_hf requires params")
        c = schedule(state.count) * weight_decay
        decay_on = (mask(params) if mask is not None
                    else jax.tree_util.tree_map(lambda _: True, params))

        def leaf(u, p, dec):
            if dec and weight_decay > 0.0:
                return u * (1.0 - c) + weight_decay * p
            return u

        new = jax.tree_util.tree_map(leaf, updates, params, decay_on)
        return new, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


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

    Built as the same 3-transform chain as optax.adamw (scale_by_adam →
    decayed-weights → scale_by_learning_rate) so XLA lowers it
    identically; both differences live in the transforms' scalar math.
    The schedule index is the count of completed updates — the
    reference calls scheduler.step() AFTER optimizer.step(), so update k
    uses λ(k−1), which is optax's native convention too.
    """
    return optax.chain(
        _scale_by_adam_hf(b1, b2, eps),
        _add_hf_decayed_weights(schedule, weight_decay, mask),
        optax.scale_by_learning_rate(schedule),
    )


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
