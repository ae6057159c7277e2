"""Fused Pallas MAG kernel vs plain-JAX gate (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bert_multimodal_transformer_tpu.ops.mag import (
    init_mag_params,
    mag_gate,
)
from bert_multimodal_transformer_tpu.ops.mag_pallas import mag_gate_fused

D, DV, DA = 256, 47, 74  # lane-aligned text dim, real MOSI modality dims


@pytest.fixture(scope="module")
def setup():
    params = jax.device_get(
        init_mag_params(jax.random.PRNGKey(0), D, DV, DA))
    rng = np.random.RandomState(1)
    text = rng.randn(3, 20, D).astype(np.float32)
    visual = rng.randn(3, 20, DV).astype(np.float32)
    acoustic = rng.randn(3, 20, DA).astype(np.float32)
    return params, text, visual, acoustic


def test_fused_matches_plain(setup):
    params, text, visual, acoustic = setup
    want = np.asarray(mag_gate(params, text, visual, acoustic,
                               beta_shift=1.0))
    got = np.asarray(mag_gate_fused(params, text, visual, acoustic,
                                    beta_shift=1.0, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_beta_shift(setup):
    params, text, visual, acoustic = setup
    for beta in (1e-3, 0.5, 1e6):
        want = np.asarray(mag_gate(params, text, visual, acoustic,
                                   beta_shift=beta))
        got = np.asarray(mag_gate_fused(params, text, visual, acoustic,
                                        beta_shift=beta, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"beta={beta}")


def test_fused_row_padding(setup):
    """Row counts not divisible by the tile size must still be exact."""
    params, text, visual, acoustic = setup
    t = text[:1, :7]
    v = visual[:1, :7]
    a = acoustic[:1, :7]
    want = np.asarray(mag_gate(params, t, v, a))
    got = np.asarray(mag_gate_fused(params, t, v, a, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_plain(setup):
    params, text, visual, acoustic = setup

    def loss_plain(p, t, v, a):
        return jnp.sum(mag_gate(p, t, v, a) ** 2)

    def loss_fused(p, t, v, a):
        return jnp.sum(mag_gate_fused(p, t, v, a, interpret=True) ** 2)

    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(
        params, text, visual, acoustic)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        params, text, visual, acoustic)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-4),
        g_plain, g_fused)


def test_fused_non_aligned_text_dim_falls_back():
    params = jax.device_get(init_mag_params(jax.random.PRNGKey(0), 100,
                                            DV, DA))
    rng = np.random.RandomState(2)
    t = rng.randn(2, 4, 100).astype(np.float32)
    v = rng.randn(2, 4, DV).astype(np.float32)
    a = rng.randn(2, 4, DA).astype(np.float32)
    want = np.asarray(mag_gate(params, t, v, a))
    got = np.asarray(mag_gate_fused(params, t, v, a, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_backward_kernel_matches_plain_vjp(setup):
    """The hand-derived Pallas backward (LN→clamp→gate chain) must equal the
    plain gate's jax.vjp cotangents for params and all three inputs."""
    params, text, visual, acoustic = setup
    rng = np.random.RandomState(3)
    dy = rng.randn(*text.shape).astype(np.float32)

    for beta in (1e-3, 1.0, 1e6):
        _, vjp = jax.vjp(
            lambda p, t, v, a: mag_gate(p, t, v, a, beta_shift=beta),
            params, text, visual, acoustic)
        want = vjp(jnp.asarray(dy))

        from bert_multimodal_transformer_tpu.ops.mag_pallas import (
            _mag_backward_pallas,
        )
        got = _mag_backward_pallas(params, jnp.asarray(text),
                                   jnp.asarray(visual),
                                   jnp.asarray(acoustic), jnp.asarray(dy),
                                   beta_shift=beta, interpret=True)
        jax.tree_util.tree_map(
            lambda a_, b_: np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4),
            got, want)


def test_fused_backward_ragged_rows(setup):
    params, text, visual, acoustic = setup
    t = text[:1, :5]
    v = visual[:1, :5]
    a = acoustic[:1, :5]
    rng = np.random.RandomState(4)
    dy = rng.randn(*t.shape).astype(np.float32)

    _, vjp = jax.vjp(lambda p, tt, vv, aa: mag_gate(p, tt, vv, aa),
                     params, t, v, a)
    want = vjp(jnp.asarray(dy))
    from bert_multimodal_transformer_tpu.ops.mag_pallas import (
        _mag_backward_pallas,
    )
    got = _mag_backward_pallas(params, jnp.asarray(t), jnp.asarray(v),
                               jnp.asarray(a), jnp.asarray(dy),
                               beta_shift=1.0, interpret=True)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4),
        got, want)


def test_fused_bwd_env_fallback(setup, monkeypatch):
    """MAG_FUSED_BWD=plain routes through the recompute VJP and matches."""
    params, text, visual, acoustic = setup

    def loss(p, t, v, a):
        return jnp.sum(mag_gate_fused(p, t, v, a, interpret=True) ** 2)

    g_pallas = jax.grad(loss)(params, text, visual, acoustic)
    monkeypatch.setenv("MAG_FUSED_BWD", "plain")
    g_plain = jax.grad(loss)(params, text, visual, acoustic)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-4),
        g_pallas, g_plain)
