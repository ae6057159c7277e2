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
