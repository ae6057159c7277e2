"""Golden-value tests for the MAG gate.

The golden reference is an independent numpy transcription of the published
MAG equations (reference modeling.py:25-51): gates, displacement H_m, the
‖text‖/‖H_m‖·β clamp with its two guards (hm_norm==0 → 1, α ≤ 1), LayerNorm
(torch-default eps 1e-5), no dropout (eval mode).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bert_multimodal_transformer_tpu.ops.mag import (
    init_mag_params,
    mag_gate,
)
from bert_multimodal_transformer_tpu.models.mag import MAG

D, DV, DA = 16, 5, 7


def numpy_mag(params, text, visual, acoustic, beta_shift=1.0):
    """Independent numpy golden implementation of modeling.py:25-51."""
    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    t = text.astype(np.float64)
    v = visual.astype(np.float64)
    a = acoustic.astype(np.float64)

    gate_v = np.maximum(v @ p["w_hv_v"] + t @ p["w_hv_t"] + p["b_hv"], 0.0)
    gate_a = np.maximum(a @ p["w_ha_a"] + t @ p["w_ha_t"] + p["b_ha"], 0.0)
    h_m = gate_v * (v @ p["w_v"] + p["b_v"]) + gate_a * (a @ p["w_a"] + p["b_a"])

    em_norm = np.linalg.norm(t, axis=-1)
    hm_norm = np.linalg.norm(h_m, axis=-1)
    hm_norm = np.where(hm_norm == 0.0, 1.0, hm_norm)
    thresh = (em_norm / (hm_norm + 1e-6)) * beta_shift
    alpha = np.minimum(thresh, 1.0)[..., None]

    fused = alpha * h_m + t
    mean = fused.mean(-1, keepdims=True)
    var = ((fused - mean) ** 2).mean(-1, keepdims=True)
    y = (fused - mean) / np.sqrt(var + 1e-5) * p["ln_gamma"] + p["ln_beta"]
    return y


@pytest.fixture
def params():
    return jax.device_get(
        init_mag_params(jax.random.PRNGKey(0), D, DV, DA))


@pytest.fixture
def inputs():
    rng = np.random.RandomState(1)
    text = rng.randn(4, 9, D).astype(np.float32)
    visual = rng.randn(4, 9, DV).astype(np.float32)
    acoustic = rng.randn(4, 9, DA).astype(np.float32)
    return text, visual, acoustic


def test_mag_matches_numpy_golden(params, inputs):
    text, visual, acoustic = inputs
    got = np.asarray(mag_gate(params, text, visual, acoustic, beta_shift=1.0))
    want = numpy_mag(params, text, visual, acoustic, beta_shift=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mag_beta_shift_scales_alpha(params, inputs):
    text, visual, acoustic = inputs
    tiny = np.asarray(mag_gate(params, text, visual, acoustic,
                               beta_shift=1e-3))
    want = numpy_mag(params, text, visual, acoustic, beta_shift=1e-3)
    np.testing.assert_allclose(tiny, want, rtol=1e-4, atol=1e-5)


def test_mag_zero_hm_guard(params):
    """If both modalities are zero and biases make H_m exactly 0, output must
    be LayerNorm(text) — exercising the hm_norm==0 → 1 guard
    (modeling.py:35-36)."""
    p = dict(params)
    # Zero the displacement projections entirely so h_m == 0 regardless.
    for k in ["w_v", "b_v", "w_a", "b_a"]:
        p[k] = np.zeros_like(p[k])
    rng = np.random.RandomState(2)
    text = rng.randn(2, 3, D).astype(np.float32)
    visual = rng.randn(2, 3, DV).astype(np.float32)
    acoustic = rng.randn(2, 3, DA).astype(np.float32)
    got = np.asarray(mag_gate(p, text, visual, acoustic))
    want = numpy_mag(p, text, visual, acoustic)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mag_alpha_clamped_at_one(params, inputs):
    """With a huge beta_shift the clamp must saturate: output equals
    LayerNorm(h_m + text) exactly (α==1)."""
    text, visual, acoustic = inputs
    big = np.asarray(mag_gate(params, text, visual, acoustic,
                              beta_shift=1e9))
    want = numpy_mag(params, text, visual, acoustic, beta_shift=1e9)
    np.testing.assert_allclose(big, want, rtol=1e-5, atol=1e-5)


def test_mag_flax_module_matches_functional(inputs):
    text, visual, acoustic = inputs
    mod = MAG(hidden_size=D, visual_dim=DV, acoustic_dim=DA, beta_shift=1.0,
              dropout_prob=0.5)
    variables = mod.init(jax.random.PRNGKey(0), text, visual, acoustic)
    out = mod.apply(variables, text, visual, acoustic, deterministic=True)
    flat = variables["params"]
    want = numpy_mag({k: np.asarray(v) for k, v in flat.items()},
                     text, visual, acoustic)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_mag_dropout_active_in_training_mode(inputs):
    text, visual, acoustic = inputs
    mod = MAG(hidden_size=D, visual_dim=DV, acoustic_dim=DA,
              dropout_prob=0.5)
    variables = mod.init(jax.random.PRNGKey(0), text, visual, acoustic)
    out1 = mod.apply(variables, text, visual, acoustic, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = mod.apply(variables, text, visual, acoustic, deterministic=True)
    # ~half the entries should be zeroed in training mode.
    frac_zero = float(np.mean(np.asarray(out1) == 0.0))
    assert 0.3 < frac_zero < 0.7
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_mag_grads_finite(params, inputs):
    text, visual, acoustic = inputs

    def loss(p):
        return jnp.sum(mag_gate(p, text, visual, acoustic) ** 2)

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k


class _TorchRefMAG:
    """The reference gate instantiated in ACTUAL torch (modeling.py:6-51),
    not a numpy transcription: nn.Linear layers with the reference's
    concat order (visual-first at modeling.py:27, acoustic-first at :28),
    torch.norm / torch.where / clamp(max=1) guards (:32-43), and
    torch-default nn.LayerNorm eps=1e-5 (:22). Dropout off (eval mode).
    """

    def __init__(self, d, dv, da, beta_shift=1.0):
        import torch

        self.W_hv = torch.nn.Linear(dv + d, d)
        self.W_ha = torch.nn.Linear(da + d, d)
        self.W_v = torch.nn.Linear(dv, d)
        self.W_a = torch.nn.Linear(da, d)
        self.LayerNorm = torch.nn.LayerNorm(d)
        self.beta_shift = beta_shift

    def load_split_params(self, params):
        """Transplant the repo's split-param layout (ops/mag.py:64-68)
        into the reference's fused [out, in] nn.Linear layout."""
        import torch

        def t(x):
            return torch.from_numpy(np.asarray(x, np.float32))

        with torch.no_grad():
            self.W_hv.weight.copy_(
                t(np.concatenate([params["w_hv_v"], params["w_hv_t"]], 0).T))
            self.W_hv.bias.copy_(t(params["b_hv"]))
            self.W_ha.weight.copy_(
                t(np.concatenate([params["w_ha_a"], params["w_ha_t"]], 0).T))
            self.W_ha.bias.copy_(t(params["b_ha"]))
            self.W_v.weight.copy_(t(params["w_v"].T))
            self.W_v.bias.copy_(t(params["b_v"]))
            self.W_a.weight.copy_(t(params["w_a"].T))
            self.W_a.bias.copy_(t(params["b_a"]))
            self.LayerNorm.weight.copy_(t(params["ln_gamma"]))
            self.LayerNorm.bias.copy_(t(params["ln_beta"]))

    def __call__(self, text, visual, acoustic):
        import torch

        eps = 1e-6
        weight_v = torch.relu(self.W_hv(torch.cat((visual, text), dim=-1)))
        weight_a = torch.relu(self.W_ha(torch.cat((acoustic, text), dim=-1)))
        h_m = weight_v * self.W_v(visual) + weight_a * self.W_a(acoustic)
        em_norm = text.norm(2, dim=-1)
        hm_norm = h_m.norm(2, dim=-1)
        hm_norm = torch.where(hm_norm == 0, torch.ones_like(hm_norm), hm_norm)
        thresh_hold = (em_norm / (hm_norm + eps)) * self.beta_shift
        alpha = torch.clamp(thresh_hold, max=1.0).unsqueeze(-1)
        return self.LayerNorm(alpha * h_m + text)


@pytest.mark.parametrize("beta_shift", [1.0, 1e-3, 1e9])
def test_mag_matches_torch_reference(beta_shift):
    """North-star golden: bit-level (≤1e-6 fp32) agreement of the JAX gate
    AND the fused Pallas kernel with the gate run in actual PyTorch —
    reference modeling.py:25-51 — at MOSI geometry (768/47/74)."""
    import torch

    from bert_multimodal_transformer_tpu.ops.mag_pallas import mag_gate_fused

    d, dv, da = 768, 47, 74
    params = jax.device_get(init_mag_params(jax.random.PRNGKey(3), d, dv, da))
    ref = _TorchRefMAG(d, dv, da, beta_shift=beta_shift)
    ref.load_split_params(params)

    rng = np.random.RandomState(7)
    text = rng.randn(3, 11, d).astype(np.float32)
    visual = rng.randn(3, 11, dv).astype(np.float32)
    acoustic = rng.randn(3, 11, da).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(text), torch.from_numpy(visual),
                   torch.from_numpy(acoustic)).numpy()

    got = np.asarray(mag_gate(params, text, visual, acoustic,
                              beta_shift=beta_shift))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=2e-6)

    fused = np.asarray(mag_gate_fused(params, text, visual, acoustic,
                                      beta_shift=beta_shift))
    np.testing.assert_allclose(fused, want, rtol=1e-6, atol=2e-6)


def test_mag_mosei_dims():
    """MOSEI preset dims (visual 35, acoustic 74 — global_configs.py:14-17)
    flow through the gate; odd (non-lane-aligned) dims must work."""
    from bert_multimodal_transformer_tpu.config import DatasetConfig

    ds = DatasetConfig.mosei()
    assert (ds.visual_dim, ds.acoustic_dim, ds.text_dim) == (35, 74, 768)
    params = jax.device_get(init_mag_params(
        jax.random.PRNGKey(0), 32, ds.visual_dim, ds.acoustic_dim))
    rng = np.random.RandomState(0)
    t = rng.randn(2, 5, 32).astype(np.float32)
    v = rng.randn(2, 5, ds.visual_dim).astype(np.float32)
    a = rng.randn(2, 5, ds.acoustic_dim).astype(np.float32)
    out = np.asarray(mag_gate(params, t, v, a))
    want = numpy_mag(params, t, v, a)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
