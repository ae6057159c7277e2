"""Metric-function tests, cross-checked against sklearn."""

import numpy as np
from sklearn.metrics import accuracy_score, f1_score

from bert_multimodal_transformer_tpu.training.metrics import (
    binary_weighted_f1,
    score_regression,
)


def sklearn_reference(preds, labels, use_zero=False):
    """Direct transcription of the reference scoring recipe
    (multimodal_driver.py:462-480) using sklearn, as the golden."""
    preds = np.asarray(preds, np.float64)
    labels = np.asarray(labels, np.float64)
    non_zeros = np.array(
        [i for i, e in enumerate(labels) if e != 0 or use_zero])
    preds = preds[non_zeros]
    labels = labels[non_zeros]
    mae = np.mean(np.absolute(preds - labels))
    corr = np.corrcoef(preds, labels)[0][1]
    bp = preds >= 0
    bl = labels >= 0
    return {
        "acc": accuracy_score(bl, bp),
        "mae": mae,
        "corr": corr,
        "f_score": f1_score(bl, bp, average="weighted"),
    }


def test_score_matches_sklearn_reference():
    rng = np.random.RandomState(0)
    labels = rng.uniform(-3, 3, 200)
    labels[::17] = 0.0  # some exact zeros to exercise exclusion
    preds = labels + rng.randn(200) * 0.8
    got = score_regression(preds, labels)
    want = sklearn_reference(preds, labels)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)


def test_zero_exclusion_toggle():
    labels = np.array([0.0, 0.0, 1.0, -1.0])
    preds = np.array([5.0, 5.0, 1.0, -1.0])
    excl = score_regression(preds, labels, use_zero=False)
    incl = score_regression(preds, labels, use_zero=True)
    assert excl["mae"] == 0.0
    assert incl["mae"] == 2.5
    assert excl["acc"] == 1.0


def test_weighted_f1_imbalanced():
    rng = np.random.RandomState(1)
    y_true = rng.rand(500) < 0.9
    y_pred = y_true ^ (rng.rand(500) < 0.2)
    got = binary_weighted_f1(y_true, y_pred)
    want = f1_score(y_true, y_pred, average="weighted")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_weighted_f1_single_class():
    y = np.ones(10, bool)
    got = binary_weighted_f1(y, y)
    want = f1_score(y, y, average="weighted")
    np.testing.assert_allclose(got, want)


def test_losses_match_torch_semantics():
    """MSE/CE switch parity against torch loss modules."""
    import torch
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.training.losses import (
        cross_entropy_loss,
        mse_loss,
        sequence_classification_loss,
    )

    rng = np.random.RandomState(0)
    logits = rng.randn(6, 1).astype(np.float32)
    labels = rng.randn(6).astype(np.float32)
    got = float(mse_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.MSELoss()(torch.tensor(logits).view(-1),
                                    torch.tensor(labels).view(-1)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        float(sequence_classification_loss(jnp.asarray(logits),
                                           jnp.asarray(labels), 1)),
        want, rtol=1e-6)

    logits_c = rng.randn(6, 4).astype(np.float32)
    labels_c = rng.randint(0, 4, 6)
    got = float(cross_entropy_loss(jnp.asarray(logits_c),
                                   jnp.asarray(labels_c)))
    want = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(logits_c), torch.tensor(labels_c)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        float(sequence_classification_loss(jnp.asarray(logits_c),
                                           jnp.asarray(labels_c), 4)),
        want, rtol=1e-6)


def test_activations_match_torch():
    """ACT2FN parity with the reference table (bert.py:60-70): gelu (erf),
    gelu_new (tanh approx), swish, mish vs torch implementations."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.ops.activations import ACT2FN

    x = np.linspace(-4, 4, 101).astype(np.float32)
    tx = torch.tensor(x)
    pairs = {
        "gelu": F.gelu(tx),
        "gelu_new": F.gelu(tx, approximate="tanh"),
        "relu": F.relu(tx),
        "swish": F.silu(tx),
        "mish": F.mish(tx),
    }
    for name, want in pairs.items():
        got = np.asarray(ACT2FN[name](jnp.asarray(x)))
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=name)


def test_multiclass_weighted_f1_matches_sklearn():
    from bert_multimodal_transformer_tpu.training.metrics import (
        multiclass_weighted_f1,
        score_classification,
    )

    rng = np.random.RandomState(7)
    for n_cls in (2, 3, 5):
        y_true = rng.randint(0, n_cls, 200)
        y_pred = rng.randint(0, n_cls, 200)
        want = f1_score(y_true, y_pred, average="weighted")
        got = multiclass_weighted_f1(y_true, y_pred)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        s = score_classification(y_pred, y_true.astype(np.float32))
        np.testing.assert_allclose(s["acc"],
                                   accuracy_score(y_true, y_pred))
        np.testing.assert_allclose(s["f_score"], want, rtol=1e-12)
    # a class present only in predictions must not contribute weight
    y_true = np.array([0, 0, 1, 1])
    y_pred = np.array([0, 2, 1, 2])
    np.testing.assert_allclose(
        multiclass_weighted_f1(y_true, y_pred),
        f1_score(y_true, y_pred, average="weighted"), rtol=1e-12)
