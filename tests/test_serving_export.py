"""Serving-artifact export (serving.py): the trained forward is
serialized to a StableHLO module with a symbolic batch dimension and
reloaded WITHOUT the model code — the deployment surface the reference
lacks (its best model only ever lives as an in-memory state_dict,
multimodal_driver.py:483-552)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
)
from bert_multimodal_transformer_tpu import serving

SEQ, DV, DA = 20, 5, 7


def _batch(b, seq=SEQ, vocab=128, seed=0):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, vocab, (b, seq)), jnp.int32)
    vis = jnp.asarray(rng.randn(b, seq, DV), jnp.float32)
    aco = jnp.asarray(rng.randn(b, seq, DA), jnp.float32)
    mask = np.ones((b, seq), np.int32)
    mask[0, seq // 2:] = 0
    seg = np.zeros((b, seq), np.int32)
    return ids, vis, aco, jnp.asarray(mask), jnp.asarray(seg)


def _bert_model(attention_impl="einsum"):
    cfg = dataclasses.replace(BertConfig.tiny(),
                              attention_impl=attention_impl)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    ids, vis, aco, mask, seg = _batch(2)
    params = model.init(jax.random.PRNGKey(0), ids, vis, aco, mask,
                        seg)["params"]
    return model, params


def _xlnet_model():
    cfg = XLNetConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                              acoustic_dim=DA)
    ids, vis, aco, mask, seg = _batch(2)
    params = model.init(jax.random.PRNGKey(0), ids, vis, aco, mask,
                        seg)["params"]
    return model, params


def _roundtrip(tmp_path, model, params):
    exported = serving.export_forward(
        model, params, seq_len=SEQ, visual_dim=DV, acoustic_dim=DA,
        platforms=("cpu",))
    path = str(tmp_path / "model.stablehlo")
    serving.save_artifact(path, exported, meta={"family": "test"})
    return serving.load_artifact(path), path


@pytest.mark.parametrize("family", ["bert", "xlnet"])
def test_roundtrip_matches_apply_any_batch(tmp_path, family):
    """export → serialize → deserialize → call equals model.apply, and
    the symbolic batch dim serves sizes never seen at export time."""
    model, params = (_bert_model() if family == "bert"
                     else _xlnet_model())
    serve, _ = _roundtrip(tmp_path, model, params)
    for b in (2, 5):
        ids, vis, aco, mask, seg = _batch(b, seed=b)
        ref = model.apply({"params": params}, ids, vis, aco,
                          attention_mask=mask, token_type_ids=seg,
                          deterministic=True)
        if isinstance(ref, tuple):
            ref = ref[0]
        out = serve(ids, vis, aco, mask, seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


def test_sidecar_describes_calling_convention(tmp_path):
    model, params = _bert_model()
    _, path = _roundtrip(tmp_path, model, params)
    import json
    with open(path + ".json") as f:
        side = json.load(f)
    assert side["format"] == "magtpu-serving"
    assert side["platforms"] == ["cpu"]
    assert side["inputs"][0]["name"] == "input_ids"
    assert side["inputs"][0]["shape"] == ["b", str(SEQ)]
    assert side["inputs"][1]["shape"] == ["b", str(SEQ), str(DV)]


def test_fused_model_exports_portable_einsum(tmp_path):
    """A model configured for the fused kernels re-clones onto the
    einsum path by default — the artifact must not carry
    tpu_custom_call ops — and still computes the same function."""
    model_f, params = _bert_model(attention_impl="fused")
    serve, _ = _roundtrip(tmp_path, model_f, params)
    model_e, _ = _bert_model()
    ids, vis, aco, mask, seg = _batch(3, seed=3)
    ref = model_e.apply({"params": params}, ids, vis, aco,
                        attention_mask=mask, token_type_ids=seg,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(serve(ids, vis, aco, mask, seg)),
                               np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_keep_fused_requires_tpu_only_platforms():
    model, params = _bert_model(attention_impl="fused")
    with pytest.raises(ValueError, match="only lowers for TPU"):
        serving.export_forward(model, params, seq_len=SEQ,
                               visual_dim=DV, acoustic_dim=DA,
                               platforms=("tpu", "cpu"),
                               keep_attention_impl=True)


def test_predict_batches_drops_padding(tmp_path):
    """predict_batches mirrors Trainer.test_epoch's valid-row semantics
    (reference test_epoch, multimodal_driver.py:424-459)."""
    model, params = _bert_model()
    serve, _ = _roundtrip(tmp_path, model, params)
    rng = np.random.RandomState(9)

    def loader():
        for i, valid in enumerate((np.array([True, True]),
                                   np.array([True, False]))):
            ids, vis, aco, mask, seg = _batch(2, seed=10 + i)
            lab = rng.randn(2, 1).astype(np.float32)
            yield (ids, vis, aco, mask, seg, lab), valid

    preds, labels = serving.predict_batches(serve, loader())
    assert preds.shape == (3,) and labels.shape == (3,)
    ids, vis, aco, mask, seg = _batch(2, seed=11)
    ref = np.asarray(model.apply({"params": params}, ids, vis, aco,
                                 attention_mask=mask, token_type_ids=seg,
                                 deterministic=True)).reshape(-1)
    np.testing.assert_allclose(preds[2], ref[0], rtol=1e-6)


def test_keep_fused_requires_concrete_batch():
    """The fused kernels' VMEM plans resolve from the concrete batch, so
    a keep_attention_impl artifact must pin batch_size (measured on
    hardware: a symbolic b makes the plan arithmetic inconclusive)."""
    model, params = _bert_model(attention_impl="fused")
    with pytest.raises(ValueError, match="batch_size"):
        serving.export_forward(model, params, seq_len=SEQ,
                               visual_dim=DV, acoustic_dim=DA,
                               platforms=("tpu",),
                               keep_attention_impl=True)


def test_fixed_batch_export_roundtrip(tmp_path):
    """batch_size=N exports a fixed-batch artifact whose input avals are
    concrete; it roundtrips and matches the live forward at that batch."""
    model, params = _bert_model()
    exported = serving.export_forward(
        model, params, seq_len=SEQ, visual_dim=DV, acoustic_dim=DA,
        platforms=("cpu",), batch_size=4)
    assert exported.in_avals[0].shape == (4, SEQ)
    path = str(tmp_path / "fixed.stablehlo")
    serving.save_artifact(path, exported)
    serve = serving.load_artifact(path)
    ids, vis, aco, mask, seg = _batch(4)
    ref = model.apply({"params": params}, ids, vis, aco,
                      attention_mask=mask, token_type_ids=seg,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(serve(ids, vis, aco, mask, seg)),
                               np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_predict_batches_classification_artifact(tmp_path):
    """A num_labels>1 artifact's [B, C] logits must mask padded ROWS and
    keep the class axis (the round-4 advisor found reshape(-1) before
    masking broke this path — regression lock)."""
    import dataclasses

    cfg = dataclasses.replace(BertConfig.tiny(), num_labels=3)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.5,
                          injection_index=0)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    ids, vis, aco, mask, seg = _batch(2)
    params = model.init(jax.random.PRNGKey(0), ids, vis, aco, mask,
                        seg)["params"]
    exported = serving.export_forward(
        model, params, seq_len=SEQ, visual_dim=DV, acoustic_dim=DA,
        platforms=("cpu",))
    path = str(tmp_path / "cls.stablehlo")
    serving.save_artifact(path, exported)
    serve = serving.load_artifact(path)

    rng = np.random.RandomState(5)

    def loader():
        for i, valid in enumerate((np.array([True, True]),
                                   np.array([True, False]))):
            b = _batch(2, seed=20 + i)
            lab = (rng.randint(0, 3, (2,))).astype(np.float32)
            yield b + (lab,), valid

    preds, labels = serving.predict_batches(serve, loader())
    assert preds.shape == (3, 3)  # 3 valid rows x 3 classes
    assert labels.shape == (3,)
    ids, vis, aco, mask, seg = _batch(2, seed=21)
    ref = np.asarray(model.apply({"params": params}, ids, vis, aco,
                                 attention_mask=mask, token_type_ids=seg,
                                 deterministic=True))
    np.testing.assert_allclose(preds[2], ref[0], rtol=1e-6, atol=1e-7)
