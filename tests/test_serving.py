"""Predictor: jitted batch inference + checkpoint restore + scoring."""

import numpy as np
import jax
import optax

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MeshConfig,
    MultimodalConfig,
)
from bert_multimodal_transformer_tpu.data import synthetic
from bert_multimodal_transformer_tpu.data.pipeline import (
    convert_to_features,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    WordPieceTokenizer,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.serving import Predictor
from bert_multimodal_transformer_tpu.training.trainer import TrainState
from bert_multimodal_transformer_tpu.utils.checkpoint import (
    CheckpointManager,
)

DV, DA, S = 3, 4, 12


def setup_model_and_split():
    tok = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=2, n_dev=2, n_test=11, seed=21)
    split = convert_to_features(data["test"], S, tok, "bert")
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)
    batch = split.take(np.arange(2)).as_tuple()
    params = model.init(jax.random.PRNGKey(0), *batch[:5])["params"]
    return model, params, split


def test_predictor_orders_and_scores():
    model, params, split = setup_model_and_split()
    mesh = make_mesh(MeshConfig(data_parallel=1))
    pred = Predictor(model, params, mesh=mesh, batch_size=4)
    preds = pred.predict_split(split)
    assert preds.shape == (11,)  # ragged final batch included exactly once
    # order matches a direct forward
    direct = model.apply(
        {"params": params}, split.input_ids, split.visual, split.acoustic,
        attention_mask=split.input_mask, token_type_ids=split.segment_ids)
    np.testing.assert_allclose(preds, np.asarray(direct).reshape(-1),
                               rtol=1e-5, atol=1e-6)
    scores = pred.score_split(split)
    assert set(scores) == {"acc", "mae", "corr", "f_score"}


def test_predictor_from_checkpoint(tmp_path):
    model, params, split = setup_model_and_split()
    tx = optax.sgd(0.1)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              rng=jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, step=3, wait=True)
    mgr.close()

    zero_params = jax.tree_util.tree_map(np.zeros_like,
                                         jax.device_get(params))
    pred = Predictor.from_checkpoint(
        model, str(tmp_path / "ckpt"), zero_params,
        mesh=make_mesh(MeshConfig(data_parallel=1)), batch_size=4)
    preds = pred.predict_split(split)
    want = Predictor(model, params,
                     mesh=make_mesh(MeshConfig(data_parallel=1)),
                     batch_size=4).predict_split(split)
    np.testing.assert_allclose(preds, want, rtol=1e-6)


def test_predictor_classification_head():
    """num_labels>1 (the reference's CrossEntropy branch, bert.py:313-322):
    [N, C] logits, argmax classes, accuracy/weighted-F1 scoring — the
    serving surface now covers everything the classifier heads support."""
    import dataclasses

    import pytest

    tok = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=2, n_dev=2, n_test=11, seed=22)
    split = convert_to_features(data["test"], S, tok, "bert")
    # integer class labels in [0, 3)
    split = dataclasses.replace(
        split, label_ids=np.arange(11, dtype=np.float32) % 3)
    cfg = dataclasses.replace(BertConfig.tiny(vocab_size=tok.vocab_size),
                              num_labels=3)
    model = MagBertForSequenceClassification(
        cfg, MultimodalConfig(1.0, 0.1), visual_dim=DV, acoustic_dim=DA)
    batch = split.take(np.arange(2)).as_tuple()
    params = model.init(jax.random.PRNGKey(0), *batch[:5])["params"]

    pred = Predictor(model, params,
                     mesh=make_mesh(MeshConfig(data_parallel=1)),
                     batch_size=4)
    logits = pred.predict_split(split)
    assert logits.shape == (11, 3)
    direct = model.apply(
        {"params": params}, split.input_ids, split.visual, split.acoustic,
        attention_mask=split.input_mask, token_type_ids=split.segment_ids)
    np.testing.assert_allclose(logits, np.asarray(direct).reshape(11, 3),
                               rtol=1e-5, atol=1e-6)
    classes = pred.predict_classes(split)
    np.testing.assert_array_equal(classes, np.argmax(logits, axis=-1))
    scores = pred.score_split(split)
    assert set(scores) == {"acc", "f_score"}
    assert 0.0 <= scores["acc"] <= 1.0

    # regression predictors reject predict_classes with a clear error
    reg_model, reg_params, reg_split = setup_model_and_split()
    reg = Predictor(reg_model, reg_params,
                    mesh=make_mesh(MeshConfig(data_parallel=1)),
                    batch_size=4)
    with pytest.raises(ValueError, match="classification head"):
        reg.predict_classes(reg_split)


def test_predictor_wire_dtype_bf16_lossless_for_bf16_model():
    """wire_dtype=bfloat16 halves the request payload; with a
    bf16-compute model the predictions are identical to sending fp32 —
    the model casts the modality features to bf16 anyway."""
    import jax.numpy as jnp

    tok = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=2, n_dev=2, n_test=11, seed=21)
    split = convert_to_features(data["test"], S, tok, "bert")
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA, dtype=jnp.bfloat16)
    batch = split.take(np.arange(2)).as_tuple()
    params = model.init(jax.random.PRNGKey(0), *batch[:5])["params"]

    mesh = make_mesh(MeshConfig(data_parallel=1))
    p32 = Predictor(model, params, mesh=mesh, batch_size=4)
    pbf = Predictor(model, params, mesh=mesh, batch_size=4,
                    wire_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(p32.predict_split(split),
                                  pbf.predict_split(split))


def test_predict_requests_orders_and_overlaps():
    """submit/fetch + predict_requests: independent request batches come
    back in order and equal the synchronous forward at every in_flight
    depth; mems predictors reject the API (order-dependent chain)."""
    import pytest

    model, params, split = setup_model_and_split()
    mesh = make_mesh(MeshConfig(data_parallel=1))
    pred = Predictor(model, params, mesh=mesh, batch_size=4)
    reqs = [tuple(a[i:i + 4] for a in split.as_tuple()[:5])
            for i in range(0, 8, 4)]
    want = [np.asarray(jax.device_get(pred._forward(
        pred.params, *[jax.device_put(x, pred._bsh) for x in r])))
        for r in reqs]
    for in_flight in (1, 2, 4):
        got = list(pred.predict_requests(iter(reqs), in_flight=in_flight))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)
    # handle API directly
    h = pred.submit(*reqs[0])
    np.testing.assert_allclose(Predictor.fetch(h), want[0], rtol=1e-6,
                               atol=1e-7)
    with pytest.raises(ValueError, match="in_flight"):
        list(pred.predict_requests(iter(reqs), in_flight=0))
