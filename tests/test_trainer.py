"""Trainer tests: optimizer semantics, grad-accum equivalence, data-parallel
sharding on the virtual 8-device CPU mesh, and a tiny end-to-end overfit."""

import numpy as np
import jax
import optax
import pytest

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MeshConfig,
    MultimodalConfig,
)
from bert_multimodal_transformer_tpu.data import synthetic
from bert_multimodal_transformer_tpu.data.pipeline import (
    BatchIterator,
    convert_to_features,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    WordPieceTokenizer,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.training.optim import (
    decay_mask,
    linear_warmup_decay_schedule,
    make_optimizer,
)
from bert_multimodal_transformer_tpu.training.trainer import Trainer

CFG = BertConfig.tiny(vocab_size=64)
MM = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
DV, DA, S, B = 3, 4, 12, 8


def make_model():
    return MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)


@pytest.fixture(scope="module")
def dataset():
    tok = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=32, n_dev=8, n_test=8, seed=3)
    return {name: convert_to_features(data[name], S, tok, "bert",
                                      visual_dim=DV, acoustic_dim=DA)
            for name in ("train", "dev", "test")}, tok


def test_schedule_shape():
    sched = linear_warmup_decay_schedule(1e-3, warmup_steps=10,
                                         total_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 5e-4)
    np.testing.assert_allclose(float(sched(10)), 1e-3)
    np.testing.assert_allclose(float(sched(55)), 5e-4)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-12)


def test_decay_mask_excludes_bias_and_layernorm():
    model = make_model()
    rng = np.random.RandomState(0)
    ids = rng.randint(0, CFG.vocab_size, (2, S)).astype(np.int32)
    vis = rng.randn(2, S, DV).astype(np.float32)
    ac = rng.randn(2, S, DA).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, vis, ac)["params"]
    mask = decay_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, decays in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        leaf = names[-1]
        is_ln = any("LayerNorm" in n for n in names)
        is_bias = leaf in ("bias", "beta") or leaf.startswith("b_") \
            or leaf.startswith("ln_") or leaf in ("gamma", "scale")
        if is_ln or is_bias:
            assert not decays, names
        else:
            assert decays, names


def test_masked_ragged_step_equals_exact_small_batch(dataset):
    """The masked train step on a zero-padded ragged batch (4 real of 8)
    must produce the same loss and params as the unmasked step on the
    exact 4-example batch — the reference trains on the ragged tail
    directly (multimodal_driver.py:358-386); VERDICT r1 item 9."""
    import dataclasses

    splits, _ = dataset
    small = splits["train"].take(np.arange(4)).as_tuple()
    padded = tuple(
        np.concatenate([a, np.zeros((4,) + a.shape[1:], a.dtype)])
        for a in small)
    valid = np.zeros(8, bool)
    valid[:4] = True

    cfg_nodrop = dataclasses.replace(
        BertConfig.tiny(vocab_size=64),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    mm_nodrop = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertForSequenceClassification(
        cfg_nodrop, mm_nodrop, visual_dim=DV, acoustic_dim=DA)
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = optax.sgd(0.1)

    t_exact = Trainer(model=model, tx=tx, mesh=mesh, donate=False)
    t_masked = Trainer(model=model, tx=tx, mesh=mesh, donate=False)
    s_exact = t_exact.init_state(jax.random.PRNGKey(0), small)
    s_masked = t_masked.init_state(jax.random.PRNGKey(0), padded)

    s_exact, loss_exact = t_exact._train_step(
        s_exact, t_exact._put_batch(small))
    s_masked, loss_masked = t_masked._train_step_masked(
        s_masked, t_masked._put_batch(padded),
        jax.device_put(valid, t_masked._bsh))
    np.testing.assert_allclose(float(loss_exact), float(loss_masked),
                               rtol=1e-6)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_exact.params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_masked.params))):
        assert p1 == p2
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=str(p1))


def test_train_epoch_trains_on_ragged_tail(dataset):
    """train_epoch with a drop_remainder=False loader consumes the ragged
    final batch (params change on it) and reports its loss."""
    splits, _ = dataset
    # 12 examples, batch 8 → one full batch + ragged 4
    sub = splits["train"].take(np.arange(12))
    loader = BatchIterator(sub, 8, shuffle=False, drop_remainder=False)
    assert len(loader) == 2
    model = make_model()
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    trainer = Trainer(model=model, tx=optax.sgd(0.1), mesh=mesh,
                      donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               next(iter(loader))[0])
    step0 = int(state.step)
    state, _loss = trainer.train_epoch(state, loader)
    assert int(state.step) == step0 + 2  # ragged tail stepped too


def test_grad_accum_equivalent_to_full_batch(dataset):
    """accum=2 over B=8 must produce (numerically close) params to accum=1,
    dropout off (deterministic path uses same rng fold)."""
    splits, _ = dataset
    batch = splits["train"].take(np.arange(B)).as_tuple()

    # Fully dropout-free config: accum splits consume RNG differently, so
    # any active dropout would make the two paths legitimately diverge.
    import dataclasses
    cfg_nodrop = dataclasses.replace(
        BertConfig.tiny(vocab_size=64),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    mm_nodrop = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertForSequenceClassification(
        cfg_nodrop, mm_nodrop, visual_dim=DV, acoustic_dim=DA)

    mesh = make_mesh(MeshConfig(data_parallel=1))
    tx = optax.sgd(0.1)

    t1 = Trainer(model=model, tx=tx, mesh=mesh, grad_accum=1, donate=False)
    t2 = Trainer(model=model, tx=tx, mesh=mesh, grad_accum=2, donate=False)
    s1 = t1.init_state(jax.random.PRNGKey(0), batch)
    s2 = t2.init_state(jax.random.PRNGKey(0), batch)

    s1, loss1 = t1._train_step(s1, t1._put_batch(batch))
    s2, loss2 = t2._train_step(s2, t2._put_batch(batch))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s1.params, s2.params)


def test_data_parallel_matches_single_device(dataset):
    """The 8-way sharded step must produce the same loss/params as 1-way —
    SPMD correctness of the batch sharding (SURVEY §2d plan)."""
    splits, _ = dataset
    batch = splits["train"].take(np.arange(B)).as_tuple()
    model = make_model()
    tx = optax.sgd(0.1)

    t_dp = Trainer(model=model, tx=tx,
                   mesh=make_mesh(MeshConfig(data_parallel=-1)),
                   donate=False)
    t_1 = Trainer(model=model, tx=tx,
                  mesh=make_mesh(MeshConfig(data_parallel=1)),
                  donate=False)
    assert t_dp.mesh.devices.size == 8

    s_dp = t_dp.init_state(jax.random.PRNGKey(0), batch)
    s_1 = t_1.init_state(jax.random.PRNGKey(0), batch)

    s_dp, loss_dp = t_dp._train_step(s_dp, t_dp._put_batch(batch))
    s_1, loss_1 = t_1._train_step(s_1, t_1._put_batch(batch))
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_dp.params, s_1.params)


def test_end_to_end_overfit(dataset):
    """Tiny MAG-BERT must overfit 32 synthetic examples: train loss drops
    by >5x over 30 steps. This is the framework's smoke equivalent of the
    reference's continuous-eval workflow (SURVEY §4)."""
    splits, _ = dataset
    model = make_model()
    tx = make_optimizer(learning_rate=5e-3, num_train_steps=120,
                        warmup_proportion=0.1)
    trainer = Trainer(model=model, tx=tx,
                      mesh=make_mesh(MeshConfig(data_parallel=1)))
    loader = BatchIterator(splits["train"], B, shuffle=True,
                           drop_remainder=True, seed=0)
    sample = next(iter(loader))[0]
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    state, first_loss = trainer.train_epoch(state, loader)
    losses = [first_loss]
    for _ in range(29):
        state, loss = trainer.train_epoch(state, loader)
        losses.append(loss)
    assert losses[-1] < losses[0] / 5, losses

    dev_loader = BatchIterator(splits["dev"], B, shuffle=False,
                               drop_remainder=False)
    dev_mse = trainer.eval_epoch(state, dev_loader)
    assert np.isfinite(dev_mse)
    scores = trainer.test_score_model(
        state, BatchIterator(splits["test"], B, shuffle=False,
                             drop_remainder=False))
    assert set(scores) == {"acc", "mae", "corr", "f_score"}
    assert np.isfinite(scores["mae"])


def test_decay_mask_covers_xlnet_rel_biases():
    """Reference rule: any param name containing 'bias' is excluded from
    weight decay — XLNet's r_w_bias/r_r_bias/r_s_bias included
    (multimodal_driver.py:329-343)."""
    from bert_multimodal_transformer_tpu.config import XLNetConfig
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification,
    )

    cfg = XLNetConfig.tiny(vocab_size=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 64, (2, S)).astype(np.int32)
    vis = rng.randn(2, S, DV).astype(np.float32)
    ac = rng.randn(2, S, DA).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, vis, ac)["params"]
    mask = decay_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    checked = 0
    for path, decays in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        leaf = names[-1]
        if "bias" in leaf or any("layer_norm" in n for n in names):
            assert not decays, names
            checked += 1
        elif leaf in ("q", "k", "v", "o", "r", "seg_embed", "embedding",
                      "kernel"):
            assert decays, names
    assert checked >= 3 * cfg.n_layer  # r_w/r_r/r_s per layer at minimum


def test_compiler_options_thread_through(dataset):
    """Trainer(compiler_options=...) reaches jax.jit: a benign XLA option
    compiles and steps identically to the default; an invalid option name
    fails loudly at compile time instead of being silently dropped."""
    splits, _ = dataset
    batch = splits["train"].take(np.arange(B)).as_tuple()
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = optax.sgd(0.1)
    model = make_model()

    t_plain = Trainer(model=model, tx=tx, mesh=mesh, donate=False)
    t_opts = Trainer(model=model, tx=tx, mesh=mesh, donate=False,
                     compiler_options={
                         "xla_backend_optimization_level": "2"})
    s_plain = t_plain.init_state(jax.random.PRNGKey(0), batch)
    s_opts = t_opts.init_state(jax.random.PRNGKey(0), batch)
    _, loss_plain = t_plain._train_step(s_plain, t_plain._put_batch(batch))
    _, loss_opts = t_opts._train_step(s_opts, t_opts._put_batch(batch))
    np.testing.assert_allclose(float(loss_plain), float(loss_opts),
                               rtol=1e-6)

    t_bad = Trainer(model=model, tx=tx, mesh=mesh, donate=False,
                    compiler_options={"no_such_xla_option": "1"})
    s_bad = t_bad.init_state(jax.random.PRNGKey(0), batch)
    with pytest.raises(Exception):
        t_bad._train_step(s_bad, t_bad._put_batch(batch))
