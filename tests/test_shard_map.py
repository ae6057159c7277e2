"""Explicit shard_map step vs the jit+NamedSharding step (8-device mesh)."""

import numpy as np
import jax
import optax

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MeshConfig,
    MultimodalConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.parallel.shard_map_step import (
    make_shard_map_train_step,
)
from bert_multimodal_transformer_tpu.training.trainer import Trainer

DV, DA, S, B = 3, 4, 12, 16


def make_batch(vocab, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, vocab, (B, S)).astype(np.int32),
            rng.randn(B, S, DV).astype(np.float32),
            rng.randn(B, S, DA).astype(np.float32),
            np.ones((B, S), np.int32),
            np.zeros((B, S), np.int32),
            rng.uniform(-3, 3, (B,)).astype(np.float32))


def test_shard_map_step_matches_jit_step():
    """Dropout-free: explicit-pmean shard_map step must equal the
    XLA-partitioned jit step exactly."""
    import dataclasses
    cfg = dataclasses.replace(
        BertConfig.tiny(vocab_size=64),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.0)
    model = MagBertForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)

    mesh = make_mesh(MeshConfig(data_parallel=-1))
    assert mesh.devices.size == 8
    trainer = Trainer(model=model, tx=optax.sgd(0.1), mesh=mesh,
                      donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    db = trainer._put_batch(batch)

    sm_step = make_shard_map_train_step(mesh)
    s_sm, loss_sm = sm_step(state, db)
    s_jit, loss_jit = trainer._train_step(state, db)

    np.testing.assert_allclose(float(loss_sm), float(loss_jit), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_sm.params, s_jit.params)


def test_shard_map_step_trains_with_dropout():
    """With dropout on, per-shard RNG folding must still produce a
    finite loss and a changed parameter set."""
    cfg = BertConfig.tiny(vocab_size=64)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size, seed=1)

    mesh = make_mesh(MeshConfig(data_parallel=-1))
    trainer = Trainer(model=model, tx=optax.adam(1e-3), mesh=mesh,
                      donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    db = trainer._put_batch(batch)

    sm_step = make_shard_map_train_step(mesh)
    new_state, loss = sm_step(state, db)
    assert np.isfinite(float(loss))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.params, new_state.params)
    assert any(jax.tree_util.tree_leaves(changed))


def test_fused_attention_trains_under_dp_sharding():
    """--attention_impl fused under 8-way DP: pjit partitions the Pallas
    custom-calls (interpret mode off-TPU); 8-way loss == 1-way loss."""
    import dataclasses

    # attention dropout 0: with it nonzero the off-TPU entry point takes
    # the einsum fallback (interpreter stubs the hardware PRNG) and no
    # pallas_call would enter the pjit graph — the thing under test.
    cfg = dataclasses.replace(BertConfig.tiny(), attention_impl="fused",
                              attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    losses = []
    for ndev in (1, 8):
        tr = Trainer(model=model, tx=optax.adam(1e-3),
                     mesh=make_mesh(MeshConfig(data_parallel=ndev)),
                     donate=False)
        st = tr.init_state(jax.random.PRNGKey(0), batch)
        _, loss = tr._train_step(st, tr._put_batch(batch))
        losses.append(float(loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)


def test_qkvproj_fused_attention_trains_under_dp_sharding():
    """qkv_fusion (projection inside the kernel) under 8-way DP: pjit
    partitions the pallas_call with the weight operand replicated;
    8-way loss == 1-way loss. Both backward variants."""
    import dataclasses

    for qkv_residual in (False, True):
        cfg = dataclasses.replace(BertConfig.tiny(),
                                  attention_impl="fused",
                                  attention_probs_dropout_prob=0.0,
                                  qkv_fusion=True,
                                  qkv_residual=qkv_residual)
        mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
        model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                                 acoustic_dim=DA)
        batch = make_batch(cfg.vocab_size)
        losses = []
        for ndev in (1, 8):
            tr = Trainer(model=model, tx=optax.adam(1e-3),
                         mesh=make_mesh(MeshConfig(data_parallel=ndev)),
                         donate=False)
            st = tr.init_state(jax.random.PRNGKey(0), batch)
            _, loss = tr._train_step(st, tr._put_batch(batch))
            losses.append(float(loss))
        np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)
