"""FSDP / ZeRO-3 parameter+moment sharding (parallel/fsdp.py) on the
virtual 8-device mesh: the sharded-state training step must match the
single-device step exactly (same math; XLA inserts the
all-gather/reduce-scatter schedule from the sharding annotations)."""

import dataclasses

import jax
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MeshConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.fsdp import (
    fsdp_pspec_for_leaf,
    make_fsdp_state_shardings,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
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


def test_fsdp_pspec_rule():
    # largest divisible dim is sharded
    assert fsdp_pspec_for_leaf((32, 64), 8) == P(None, "data")
    assert fsdp_pspec_for_leaf((64, 32), 8) == P("data")
    # ties keep the leading dim
    assert fsdp_pspec_for_leaf((64, 64), 8) == P("data")
    # no divisible dim -> replicated
    assert fsdp_pspec_for_leaf((30522,), 8) == P()
    assert fsdp_pspec_for_leaf((), 8) == P()
    # TP-claimed dims are respected: FSDP takes the largest FREE dim
    assert fsdp_pspec_for_leaf((32, 64), 2,
                               base=(None, "model")) == P("data", "model")
    assert fsdp_pspec_for_leaf((32, 64), 2,
                               base=("model",)) == P("model", "data")


def _param_leaf(params, substr, suffix="['kernel']"):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        s = jax.tree_util.keystr(path)
        if substr in s and s.endswith(suffix):
            return leaf
    raise AssertionError(f"no {substr} leaf found")


def _assert_data_sharded(leaf):
    assert "data" in tuple(leaf.sharding.spec), leaf.sharding
    # the local shard must actually be smaller than the full array
    shard_shape = leaf.sharding.shard_shape(leaf.shape)
    assert np.prod(shard_shape) < np.prod(leaf.shape), (
        shard_shape, leaf.shape)


def _ref_losses(model, batch, n_steps=2, grad_accum=1):
    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(MeshConfig(data_parallel=1)),
                 grad_accum=grad_accum, donate=False)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    out = []
    for _ in range(n_steps):
        st, loss = tr._train_step(st, tr._put_batch(batch))
        out.append(float(loss))
    return out


def test_bert_fsdp_matches_single_device():
    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    ref = _ref_losses(model, batch)

    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(MeshConfig(data_parallel=8)),
                 donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    # params AND optimizer moments actually live sharded
    _assert_data_sharded(_param_leaf(st.params, "['intermediate_dense']"))
    _assert_data_sharded(_param_leaf(st.opt_state, "['intermediate_dense']"))
    losses = []
    for _ in range(2):
        st, loss = tr._train_step(st, tr._put_batch(batch))
        losses.append(float(loss))
    # the updated params must STAY sharded step-to-step (a replicated
    # output sharding would silently degrade FSDP to plain DP)
    _assert_data_sharded(_param_leaf(st.params, "['intermediate_dense']"))
    np.testing.assert_allclose(losses, ref, rtol=1e-6)


def test_bert_fsdp_fused_attention_and_grad_accum():
    cfg = dataclasses.replace(BertConfig.tiny(), attention_impl="fused",
                              attention_probs_dropout_prob=0.0)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    ref = _ref_losses(model, batch, grad_accum=2)

    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(MeshConfig(data_parallel=8)),
                 grad_accum=2, donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(2):
        st, loss = tr._train_step(st, tr._put_batch(batch))
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref, rtol=1e-6)


def test_xlnet_fsdp_matches_single_device():
    cfg = XLNetConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(cfg, mm, visual_dim=DV,
                                              acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    ref = _ref_losses(model, batch)

    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(MeshConfig(data_parallel=8)),
                 donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    _assert_data_sharded(_param_leaf(st.params, "['ff']['layer_1']"))
    losses = []
    for _ in range(2):
        st, loss = tr._train_step(st, tr._put_batch(batch))
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref, rtol=1e-6)


def test_fsdp_tp_compose():
    """2-D mesh: TP claims the FFN dims (Megatron), FSDP shards the
    largest remaining dim over 'data' — losses still match exactly."""
    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    ref = _ref_losses(model, batch)

    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(MeshConfig(data_parallel=2,
                                           model_parallel=4)),
                 donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    leaf = _param_leaf(st.params, "['intermediate_dense']")
    assert leaf.sharding.spec == P("data", "model"), leaf.sharding
    losses = []
    for _ in range(2):
        st, loss = tr._train_step(st, tr._put_batch(batch))
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref, rtol=1e-6)


def test_fsdp_masked_eval_predict_paths():
    """The ragged-tail masked step and the eval/predict steps run under
    FSDP shardings and agree with the replicated trainer."""
    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    valid = np.ones((B,), np.float32)
    valid[-3:] = 0.0

    def run(fsdp, mesh_cfg):
        tr = Trainer(model=model, tx=optax.adam(1e-3),
                     mesh=make_mesh(mesh_cfg), donate=False, fsdp=fsdp)
        st = tr.init_state(jax.random.PRNGKey(0), batch)
        st, loss = tr._train_step_masked(
            st, tr._put_batch(batch), jax.device_put(valid, tr._bsh))
        s_err, s_n = tr._eval_step(st, tr._put_batch(batch),
                                   jax.device_put(valid, tr._bsh))
        preds, _ = tr._predict_step(st, tr._put_batch(batch))
        return (float(loss), float(s_err), float(s_n),
                np.asarray(jax.device_get(preds)))

    ref = run(False, MeshConfig(data_parallel=1))
    got = run(True, MeshConfig(data_parallel=8))
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-6)
    assert got[2] == ref[2] == B - 3
    np.testing.assert_allclose(got[3], ref[3], rtol=1e-5)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore preserves FSDP shardings (StandardRestore
    against the sharded template) and training continues identically."""
    from bert_multimodal_transformer_tpu.utils.checkpoint import (
        CheckpointManager)

    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    mesh_cfg = MeshConfig(data_parallel=8)
    tr = Trainer(model=model, tx=optax.adam(1e-3),
                 mesh=make_mesh(mesh_cfg), donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    st, _ = tr._train_step(st, tr._put_batch(batch))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(st, 1, wait=True)
    _, loss_cont = tr._train_step(st, tr._put_batch(batch))

    tr2 = Trainer(model=model, tx=optax.adam(1e-3),
                  mesh=make_mesh(mesh_cfg), donate=False, fsdp=True)
    template = tr2.init_state(jax.random.PRNGKey(99), batch)
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(template, 1)
    _assert_data_sharded(
        _param_leaf(restored.params, "['intermediate_dense']"))
    _, loss_restored = tr2._train_step(restored, tr2._put_batch(batch))
    np.testing.assert_allclose(float(loss_restored), float(loss_cont),
                               rtol=1e-6)


def test_fsdp_state_shardings_replicate_rng_and_step():
    cfg = BertConfig.tiny()
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
    model = MagBertForSequenceClassification(cfg, mm, visual_dim=DV,
                                             acoustic_dim=DA)
    batch = make_batch(cfg.vocab_size)
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    tr = Trainer(model=model, tx=optax.adam(1e-3), mesh=mesh,
                 donate=False, fsdp=True)
    st = tr.init_state(jax.random.PRNGKey(0), batch)
    sh = make_fsdp_state_shardings(st, mesh)
    assert sh.rng.spec == P()
    assert sh.step.spec == P()
