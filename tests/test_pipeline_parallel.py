"""Pipeline parallelism (parallel/pp.py) equivalence tests.

A GPipe-pipelined train step must compute exactly what the plain
Trainer's grad_accum=n_micro step computes (same mean loss over
microbatches, same summed-then-averaged gradients, same AdamW update) —
the pipeline only changes WHERE layers execute. Verified on the virtual
8-device CPU mesh with dropout disabled so the comparison is exact
(the pipelined dropout uses a per-(microbatch, layer) stream that is
deliberately NOT the plain step's stream).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MeshConfig,
    MultimodalConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.parallel.pp import (
    PipelineTrainer,
    make_pp_mesh,
    model_params_from_pp_params,
    pp_params_from_model_params,
)
from bert_multimodal_transformer_tpu.training.optim import make_optimizer
from bert_multimodal_transformer_tpu.training.trainer import Trainer

VIS, AC = 5, 7


def _cfg(dropout: float = 0.0) -> BertConfig:
    cfg = BertConfig.tiny(vocab_size=97)
    return dataclasses.replace(
        cfg, num_hidden_layers=4,
        hidden_dropout_prob=dropout, attention_probs_dropout_prob=dropout)


def _model(cfg, mag_dropout: float = 0.0):
    return MagBertForSequenceClassification(
        cfg, MultimodalConfig(beta_shift=1.0, dropout_prob=mag_dropout),
        visual_dim=VIS, acoustic_dim=AC)


def _batch(rng, b, s):
    r = np.random.RandomState(rng)
    return (r.randint(0, 97, (b, s)).astype(np.int32),
            r.randn(b, s, VIS).astype(np.float32),
            r.randn(b, s, AC).astype(np.float32),
            np.ones((b, s), np.int32),
            np.zeros((b, s), np.int32),
            r.randn(b).astype(np.float32))


def _ref_step(model, batch, n_micro):
    """Plain Trainer grad_accum=n_micro step on a data=1 mesh."""
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tr = Trainer(model=model, tx=make_optimizer(1e-3, 10), mesh=mesh,
                 grad_accum=n_micro, donate=False)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    params0 = jax.device_get(state.params)
    new_state, loss = tr._train_step(state, tr._put_batch(batch))
    return params0, jax.device_get(new_state.params), float(loss)


def _assert_trees_close(a, b, **kw):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    b_map = {jax.tree_util.keystr(p): l
             for p, l in jax.tree_util.tree_leaves_with_path(b)}
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(b_map[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path), **kw)


@pytest.mark.parametrize("n_stages,dp,n_micro", [(4, 2, 4), (2, 4, 2)])
def test_pp_step_matches_plain_trainer(n_stages, dp, n_micro):
    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)
    batch = _batch(0, 16, 12)

    params0, ref_params, ref_loss = _ref_step(model, batch, n_micro)

    mesh = make_pp_mesh(n_stages, data_parallel=dp)
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=n_micro, donate=False)
    state = pt.create_state_from_model_params(params0,
                                              jax.random.PRNGKey(3))
    new_state, loss = pt.train_step(state, batch)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5,
                               atol=1e-6)
    _assert_trees_close(
        model_params_from_pp_params(jax.device_get(new_state.params)),
        ref_params, rtol=2e-5, atol=1e-6)


def test_pp_predict_matches_model_forward():
    cfg = _cfg(dropout=0.1)  # deterministic predict ignores dropout
    model = _model(cfg, mag_dropout=0.3)
    batch = _batch(1, 16, 10)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch[0]),
                        jnp.asarray(batch[1]), jnp.asarray(batch[2]),
                        jnp.asarray(batch[3]),
                        jnp.asarray(batch[4]))["params"]
    ref = model.apply({"params": params}, *map(jnp.asarray, batch[:3]),
                      attention_mask=jnp.asarray(batch[3]),
                      token_type_ids=jnp.asarray(batch[4]),
                      deterministic=True)

    mesh = make_pp_mesh(4, data_parallel=2)
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=2, donate=False)
    state = pt.create_state_from_model_params(params, jax.random.PRNGKey(5))
    got = pt.predict(state, batch)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref).reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_pp_params_roundtrip():
    cfg = _cfg()
    model = _model(cfg)
    batch = _batch(2, 4, 8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch[0]),
                        jnp.asarray(batch[1]), jnp.asarray(batch[2]),
                        jnp.asarray(batch[3]),
                        jnp.asarray(batch[4]))["params"]
    rt = model_params_from_pp_params(pp_params_from_model_params(params))
    _assert_trees_close(rt, params, rtol=0, atol=0)


def test_pp_trains_with_dropout():
    """With dropout ON the pipelined step must still run and move the
    loss (its dropout streams are pipeline-specific by design)."""
    cfg = _cfg(dropout=0.1)
    model = _model(cfg, mag_dropout=0.2)
    mesh = make_pp_mesh(4, data_parallel=2)
    pt = PipelineTrainer(model=model, tx=make_optimizer(5e-3, 20),
                         mesh=mesh, n_micro=2)
    batch = _batch(3, 16, 10)
    state = pt.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(6):
        state, loss = pt.train_step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pp_masked_step_matches_plain_masked_step():
    """The ragged-tail step: masked global-mean semantics must match the
    plain Trainer's make_masked_train_step exactly (dropout off)."""
    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)
    batch = _batch(7, 16, 12)
    valid = np.zeros(16, bool)
    valid[:11] = True  # ragged: 11 real examples zero-padded to 16

    mesh1 = make_mesh(MeshConfig(data_parallel=1),
                      devices=jax.devices()[:1])
    tr = Trainer(model=model, tx=make_optimizer(1e-3, 10), mesh=mesh1,
                 donate=False)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    params0 = jax.device_get(state.params)
    ref_state, ref_loss = tr._train_step_masked(
        state, tr._put_batch(batch), jnp.asarray(valid))

    mesh = make_pp_mesh(4, data_parallel=2)
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=2, donate=False)
    pstate = pt.create_state_from_params(params0, jax.random.PRNGKey(3))
    new_state, loss = pt._train_step_masked(
        pstate, pt._put_batch(batch),
        jax.device_put(valid, pt._bsh))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    _assert_trees_close(
        model_params_from_pp_params(jax.device_get(new_state.params)),
        jax.device_get(ref_state.params), rtol=2e-5, atol=1e-6)


def test_pp_epoch_driver_inherited():
    """The full inherited Trainer.train() epoch loop (train epochs with a
    ragged tail, eval, test scoring) runs on the pipeline trainer and
    matches the plain Trainer's history with dropout off."""
    from bert_multimodal_transformer_tpu.data.pipeline import (
        BatchIterator,
        PackedSplit,
    )

    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)

    def split(n, seed):
        b = _batch(seed, n, 10)
        return PackedSplit(*[np.asarray(a) for a in b])

    train, dev, test = split(12, 10), split(8, 11), split(8, 12)

    def loaders():
        return (BatchIterator(train, 8, shuffle=True, seed=5,
                              drop_remainder=False),
                BatchIterator(dev, 8, shuffle=False,
                              drop_remainder=False),
                BatchIterator(test, 8, shuffle=False,
                              drop_remainder=False))

    mesh1 = make_mesh(MeshConfig(data_parallel=1),
                      devices=jax.devices()[:1])
    tr = Trainer(model=model, tx=make_optimizer(1e-3, 10), mesh=mesh1,
                 donate=False)
    batch0 = next(iter(loaders()[0]))[0]
    state = tr.init_state(jax.random.PRNGKey(0), batch0)
    params0 = jax.device_get(state.params)
    _, ref_summary = tr.train(state, *loaders(), n_epochs=1)

    mesh = make_pp_mesh(2, data_parallel=4)
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=2, donate=False)
    pstate = pt.create_state_from_params(params0, jax.random.PRNGKey(9))
    _, pp_summary = pt.train(pstate, *loaders(), n_epochs=1)

    ref_rec, pp_rec = ref_summary["history"][0], pp_summary["history"][0]
    for key in ("train_loss", "valid_loss", "test_acc", "test_mae"):
        np.testing.assert_allclose(pp_rec[key], ref_rec[key], rtol=1e-4,
                                   atol=1e-6, err_msg=key)


def test_pp_validates_geometry():
    cfg = _cfg()
    model = _model(cfg)
    mesh = make_pp_mesh(4, data_parallel=2)
    with pytest.raises(ValueError, match="divide"):
        PipelineTrainer(model=_model(dataclasses.replace(
            cfg, num_hidden_layers=5)), tx=make_optimizer(1e-3, 10),
            mesh=mesh, n_micro=2)
    with pytest.raises(ValueError, match="num_labels"):
        PipelineTrainer(model=_model(dataclasses.replace(
            cfg, num_labels=3)), tx=make_optimizer(1e-3, 10),
            mesh=mesh, n_micro=2)


@pytest.mark.parametrize("n_stages,mp,dp", [(2, 2, 2), (2, 4, 1)])
def test_pp_tp_step_matches_plain_trainer(n_stages, mp, dp):
    """PPxTP (VERDICT r4 #5): pipeline stages whose layer stacks run with
    the FFN Megatron-split over a mesh model axis (explicit f/g
    boundary collectives, parallel/pp.py::_TPBertLayer). The 3-D
    (data, pipe, model) step must compute exactly what the plain
    grad_accum=n_micro trainer computes — loss AND updated params —
    and the FFN leaves must actually be sharded over the model axis."""
    from bert_multimodal_transformer_tpu.parallel.mesh import MODEL_AXIS
    from bert_multimodal_transformer_tpu.parallel.pp import PIPE_AXIS

    n_micro = 2
    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)
    batch = _batch(0, 16, 12)

    params0, ref_params, ref_loss = _ref_step(model, batch, n_micro)

    mesh = make_pp_mesh(n_stages, data_parallel=dp, model_parallel=mp)
    assert mesh.shape[MODEL_AXIS] == mp and mesh.shape[PIPE_AXIS] == n_stages
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=n_micro, donate=False)
    state = pt.create_state_from_model_params(params0,
                                              jax.random.PRNGKey(3))
    # the column kernel [L, D, F] must be model-sharded on its last dim
    col = state.params["layers"]["intermediate_dense"]["kernel"]
    assert col.sharding.spec == jax.sharding.PartitionSpec(
        PIPE_AXIS, None, MODEL_AXIS)
    row = state.params["layers"]["output_dense"]["kernel"]
    assert row.sharding.spec == jax.sharding.PartitionSpec(
        PIPE_AXIS, MODEL_AXIS, None)

    new_state, loss = pt.train_step(state, batch)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5,
                               atol=1e-6)
    _assert_trees_close(
        model_params_from_pp_params(jax.device_get(new_state.params)),
        ref_params, rtol=2e-5, atol=1e-6)


def test_pp_tp_predict_and_masked_step():
    """PPxTP eval/predict forwards and the masked ragged-tail step match
    the plain trainer's on the 3-D mesh."""
    from bert_multimodal_transformer_tpu.training.trainer import (
        make_masked_train_step,
    )

    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)
    batch = _batch(1, 16, 12)
    valid = np.ones(16, bool)
    valid[13:] = False

    mesh1 = make_mesh(MeshConfig(data_parallel=1),
                      devices=jax.devices()[:1])
    tr = Trainer(model=model, tx=make_optimizer(1e-3, 10), mesh=mesh1,
                 grad_accum=2, donate=False)
    state1 = tr.init_state(jax.random.PRNGKey(0), batch)
    params0 = jax.device_get(state1.params)
    ref_new, ref_loss = tr._train_step_masked(
        state1, tr._put_batch(batch), tr._put_valid(valid))
    ref_logits = np.asarray(jax.device_get(
        tr._predict_step(state1, tr._put_batch(batch))[0]))

    mesh = make_pp_mesh(2, data_parallel=2, model_parallel=2)
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=2, donate=False)
    state = pt.create_state_from_model_params(params0,
                                              jax.random.PRNGKey(3))
    got_logits = np.asarray(jax.device_get(pt.predict(state, batch)))
    np.testing.assert_allclose(got_logits, ref_logits, rtol=1e-5,
                               atol=1e-6)
    new_state, loss = pt._train_step_masked(
        state, pt._put_batch(batch), pt._put_valid(valid))
    np.testing.assert_allclose(float(loss),
                               float(jax.device_get(ref_loss)),
                               rtol=1e-5, atol=1e-6)
    _assert_trees_close(
        model_params_from_pp_params(jax.device_get(new_state.params)),
        jax.device_get(ref_new.params), rtol=2e-5, atol=1e-6)


def test_pp_compiler_options_thread_through():
    """PipelineTrainer honors Trainer's compiler_options surface
    (r5f: _pp_jit applies it to the shard_map programs): a benign XLA
    option steps identically to the default; an invalid option name
    fails loudly instead of being silently dropped."""
    import pytest

    cfg = _cfg(dropout=0.0)
    model = _model(cfg, mag_dropout=0.0)
    batch = _batch(0, 16, 12)
    mesh = make_pp_mesh(2, data_parallel=1)

    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=2, donate=False)
    # build states from the same model params so losses compare exactly
    params0, _, _ = _ref_step(model, batch, 2)
    s_plain = pt.create_state_from_model_params(params0,
                                                jax.random.PRNGKey(3))
    _, loss_plain = pt.train_step(s_plain, batch)

    pt_opts = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                              mesh=mesh, n_micro=2, donate=False,
                              compiler_options={
                                  "xla_backend_optimization_level": "2"})
    s_opts = pt_opts.create_state_from_model_params(
        params0, jax.random.PRNGKey(3))
    _, loss_opts = pt_opts.train_step(s_opts, batch)
    np.testing.assert_allclose(float(loss_plain), float(loss_opts),
                               rtol=1e-6)

    pt_bad = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                             mesh=mesh, n_micro=2, donate=False,
                             compiler_options={"no_such_xla_option": "1"})
    s_bad = pt_bad.create_state_from_model_params(params0,
                                                  jax.random.PRNGKey(3))
    with pytest.raises(Exception):
        pt_bad.train_step(s_bad, batch)
