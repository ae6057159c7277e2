"""XLNet pipeline parallelism (parallel/pp_xlnet.py) equivalence tests.

The pipelined MAG-XLNet step must compute exactly what the plain
Trainer's grad_accum=n_micro step computes — including the mid-stack MAG
injection before layer XLNET_INJECTION_INDEX (reference xlnet.py:371-372),
exercised in BOTH geometries: injection inside stage 0 (k >= 2) and
injection on a non-zero rank (k = 1, one layer per stage). Dropout off
for the exact comparison, as in the BERT twin
(tests/test_pipeline_parallel.py).
"""

import dataclasses

import jax
import numpy as np
import pytest

from bert_multimodal_transformer_tpu.config import (
    MeshConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.parallel.pp import make_pp_mesh
from bert_multimodal_transformer_tpu.parallel.pp_xlnet import (
    XLNetPipelineTrainer,
    pp_params_from_xlnet_params,
    xlnet_params_from_pp_params,
)
from bert_multimodal_transformer_tpu.training.optim import make_optimizer
from bert_multimodal_transformer_tpu.training.trainer import Trainer

VIS, AC = 5, 7


def _cfg(dropout: float = 0.0, n_layer: int = 4) -> XLNetConfig:
    cfg = XLNetConfig.tiny(vocab_size=97)
    return dataclasses.replace(cfg, n_layer=n_layer, dropout=dropout,
                               summary_last_dropout=dropout)


def _model(cfg, injection_index: int = 1, mag_dropout: float = 0.0):
    return MagXLNetForSequenceClassification(
        cfg, MultimodalConfig(beta_shift=1.0, dropout_prob=mag_dropout,
                              injection_index=injection_index),
        visual_dim=VIS, acoustic_dim=AC)


def _batch(rng, b, s):
    r = np.random.RandomState(rng)
    mask = np.ones((b, s), np.int32)
    mask[:, :2] = 0  # XLNet left-pads — exercise a non-trivial input mask
    seg = np.zeros((b, s), np.int32)
    seg[:, -1] = 2   # CLS-last segment id (multimodal_driver.py:190)
    return (r.randint(0, 97, (b, s)).astype(np.int32),
            r.randn(b, s, VIS).astype(np.float32),
            r.randn(b, s, AC).astype(np.float32),
            mask, seg,
            r.randn(b).astype(np.float32))


def _ref_step(model, batch, n_micro):
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


@pytest.mark.parametrize("n_layer,n_stages,dp,n_micro,inj", [
    (4, 2, 4, 2, 1),   # k=2: injection inside stage 0 (r0=0, p=1)
    (4, 4, 2, 4, 1),   # k=1: injection ON rank 1 (r0=1, p=0)
    (4, 2, 1, 2, 2),   # k=2: injection at a stage boundary (r0=1, p=0)
])
def test_xlnet_pp_step_matches_plain_trainer(n_layer, n_stages, dp,
                                             n_micro, inj):
    cfg = _cfg(dropout=0.0, n_layer=n_layer)
    model = _model(cfg, injection_index=inj)
    batch = _batch(0, 16, 10)

    params0, ref_params, ref_loss = _ref_step(model, batch, n_micro)

    mesh = make_pp_mesh(n_stages, data_parallel=dp)
    pt = XLNetPipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                              mesh=mesh, n_micro=n_micro, donate=False)
    state = pt.create_state_from_params(params0, jax.random.PRNGKey(3))
    new_state, loss = pt.train_step(state, batch)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5,
                               atol=1e-6)
    _assert_trees_close(
        xlnet_params_from_pp_params(jax.device_get(new_state.params)),
        ref_params, rtol=2e-5, atol=1e-6)


def test_xlnet_pp_predict_matches_model_forward():
    cfg = _cfg(dropout=0.1)  # deterministic predict ignores dropout
    model = _model(cfg, mag_dropout=0.3)
    batch = _batch(1, 8, 10)

    mesh = make_pp_mesh(2, data_parallel=2)
    pt = XLNetPipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                              mesh=mesh, n_micro=2, donate=False)
    state = pt.init_state(jax.random.PRNGKey(0), batch)
    got = np.asarray(pt.predict(state, batch))

    params = xlnet_params_from_pp_params(jax.device_get(state.params))
    expect = model.apply(
        {"params": params}, batch[0], batch[1], batch[2],
        attention_mask=batch[3], token_type_ids=batch[4],
        deterministic=True)
    np.testing.assert_allclose(got, np.asarray(expect).reshape(-1),
                               rtol=2e-5, atol=1e-6)


def test_xlnet_pp_params_roundtrip():
    cfg = _cfg()
    model = _model(cfg)
    batch = _batch(2, 4, 10)
    params = model.init(
        jax.random.PRNGKey(0), batch[0], batch[1], batch[2],
        attention_mask=batch[3], token_type_ids=batch[4])["params"]
    pp = pp_params_from_xlnet_params(params)
    back = xlnet_params_from_pp_params(pp)
    _assert_trees_close(back, params, rtol=0, atol=0)


def test_xlnet_pp_trains_with_dropout():
    """Dropout ON must run and move the loss (pipeline-specific streams
    by design, as in the BERT twin)."""
    cfg = _cfg(dropout=0.1)
    model = _model(cfg, mag_dropout=0.2)
    batch = _batch(3, 8, 10)
    mesh = make_pp_mesh(2, data_parallel=2)
    pt = XLNetPipelineTrainer(model=model, tx=make_optimizer(1e-2, 10),
                              mesh=mesh, n_micro=2, donate=False)
    state = pt.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(3):
        state, loss = pt.train_step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_xlnet_pp_validates_geometry():
    cfg = _cfg(n_layer=4)
    model = _model(cfg)
    mesh = make_pp_mesh(2, data_parallel=1)
    tx = make_optimizer(1e-3, 10)
    with pytest.raises(ValueError, match="divide evenly"):
        XLNetPipelineTrainer(model=_model(_cfg(n_layer=3)), tx=tx,
                             mesh=make_pp_mesh(2), n_micro=2)
    with pytest.raises(ValueError, match="pipe"):
        XLNetPipelineTrainer(
            model=model, tx=tx,
            mesh=make_mesh(MeshConfig(data_parallel=1),
                           devices=jax.devices()[:1]), n_micro=2)
    with pytest.raises(ValueError, match="bi_data"):
        XLNetPipelineTrainer(
            model=_model(dataclasses.replace(cfg, bi_data=True)),
            tx=tx, mesh=mesh, n_micro=2)
    with pytest.raises(ValueError, match="attn_type"):
        XLNetPipelineTrainer(
            model=_model(dataclasses.replace(cfg, attn_type="uni")),
            tx=tx, mesh=mesh, n_micro=2)
    with pytest.raises(ValueError, match="injection_index"):
        XLNetPipelineTrainer(model=_model(cfg, injection_index=9),
                             tx=tx, mesh=mesh, n_micro=2)


@pytest.mark.parametrize("n_stages,mp,dp,inj", [(2, 2, 2, 1), (2, 4, 1, 3)])
def test_xlnet_pp_tp_step_matches_plain_trainer(n_stages, mp, dp, inj):
    """XLNet PPxTP: pipeline stages with the XLNetFeedForward
    Megatron-split over the mesh model axis (_TPXLNetFF, same f/g
    boundary collectives as the BERT stage) — the 3-D step must match
    the plain grad_accum trainer exactly, in both MAG injection
    geometries (inside stage 0, and on the last stage)."""
    from bert_multimodal_transformer_tpu.parallel.mesh import MODEL_AXIS
    from bert_multimodal_transformer_tpu.parallel.pp import PIPE_AXIS

    n_micro = 2
    cfg = _cfg(dropout=0.0)
    model = _model(cfg, injection_index=inj)
    batch = _batch(0, 16, 10)

    params0, ref_params, ref_loss = _ref_step(model, batch, n_micro)

    mesh = make_pp_mesh(n_stages, data_parallel=dp, model_parallel=mp)
    pt = XLNetPipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                              mesh=mesh, n_micro=n_micro, donate=False)
    state = pt.create_state_from_model_params(params0,
                                              jax.random.PRNGKey(3))
    col = state.params["layers"]["ff"]["layer_1"]["kernel"]
    assert col.sharding.spec == jax.sharding.PartitionSpec(
        PIPE_AXIS, None, MODEL_AXIS)
    row = state.params["layers"]["ff"]["layer_2"]["kernel"]
    assert row.sharding.spec == jax.sharding.PartitionSpec(
        PIPE_AXIS, MODEL_AXIS, None)

    new_state, loss = pt.train_step(state, batch)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5,
                               atol=1e-6)
    _assert_trees_close(
        xlnet_params_from_pp_params(jax.device_get(new_state.params)),
        ref_params, rtol=2e-5, atol=1e-6)
