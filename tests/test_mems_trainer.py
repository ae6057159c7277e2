"""XLNet segment recurrence through the Trainer (mem_len): fixed-shape
Transformer-XL memory carried across the batch stream (reference
cache_mem, xlnet.py:81-91 — dormant in its driver, a trainer mode here).
"""

import dataclasses

import jax
import jax.numpy as jnp
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
from bert_multimodal_transformer_tpu.training.optim import make_optimizer
from bert_multimodal_transformer_tpu.training.trainer import Trainer

VIS, AC = 5, 7
MLEN = 6


def _cfg(mem_len=MLEN):
    return dataclasses.replace(
        XLNetConfig.tiny(vocab_size=97), mem_len=mem_len, dropout=0.0,
        summary_last_dropout=0.0)


def _model(cfg):
    return MagXLNetForSequenceClassification(
        cfg, MultimodalConfig(beta_shift=1.0, dropout_prob=0.0,
                              injection_index=1),
        visual_dim=VIS, acoustic_dim=AC)


def _batch(seed, b=8, s=10):
    r = np.random.RandomState(seed)
    return (r.randint(0, 97, (b, s)).astype(np.int32),
            r.randn(b, s, VIS).astype(np.float32),
            r.randn(b, s, AC).astype(np.float32),
            np.ones((b, s), np.int32),
            np.zeros((b, s), np.int32),
            r.randn(b).astype(np.float32))


def _trainer(cfg, **kw):
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    return Trainer(model=_model(cfg), tx=make_optimizer(1e-3, 10),
                   mesh=mesh, donate=False, mem_len=cfg.mem_len, **kw)


def test_mems_predict_matches_manual_chain():
    """The trainer's carried memory chain equals driving the model's
    use_cache path by hand: segment 2's logits must reflect segment 1's
    cached states."""
    cfg = _cfg()
    tr = _trainer(cfg)
    b1, b2 = _batch(0), _batch(1)
    state = tr.init_state(jax.random.PRNGKey(0), b1)
    params = jax.device_get(state.params)
    model = tr.model

    mems = tr._init_mems(b1)
    p1, _, mems1 = tr._predict_step_mems(state, tr._put_batch(b1), mems)
    p2, _, _ = tr._predict_step_mems(state, tr._put_batch(b2), mems1)

    def manual(batch, mems_in):
        out = model.apply(
            {"params": params}, batch[0], batch[1], batch[2],
            attention_mask=batch[3], token_type_ids=batch[4],
            mems=mems_in, use_cache=True, deterministic=True)
        return np.asarray(out[0]).reshape(-1), out[1]

    zeros = tuple(jnp.zeros((8, MLEN, cfg.d_model)) for _ in
                  range(cfg.n_layer))
    m1_logits, m1_mems = manual(b1, zeros)
    m2_logits, _ = manual(b2, m1_mems)
    np.testing.assert_allclose(np.asarray(p1), m1_logits, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), m2_logits, rtol=1e-5,
                               atol=1e-6)
    # memory must MATTER: segment 2 scored without memory differs
    m2_fresh, _ = manual(b2, zeros)
    assert np.abs(m2_logits - m2_fresh).max() > 1e-6


def test_mems_train_step_runs_and_carries():
    cfg = _cfg()
    tr = _trainer(cfg)
    b = _batch(2)
    state = tr.init_state(jax.random.PRNGKey(0), b)
    mems = tr._init_mems(b)
    state, loss1, mems = tr._train_step_mems(state, tr._put_batch(b), mems)
    assert np.isfinite(float(loss1))
    # carried memory is non-zero after a real segment
    assert float(jnp.abs(mems[0]).max()) > 0
    state, loss2, mems = tr._train_step_mems(state, tr._put_batch(b), mems)
    assert np.isfinite(float(loss2))
    # epoch drivers thread it end-to-end
    loader = [(b, np.ones(8, bool)), (_batch(3), np.ones(8, bool))]
    state, mean_loss = tr.train_epoch(state, loader)
    assert np.isfinite(mean_loss)
    mse = tr.eval_epoch(state, loader)
    assert np.isfinite(mse)
    preds, labels = tr.test_epoch(state, loader)
    assert preds.shape == (16,) and np.isfinite(preds).all()


def test_mems_validation():
    cfg = _cfg()
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = make_optimizer(1e-3, 10)
    with pytest.raises(ValueError, match="config.mem_len"):
        Trainer(model=_model(_cfg(mem_len=None)), tx=tx, mesh=mesh,
                mem_len=MLEN)
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(model=_model(cfg), tx=tx, mesh=mesh, mem_len=MLEN,
                grad_accum=2)


def test_driver_mem_len_e2e(tmp_path, capsys):
    """--mem_len through the full CLI (train + eval + test with carried
    memory), plus the family guard."""
    import json

    from bert_multimodal_transformer_tpu import driver

    rc = driver.main([
        "--model", "xlnet-base-cased", "--dataset", "mosi",
        "--synthetic", "--tiny", "--n_epochs", "1",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8", "--synthetic_sizes", "16", "8", "8",
        "--seed", "3", "--compute_dtype", "float32",
        "--mem_len", "8",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])

    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--mem_len", "8"])
    assert rc == 2
    assert "XLNet" in capsys.readouterr().err
    # --predict_only scores WITHOUT segment recurrence (the Predictor
    # never threads mems) — composing them must error, not silently
    # change the checkpoint's metrics
    rc = driver.main(["--model", "xlnet-base-cased", "--synthetic",
                      "--tiny", "--mem_len", "8", "--predict_only",
                      "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 2
    assert "predict_only" in capsys.readouterr().err


def test_mems_dp8_matches_single_device():
    """Segment recurrence under 8-way data parallelism: the mems tuples
    shard over the batch axis; loss and carried memory must equal the
    1-device run bit-for-bit (fp32, dropout off)."""
    cfg = _cfg()
    b = _batch(7, b=16)

    def run(n_dev):
        mesh = make_mesh(MeshConfig(data_parallel=n_dev),
                         devices=jax.devices()[:n_dev])
        tr = Trainer(model=_model(cfg), tx=make_optimizer(1e-3, 10),
                     mesh=mesh, donate=False, mem_len=MLEN)
        state = tr.init_state(jax.random.PRNGKey(0), b)
        mems = tr._init_mems(b)
        losses = []
        for _ in range(3):
            state, loss, mems = tr._train_step_mems(
                state, tr._put_batch(b), mems)
            losses.append(float(loss))
        return losses, jax.device_get(mems), jax.device_get(state.params)

    l1, m1, p1 = run(1)
    l8, m8, p8 = run(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-6, atol=1e-7)
    for a, c in zip(m1, m8):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32),
                                   rtol=1e-6, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    for path, leaf in flat1:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat8[path]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(path))
