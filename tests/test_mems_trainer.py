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
    mesh = make_mesh(MeshConfig(data_parallel=1),
                     devices=jax.devices()[:1])
    tx = make_optimizer(1e-3, 10)
    with pytest.raises(ValueError, match="config.mem_len"):
        Trainer(model=_model(_cfg(mem_len=None)), tx=tx, mesh=mesh,
                mem_len=MLEN)


def test_mems_grad_accum_matches_manual_chain():
    """grad_accum=2 with segment recurrence: the two micro-batches scan
    as sequential segments (micro 1 consumes micro 0's memory — the
    reference's use_cache chain, xlnet.py:363-365) while gradients
    accumulate against the step's constant params. Must equal the
    hand-driven two-segment chain with manual grad accumulation, and
    the returned memory must be the LAST micro-batch's so the chain
    continues into the next optimizer step."""
    from bert_multimodal_transformer_tpu.training.losses import mse_loss

    cfg = _cfg()
    tr = _trainer(cfg, grad_accum=2)
    b1, b2 = _batch(0), _batch(1)
    big = tuple(np.concatenate([a, b]) for a, b in zip(b1, b2))
    state = tr.init_state(jax.random.PRNGKey(0), b1)
    model = tr.model

    mems0 = tr._init_mems(big, for_train=True)
    assert mems0[0].shape[0] == 8  # micro rows, not the 16-row loader batch
    new_state, loss, new_mems = tr._train_step_mems(
        state, tr._put_batch(big), mems0)

    # manual twin: same params for both segments, memory chained,
    # grads/loss averaged, one optimizer update
    def loss_fn(p, batch, mems):
        out = model.apply(
            {"params": p}, batch[0], batch[1], batch[2],
            attention_mask=batch[3], token_type_ids=batch[4],
            mems=mems, use_cache=True, deterministic=True)
        return mse_loss(out[0], jnp.asarray(batch[5])), out[1]

    zeros = tuple(jnp.zeros((8, MLEN, cfg.d_model)) for _ in
                  range(cfg.n_layer))
    (l1, m1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, b1, zeros)
    (l2, m2), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, b2, m1)
    man_loss = (l1 + l2) / 2
    man_grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    import optax as _optax

    updates, _ = state.tx.update(man_grads, state.opt_state, state.params)
    man_params = _optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(float(loss), float(man_loss), rtol=1e-6)
    for a, b in zip(new_mems, m2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-6)
    got = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(new_state.params)))
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            jax.device_get(man_params)):
        np.testing.assert_allclose(np.asarray(got[path]),
                                   np.asarray(leaf), rtol=1e-5,
                                   atol=1e-7,
                                   err_msg=jax.tree_util.keystr(path))
    # memory must MATTER across the micro boundary: scanning with a
    # broken chain (zeros into micro 2) gives a different loss
    (l2_fresh, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, b2, zeros)
    assert abs(float(l2) - float(l2_fresh)) > 1e-7


def test_mems_grad_accum_masked_full_valid_matches_unmasked():
    cfg = _cfg()
    tr = _trainer(cfg, grad_accum=2)
    big = tuple(np.concatenate([a, b]) for a, b in
                zip(_batch(0), _batch(1)))
    state = tr.init_state(jax.random.PRNGKey(0), big)
    mems = tr._init_mems(big, for_train=True)
    _, lu, mu = tr._train_step_mems(state, tr._put_batch(big), mems)
    mems2 = tr._init_mems(big, for_train=True)
    _, lm, mm_ = tr._train_step_mems_masked(
        state, tr._put_batch(big), mems2,
        tr._put_valid(np.ones(16, bool)))
    np.testing.assert_allclose(float(lu), float(lm), rtol=1e-6)
    for a, b in zip(mu, mm_):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_predictor_mems_matches_trainer_chain():
    """Predictor(mem_len=N) scores a mems-trained model the way the
    trainer evaluates it: memory threaded through the ordered batch
    stream, padded tail rows excluded — predictions must match
    Trainer.test_epoch's mems path on the same split (incl. a ragged
    final batch)."""
    from bert_multimodal_transformer_tpu.data.pipeline import (
        BatchIterator,
        PackedSplit,
    )
    from bert_multimodal_transformer_tpu.serving import Predictor

    cfg = _cfg()
    tr = _trainer(cfg)
    rows = 20  # batches of 8: 8 + 8 + ragged 4
    r = np.random.RandomState(3)
    s = 10
    split = PackedSplit(
        r.randint(0, 97, (rows, s)).astype(np.int32),
        r.randn(rows, s, VIS).astype(np.float32),
        r.randn(rows, s, AC).astype(np.float32),
        np.ones((rows, s), np.int32),
        np.zeros((rows, s), np.int32),
        r.randn(rows).astype(np.float32))
    state = tr.init_state(jax.random.PRNGKey(0),
                          tuple(a[:8] for a in split.as_tuple()))

    loader = BatchIterator(split, 8, shuffle=False, drop_remainder=False)
    want, _ = tr.test_epoch(state, loader)

    pred = Predictor(tr.model, jax.device_get(state.params),
                     batch_size=8, mem_len=MLEN)
    got = pred.predict_split(split)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # the memory must matter: a no-mems Predictor on the same params
    # (model clone without mem_len) scores differently
    import dataclasses as _dc

    plain_model = _model(_dc.replace(cfg, mem_len=None))
    plain = Predictor(plain_model, jax.device_get(state.params),
                      batch_size=8)
    assert np.abs(plain.predict_split(split) - got).max() > 1e-6

    with pytest.raises(ValueError, match="config.mem_len"):
        Predictor(plain_model, jax.device_get(state.params),
                  batch_size=8, mem_len=MLEN)


def test_driver_mem_len_e2e(tmp_path, capsys):
    """--mem_len through the full CLI (train + eval + test with carried
    memory), the family guard, --gradient_accumulation_step composition,
    and --predict_only scoring the checkpoint WITH memory."""
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

    # mems × grad-accum: micro-batches chain as sequential segments
    # inside the accumulated step (reference use_cache, xlnet.py:363-365)
    rc = driver.main([
        "--model", "xlnet-base-cased", "--dataset", "mosi",
        "--synthetic", "--tiny", "--n_epochs", "1",
        # micro-batch rows (train_batch_size) must shard over the 8-dev
        # test mesh's data axis: 8 rows x 2 micro-segments per step
        "--train_batch_size", "8", "--gradient_accumulation_step", "2",
        "--dev_batch_size", "8", "--test_batch_size", "8",
        "--synthetic_sizes", "32", "8", "8",
        "--seed", "3", "--compute_dtype", "float32",
        "--mem_len", "8",
        "--checkpoint_dir", str(tmp_path / "ckpt2"),
    ])
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt2" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])

    # mems × predict_only: the checkpoint scores WITH segment recurrence
    # (Predictor(mem_len=N)), the way it was trained
    capsys.readouterr()
    rc = driver.main(["--model", "xlnet-base-cased", "--dataset", "mosi",
                      "--synthetic", "--tiny",
                      "--synthetic_sizes", "16", "8", "8", "--seed", "3",
                      "--compute_dtype", "float32",
                      "--test_batch_size", "8",
                      "--mem_len", "8", "--predict_only",
                      "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 0
    out = capsys.readouterr().out
    scores = json.loads([ln for ln in out.splitlines()
                         if ln.startswith("{")][-1])
    assert np.isfinite(scores["test_mae"])


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


def test_mems_relik_fs_tier_matches_einsum(monkeypatch):
    """Segment recurrence × the ingredients flash-streamed tier (r5f):
    a mems geometry past the full-H fit (budget shrunk) must route the
    fused "auto" dispatch onto the relik-fs kernels — K = qlen + mlen
    streams in kb blocks, the position window bound P ≥ Q+K holds by
    construction — and the train step must match the einsum math.
    Geometry: qlen=mlen=128 (K=256, kb-divisible), H=4 × Dh=32
    (hb=4 → 128-lane block)."""
    import bert_multimodal_transformer_tpu.ops.fused_attention as fa

    monkeypatch.setenv("FUSED_ATTN_VMEM_BUDGET", "1000000")
    H_, DH_, QL, ML = 4, 32, 128, 128
    D = H_ * DH_
    assert not fa.fused_rel_attention_fits(H_, QL, QL + ML, D, 4, 4)
    assert fa.fused_rel_attention_ingredients_fits_fs(
        H_, QL, QL + ML, 2 * QL + ML, D, 4, batch=4, rate=0.0,
        scale=1.0 / DH_ ** 0.5, dtype=jnp.float32)

    def run(attn_impl):
        cfg = dataclasses.replace(
            _cfg(mem_len=ML), d_model=D, n_head=H_, d_inner=2 * D,
            n_layer=2, attention_impl=attn_impl, rel_bias_impl="auto")
        tr = _trainer(cfg)
        b = _batch(11, b=4, s=QL)
        st = tr.init_state(jax.random.PRNGKey(0), b)
        losses = []
        for i in range(3):
            st, loss = tr._train_step(st, tr._put_batch(_batch(20 + i,
                                                               b=4,
                                                               s=QL)))
            losses.append(float(jax.device_get(loss)))
        return np.asarray(losses)

    fused = run("fused")
    einsum = run("einsum")
    rel = np.abs(fused - einsum) / np.maximum(np.abs(einsum), 1e-12)
    assert np.isfinite(fused).all()
    assert rel.max() < 5e-3, (rel, fused, einsum)
