"""Preemption-safe mid-epoch resume.

The reference loses the whole run on a crash (SURVEY §5: it never saves
the model). Beyond the epoch-level Orbax checkpointing added in round 1,
the trainer/driver now support step-level checkpoints with a resume meta
(data-iterator position included), and a resumed run reproduces the
uninterrupted run's parameters BIT-FOR-BIT: same batches in the same
shuffled order, same dropout streams (state.rng is checkpointed), same
optimizer trajectory.
"""

import json
import os

import jax
import numpy as np
import pytest

from bert_multimodal_transformer_tpu import driver
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
from bert_multimodal_transformer_tpu.training.optim import make_optimizer
from bert_multimodal_transformer_tpu.training.trainer import Trainer

CFG = BertConfig.tiny(vocab_size=64)
MM = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1)
DV, DA, S, B = 3, 4, 12, 8


@pytest.fixture(scope="module")
def dataset():
    tok = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=32, n_dev=8, n_test=8, seed=3)
    return {name: convert_to_features(data[name], S, tok, "bert",
                                      visual_dim=DV, acoustic_dim=DA)
            for name in ("train", "dev", "test")}, tok


def _fingerprint(loader):
    """One epoch's batch order as a list of label-array bytes."""
    return [batch[-1].tobytes() for batch, _ in loader]


def test_batch_iterator_restore_position(dataset):
    splits, _ = dataset
    mk = lambda: BatchIterator(splits["train"], B, shuffle=True,
                               drop_remainder=False, seed=11)
    it = mk()
    epochs = [_fingerprint(it) for _ in range(3)]
    assert epochs[0] != epochs[1]  # distinct shuffles
    assert it.shuffles_done == 3

    # a fresh iterator, even after stray draws (e.g. the driver's sample
    # peek), fast-forwards to reproduce any epoch exactly
    it2 = mk()
    _fingerprint(it2)  # stray epoch
    it2.restore_position(1)
    assert _fingerprint(it2) == epochs[1]
    it2.restore_position(0)
    assert _fingerprint(it2) == epochs[0]
    it2.restore_position(2)
    assert _fingerprint(it2) == epochs[2]


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(path))


def test_trainer_midepoch_resume_bit_exact(dataset):
    """Stop after 3 optimizer steps (mid-epoch 0 of 2), resume from the
    returned position with a freshly constructed + repositioned iterator:
    final params must equal the uninterrupted run's bit-for-bit."""
    splits, _ = dataset
    mesh = make_mesh(MeshConfig(data_parallel=1))
    model = MagBertForSequenceClassification(
        CFG, MM, visual_dim=DV, acoustic_dim=DA)
    dev_it = BatchIterator(splits["dev"], B, shuffle=False,
                           drop_remainder=False)
    test_it = BatchIterator(splits["test"], B, shuffle=False,
                            drop_remainder=False)
    sample_it = BatchIterator(splits["train"], B, shuffle=False,
                              drop_remainder=True)
    sample = next(iter(sample_it))[0]

    def fresh(seed_it):
        tr = Trainer(model=model, tx=make_optimizer(1e-3, 8), mesh=mesh,
                     donate=False)
        st = tr.init_state(jax.random.PRNGKey(0), sample)
        it = BatchIterator(splits["train"], B, shuffle=True,
                           drop_remainder=False, seed=seed_it)
        return tr, st, it

    # uninterrupted: 2 epochs x 4 batches = 8 steps
    tr_a, st_a, it_a = fresh(7)
    st_a, sum_a = tr_a.train(st_a, it_a, dev_it, test_it, 2)
    assert sum_a["interrupted"] is None

    # interrupted after 3 steps
    tr_b, st_b, it_b = fresh(7)
    st_b, sum_b = tr_b.train(st_b, it_b, dev_it, test_it, 2, max_steps=3)
    pos = sum_b["interrupted"]
    assert pos == {"epoch": 0, "next_batch": 3}

    # "new process": fresh trainer + fresh iterator repositioned to replay
    # the interrupted epoch's shuffle
    burn = it_b.shuffles_done - (1 if pos["next_batch"] > 0 else 0)
    tr_c = Trainer(model=model, tx=make_optimizer(1e-3, 8), mesh=mesh,
                   donate=False)
    it_c = BatchIterator(splits["train"], B, shuffle=True,
                         drop_remainder=False, seed=7)
    it_c.restore_position(burn)
    st_c, sum_c = tr_c.train(st_b, it_c, dev_it, test_it, 2,
                             start_epoch=pos["epoch"],
                             start_batch=pos["next_batch"],
                             initial_history=sum_b["history"])
    assert sum_c["interrupted"] is None
    _assert_trees_equal(st_a.params, st_c.params)
    _assert_trees_equal(st_a.opt_state, st_c.opt_state)
    np.testing.assert_array_equal(np.asarray(st_a.rng),
                                  np.asarray(st_c.rng))
    # epoch-1 records must agree exactly (same eval on same params)
    assert sum_a["history"][1]["valid_loss"] == \
        sum_c["history"][-1]["valid_loss"]


def _run_driver(tmp_path, name, extra):
    args = [
        "--model", "bert-base-uncased", "--dataset", "mosi",
        "--synthetic", "--tiny",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "20", "8", "8",
        "--seed", "5", "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / name),
    ] + list(extra)
    return driver.main(args)


def test_driver_midepoch_resume_bit_exact(tmp_path):
    """Through the CLI: a run killed mid-epoch (--max_steps) with
    step-level checkpoints (--save_every_steps 1), then --resume, ends at
    exactly the same parameters as an uninterrupted run — including the
    replayed shuffle order and the ragged final batch (20 % 8 != 0)."""
    from bert_multimodal_transformer_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    assert _run_driver(tmp_path, "straight", ["--n_epochs", "2"]) == 0

    # interrupted mid-epoch 0 (3 batches/epoch: 2 full + 1 ragged)
    assert _run_driver(tmp_path, "resumed",
                       ["--n_epochs", "2", "--save_every_steps", "1",
                        "--max_steps", "2"]) == 0
    meta = json.loads(
        (tmp_path / "resumed" / "resume_meta.json").read_text())
    assert meta["start_epoch"] == 0 and meta["start_batch"] == 2
    assert meta["seed"] == 5
    # resume with a DIFFERENT --seed: the driver must adopt the meta's
    # seed (data order, synthetic data and rng streams derive from it) —
    # bit-exactness below proves the adoption happened
    args = [
        "--model", "bert-base-uncased", "--dataset", "mosi",
        "--synthetic", "--tiny",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "20", "8", "8",
        "--seed", "9", "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "resumed"),
        "--n_epochs", "2", "--resume",
    ]
    assert driver.main(args) == 0

    pa = CheckpointManager(str(tmp_path / "straight")).restore_params()
    pb = CheckpointManager(str(tmp_path / "resumed")).restore_params()
    _assert_trees_equal(pa, pb)

    # the resumed run's epoch records continue the original run's
    # history, and the mid-epoch-resumed epoch is marked (its train_loss
    # averages only the post-resume batches)
    recs = [json.loads(l) for l in
            (tmp_path / "resumed" / "metrics.jsonl").read_text()
            .strip().splitlines()]
    epochs = [r["epoch"] for r in recs if "epoch" in r]
    assert epochs == [0, 1]
    assert recs[0].get("resumed_mid_epoch") is True
    assert "resumed_mid_epoch" not in recs[1]


def test_driver_epoch_resume_bit_exact(tmp_path):
    """Epoch-boundary variant: a 2-epoch run interrupted exactly at the
    end of epoch 0 (--max_steps = the 3 epoch-0 steps), then --resume
    with the SAME --n_epochs — epoch 1 must replay the same shuffle the
    uninterrupted run uses (the resume meta carries the iterator position
    across the process boundary).

    Note --n_epochs must match the interrupted run's: the LR schedule
    spans the planned total step count (reference semantics,
    multimodal_driver.py:261-267), so resuming \"a 1-epoch run extended
    to 2\" is a different trajectory by design."""
    from bert_multimodal_transformer_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    assert _run_driver(tmp_path, "straight", ["--n_epochs", "2"]) == 0
    assert _run_driver(tmp_path, "twostage",
                       ["--n_epochs", "2", "--max_steps", "3"]) == 0
    meta = json.loads(
        (tmp_path / "twostage" / "resume_meta.json").read_text())
    assert meta["start_epoch"] == 1 and meta["start_batch"] == 0
    assert _run_driver(tmp_path, "twostage",
                       ["--n_epochs", "2", "--resume"]) == 0

    pa = CheckpointManager(str(tmp_path / "straight")).restore_params()
    pb = CheckpointManager(str(tmp_path / "twostage")).restore_params()
    _assert_trees_equal(pa, pb)


def test_driver_refuses_foreign_checkpoint_dir(tmp_path, capsys):
    """A fresh (non-resume) run into a directory holding another run's
    checkpoints must error: the save-dedup could otherwise skip saves and
    publish a resume meta naming the old run's parameters."""
    assert _run_driver(tmp_path, "d", ["--n_epochs", "1"]) == 0
    rc = _run_driver(tmp_path, "d", ["--n_epochs", "1"])
    assert rc == 2
    assert "already contains checkpoints" in capsys.readouterr().err


def test_driver_xlnet_resume_smoke(tmp_path):
    """The resume machinery is family-agnostic; this guards the XLNet
    integration (different state tree, left-padded packing) through the
    CLI: interrupt mid-epoch, resume, finish with finite metrics."""
    args = [
        "--model", "xlnet-base-cased", "--dataset", "mosi",
        "--synthetic", "--tiny",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "20", "8", "8",
        "--seed", "5", "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "x"),
        "--n_epochs", "2",
    ]
    assert driver.main(args + ["--save_every_steps", "1",
                               "--max_steps", "2"]) == 0
    assert driver.main(args + ["--resume"]) == 0
    recs = [json.loads(l) for l in
            (tmp_path / "x" / "metrics.jsonl").read_text()
            .strip().splitlines()]
    assert [r["epoch"] for r in recs] == [0, 1]
    assert all(np.isfinite(r["train_loss"]) for r in recs)
