"""CLI driver tests: end-to-end main() on CPU with synthetic data,
checkpoint save + resume."""

import json
import os

import pytest

from bert_multimodal_transformer_tpu import driver


def run_driver(tmp_path, extra=(), epochs=1):
    args = [
        "--model", "bert-base-uncased", "--dataset", "mosi",
        "--synthetic", "--tiny",
        "--n_epochs", str(epochs),
        "--train_batch_size", "8",
        "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "16", "8", "8",
        "--seed", "3",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ] + list(extra)
    return driver.main(args)


def test_driver_end_to_end_with_checkpoint(tmp_path):
    rc = run_driver(tmp_path, epochs=2)
    assert rc == 0
    metrics_path = tmp_path / "ckpt" / "metrics.jsonl"
    lines = metrics_path.read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert {"epoch", "train_loss", "valid_loss", "test_acc",
            "test_mae", "test_corr", "test_f_score"} <= set(rec)
    # a checkpoint directory exists with at least one step
    ckpt_root = tmp_path / "ckpt"
    steps = [d for d in os.listdir(ckpt_root) if d.isdigit()]
    assert steps, list(os.listdir(ckpt_root))

    # resume: runs one more epoch from the restored state without error
    rc = run_driver(tmp_path, extra=["--resume"], epochs=1)
    assert rc == 0
    lines = metrics_path.read_text().strip().splitlines()
    assert len(lines) == 3


def test_driver_requires_data_source(capsys):
    rc = driver.main(["--model", "bert-base-uncased"])
    assert rc == 2
    assert "provide --data_pickle or --synthetic" in capsys.readouterr().err
