"""Multi-process SPMD (parallel/multiprocess.py + __graft_entry__
dryrun_multiprocess + driver --num_processes).

The reference is single-process single-GPU (global_configs.py:4-7); real
TPU pod slices are multi-host — one process per host, per-host data
sharding, rendezvous checkpointing. These tests run that execution model
with real `jax.distributed` processes over a loopback coordinator
(2 procs × N virtual CPU devices each) and assert equivalence with the
single-process virtual mesh the rest of the suite uses.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cpu_env(n_dev: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_dev}").strip()
    return env


# ---- ShardedBatchIterator: pure-host slicing semantics ---------------------


def _tiny_split(n=21, seq=6, dv=3, da=4, seed=5):
    from bert_multimodal_transformer_tpu.data.pipeline import PackedSplit

    r = np.random.RandomState(seed)
    return PackedSplit(
        r.randint(0, 100, (n, seq)).astype(np.int32),
        r.randn(n, seq, dv).astype(np.float32),
        r.randn(n, seq, da).astype(np.float32),
        np.ones((n, seq), np.int32),
        np.zeros((n, seq), np.int32),
        r.randn(n).astype(np.float32),
    )


@pytest.mark.parametrize("nproc", [2, 4])
@pytest.mark.parametrize("shuffle,drop", [(True, True), (False, False)])
def test_sharded_iterator_unions_to_global(nproc, shuffle, drop):
    """The union of every process's rows IS the single-process batch
    stream: same shuffle (same seed), contiguous row-blocks in process
    order, valid masks sliced identically."""
    from bert_multimodal_transformer_tpu.data.pipeline import BatchIterator
    from bert_multimodal_transformer_tpu.parallel.multiprocess import (
        ShardedBatchIterator,
    )

    split = _tiny_split()
    gb = 8
    ref = list(BatchIterator(split, gb, shuffle=shuffle,
                             drop_remainder=drop, seed=3))
    views = [list(ShardedBatchIterator(split, gb, shuffle=shuffle,
                                       drop_remainder=drop, seed=3,
                                       num_processes=nproc,
                                       process_id=p))
             for p in range(nproc)]
    assert all(len(v) == len(ref) for v in views)
    for bi, (rbatch, rvalid) in enumerate(ref):
        cat_valid = np.concatenate([views[p][bi][1] for p in range(nproc)])
        np.testing.assert_array_equal(cat_valid, rvalid)
        for ai, rarr in enumerate(rbatch):
            cat = np.concatenate([views[p][bi][0][ai]
                                  for p in range(nproc)])
            np.testing.assert_array_equal(cat, rarr)
            # and each view is exactly 1/nproc of the global batch
            assert views[0][bi][0][ai].shape[0] == gb // nproc


def test_sharded_iterator_indivisible_batch_rejected():
    from bert_multimodal_transformer_tpu.parallel.multiprocess import (
        ShardedBatchIterator,
    )

    with pytest.raises(ValueError, match="not divisible"):
        ShardedBatchIterator(_tiny_split(), 9, shuffle=False,
                             drop_remainder=False, num_processes=2,
                             process_id=0)


def test_sharded_iterator_resume_passthrough():
    """restore_position reproduces the same per-process stream as an
    uninterrupted iterator that already drew that many shuffles."""
    from bert_multimodal_transformer_tpu.parallel.multiprocess import (
        ShardedBatchIterator,
    )

    split = _tiny_split()

    def make():
        return ShardedBatchIterator(split, 8, shuffle=True,
                                    drop_remainder=True, seed=11,
                                    num_processes=2, process_id=1)

    a = make()
    for _ in range(2):
        list(a)
    epoch3_a = list(a)

    b = make()
    b.restore_position(2)
    epoch3_b = list(b)
    assert a.shuffles_done == b.shuffles_done == 3
    for (ba, va), (bb, vb) in zip(epoch3_a, epoch3_b):
        np.testing.assert_array_equal(va, vb)
        for x, y in zip(ba, bb):
            np.testing.assert_array_equal(x, y)


# ---- the full jax.distributed equivalence dryrun ---------------------------


@pytest.mark.slow
def test_dryrun_multiprocess_equivalence():
    """2 real processes × 2 virtual CPU devices under jax.distributed ==
    the single-process 4-device run: processes bit-identical, params
    within f32 reduction-order tolerance, Orbax rendezvous roundtrip.
    (The parent only spawns subprocesses, so running it in-process is
    safe under the CPU-forced test session.)"""
    import __graft_entry__ as g

    g.dryrun_multiprocess(num_processes=2, devices_per_process=2)


# ---- driver CLI surface ----------------------------------------------------


def _run_driver(env, extra, timeout=900):
    cmd = [sys.executable, "-m", "bert_multimodal_transformer_tpu.driver",
           "--model", "bert-base-uncased", "--dataset", "mosi",
           "--synthetic", "--tiny", "--n_epochs", "1",
           "--train_batch_size", "8", "--synthetic_sizes", "32", "8", "8",
           "--seed", "42"] + extra
    return subprocess.Popen(cmd, cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _epoch_line(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("epoch:0"):
            return {kv.split(":")[0]: float(kv.split(":")[1])
                    for kv in line.split(", ")}
    raise AssertionError(f"no epoch line in driver output:\n{out}")


@pytest.mark.slow
def test_driver_num_processes_matches_single_process():
    """`--num_processes 2` (two real driver processes, loopback
    coordinator, per-process data shards) reproduces the single-process
    driver's epoch metrics within f32 reduction-order tolerance; the
    non-zero process stays silent."""
    port = _free_port()
    mp_flags = ["--num_processes", "2",
                "--coordinator_address", f"127.0.0.1:{port}"]
    p1 = _run_driver(_cpu_env(2), mp_flags + ["--process_id", "1"])
    p0 = _run_driver(_cpu_env(2), mp_flags + ["--process_id", "0"])
    out0, _ = p0.communicate(timeout=900)
    out1, _ = p1.communicate(timeout=900)
    assert p0.returncode == 0, out0
    assert p1.returncode == 0, out1
    assert "epoch:0" not in out1, "non-zero process must not log"

    ref = _run_driver(_cpu_env(4), [])
    out_ref, _ = ref.communicate(timeout=900)
    assert ref.returncode == 0, out_ref

    got = _epoch_line(out0)
    want = _epoch_line(out_ref)
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-4 * max(1.0, abs(v)), (
            k, got[k], v)


def test_driver_num_processes_guards():
    """Incompatible compositions and indivisible batches fail loudly
    before any distributed init."""
    from bert_multimodal_transformer_tpu import driver

    base = ["--model", "bert-base-uncased", "--synthetic", "--tiny",
            "--num_processes", "2"]
    # (--fsdp and --model_parallel are NOT here: ZeRO-3 and Megatron-FFN
    # TP compose with multi-process — the dryrun's FSDP/TP stages prove
    # the cross-process sharded placements)
    for extra in (["--tp_shard_attention", "--model_parallel", "2"],
                  ["--pipeline_parallel", "2"],
                  ["--train_batch_size", "7"],
                  ["--process_id", "2"]):
        assert driver.main(base + extra) == 2


@pytest.mark.slow
def test_driver_num_processes_fsdp(tmp_path):
    """--fsdp x --num_processes through the CLI: ZeRO-3 state sharded
    over the cross-process data axis, collective Orbax save included."""
    port = _free_port()
    flags = ["--num_processes", "2",
             "--coordinator_address", f"127.0.0.1:{port}", "--fsdp",
             "--checkpoint_dir", str(tmp_path / "ckpt")]
    p1 = _run_driver(_cpu_env(2), flags + ["--process_id", "1"])
    p0 = _run_driver(_cpu_env(2), flags + ["--process_id", "0"])
    out0, _ = p0.communicate(timeout=900)
    out1, _ = p1.communicate(timeout=900)
    assert p0.returncode == 0, out0
    assert p1.returncode == 0, out1
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])
