"""CLI driver tests: end-to-end main() on CPU with synthetic data,
checkpoint save + resume."""

import json
import os

import numpy as np
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

    # resume toward a larger total: epochs are counted absolutely, so
    # --n_epochs 3 after a completed 2-epoch run trains exactly one more
    # epoch (epoch 2) from the restored state
    rc = run_driver(tmp_path, extra=["--resume"], epochs=3)
    assert rc == 0
    lines = metrics_path.read_text().strip().splitlines()
    assert len(lines) == 3
    assert json.loads(lines[-1])["epoch"] == 2

    # resume at an already-reached total: nothing left to train, still rc 0
    rc = run_driver(tmp_path, extra=["--resume"], epochs=3)
    assert rc == 0
    assert len(metrics_path.read_text().strip().splitlines()) == 3


def test_driver_xlnet_fused_inkernel_end_to_end(tmp_path):
    """--attention_impl fused --rel_bias_impl inkernel through the full
    CLI: the ingredients-fused rel-attention path trains and evaluates."""
    args = [
        "--model", "xlnet-base-cased", "--dataset", "mosi",
        "--synthetic", "--tiny",
        "--n_epochs", "1",
        "--train_batch_size", "8",
        "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "16", "8", "8",
        "--seed", "3",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--attention_impl", "fused",
        "--rel_bias_impl", "inkernel",
    ]
    assert driver.main(args) == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])


def test_driver_requires_data_source(capsys):
    rc = driver.main(["--model", "bert-base-uncased"])
    assert rc == 2
    assert "provide --data_pickle or --synthetic" in capsys.readouterr().err


def test_driver_rejects_flash_for_xlnet(capsys):
    """--attention_impl flash + XLNet must error, not silently run einsum
    (advisor finding, round 1)."""
    rc = driver.main(["--model", "xlnet-base-cased", "--synthetic", "--tiny",
                      "--attention_impl", "flash"])
    assert rc == 2
    assert "flash" in capsys.readouterr().err


def test_driver_flag_surface_smoke(tmp_path):
    """One tiny run sweeping the CLI flags whose mechanisms are tested at
    lower levels but whose argparse->config wiring had no CLI coverage:
    fused MAG kernel, remat (+policy), grad accumulation, gate/beta
    hyperparams, lr, seq length, zero-label scoring, threefry PRNG."""
    rc = run_driver(tmp_path, extra=[
        "--use_fused_mag", "--remat", "--remat_policy", "dots",
        "--gradient_accumulation_step", "2",
        "--beta_shift", "0.5", "--dropout_prob", "0.3",
        "--learning_rate", "2e-5", "--max_seq_length", "24",
        "--use_zero", "--rng_impl", "threefry2x32"])
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])


def test_driver_tp_cli_smoke(tmp_path):
    """--model_parallel/--tp_shard_attention through the CLI on the
    virtual mesh (mechanism tested in test_tensor_parallel; this covers
    the driver wiring incl. mesh construction and config threading)."""
    rc = run_driver(tmp_path, extra=["--model_parallel", "2",
                                     "--tp_shard_attention"])
    assert rc == 0


def test_driver_fsdp_cli_smoke(tmp_path, capsys):
    """--fsdp through the full CLI on the virtual mesh (mechanism tested
    in test_fsdp; this covers the driver wiring), and its rejection
    under --pipeline_parallel."""
    rc = run_driver(tmp_path, extra=["--fsdp"])
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])

    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--fsdp", "--pipeline_parallel", "2"])
    assert rc == 2
    assert "--fsdp" in capsys.readouterr().err


def test_driver_extends_position_table_past_config(tmp_path):
    """--max_seq_length beyond max_position_embeddings must extend the
    BERT position table (XLA gather would silently CLIP position ids
    otherwise — every position past the table would share one
    embedding). Tiny config has a 64-entry table; train at 80."""
    rc = run_driver(tmp_path, extra=["--max_seq_length", "80"])
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])


def test_driver_rejects_inert_rel_bias_impl(capsys):
    """--rel_bias_impl inkernel is only read by the fused rel-attention
    path: without --attention_impl fused (or on the BERT family) it would
    silently run a differently-labeled config, so the driver must error."""
    rc = driver.main(["--model", "xlnet-base-cased", "--synthetic", "--tiny",
                      "--rel_bias_impl", "inkernel"])
    assert rc == 2
    assert "--attention_impl fused" in capsys.readouterr().err

    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--attention_impl", "fused",
                      "--rel_bias_impl", "inkernel"])
    assert rc == 2
    assert "XLNet" in capsys.readouterr().err


def test_driver_pretrained_warm_start(tmp_path):
    """--pretrained_checkpoint loads a local torch .bin through the full
    CLI path (reference prep_for_training contract)."""
    import os
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    torch = pytest.importorskip("torch")
    import transformers

    from bert_multimodal_transformer_tpu.data import synthetic
    from bert_multimodal_transformer_tpu.data.tokenization import (
        WordPieceTokenizer,
    )

    vocab_size = WordPieceTokenizer.from_wordlist(
        synthetic.vocabulary()).vocab_size
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    tm = transformers.BertModel(hf_cfg)
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(tm.state_dict(), ckpt)

    rc = run_driver(tmp_path, extra=["--pretrained_checkpoint", str(ckpt)],
                    epochs=1)
    assert rc == 0


def test_driver_mosei_config(tmp_path):
    """BASELINE config #2: MOSEI modality dims (visual 35) through the
    full CLI path."""
    args = [
        "--model", "bert-base-uncased", "--dataset", "mosei",
        "--synthetic", "--tiny",
        "--n_epochs", "1",
        "--train_batch_size", "8",
        "--dev_batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_sizes", "16", "8", "8",
        "--seed", "5",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    assert driver.main(args) == 0
    import json
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])


def test_bert_large_config_geometry():
    from bert_multimodal_transformer_tpu.config import BertConfig

    cfg = BertConfig.bert_large_uncased()
    assert (cfg.hidden_size, cfg.num_hidden_layers,
            cfg.num_attention_heads, cfg.intermediate_size) == \
        (1024, 24, 16, 4096)


def test_driver_predict_only(tmp_path, capsys):
    """Train one epoch with checkpointing, then --predict_only restores and
    prints test metrics without training."""
    import json

    assert run_driver(tmp_path, epochs=1) == 0
    capsys.readouterr()
    rc = run_driver(tmp_path, extra=["--predict_only"], epochs=1)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert {"test_acc", "test_mae", "test_corr", "test_f_score"} == set(rec)
    assert np.isfinite(rec["test_mae"])

    # --wire_dtype: halved request payload, finite scores
    rc = run_driver(tmp_path, extra=["--predict_only",
                                     "--wire_dtype", "bfloat16"], epochs=1)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec_bf = json.loads(out)
    assert np.isfinite(rec_bf["test_mae"])


def test_driver_qkv_fusion_flag(tmp_path, capsys):
    """--qkv_fusion through the CLI (CPU: the dropout path falls back to
    the split projection, so this covers the wiring + fallback), plus the
    inert-combination guards."""
    rc = run_driver(tmp_path, extra=["--attention_impl", "fused",
                                     "--qkv_fusion", "--qkv_residual"])
    assert rc == 0

    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--qkv_fusion"])
    assert rc == 2
    assert "--attention_impl" in capsys.readouterr().err

    rc = driver.main(["--model", "xlnet-base-cased", "--synthetic",
                      "--tiny", "--attention_impl", "fused",
                      "--qkv_fusion"])
    assert rc == 2
    assert "BERT" in capsys.readouterr().err


def test_driver_pipeline_parallel(tmp_path, capsys):
    """--pipeline_parallel through the full CLI on the virtual mesh:
    train epochs (incl. a ragged tail through the masked pipeline step),
    checkpoint in pipeline layout, --predict_only converts it back to
    the model layout, --export_hf writes model-layout weights. Plus the
    combination guards."""
    import json

    rc = run_driver(tmp_path,
                    extra=["--pipeline_parallel", "2",
                           "--pp_microbatches", "2",
                           "--synthetic_sizes", "20", "8", "8",
                           "--export_hf", str(tmp_path / "pp.bin")],
                    epochs=1)
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])
    assert (tmp_path / "pp.bin").exists()

    capsys.readouterr()
    rc = run_driver(tmp_path,
                    extra=["--pipeline_parallel", "2",
                           "--pp_microbatches", "2",
                           "--synthetic_sizes", "20", "8", "8",
                           "--predict_only"], epochs=1)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["test_mae"])

    # guards: no head-sharded attention under PP, no grad-accum
    # double-counting
    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--pipeline_parallel", "2",
                      "--model_parallel", "2", "--tp_shard_attention"])
    assert rc == 2
    assert "tp_shard_attention" in capsys.readouterr().err
    rc = driver.main(["--model", "bert-base-uncased", "--synthetic",
                      "--tiny", "--pipeline_parallel", "2",
                      "--gradient_accumulation_step", "2"])
    assert rc == 2
    assert "--pp_microbatches" in capsys.readouterr().err


def test_driver_pp_tp(tmp_path, capsys):
    """PPxTP through the full CLI: --pipeline_parallel 2
    --model_parallel 2 on the virtual 8-device mesh (2 stages x 2-way
    Megatron FFN x 2-way data)."""
    import json

    rc = run_driver(tmp_path,
                    extra=["--pipeline_parallel", "2",
                           "--model_parallel", "2",
                           "--pp_microbatches", "2",
                           "--synthetic_sizes", "20", "8", "8"],
                    epochs=1)
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])


def test_driver_pipeline_parallel_xlnet(tmp_path, capsys):
    """--pipeline_parallel with the XLNet family (the reference's
    headline model, xlnet.py:432-527): train through the CLI with the
    mid-stack MAG injection pipelined (parallel/pp_xlnet.py), then
    restore the pipeline-layout checkpoint with --predict_only."""
    import json

    extra = ["--model", "xlnet-base-cased",
             "--pipeline_parallel", "2", "--pp_microbatches", "2",
             "--synthetic_sizes", "20", "8", "8"]
    rc = run_driver(tmp_path, extra=extra, epochs=1)
    assert rc == 0
    rec = json.loads((tmp_path / "ckpt" / "metrics.jsonl")
                     .read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["test_mae"])

    capsys.readouterr()
    rc = run_driver(tmp_path, extra=extra + ["--predict_only"], epochs=1)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["test_mae"])


def test_driver_export_serving(tmp_path):
    """--export_serving writes a StableHLO serving artifact (+ JSON
    sidecar) after training; reloading it needs only jax and computes
    the trained forward at a batch size never seen in training."""
    out = tmp_path / "model.stablehlo"
    rc = run_driver(tmp_path, extra=["--export_serving", str(out)])
    assert rc == 0
    assert out.exists() and out.with_suffix(".stablehlo.json").exists()
    side = json.loads(out.with_suffix(".stablehlo.json").read_text())
    assert side["family"] == "bert"
    assert "cpu" in side["platforms"] and "tpu" in side["platforms"]

    from bert_multimodal_transformer_tpu.serving import load_artifact

    serve = load_artifact(str(out))
    b, s = 3, int(side["inputs"][0]["shape"][1])
    dv = int(side["inputs"][1]["shape"][2])
    da = int(side["inputs"][2]["shape"][2])
    rng = np.random.RandomState(0)
    logits = serve(rng.randint(0, 10, (b, s)), rng.randn(b, s, dv),
                   rng.randn(b, s, da), np.ones((b, s), np.int32),
                   np.zeros((b, s), np.int32))
    assert np.asarray(logits).shape == (b, 1)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_driver_export_hf(tmp_path):
    """--export_hf writes the fine-tuned encoder as an HF-format torch
    .bin that loads into a transformers BertModel of the same geometry
    (reverse of the --pretrained_checkpoint warm-start path)."""
    torch = pytest.importorskip("torch")
    import transformers

    out = tmp_path / "exported.bin"
    rc = run_driver(tmp_path, extra=["--export_hf", str(out)])
    assert rc == 0
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert "embeddings.word_embeddings.weight" in sd
    assert any(k.startswith("encoder.layer.1.") for k in sd)
    hf = transformers.BertModel(transformers.BertConfig(
        vocab_size=sd["embeddings.word_embeddings.weight"].shape[0],
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        attn_implementation="eager"))
    res = hf.load_state_dict(sd, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys


def test_driver_real_data_path_bert_vocab_file(tmp_path):
    """The REAL-data CLI surface (--data_pickle + --vocab vocab.txt):
    pickle loader in the documented reference format
    (multimodal_driver.py:249-255, README.md:129-159) + the WordPiece
    tokenizer built from a vocab file — the path a user with actual
    mosi.pkl runs, end to end."""
    from bert_multimodal_transformer_tpu.data import synthetic

    data = synthetic.make_dataset(visual_dim=47, acoustic_dim=74,
                                  n_train=16, n_dev=8, n_test=8, seed=5)
    pkl = tmp_path / "mosi.pkl"
    synthetic.write_pickle(str(pkl), data)
    # vocab.txt: specials + whole words + char fallbacks (the same
    # construction WordPieceTokenizer.from_wordlist uses)
    from bert_multimodal_transformer_tpu.data.tokenization import (
        WordPieceTokenizer,
    )

    wp = WordPieceTokenizer.from_wordlist(synthetic.vocabulary())
    inv = {i: t for t, i in wp.vocab.items()}
    vocab_txt = tmp_path / "vocab.txt"
    vocab_txt.write_text(
        "\n".join(inv[i] for i in range(len(inv))) + "\n",
        encoding="utf-8")

    rc = driver.main([
        "--model", "bert-base-uncased", "--dataset", "mosi",
        "--data_pickle", str(pkl), "--vocab", str(vocab_txt),
        "--tiny", "--n_epochs", "1",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8", "--seed", "3",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    lines = (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 1


def test_driver_real_data_path_xlnet_spiece_model(tmp_path):
    """XLNet twin: --data_pickle + --vocab spiece.model, where the
    .model is a REAL serialized SentencePiece ModelProto — including an
    embedded nmt_nfkc precompiled charsmap, so the CLI drives the EXACT
    normalizer path a stock spiece.model takes — read by the native
    unigram engine (the reference's get_tokenizer path,
    multimodal_driver.py:208-218)."""
    from bert_multimodal_transformer_tpu.data import synthetic
    from bert_multimodal_transformer_tpu.data.sentencepiece_native import (
        TYPE_CONTROL,
        TYPE_NORMAL,
        TYPE_UNKNOWN,
        build_nmt_nfkc_rules,
        build_precompiled_charsmap,
        serialize_model_proto,
    )

    data = synthetic.make_dataset(visual_dim=47, acoustic_dim=74,
                                  n_train=16, n_dev=8, n_test=8, seed=6)
    pkl = tmp_path / "mosi.pkl"
    synthetic.write_pickle(str(pkl), data)

    pieces = [("<unk>", 0.0, TYPE_UNKNOWN),
              ("<s>", 0.0, TYPE_CONTROL), ("</s>", 0.0, TYPE_CONTROL),
              ("<cls>", 0.0, TYPE_CONTROL), ("<sep>", 0.0, TYPE_CONTROL),
              ("<pad>", 0.0, TYPE_CONTROL)]
    chars = set()
    for w in synthetic.vocabulary():
        pieces.append(("▁" + w, -1.0, TYPE_NORMAL))
        chars.update(w)
    for ch in sorted(chars):
        pieces.append((ch, -5.0, TYPE_NORMAL))
        pieces.append(("▁" + ch, -5.0, TYPE_NORMAL))
    charsmap = build_precompiled_charsmap(build_nmt_nfkc_rules(max_cp=0x300))
    spiece = tmp_path / "spiece.model"
    spiece.write_bytes(serialize_model_proto(
        pieces, normalizer_spec={"name": "nmt_nfkc",
                                 "precompiled_charsmap": charsmap}))

    rc = driver.main([
        "--model", "xlnet-base-cased", "--dataset", "mosi",
        "--data_pickle", str(pkl), "--vocab", str(spiece),
        "--tiny", "--n_epochs", "1",
        "--train_batch_size", "8", "--dev_batch_size", "8",
        "--test_batch_size", "8", "--seed", "3",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    lines = (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 1


def test_driver_compiler_options_flag(tmp_path, capsys):
    """--compiler_options reaches the Trainer's jits AND (since r5f) the
    pipeline trainer's shard_map programs (PipelineTrainer._pp_jit) — a
    benign XLA option trains end-to-end both ways."""
    rc = run_driver(tmp_path, extra=[
        "--compiler_options",
        '{"xla_backend_optimization_level": "2"}'])
    assert rc == 0

    # fresh checkpoint dir: the first leg saved a plain-trainer layout
    # there, which a PP run would (correctly) refuse to resume from
    rc = run_driver(tmp_path / "pp", extra=[
        "--pipeline_parallel", "2", "--pp_microbatches", "2",
        "--compiler_options",
        '{"xla_backend_optimization_level": "2"}'])
    assert rc == 0
