"""CLI driver.

Mirror of the reference's ``multimodal_driver.py`` entry point
(:35-57 argparse, :526-552 main): same flags and defaults, plus TPU-native
extras (--compute_dtype, --use_fused_mag, --checkpoint_dir, --data_pickle,
--vocab, --synthetic for offline runs).

Usage:
    python -m bert_multimodal_transformer_tpu.driver \
        --model bert-base-uncased --dataset mosi --synthetic
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from bert_multimodal_transformer_tpu.utils.seeding import parse_seed

    p = argparse.ArgumentParser(description=__doc__)
    # Reference flags (multimodal_driver.py:35-57):
    p.add_argument("--dataset", type=str, choices=["mosi", "mosei"],
                   default="mosi")
    p.add_argument("--max_seq_length", type=int, default=50)
    p.add_argument("--train_batch_size", type=int, default=48)
    p.add_argument("--dev_batch_size", type=int, default=128)
    p.add_argument("--test_batch_size", type=int, default=128)
    p.add_argument("--n_epochs", type=int, default=40)
    p.add_argument("--beta_shift", type=float, default=1.0)
    p.add_argument("--dropout_prob", type=float, default=0.5)
    p.add_argument("--model", type=str,
                   choices=["bert-base-uncased", "bert-large-uncased",
                            "xlnet-base-cased"],
                   default="bert-base-uncased")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--gradient_accumulation_step", type=int, default=1)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--seed", type=parse_seed, default="random")
    # TPU-native extras:
    p.add_argument("--data_pickle", type=str, default=None,
                   help="Path to {mosi,mosei}.pkl in the documented format")
    p.add_argument("--vocab", type=str, default=None,
                   help="Local vocab.txt (BERT) or spiece.model (XLNet)")
    p.add_argument("--pretrained_checkpoint", type=str, default=None,
                   help="Local HF pytorch_model.bin (or dir) to warm-start")
    p.add_argument("--synthetic", action="store_true",
                   help="Generate synthetic data (offline smoke/dev mode)")
    p.add_argument("--synthetic_sizes", type=int, nargs=3,
                   default=[256, 64, 64], metavar=("TRAIN", "DEV", "TEST"))
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_fused_mag", action="store_true")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="Continue an interrupted run from --checkpoint_dir "
                        "toward the same --n_epochs total. With a resume "
                        "meta present (written by this driver), training "
                        "continues exactly where it stopped — mid-epoch "
                        "included — reproducing the uninterrupted run's "
                        "parameters bit-for-bit (pass the SAME --n_epochs "
                        "as the interrupted run: the LR schedule spans the "
                        "planned total step count)")
    p.add_argument("--save_every_steps", type=int, default=0,
                   help="Also checkpoint every N optimizer steps "
                        "(preemption-safe mid-epoch resume; requires "
                        "--checkpoint_dir). 0 = epoch-end saves only")
    p.add_argument("--qkv_fusion", action="store_true",
                   help="With --attention_impl fused (BERT family): fuse "
                        "the QKV projection gemm into the attention "
                        "kernel (opt-in pending hardware timing)")
    p.add_argument("--qkv_residual", action="store_true",
                   help="With --qkv_fusion: save the VMEM-computed qkv "
                        "as a backward residual instead of recomputing "
                        "the projection in the backward kernel")
    p.add_argument("--max_steps", type=int, default=0,
                   help="Stop this run after N optimizer steps (0 = no "
                        "limit); with --save_every_steps, a later --resume "
                        "continues exactly where it stopped")
    p.add_argument("--export_hf", type=str, default=None,
                   help="After training, export the fine-tuned encoder "
                        "weights as an HF-format torch .bin at this path "
                        "(reverse of --pretrained_checkpoint; MAG and "
                        "classifier params are framework-specific and "
                        "not exported)")
    p.add_argument("--export_serving", type=str, default=None,
                   help="After training, export the deterministic forward "
                        "(weights captured) as a serialized StableHLO "
                        "artifact at this path, loadable for inference "
                        "without this package's model code "
                        "(serving.py; symbolic batch dim, portable "
                        "einsum attention). '.json' sidecar records the "
                        "calling convention")
    p.add_argument("--predict_only", action="store_true",
                   help="Skip training: restore --checkpoint_dir and print "
                        "test metrics (inference/serving mode)")
    p.add_argument("--tiny", action="store_true",
                   help="Tiny model geometry (smoke tests)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize encoder layers (bert-large memory)")
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "dots"],
                   help="Remat policy: full recompute (lowest memory) or "
                        "save-matmul-outputs (faster backward)")
    p.add_argument("--use_zero", action="store_true",
                   help="Include exactly-zero labels in test metrics "
                        "(reference test_score_model use_zero flag)")
    p.add_argument("--attention_impl", type=str, default="einsum",
                   choices=["einsum", "fused", "flash"],
                   help="Attention backend (BERT: all three; XLNet: "
                        "einsum/fused). fused = packed Pallas kernel "
                        "(in-VMEM softmax+dropout, fused bwd); "
                        "flash = blockwise kernel for long sequences "
                        "(seq %% 128 == 0)")
    p.add_argument("--rel_bias_impl", type=str, default="auto",
                   choices=["auto", "stream", "inkernel"],
                   help="XLNet fused-attention score-bias assembly: "
                        "stream the [B,H,Q,K] ebias from XLA, or "
                        "assemble bd/rel-shift/segment/mask in VMEM "
                        "(inkernel; bi attention, works under TP). "
                        "auto = stream while the full-H ebias kernel "
                        "fits, the in-VMEM ingredients flash-streamed "
                        "tier past it (~2x at long S)")
    p.add_argument("--mem_len", type=int, default=0,
                   help="XLNet segment recurrence: carry Transformer-XL "
                        "memory of this many positions across the batch "
                        "stream (K = seq + mem_len in every layer; "
                        "reference xlnet.py:81-91, dormant there). "
                        "XLNet family, data-parallel trainer only")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="Model (tensor-parallel) mesh axis size: shards "
                        "the FFN Megatron-style over the 'model' axis "
                        "(parallel/tp.py); data axis gets the remaining "
                        "devices")
    p.add_argument("--tp_shard_attention", action="store_true",
                   help="With --model_parallel > 1: also head-shard "
                        "attention over the model axis (both families; "
                        "einsum via GSPMD, fused via shard_map'd Pallas "
                        "kernels; needs n_head %% mp == 0)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="Pipeline-parallel stage count: encoder layers "
                        "split into N stages over a 'pipe' mesh axis, "
                        "GPipe microbatch schedule, activations over ICI "
                        "(parallel/pp.py BERT, parallel/pp_xlnet.py XLNet); "
                        "data axis gets the remaining devices; needs "
                        "layer count %% N == 0")
    p.add_argument("--pp_microbatches", type=int, default=4,
                   help="With --pipeline_parallel > 1: microbatches per "
                        "step (the pipeline's accumulation factor; the "
                        "per-data-shard batch must divide by it)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: store params + optimizer moments "
                        "sharded over the data axis (parallel/fsdp.py; "
                        "XLA inserts the all-gather/reduce-scatter "
                        "schedule). Composes with --model_parallel; "
                        "not with --pipeline_parallel")
    p.add_argument("--rng_impl", type=str, default="rbg",
                   choices=["threefry2x32", "rbg"],
                   help="Dropout PRNG: rbg uses the TPU hardware RNG "
                        "(~20%% faster step; same statistics)")
    p.add_argument("--wire_dtype", type=str, default=None,
                   choices=[None, "bfloat16", "float16"],
                   help="--predict_only: cast the modality features to "
                        "this dtype host-side before the device "
                        "transfer (halves the request payload; "
                        "bfloat16 is lossless for a bf16-compute "
                        "model — serving.Predictor wire_dtype)")
    p.add_argument("--compiler_options", type=str, default=None,
                   help="JSON dict of XLA compile options applied to the "
                        "jitted train/eval/predict steps, e.g. "
                        "'{\"xla_tpu_scoped_vmem_limit_kib\":\"65536\"}'. "
                        "Invalid names/values fail at compile time. "
                        "(The per-program jit route is the one that "
                        "reliably reaches the compiler on a PJRT "
                        "backend; process-level LIBTPU_INIT_ARGS "
                        "measured as a no-op here — BENCHMARKS.md.)")
    p.add_argument("--num_processes", type=int, default=1,
                   help="Multi-process SPMD (one process per host — how "
                        "real pod slices run; parallel/multiprocess.py): "
                        "total process count. Launch one driver per host "
                        "with identical flags and a distinct "
                        "--process_id; every process feeds only its "
                        "local devices' batch rows. Data-parallel "
                        "trainer only")
    p.add_argument("--process_id", type=int, default=0,
                   help="This process's index in [0, --num_processes)")
    p.add_argument("--coordinator_address", type=str,
                   default="127.0.0.1:8476",
                   help="host:port of process 0's jax.distributed "
                        "coordinator (every process passes the same "
                        "address)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # A PJRT plugin registered at interpreter start (this image's
        # sitecustomize registers the TPU tunnel plugin) can win platform
        # selection over the env var; re-assert it so
        # `JAX_PLATFORMS=cpu python -m ...driver` really runs on CPU
        # (measured: without this, the env var alone silently lands on
        # the TPU — CLAUDE.md "Environment gotchas").
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_prng_impl", args.rng_impl)
    # Persistent compilation cache (cold tunnel compiles are minutes).
    # Respect an already-configured cache dir: the test suite runs
    # driver.main in-process with its own cache (tests/conftest.py), and
    # rebinding here would split it mid-session.
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10.0)
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        DatasetConfig,
        MeshConfig,
        MultimodalConfig,
        XLNetConfig,
    )
    from bert_multimodal_transformer_tpu.data import synthetic
    from bert_multimodal_transformer_tpu.data.pipeline import (
        set_up_data_loaders,
    )
    from bert_multimodal_transformer_tpu.data.tokenization import (
        SimpleUnigramTokenizer,
        WordPieceTokenizer,
        get_tokenizer,
    )
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
    from bert_multimodal_transformer_tpu.training.optim import make_optimizer
    from bert_multimodal_transformer_tpu.training.trainer import Trainer
    from bert_multimodal_transformer_tpu.utils.logging import MetricLogger
    from bert_multimodal_transformer_tpu.utils.seeding import set_random_seed

    ds = DatasetConfig.from_name(args.dataset)
    is_xlnet = args.model.startswith("xlnet")
    family = "xlnet" if is_xlnet else "bert"

    multiproc = args.num_processes > 1
    if multiproc:
        bad = [f for f, cond in (
            ("--pipeline_parallel", args.pipeline_parallel > 1),
            ("--tp_shard_attention", args.tp_shard_attention),
            ("--mem_len", bool(args.mem_len)),
            ("--predict_only", args.predict_only),
        ) if cond]
        if bad:
            print("error: --num_processes > 1 composes with the "
                  "data-parallel trainer, --fsdp (ZeRO-3 over the "
                  "cross-process data axis) and --model_parallel "
                  "(Megatron FFN, model axis intra-process); not with "
                  f"{' '.join(bad)}", file=sys.stderr)
            return 2
        if not (0 <= args.process_id < args.num_processes):
            print(f"error: --process_id {args.process_id} outside "
                  f"[0, {args.num_processes})", file=sys.stderr)
            return 2
        for flag, b in (("--train_batch_size",
                         args.train_batch_size
                         * args.gradient_accumulation_step),
                        ("--dev_batch_size", args.dev_batch_size),
                        ("--test_batch_size", args.test_batch_size)):
            if b % args.num_processes != 0:
                print(f"error: {flag} (global {b}) must divide by "
                      f"--num_processes {args.num_processes} (each "
                      "process feeds an equal row-block)",
                      file=sys.stderr)
                return 2
        # must run BEFORE any computation initializes the backend —
        # after this, jax.devices() is the global device list
        from bert_multimodal_transformer_tpu.parallel import (
            multiprocess as mp_lib,
        )

        mp_lib.initialize(args.coordinator_address, args.num_processes,
                          args.process_id)
        if (jax.process_count() != args.num_processes
                or jax.process_index() != args.process_id):
            # a backend whose plugin ignores the distributed runtime
            # (each process seeing itself as process 0) would silently
            # train N independent copies — fail loudly instead
            print(f"error: backend reports process "
                  f"{jax.process_index()}/{jax.process_count()}, flags "
                  f"say {args.process_id}/{args.num_processes} — the "
                  "active platform did not join the distributed runtime",
                  file=sys.stderr)
            return 2
        if (args.model_parallel > 1
                and jax.local_device_count() % args.model_parallel != 0):
            # the mesh reshapes the process-ordered global device list
            # to (data, model) with model minor — each process must
            # hold whole data rows so batch row-blocks stay local (and
            # the Megatron FFN collectives stay intra-host)
            print(f"error: --model_parallel {args.model_parallel} must "
                  f"divide the {jax.local_device_count()} local devices "
                  "per process", file=sys.stderr)
            return 2
        is_main = jax.process_index() == 0
    else:
        is_main = True

    if args.resume and args.checkpoint_dir:
        # exact continuation requires the interrupted run's seed (data
        # shuffle, synthetic data, init, dropout streams all derive from
        # it) — with the default --seed random each process would draw a
        # fresh one, silently replaying a different data order
        _meta = _read_resume_meta(
            os.path.join(args.checkpoint_dir, "resume_meta.json"))
        if _meta is not None and "seed" in _meta \
                and _meta["seed"] != args.seed:
            print(f"Resume: adopting the interrupted run's seed "
                  f"{_meta['seed']} (was {args.seed})")
            args.seed = _meta["seed"]

    rng = set_random_seed(args.seed)
    if is_main:
        print(f"Seed: {args.seed}")

    # ---- data -----------------------------------------------------------
    if args.synthetic:
        data = synthetic.make_dataset(
            visual_dim=ds.visual_dim, acoustic_dim=ds.acoustic_dim,
            n_train=args.synthetic_sizes[0], n_dev=args.synthetic_sizes[1],
            n_test=args.synthetic_sizes[2], seed=args.seed)
        pickle_path = os.path.join(tempfile.mkdtemp(), f"{args.dataset}.pkl")
        synthetic.write_pickle(pickle_path, data)
        if is_xlnet:
            tokenizer = SimpleUnigramTokenizer.from_wordlist(
                synthetic.vocabulary())
        else:
            tokenizer = WordPieceTokenizer.from_wordlist(
                synthetic.vocabulary())
    else:
        if args.data_pickle is None:
            print("error: provide --data_pickle or --synthetic",
                  file=sys.stderr)
            return 2
        pickle_path = args.data_pickle
        tokenizer = get_tokenizer(args.model, args.vocab)

    if isinstance(tokenizer, WordPieceTokenizer):
        # Native C++ tokenize/align fast path when the toolchain allows.
        from bert_multimodal_transformer_tpu.data import native

        if native.available():
            tokenizer = native.NativeWordPieceTokenizer(tokenizer)

    train_it, dev_it, test_it, num_steps = set_up_data_loaders(
        pickle_path, tokenizer, model_family=family,
        max_seq_length=args.max_seq_length,
        train_batch_size=args.train_batch_size,
        dev_batch_size=args.dev_batch_size,
        test_batch_size=args.test_batch_size,
        n_epochs=args.n_epochs,
        gradient_accumulation_step=args.gradient_accumulation_step,
        seed=args.seed,
        num_processes=args.num_processes, process_id=args.process_id)

    # ---- model ----------------------------------------------------------
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    mm = MultimodalConfig(
        beta_shift=args.beta_shift, dropout_prob=args.dropout_prob,
        injection_index=1 if is_xlnet else 0,
        use_fused_kernel=args.use_fused_mag)

    # mesh before the model: --tp_shard_attention threads it into the
    # model config (tp_attention_mesh) for the head-sharded attention
    # constraints / shard_map'd fused kernels.
    if args.mem_len:
        if not is_xlnet:
            print("error: --mem_len is XLNet segment recurrence "
                  "(Transformer-XL memory, xlnet.py:81-91); the BERT "
                  "family has no memory mechanism", file=sys.stderr)
            return 2
        if (args.pipeline_parallel > 1 or args.fsdp
                or args.model_parallel > 1):
            print("error: --mem_len runs on the data-parallel trainer "
                  "(mems shard over the batch axis)", file=sys.stderr)
            return 2
        # --gradient_accumulation_step composes: the micro-batches scan
        # as sequential segments with the memory chained through the
        # scan (the reference's use_cache chain, xlnet.py:363-365).
        # --predict_only composes: Predictor(mem_len=N) threads the
        # memory through batch-ordered inference (serving.py).
    use_pp = args.pipeline_parallel > 1
    if use_pp:
        if args.tp_shard_attention:
            print("error: --pipeline_parallel does not compose with "
                  "--tp_shard_attention (attention stays replicated "
                  "inside pipeline stages; --model_parallel gives the "
                  "Megatron FFN split)", file=sys.stderr)
            return 2
        if args.fsdp:
            print("error: --fsdp does not compose with "
                  "--pipeline_parallel (the pipeline trainer owns its "
                  "stage-sharded state layout)", file=sys.stderr)
            return 2
        if args.remat:
            print("error: --remat is not applied by the pipeline "
                  "trainer (parallel/pp.py builds the stage layers "
                  "directly); drop one of the flags", file=sys.stderr)
            return 2
        from bert_multimodal_transformer_tpu.parallel.pp import (
            make_pp_mesh,
        )

        n_dev = len(jax.devices())
        mp = max(1, args.model_parallel)
        if n_dev % (args.pipeline_parallel * mp) != 0:
            print(f"error: --pipeline_parallel {args.pipeline_parallel} "
                  f"x --model_parallel {mp} does not divide the "
                  f"{n_dev} devices", file=sys.stderr)
            return 2
        mesh = make_pp_mesh(
            args.pipeline_parallel, model_parallel=mp,
            data_parallel=n_dev // (args.pipeline_parallel * mp))
    else:
        try:
            mesh = make_mesh(MeshConfig(data_parallel=-1,
                                        model_parallel=args.model_parallel))
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2

    vocab_size = getattr(tokenizer, "vocab_size", 30522)
    if is_xlnet:
        from bert_multimodal_transformer_tpu.models.xlnet import (
            MagXLNetForSequenceClassification,
        )

        import dataclasses
        cfg = (XLNetConfig.tiny(vocab_size) if args.tiny
               else XLNetConfig.xlnet_base_cased())
        if args.synthetic and not args.tiny:
            # shrink vocab to the synthetic tokenizer's, keep geometry
            cfg = dataclasses.replace(cfg, vocab_size=max(vocab_size, 128))
        if args.attention_impl == "flash":
            # "flash" is a BERT-only backend; erroring beats silently
            # benchmarking einsum under a flash flag.
            print("error: --attention_impl flash is not available for the "
                  "XLNet family (rel-attention needs the ebias-streamed "
                  "fused kernel); use einsum or fused", file=sys.stderr)
            return 2
        if args.attention_impl != "einsum":
            cfg = dataclasses.replace(cfg,
                                      attention_impl=args.attention_impl)
        if args.rel_bias_impl == "inkernel" and args.attention_impl != \
                "fused":
            # only the fused rel-attention path reads rel_bias_impl;
            # erroring beats a run whose logs claim inkernel while
            # executing einsum attention. ("auto" composes with any
            # attention_impl — it only changes the fused dispatch.)
            print("error: --rel_bias_impl inkernel requires "
                  "--attention_impl fused (the einsum path has no "
                  "score-bias kernel to select)", file=sys.stderr)
            return 2
        cfg = dataclasses.replace(cfg,
                                  rel_bias_impl=args.rel_bias_impl)
        if args.qkv_fusion or args.qkv_residual:
            print("error: --qkv_fusion/--qkv_residual apply only to the "
                  "BERT family's packed fused attention", file=sys.stderr)
            return 2
        if args.tp_shard_attention:
            cfg = dataclasses.replace(cfg, tp_attention_mesh=mesh)
        if args.mem_len:
            # segment recurrence: K = qlen + mem_len in every layer
            # (reference xlnet.py:81-91, 241-242 — dormant there, a
            # first-class trainer mode here)
            cfg = dataclasses.replace(cfg, mem_len=args.mem_len)
        model = MagXLNetForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim, acoustic_dim=ds.acoustic_dim,
            dtype=dtype, remat=args.remat)
    else:
        cfg = (BertConfig.tiny(vocab_size) if args.tiny else
               (BertConfig.bert_large_uncased()
                if args.model == "bert-large-uncased"
                else BertConfig.bert_base_uncased()))
        import dataclasses
        if args.synthetic and not args.tiny:
            cfg = dataclasses.replace(cfg, vocab_size=max(vocab_size, 128))
        if args.max_seq_length > cfg.max_position_embeddings:
            # BERT's absolute position table would silently CLIP indices
            # past its size (XLA gather semantics) — extend it instead.
            # Warm-starting a [512, D] checkpoint into the longer table
            # fails loudly in the converter, which is the honest outcome.
            cfg = dataclasses.replace(
                cfg, max_position_embeddings=args.max_seq_length)
        if args.rel_bias_impl == "inkernel":
            # "auto"/"stream" are harmless no-ops for BERT (its config
            # has no such field to select); an explicit inkernel ask is
            # a user error worth surfacing.
            print("error: --rel_bias_impl inkernel applies only to the "
                  "XLNet family's fused rel-attention", file=sys.stderr)
            return 2
        if args.attention_impl != "einsum":
            cfg = dataclasses.replace(cfg,
                                      attention_impl=args.attention_impl)
        if args.qkv_residual and not args.qkv_fusion:
            print("error: --qkv_residual requires --qkv_fusion (it picks "
                  "that path's backward variant)", file=sys.stderr)
            return 2
        if args.qkv_fusion:
            if args.attention_impl != "fused" or args.tp_shard_attention:
                print("error: --qkv_fusion requires --attention_impl "
                      "fused and is unavailable with "
                      "--tp_shard_attention", file=sys.stderr)
                return 2
            cfg = dataclasses.replace(cfg, qkv_fusion=True,
                                      qkv_residual=args.qkv_residual)
        if args.tp_shard_attention:
            cfg = dataclasses.replace(cfg, tp_attention_mesh=mesh)
        from bert_multimodal_transformer_tpu.models.bert import (
            MagBertForSequenceClassification,
        )

        model = MagBertForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim, acoustic_dim=ds.acoustic_dim,
            dtype=dtype, remat=args.remat, remat_policy=args.remat_policy)

    # ---- training -------------------------------------------------------
    tx = make_optimizer(
        learning_rate=args.learning_rate, num_train_steps=max(num_steps, 1),
        warmup_proportion=args.warmup_proportion)
    if args.tp_shard_attention:
        if args.model_parallel <= 1:
            print("error: --tp_shard_attention requires --model_parallel"
                  " > 1", file=sys.stderr)
            return 2
        if args.attention_impl == "flash":
            print("error: --tp_shard_attention supports einsum and fused "
                  "attention, not flash", file=sys.stderr)
            return 2
        n_head = getattr(cfg, "n_head", getattr(cfg, "num_attention_heads",
                                                0))
        if n_head % args.model_parallel != 0:
            print(f"error: --tp_shard_attention needs n_head ({n_head}) "
                  f"divisible by --model_parallel "
                  f"({args.model_parallel})", file=sys.stderr)
            return 2
    if use_pp:
        if args.gradient_accumulation_step != 1:
            print("error: --gradient_accumulation_step is superseded by "
                  "--pp_microbatches under --pipeline_parallel",
                  file=sys.stderr)
            return 2
        if is_xlnet:
            from bert_multimodal_transformer_tpu.parallel.pp_xlnet import (
                XLNetPipelineTrainer as _PT,
            )
        else:
            from bert_multimodal_transformer_tpu.parallel.pp import (
                PipelineTrainer as _PT,
            )
        trainer = _PT(model=model, tx=tx, mesh=mesh,
                      n_micro=args.pp_microbatches,
                      compiler_options=(json.loads(args.compiler_options)
                                        if args.compiler_options
                                        else None))
    else:
        trainer = Trainer(model=model, tx=tx, mesh=mesh,
                          grad_accum=args.gradient_accumulation_step,
                          tp_shard_attention=args.tp_shard_attention,
                          fsdp=args.fsdp,
                          mem_len=args.mem_len or None,
                          multiprocess=multiproc,
                          compiler_options=(json.loads(args.compiler_options)
                                            if args.compiler_options
                                            else None))

    sample = next(iter(train_it))[0]
    state = trainer.init_state(rng, sample)

    if args.pretrained_checkpoint:
        from bert_multimodal_transformer_tpu.utils.convert import (
            load_pretrained_into_params,
        )

        if use_pp:
            # the converter speaks the model layout; round-trip through
            # the trainer's family-specific conversion hooks
            template = trainer._from_pp(jax.device_get(state.params))
            params = trainer._to_pp(load_pretrained_into_params(
                template, args.pretrained_checkpoint, family=family))
        else:
            params = load_pretrained_into_params(
                state.params, args.pretrained_checkpoint, family=family)
        # place loaded params with the state's shardings (under TP/PP
        # these are per-leaf mesh shardings, not plain replication)
        param_shardings = jax.tree_util.tree_map(
            lambda a: a.sharding, state.params)
        state = state.replace(
            params=jax.device_put(params, param_shardings))

    if args.predict_only:
        import json as _json

        from bert_multimodal_transformer_tpu.data.pipeline import (
            convert_to_features,
            load_pickle_splits,
        )
        from bert_multimodal_transformer_tpu.serving import Predictor

        if not args.checkpoint_dir:
            print("error: --predict_only requires --checkpoint_dir",
                  file=sys.stderr)
            return 2
        from bert_multimodal_transformer_tpu.utils.checkpoint import (
            CheckpointManager as _CM,
        )

        _params = _CM(args.checkpoint_dir).restore_params()
        if _params is None:
            print(f"error: no checkpoint under {args.checkpoint_dir}",
                  file=sys.stderr)
            return 2
        if "prologue" in _params:
            # checkpoint written by a --pipeline_parallel run: stored in
            # the pipeline layout, serve in the model layout (the
            # prologue's keys identify the family)
            if "word_embedding" in _params["prologue"]:
                from bert_multimodal_transformer_tpu.parallel.pp_xlnet \
                    import xlnet_params_from_pp_params as _from_pp
            else:
                from bert_multimodal_transformer_tpu.parallel.pp import (
                    model_params_from_pp_params as _from_pp,
                )

            _params = _from_pp(_params)
        import jax.numpy as _jnp
        if args.wire_dtype == "float16":
            # fp16's max finite value is 65504 — unnormalized visual/
            # acoustic features beyond it overflow to inf on the wire and
            # silently corrupt predictions. Only bf16 (same exponent
            # range as fp32) is lossless for a bf16-compute model.
            print("warning: --wire_dtype float16 overflows to inf above "
                  "65504; it is NOT lossless on unnormalized features — "
                  "use bfloat16 unless your features are bounded",
                  file=sys.stderr)
        predictor = Predictor(
            model, _params, batch_size=args.test_batch_size,
            wire_dtype=(getattr(_jnp, args.wire_dtype)
                        if args.wire_dtype else None),
            mem_len=args.mem_len or None)
        data = load_pickle_splits(pickle_path)
        test_split = convert_to_features(
            data["test"], args.max_seq_length, tokenizer, family)
        scores = predictor.score_split(test_split, use_zero=args.use_zero)
        print(_json.dumps({"test_" + k: v for k, v in scores.items()}))
        return 0

    if args.save_every_steps and not args.checkpoint_dir:
        print("error: --save_every_steps requires --checkpoint_dir",
              file=sys.stderr)
        return 2

    ckpt = None
    start_epoch, start_batch, initial_history = 0, 0, None
    meta_path = (os.path.join(args.checkpoint_dir, "resume_meta.json")
                 if args.checkpoint_dir else None)
    jsonl_path = (os.path.join(args.checkpoint_dir, "metrics.jsonl")
                  if args.checkpoint_dir else None)
    if args.checkpoint_dir:
        from bert_multimodal_transformer_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        ckpt = CheckpointManager(args.checkpoint_dir)
        if not args.resume and ckpt.latest_step() is not None:
            # a fresh run into a directory holding another run's
            # checkpoints would let the save-dedup below skip saves and
            # publish a resume meta naming the OLD run's parameters
            print(f"error: --checkpoint_dir {args.checkpoint_dir} already "
                  f"contains checkpoints (latest step "
                  f"{ckpt.latest_step()}); pass --resume to continue that "
                  "run or use a fresh directory", file=sys.stderr)
            return 2
        if args.resume:
            meta = _read_resume_meta(meta_path)
            if meta is not None:
                # exact continuation: restore the state the meta names,
                # replay the data order, carry the completed epochs
                state = ckpt.restore(state, meta["state_step"])
                start_epoch = meta["start_epoch"]
                start_batch = meta["start_batch"]
                train_it.restore_position(meta["iter_shuffles_to_burn"])
                initial_history = _read_epoch_history(jsonl_path,
                                                      before=start_epoch)
                print(f"Resuming at epoch {start_epoch}, "
                      f"batch {start_batch} (step {meta['state_step']})")
            else:
                # legacy checkpoints (no meta): params-only warm resume
                state = ckpt.restore_latest(state) or state

    # non-zero processes train/eval in lockstep but stay silent: the
    # metric records are identical on every process (test_epoch
    # allgathers), so one writer suffices
    logger = (MetricLogger(project="MAG", config=vars(args),
                           jsonl_path=jsonl_path) if is_main else None)

    def _save(st, *, step, next_epoch, next_batch, burn):
        # durably save the state BEFORE publishing the meta that names it
        # (the dir is guaranteed free of foreign checkpoints above, so a
        # matching latest step can only be this run's own earlier save).
        # Every process participates in the save (Orbax rendezvous);
        # only process 0 publishes the meta.
        if ckpt.latest_step() != step:
            ckpt.save(st, step=step, wait=True)
        else:
            ckpt.wait_until_finished()
        if is_main:
            _write_resume_meta(meta_path, {
                "state_step": step, "start_epoch": next_epoch,
                "start_batch": next_batch, "iter_shuffles_to_burn": burn,
                "seed": args.seed})

    def save_epoch(st, epoch_i):
        if ckpt is not None:
            # resume into the next epoch with a fresh shuffle
            _save(st, step=int(st.step), next_epoch=epoch_i + 1,
                  next_batch=0, burn=train_it.shuffles_done)

    step_callback = None
    if ckpt is not None and args.save_every_steps > 0:
        # track the optimizer step host-side: int(st.step) is a device
        # fetch, and syncing every step would serialize the async
        # dispatch pipeline on the tunneled backend
        base_step = int(state.step)
        host_step = {"n": base_step}

        def step_callback(st, epoch_i, bi):
            host_step["n"] += 1
            if host_step["n"] % args.save_every_steps == 0:
                # resume mid-epoch: replay the current epoch's shuffle
                # (the last one drawn), skip the batches already trained
                _save(st, step=host_step["n"], next_epoch=epoch_i,
                      next_batch=bi + 1,
                      burn=train_it.shuffles_done - 1)

    state, _summary = trainer.train(
        state, train_it, dev_it, test_it, args.n_epochs, logger=logger,
        epoch_callback=save_epoch, use_zero=args.use_zero,
        start_epoch=start_epoch, start_batch=start_batch,
        initial_history=initial_history, step_callback=step_callback,
        max_steps=(args.max_steps or None))
    if ckpt is not None:
        ckpt.close()  # flush the async Orbax save before exit
    if args.export_hf and is_main:
        from bert_multimodal_transformer_tpu.utils.convert import (
            export_bert_state_dict,
            export_xlnet_state_dict,
        )

        import torch as _torch

        params_np = jax.device_get(state.params)
        if use_pp:
            params_np = trainer._from_pp(params_np)
        if is_xlnet:
            sd = export_xlnet_state_dict(params_np, cfg.n_layer)
        else:
            sd = export_bert_state_dict(params_np, cfg.num_hidden_layers)
        _torch.save({k: _torch.tensor(np.asarray(v))
                     for k, v in sd.items()}, args.export_hf)
        print(f"Exported HF-format weights to {args.export_hf}")
    if args.export_serving and is_main:
        from bert_multimodal_transformer_tpu import serving

        params_np = jax.device_get(state.params)
        if use_pp:
            params_np = trainer._from_pp(params_np)
        exported = serving.export_forward(
            model, params_np, seq_len=args.max_seq_length,
            visual_dim=ds.visual_dim, acoustic_dim=ds.acoustic_dim,
            platforms=("tpu", "cpu"))
        serving.save_artifact(
            args.export_serving, exported,
            meta={"family": "xlnet" if is_xlnet else "bert",
                  "model": args.model, "dataset": args.dataset})
        print(f"Exported serving artifact to {args.export_serving}")
    if logger is not None:
        logger.finish()
    return 0


def _write_resume_meta(path: str, meta: dict) -> None:
    import json as _json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, path)  # atomic: never a half-written meta


def _read_resume_meta(path):
    import json as _json

    if path is None or not os.path.exists(path):
        return None
    with open(path) as f:
        return _json.load(f)


def _read_epoch_history(jsonl_path, *, before: int):
    """Completed-epoch records from metrics.jsonl (appended across runs)
    so a resumed run's best_valid_loss/best_test_acc stay correct."""
    import json as _json

    if jsonl_path is None or not os.path.exists(jsonl_path):
        return None
    records = []
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = _json.loads(line)
            if rec.get("epoch") is not None and rec["epoch"] < before:
                records.append(rec)
    # latest run's record wins per epoch (restarts may duplicate epochs)
    by_epoch = {}
    for rec in records:
        by_epoch[rec["epoch"]] = rec
    return [by_epoch[e] for e in sorted(by_epoch)] or None


if __name__ == "__main__":
    sys.exit(main())
