"""Benchmark: MAG-BERT MOSI fine-tune training throughput (examples/sec/chip).

Runs the full jitted training step (forward + MSE + backward + AdamW) on the
flagship config — bert-base geometry, MOSI modality dims (47/74), seq 50 —
in bfloat16 on whatever accelerator JAX exposes, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "examples/sec/chip",
     "vs_baseline": N}

``vs_baseline`` compares against the measured PyTorch-reference-equivalent
throughput stored in BASELINE_measured.json (produced by
tools/measure_reference_baseline.py; the reference repo publishes no
numbers — BASELINE.md). Falls back to null if absent.
"""

import json
import os
import sys
import threading
import time

import numpy as np


def _install_watchdog(seconds: float):
    """The tunneled TPU backend can wedge indefinitely; fail loudly with a
    non-zero exit instead of hanging the harness. No JSON is printed on
    timeout — a fabricated number is worse than a missing one."""

    def fire():
        print(f"bench: watchdog timeout after {seconds:.0f}s "
              "(TPU backend unresponsive)", file=sys.stderr)
        os._exit(17)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _install_watchdog(
        float(os.environ.get("BENCH_TIMEOUT_S", "1800")))
    import jax

    # Persistent compilation cache: cold compiles through the tunnel take
    # 10-25 min; cached reruns start in seconds. Steps are timed after
    # warmup, so caching never affects the measurement.
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    # Hardware PRNG for dropout: threefry costs ~25% of the train step at
    # this geometry; rbg recovers most of it (same statistics, different
    # stream). Override with BENCH_RNG=threefry.
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_RNG", "rbg"))
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        MeshConfig,
        MultimodalConfig,
    )
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification,
    )
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
    from bert_multimodal_transformer_tpu.training.optim import make_optimizer
    from bert_multimodal_transformer_tpu.training.trainer import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    # BENCH_SEQ: sequence length. The reference truncates at 50; longer
    # values exercise the long-seq scaling story (fused dispatch:
    # full-H -> head-blocked -> flash-streamed; BENCH_ATTN=flash is the
    # dropout-free kernel, eval mode). Past max_position_embeddings=512
    # position ids clip (XLA gather) — identical compute, synthetic
    # positions; the CLI driver extends the table instead.
    seq = int(os.environ.get("BENCH_SEQ", "50"))
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))
    warmup = 5
    family = os.environ.get("BENCH_MODEL", "bert")  # "bert" | "xlnet"
    # BENCH_DATASET=mosei benches the MOSEI modality dims (visual 35 —
    # BASELINE config #4 pairs it with bert-large); default MOSI (47/74)
    from bert_multimodal_transformer_tpu.config import DatasetConfig

    ds = DatasetConfig.from_name(os.environ.get("BENCH_DATASET", "mosi"))

    mm = MultimodalConfig(
        beta_shift=1.0, dropout_prob=0.5,
        injection_index=1 if family == "xlnet" else 0,
        use_fused_kernel=os.environ.get("BENCH_FUSED_MAG", "0") == "1")
    if family == "xlnet":
        from bert_multimodal_transformer_tpu.config import XLNetConfig
        from bert_multimodal_transformer_tpu.models.xlnet import (
            MagXLNetForSequenceClassification,
        )

        cfg = XLNetConfig.xlnet_base_cased()
        # Fused Pallas rel-attention kernel is the fastest validated
        # XLNet path; BENCH_ATTN=einsum restores the plain path.
        # BENCH_REL_BIAS picks the score-bias assembly: the "auto"
        # default streams ebias while the full-H kernel fits (the S=50
        # headline, measured neutral) and assembles it in VMEM via the
        # ingredients flash-streamed tier past that fit (long S, ~2x —
        # BENCHMARKS.md "Ingredients flash-streamed tier");
        # stream/inkernel force a side.
        attn = os.environ.get("BENCH_ATTN", "fused")
        import dataclasses
        if attn != "einsum":
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        relb = os.environ.get("BENCH_REL_BIAS", "auto")
        cfg = dataclasses.replace(cfg, rel_bias_impl=relb)
        # BENCH_PACK_QKV=1 packs the q/k/v projection into one
        # [D, 3·H·Dh] dot — measured −3.8% at b256 (BENCHMARKS.md),
        # kept opt-in for re-measurement at other geometries.
        if os.environ.get("BENCH_PACK_QKV", "0") == "1":
            cfg = dataclasses.replace(cfg, pack_qkv=True)
        # BENCH_MEM_LEN=N: Transformer-XL segment recurrence — memory of
        # N positions carried across steps (K = seq + N in every layer;
        # reference xlnet.py:81-91). Exercises the rel fit gates on
        # K != Q geometries (head-blocked / flash-streamed dispatch).
        if int(os.environ.get("BENCH_MEM_LEN", "0")):
            cfg = dataclasses.replace(
                cfg, mem_len=int(os.environ["BENCH_MEM_LEN"]))
        model = MagXLNetForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim,
            acoustic_dim=ds.acoustic_dim, dtype=jnp.bfloat16,
            remat=os.environ.get("BENCH_REMAT", "0") == "1")
    else:
        cfg = (BertConfig.bert_large_uncased()
               if family == "bert-large" else
               BertConfig.bert_base_uncased())
        # Fused Pallas attention (in-VMEM softmax+dropout, save-probs
        # backward under the auto residual cap) is the fastest validated
        # path: 2917 ex/s vs 2642 (recompute bwd) vs ~2540 (einsum) at
        # this geometry. BENCH_ATTN=einsum for the plain path.
        attn = os.environ.get("BENCH_ATTN", "fused")
        if attn != "einsum":
            import dataclasses
            cfg = dataclasses.replace(cfg, attention_impl=attn)
        # BENCH_QKV_FUSION=1: QKV projection fused into the attention
        # kernel (opt-in pending timing; BENCH_QKV_RESIDUAL=1 saves the
        # VMEM-computed qkv instead of recomputing it in the backward)
        if os.environ.get("BENCH_QKV_FUSION", "0") == "1":
            import dataclasses
            cfg = dataclasses.replace(
                cfg, qkv_fusion=True,
                qkv_residual=os.environ.get("BENCH_QKV_RESIDUAL",
                                            "0") == "1")
        elif os.environ.get("BENCH_QKV_RESIDUAL", "0") == "1":
            raise SystemExit(
                "BENCH_QKV_RESIDUAL=1 without BENCH_QKV_FUSION=1 would "
                "silently benchmark the split path")
        model = MagBertForSequenceClassification(
            cfg, mm, visual_dim=ds.visual_dim,
            acoustic_dim=ds.acoustic_dim, dtype=jnp.bfloat16,
            remat=os.environ.get("BENCH_REMAT", "0") == "1",
            remat_policy=os.environ.get("BENCH_REMAT_POLICY", "full"))

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshConfig(data_parallel=n_dev))
    tx = make_optimizer(learning_rate=1e-5, num_train_steps=10000)
    mem_len = int(os.environ.get("BENCH_MEM_LEN", "0"))
    if mem_len and family != "xlnet":
        raise SystemExit(
            "BENCH_MEM_LEN requires BENCH_MODEL=xlnet (segment recurrence "
            "is XLNet's memory mechanism) — refusing to print a metric "
            "that silently ignored it")
    # BENCH_COMPILER_OPTIONS: JSON dict of XLA compile options applied to
    # every jitted step via jax.jit(compiler_options=...) — the reliable
    # per-program knob on this PJRT backend (LIBTPU_INIT_ARGS measured as
    # a no-op through the tunnel). E.g.
    #   BENCH_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib":"65536"}'
    copts = os.environ.get("BENCH_COMPILER_OPTIONS")
    trainer = Trainer(model=model, tx=tx, mesh=mesh, donate=True,
                      mem_len=mem_len or None,
                      compiler_options=json.loads(copts) if copts else None)

    rng = np.random.RandomState(0)
    host_batch = (
        rng.randint(0, cfg.vocab_size, (batch, seq)).astype(np.int32),
        rng.randn(batch, seq, ds.visual_dim).astype(np.float32),
        rng.randn(batch, seq, ds.acoustic_dim).astype(np.float32),
        np.ones((batch, seq), np.int32),
        np.zeros((batch, seq), np.int32),
        rng.uniform(-3, 3, (batch,)).astype(np.float32),
    )

    state = trainer.init_state(jax.random.PRNGKey(0), host_batch)
    dev_batch = trainer._put_batch(host_batch)

    if os.environ.get("BENCH_MODE", "train") == "eval":
        # Serving/inference throughput: the jitted predict step (forward
        # only, dropout off) chained through a running scalar so each
        # step depends on the last (honest sync; see NOTE below).
        import jax.numpy as jnp2

        # state passed as an ARGUMENT (closing over it would bake the
        # params into the HLO as constants — 400+ MB through the tunnel)
        @jax.jit
        def pred_chain(state_, carry, batch_):
            ids = batch_[0] + (carry * 0).astype(batch_[0].dtype)
            preds, _ = trainer._predict_step(
                state_, (ids,) + tuple(batch_[1:]))
            return jnp2.sum(preds.astype(jnp2.float32)) * 1e-30

        @jax.jit
        def pred_chain_mems(state_, carry, batch_, mems_):
            ids = batch_[0] + (carry * 0).astype(batch_[0].dtype)
            preds, _, new_mems = trainer._predict_step_mems(
                state_, (ids,) + tuple(batch_[1:]), mems_)
            return (jnp2.sum(preds.astype(jnp2.float32)) * 1e-30,
                    new_mems)

        carry = jnp2.zeros((), jnp2.float32)
        mems = trainer._init_mems(host_batch) if mem_len else None
        for _ in range(warmup):
            if mem_len:
                carry, mems = pred_chain_mems(state, carry, dev_batch,
                                              mems)
            else:
                carry = pred_chain(state, carry, dev_batch)
        float(jax.device_get(carry))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            if mem_len:
                carry, mems = pred_chain_mems(state, carry, dev_batch,
                                              mems)
            else:
                carry = pred_chain(state, carry, dev_batch)
        float(jax.device_get(carry))
        dt = time.perf_counter() - t0
        per_chip = batch * n_steps / dt / len(jax.devices())
        watchdog.cancel()
        model_name = {"xlnet": "xlnet-base",
                      "bert-large": "bert-large"}.get(family, "bert-base")
        print(json.dumps({
            "metric": f"MOSI MAG-{family.upper()} inference throughput "
                      f"({model_name}, batch {batch}, seq {seq}"
                      + (f", mem {mem_len}" if mem_len else "")
                      + f", bf16, {len(jax.devices())} chip(s))",
            "value": round(per_chip, 2),
            "unit": "examples/sec/chip",
            "vs_baseline": None,
        }))
        return

    mems = trainer._init_mems(host_batch) if mem_len else None
    for _ in range(warmup):
        if mem_len:
            state, loss, mems = trainer._train_step_mems(state, dev_batch,
                                                         mems)
        else:
            state, loss = trainer._train_step(state, dev_batch)
    float(jax.device_get(loss))

    # BENCH_TRACE=<dir>: capture a jax.profiler device trace of a few
    # timed steps for attribution (tools/analyze_trace.py <dir> groups
    # it per category/source-line/phase). The traced window is separate
    # from the timed window so the metric stays untouched by tracing
    # overhead.
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        for _ in range(int(os.environ.get("BENCH_TRACE_STEPS", "2"))):
            if mem_len:
                state, loss, mems = trainer._train_step_mems(
                    state, dev_batch, mems)
            else:
                state, loss = trainer._train_step(state, dev_batch)
        float(jax.device_get(loss))
        jax.profiler.stop_trace()

    # NOTE: synchronize by fetching the final loss VALUE. On the tunneled
    # TPU backend, block_until_ready returns before remote execution
    # completes, inflating throughput ~50x; device_get of the last loss
    # forces the whole step chain (each step consumes the previous params).
    t0 = time.perf_counter()
    for _ in range(n_steps):
        if mem_len:
            state, loss, mems = trainer._train_step_mems(state, dev_batch,
                                                         mems)
        else:
            state, loss = trainer._train_step(state, dev_batch)
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0

    examples_per_sec = batch * n_steps / dt
    per_chip = examples_per_sec / n_dev

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_measured.json")
    # The measured baseline is the torch reference at ITS geometry
    # (seq 50, multimodal_driver.py:45); a per-example multiple at a
    # different sequence length would be apples-to-oranges, so long-seq
    # runs report vs_baseline: null like eval mode does.
    if os.path.exists(baseline_path) and seq == 50 and not mem_len:
        try:
            with open(baseline_path) as f:
                base = json.load(f)
            ref = base.get("examples_per_sec_per_chip")
            if ref:
                vs_baseline = per_chip / ref
        except Exception:
            pass

    watchdog.cancel()
    model_name = {"xlnet": "xlnet-base",
                  "bert-large": "bert-large"}.get(family, "bert-base")
    record = {
        "metric": f"MOSI MAG-{family.upper()} fine-tune train-step "
                  f"throughput ({model_name}, batch {batch}, seq {seq}"
                  + (f", mem {mem_len}" if mem_len else "")
                  + f", bf16, {n_dev} chip(s))",
        "value": round(per_chip, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    if vs_baseline:
        # Keep the multiple honest: the measured baseline is the torch
        # reference on THIS box's CPU (the repo publishes no GPU numbers,
        # BASELINE.md); vs a typical 2019-era single GPU fine-tuning
        # bert-base (~150-400 ex/s) this config is ~8-22x (BENCHMARKS.md).
        record["baseline_note"] = (
            "torch reference on this host's CPU "
            "(BASELINE_measured.json); est. 2019-GPU band ~"
            f"{per_chip / 400:.0f}-{per_chip / 150:.0f}x")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
