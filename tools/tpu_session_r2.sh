#!/bin/bash
# One-shot TPU measurement session for the REMAINING round-2 pending work.
# (The 2026-08-18 window already landed: bert/xlnet regression benches,
# relik + qkvproj hardware canaries, the inkernel and qkv_fusion A/Bs —
# results in BENCHMARKS.md / NOTES_ROUND2.md. Stages below are what's
# left; each logs to /tmp/r2_*.log. A dead tunnel aborts the session.)
# TPU runs serialize — never run anything else on the TPU while this is up.
set -x
cd "$(dirname "$0")/.."

export BENCH_TIMEOUT_S=2100
FAILED=""

ping_tpu() {
    timeout 240 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
        >/dev/null 2>&1 || { echo "TUNNEL DEAD — aborting session (done: see /tmp/r2_*.log)"; exit 1; }
}

run() { name=$1; shift
    ping_tpu
    if timeout 2200 "$@" >"/tmp/r2_${name}.log" 2>&1; then
        echo "stage ${name} ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

# 1. MOSEI-scale full-geometry convergence (skip if already recorded in
#    BENCHMARKS.md — grep for "MOSEI-scale convergence").
#    Needs .artifacts/bert_base_v128.bin (tools/make_warm_start_checkpoint.py).
if ! grep -q "MOSEI-scale convergence" BENCHMARKS.md; then
    [ -f .artifacts/bert_base_v128.bin ] || \
        python tools/make_warm_start_checkpoint.py
    ping_tpu
    if timeout 3000 python -m bert_multimodal_transformer_tpu.driver \
        --model bert-base-uncased --dataset mosei --synthetic \
        --synthetic_sizes 16265 1869 4643 --n_epochs 2 --train_batch_size 48 \
        --seed 42 --pretrained_checkpoint .artifacts/bert_base_v128.bin \
        --attention_impl fused >/tmp/r2_e2e_mosei.log 2>&1; then
        echo "stage e2e_mosei ok"
    else
        echo "STAGE e2e_mosei FAILED (rc=$?)"; FAILED="$FAILED e2e_mosei"
    fi
fi

# 2. bert-large device-trace re-capture (the roofline section in
#    BENCHMARKS.md scales a pre-head-batching trace; capture a fresh one).
run blarge_trace env BENCH_MODEL=bert-large BENCH_BATCH=128 \
    python tools/profile_train_step.py

# 3. Regression benches (cheap when the persistent cache is warm).
run bench_bert python bench.py
run bench_large env BENCH_MODEL=bert-large BENCH_BATCH=128 python bench.py

if [ -n "$FAILED" ]; then echo "SESSION DONE, FAILED STAGES:$FAILED"; else echo "ALL STAGES OK"; fi
