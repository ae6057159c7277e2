#!/bin/bash
# Round-5 session A: headline regressions front-loaded (established
# discipline), then the two stale headline-table rows (VERDICT r4 weak
# #5), then the XLNet MOSEI-scale convergence run (VERDICT r4 next #7).
#   headline     — bench bert S=50 regression (>=~3850 expected)
#   xl_headline  — bench xlnet S=50 regression (>=~2600 expected)
#   blarge_b256  — bert-large b256 re-measure (BENCHMARKS.md:36 was
#                  pre-head-batching: 1005 ex/s)
#   xl_b512      — xlnet b512 re-measure (BENCHMARKS.md:575 predates the
#                  r4 kernel/dispatch changes: 2466 ex/s)
#   xl_mosei     — MAG-XLNet at MOSEI split sizes (16265/1869/4643),
#                  2 epochs, batch 48, warm start, fused rel-attention —
#                  completes the convergence matrix (BERT has MOSI+MOSEI,
#                  XLNet had only MOSI)
# Sentinel/resume harness as tpu_session_r3.sh: /tmp/r5a_<stage>.ok
set -x
cd "$(dirname "$0")/.."

export BENCH_TIMEOUT_S=2400
FAILED=""

ping_tpu() {
    for _ in 1 2 3; do
        timeout 300 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
            >/dev/null 2>&1 && return 0
        sleep 20
    done
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r5a_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r5a_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r5a_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r5a_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run headline 2500 python bench.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py
run blarge_b256 2500 env BENCH_MODEL=bert-large BENCH_BATCH=256 python bench.py
run xl_b512 2500 env BENCH_MODEL=xlnet BENCH_BATCH=512 python bench.py

# warm-start checkpoint is CPU-side torch; build before touching the TPU
[ -f .artifacts/xlnet_base_v128.bin ] || \
    python tools/make_warm_start_checkpoint.py .artifacts/xlnet_base_v128.bin 128 xlnet
run xl_mosei 3600 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --dataset mosei --synthetic \
    --synthetic_sizes 16265 1869 4643 --n_epochs 2 --train_batch_size 48 \
    --seed 42 --pretrained_checkpoint .artifacts/xlnet_base_v128.bin \
    --attention_impl fused

if [ -n "$FAILED" ]; then echo "R5A DONE, FAILED STAGES:$FAILED"; else echo "R5A ALL OK"; fi
