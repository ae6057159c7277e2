#!/bin/bash
# Round-3 follow-on 3: long-seq generality + serving peaks.
#   blarge512_train   — bert-large (H=16) S=512 b16 train, head-blocked
#                       fused (generality of _resolve_hb beyond H=12)
#   blarge512_einsum  — einsum baseline at the same geometry
#   xl512_eval_fused  — xlnet-base S=512 b32 eval (serving, rel hb)
#   eval_b512/b1024   — bert-base S=50 serving throughput at larger
#                       batches (the 8733 ex/s number is b256)
#   e2e_s320          — driver e2e at --max_seq_length 320 fused: the
#                       region the old fwd-only fit check would have
#                       routed onto a backward that cannot compile
# Same sentinel/resume harness as tpu_session_r3.sh.
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3h_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3h_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3h_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3h_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run blarge512_train 2500 env BENCH_MODEL=bert-large BENCH_SEQ=512 BENCH_BATCH=16 BENCH_ATTN=fused python bench.py
run blarge512_einsum 2500 env BENCH_MODEL=bert-large BENCH_SEQ=512 BENCH_BATCH=16 BENCH_ATTN=einsum python bench.py
run xl512_eval_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_BATCH=32 BENCH_MODE=eval BENCH_ATTN=fused python bench.py
run xl512_eval_einsum 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_BATCH=32 BENCH_MODE=eval BENCH_ATTN=einsum python bench.py
run eval_b512 2500 env BENCH_MODE=eval BENCH_BATCH=512 python bench.py
run eval_b1024 2500 env BENCH_MODE=eval BENCH_BATCH=1024 python bench.py
# full bert-base geometry (NOT --tiny: the tiny preset's d_head=16
# cannot head-block, so only the production geometry drives the hb
# routing end-to-end through the driver)
run e2e_s320 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 8 --synthetic_sizes 32 8 8 --seed 42 \
    --max_seq_length 320 --attention_impl fused

run int8_probe 2500 python tools/microbench_int8.py

if [ -n "$FAILED" ]; then echo "R3H DONE, FAILED STAGES:$FAILED"; else echo "R3H ALL OK"; fi
