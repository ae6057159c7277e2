#!/bin/bash
# Round-3 follow-on 6: hardware-validate the flash-streamed (fs)
# fused-attention tier (online softmax over kb blocks, in-kernel
# dropout replay — the S>640 regime where the head-blocked kernels
# stop compiling and training previously degraded to einsum).
#   canary4        — tools/check_fused_attention_tpu.py incl. the new
#                    2g fs section (S=768 parity, same-seed replay, FD
#                    through the stochastic graph)
#   e2e_s768       — full CLI train at --max_seq_length 768 fused (the
#                    geometry whose fused path previously didn't exist)
#   ls768_fused/einsum   — S=768 b16 train A/B
#   ls1024_fused/einsum  — S=1024 b8 train A/B (einsum expected to OOM
#                          or crawl; fused is O(S) memory in attention)
#   headline       — bench bert S=50 regression (38xx expected; the fs
#                    tier must not perturb the short-seq dispatch)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3k_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3k_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3k_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3k_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run canary4 2500 python tools/check_fused_attention_tpu.py
run e2e_s768 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 8 --synthetic_sizes 32 8 8 --seed 42 \
    --max_seq_length 768 --attention_impl fused
run ls768_fused 2500 env BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=fused python bench.py
run ls768_einsum 2500 env BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=einsum python bench.py
run ls1024_fused 2500 env BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=fused python bench.py
run ls1024_einsum 2500 env BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=einsum python bench.py
run headline 2500 python bench.py

if [ -n "$FAILED" ]; then echo "R3K DONE, FAILED STAGES:$FAILED"; else echo "R3K ALL OK"; fi
