#!/bin/bash
# Round-5 session C: extend the long-sequence scaling table past S=1024
# (the flash-streamed tier claims any 128-divisible S — measure the
# claim at 30-40x the reference's 50-token truncation), headline
# regression front-loaded per discipline.
#   headline       — bench bert S=50 regression (warm cache)
#   ls1536_fused   — S=1536 b4 train, flash-streamed kernels
#   ls1536_einsum  — S=1536 b4 train, einsum A/B (expected OOM/crawl)
#   ls2048_fused   — S=2048 b4 train
#   ls2048_einsum  — S=2048 b4 train A/B
#   xl2048_fused   — XLNet Q=K=2048 b4 train, rel flash-streamed
# Sentinel/resume harness as tpu_session_r3.sh: /tmp/r5c_<stage>.ok
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r5c_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r5c_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r5c_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r5c_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run headline 2500 python bench.py
run ls1536_fused 2500 env BENCH_SEQ=1536 BENCH_BATCH=4 BENCH_ATTN=fused python bench.py
run ls1536_einsum 2500 env BENCH_SEQ=1536 BENCH_BATCH=4 BENCH_ATTN=einsum python bench.py
run ls2048_fused 2500 env BENCH_SEQ=2048 BENCH_BATCH=4 BENCH_ATTN=fused python bench.py
run ls2048_einsum 2500 env BENCH_SEQ=2048 BENCH_BATCH=4 BENCH_ATTN=einsum python bench.py
run xl2048_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=2048 BENCH_BATCH=4 BENCH_ATTN=fused python bench.py

if [ -n "$FAILED" ]; then echo "R5C DONE, FAILED STAGES:$FAILED"; else echo "R5C ALL OK"; fi
