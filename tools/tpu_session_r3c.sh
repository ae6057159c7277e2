#!/bin/bash
# Round-3 batch-scaling recovery experiments (VERDICT r2 next #5).
# The b1024 device trace shows the fwd FFN GEMM at 3.4x its b512 time with
# its weight operand rebuilt per layer via ConcatBitcast from sliced async
# DMA out of alternate memory (S(1)) — the signature of XLA spilling under
# HBM pressure: the plain step saves TWO bf16[1024,50,3072] residuals per
# layer (GELU input + output, ~7.5 GB for 12 layers) plus attention/qkv
# residuals. Hypotheses A/B'd here:
#   1. remat policy "dots" (save matmul outputs, recompute elementwise)
#      halves the FFN residual family -> no spill -> faster b1024 despite
#      the recompute flops.
#   2. full remat — lowest memory, most recompute, for reference.
#   3. FUSED_ATTN_SAVE=1 at b1024 — isolates the prob-recompute penalty
#      (~9 ms by trace) but ADDS 4.8 GB of residuals; expected to spill
#      harder. Measured to close the question.
#   4. dots remat at b512 — does reducing residual pressure help where
#      only activations (not weights) sit in S(1)?
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3c_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3c_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3c_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3c_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run b1024_dots 2500 env BENCH_BATCH=1024 BENCH_REMAT=1 BENCH_REMAT_POLICY=dots python bench.py
run b1024_full 2500 env BENCH_BATCH=1024 BENCH_REMAT=1 BENCH_REMAT_POLICY=full python bench.py
run b1024_save 2500 env BENCH_BATCH=1024 FUSED_ATTN_SAVE=1 python bench.py
run b512_dots 2500 env BENCH_BATCH=512 BENCH_REMAT=1 BENCH_REMAT_POLICY=dots python bench.py

if [ -n "$FAILED" ]; then echo "R3C DONE, FAILED STAGES:$FAILED"; else echo "R3C ALL OK"; fi
