#!/bin/bash
# Follow-on TPU stages for round 3: the fused-BERT b256 device trace
# needed to compare per-batch GEMM efficiency against the b512/b1024
# traces (batch-scaling inversion, VERDICT r2 next #5) and against the
# XLNet b256 trace (XLNet attribution, VERDICT r2 next #4). The b256
# train-step program is already in the persistent compile cache from
# bench_bert, so this stage is minutes, not tens of minutes.
# Same sentinel/resume harness as tpu_session_r3.sh.
set -x
cd "$(dirname "$0")/.."

FAILED=""

ping_tpu() {
    for _ in 1 2 3; do
        timeout 300 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
            >/dev/null 2>&1 && return 0
        sleep 20
    done
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3b_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3b_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3b_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3b_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run bert_trace 2500 python tools/profile_train_step.py /tmp/mag_trace_b256 256

if [ -n "$FAILED" ]; then echo "R3B DONE, FAILED STAGES:$FAILED"; else echo "R3B ALL OK"; fi
