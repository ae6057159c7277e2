#!/bin/bash
# Round-4 session C: re-fly the one r4b failure after the fix.
#   r4b's mems_s50_m512_fused stage OOM'd scoped VMEM in the full-H rel
#   SAVED backward (16.41 MB vs the 16 MB limit at Q=50, K=562, b32 —
#   the block model summed to 14.8 MB; 5th instance of the Mosaic
#   non-closed-form class). Fix: _resolve_rel_full_plan compile-probes
#   the full-H residual mode and demotes auto-saved → recompute (then
#   hb → fs → einsum) on failure.
#   mems_s50_m512_fused — the exact failed stage; expect the probe to
#                         demote to the recompute backward and train
#   xl_headline         — S=50 regression: the probe is now on the
#                         XLNet production path; confirm ≥~2600
#   mems_s50_m512_eval_fused — eval regression at the fixed geometry
#                         (the primal ignores the residual mode; the
#                         number must not move)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r4c_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r4c_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r4c_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r4c_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run mems_s50_m512_fused 2500 env BENCH_MODEL=xlnet BENCH_MEM_LEN=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py
run mems_s50_m512_eval_fused 2500 env BENCH_MODE=eval BENCH_MODEL=xlnet BENCH_MEM_LEN=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py

if [ -n "$FAILED" ]; then echo "R4C DONE, FAILED STAGES:$FAILED"; else echo "R4C ALL OK"; fi
