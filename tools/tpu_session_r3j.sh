#!/bin/bash
# Round-3 follow-on 5: hardware-validate the REL compile-probe dispatch
# (r3i only covered the packed path; _resolve_rel_hb_plan and the
# xlnet.py gate change are new code).
#   canary3       — tools/check_fused_attention_tpu.py: full kernel
#                   canary incl. the rel head-blocked sections (2f)
#                   through the probed dispatch
#   xl512_regress — XLNet S=512 b32 train fused: the probe must keep
#                   the validated rel hb=2 plan (116.7 ex/s pre-probe)
#   headline      — bench bert S=50 (full-H fit short-circuits the
#                   probe: 38xx expected) and xlnet S=50 (26xx)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3j_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3j_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3j_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3j_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run canary3 2500 python tools/check_fused_attention_tpu.py
run xl512_regress 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run headline_bert 2500 python bench.py
run headline_xlnet 2500 env BENCH_MODEL=xlnet python bench.py

if [ -n "$FAILED" ]; then echo "R3J DONE, FAILED STAGES:$FAILED"; else echo "R3J ALL OK"; fi
