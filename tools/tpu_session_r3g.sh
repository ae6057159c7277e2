#!/bin/bash
# Round-3 follow-on 2: head-blocked REL attention (XLNet twin of r3f).
# Before this change the XLNet fused dispatch had no VMEM-fit gate at
# all — S=512 (or long mems: K includes mem_len) failed to compile.
# Stages:
#   canary2            — fused-attention hardware checks incl. the new
#                        rel head-blocked section (2f)
#   xl_headline        — bench.py xlnet default at S=50 (regression
#                        guard: the gate must still pick the full-H
#                        kernel at the hot geometry)
#   xl512_train_fused  — xlnet-base S=512 b32 train, fused rel
#                        (head-blocked, streamed ebias)
#   xl512_train_einsum — einsum baseline at the same geometry
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3g_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3g_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3g_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3g_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run canary2 2500 python tools/check_fused_attention_tpu.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py
run xl512_train_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run xl512_train_einsum 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_BATCH=32 BENCH_ATTN=einsum python bench.py

if [ -n "$FAILED" ]; then echo "R3G DONE, FAILED STAGES:$FAILED"; else echo "R3G ALL OK"; fi
