#!/bin/bash
# Round-3 follow-on 7: hardware-validate the REL flash-streamed tier
# (XLNet long-seq: canary section 2h + S=1024 train A/B, where the rel
# hb kernels cannot compile and the pre-fs dispatch fell to einsum).
#   canary5          — full kernel canary incl. 2g (packed fs) and 2h
#                      (rel fs) sections
#   xl1024_fused/einsum — XLNet S=1024 b8 train A/B
#   xl_headline      — bench xlnet S=50 regression (26xx expected)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3l_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3l_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3l_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3l_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run canary5 2500 python tools/check_fused_attention_tpu.py
run xl1024_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=fused python bench.py
run xl1024_einsum 2500 env BENCH_MODEL=xlnet BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=einsum python bench.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py

if [ -n "$FAILED" ]; then echo "R3L DONE, FAILED STAGES:$FAILED"; else echo "R3L ALL OK"; fi
