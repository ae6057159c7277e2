#!/bin/bash
# Round-3 follow-on: head-blocked fused attention for long sequences
# (ops/fused_attention.py::_resolve_hb — [hb,S,S] scratch grid carries
# the fused path through S=768 where the full-H kernel exceeds scoped
# VMEM). Stages:
#   canary             — full fused-attention hardware checks incl. the
#                        new S=512 head-blocked section (2e)
#   bench_headline     — bench.py default (regression guard: the S=50
#                        dispatch must still pick the full-H kernel)
#   ls512_train_fused  — S=512 b32 train, fused (head-blocked, dropout
#                        in-kernel, recompute bwd — nothing S² in HBM)
#   ls512_train_einsum — S=512 b32 train, einsum baseline (streams the
#                        saved prob residuals)
#   ls512_eval_fused   — S=512 b32 eval, fused (hb primal; r3e recorded
#                        flash 427 / einsum 454 ex/s for comparison)
#   ls512_train_{fused,einsum}_b64 — memory headroom probe: fused hb
#                        keeps nothing of size S² in HBM; einsum may OOM
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3f_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3f_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3f_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3f_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

E="env BENCH_SEQ=512 BENCH_BATCH=32"
run canary 2500 python tools/check_fused_attention_tpu.py
run bench_headline 2500 python bench.py
run ls512_train_fused 2500 $E BENCH_ATTN=fused python bench.py
run ls512_train_einsum 2500 $E BENCH_ATTN=einsum python bench.py
run ls512_eval_fused 2500 $E BENCH_MODE=eval BENCH_ATTN=fused python bench.py
run ls512_train_fused_b64 2500 env BENCH_SEQ=512 BENCH_BATCH=64 BENCH_ATTN=fused python bench.py
run ls512_train_einsum_b64 2500 env BENCH_SEQ=512 BENCH_BATCH=64 BENCH_ATTN=einsum python bench.py

if [ -n "$FAILED" ]; then echo "R3F DONE, FAILED STAGES:$FAILED"; else echo "R3F ALL OK"; fi
