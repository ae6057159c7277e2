#!/bin/bash
# Round-3 long-sequence scaling measurements: the reference truncates at
# seq 50 (multimodal_driver.py:45 max_seq_length); this framework carries
# a flash-attention backend (ops/attention.py, official Pallas blockwise
# kernel, O(S) memory) precisely for the long-seq regime. Measure it at
# S=512 (bert-base max_position_embeddings) against the fused short-seq
# kernel and the einsum path, eval mode (flash engages when dropout is
# off) and train mode (fused vs einsum; flash has no prob-dropout).
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3e_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3e_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3e_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3e_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

E="env BENCH_SEQ=512 BENCH_BATCH=32"
run ls512_eval_flash 2500 $E BENCH_MODE=eval BENCH_ATTN=flash python bench.py
run ls512_eval_fused 2500 $E BENCH_MODE=eval BENCH_ATTN=fused python bench.py
run ls512_eval_einsum 2500 $E BENCH_MODE=eval BENCH_ATTN=einsum python bench.py
run ls512_train_fused 2500 $E BENCH_ATTN=fused python bench.py
run ls512_train_einsum 2500 $E BENCH_ATTN=einsum python bench.py

if [ -n "$FAILED" ]; then echo "R3E DONE, FAILED STAGES:$FAILED"; else echo "R3E ALL OK"; fi
