#!/bin/bash
# Round-3 follow-on 4: validate the compile-probed hb dispatch on
# hardware.
#   e2e_s320          — the EXACT config that failed r3h (fwd 16.04 MB
#                       scoped OOM): must now train via the probe-walked
#                       plan (hb=6, nb_fwd=2, nb_bwd=1)
#   ls512_regress     — S=512 b32 train fused: the probe keeps the
#                       validated (hb=4, nb_fwd=4, nb_bwd=1) plan, so
#                       296 ex/s must not regress
#   ls640_fused/einsum— S=640 b16: new reach the probe table unlocked
#                       (bwd compiles at hb=2 there; beyond, S=768 bwd
#                       measured 16.10 MB and the dispatch now degrades)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3i_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3i_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3i_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3i_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run e2e_s320 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 8 --synthetic_sizes 32 8 8 --seed 42 \
    --max_seq_length 320 --attention_impl fused
run ls512_regress 2500 env BENCH_SEQ=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run ls640_fused 2500 env BENCH_SEQ=640 BENCH_BATCH=16 BENCH_ATTN=fused python bench.py
run ls640_einsum 2500 env BENCH_SEQ=640 BENCH_BATCH=16 BENCH_ATTN=einsum python bench.py

if [ -n "$FAILED" ]; then echo "R3I DONE, FAILED STAGES:$FAILED"; else echo "R3I ALL OK"; fi
