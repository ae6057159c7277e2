#!/bin/bash
# Round-3 follow-on: the packed q/k/v projection A/B for XLNet
# (XLNetConfig.pack_qkv, models/xlnet.py) plus the tiny CLI e2e that
# drives the changed path through the real user surface.
#   e2e_xlnet_tiny  — driver run, xlnet family, fused attention (packed
#                     qkv path end-to-end on hardware)
#   xl_packed       — bench.py xlnet default (pack_qkv=True, new program)
#   xl_split        — BENCH_PACK_QKV=0 (the pre-change program, cached
#                     from the r3 session) for a same-session A/B
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3d_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3d_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3d_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3d_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run e2e_xlnet_tiny 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --dataset mosi --synthetic --tiny \
    --n_epochs 2 --train_batch_size 16 --synthetic_sizes 64 16 16 \
    --seed 42 --attention_impl fused
run xl_packed 2500 env BENCH_MODEL=xlnet python bench.py
run xl_split 2500 env BENCH_MODEL=xlnet BENCH_PACK_QKV=0 python bench.py

if [ -n "$FAILED" ]; then echo "R3D DONE, FAILED STAGES:$FAILED"; else echo "R3D ALL OK"; fi
