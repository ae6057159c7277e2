#!/bin/bash
# Round-4 session B (after r4a): XLNet segment-recurrence measurements
# (VERDICT r3 #4 — the mems surface exercising the rel fit gates on
# K = qlen + mlen) and the flash-streamed-tier hardware trajectory
# bounds (VERDICT r3 #7).
#   mems_*         — BENCH_MEM_LEN train/eval A/Bs: qlen 50 / mlen 512
#                    (long memory at the reference geometry) and
#                    qlen 512 / mlen 512 (K=1024 — the head-blocked/
#                    flash-streamed rel dispatch region)
#   traj_fs_*      — tools/exp_fused_vs_einsum_traj.py at S=768: N-step
#                    fused(fs)-vs-einsum loss-trajectory bound, both
#                    families (the fs tier's numerics ledger entry)
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r4b_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r4b_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r4b_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r4b_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run mems_s50_m512_fused 2500 env BENCH_MODEL=xlnet BENCH_MEM_LEN=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run mems_s50_m512_einsum 2500 env BENCH_MODEL=xlnet BENCH_MEM_LEN=512 BENCH_BATCH=32 BENCH_ATTN=einsum python bench.py
run mems_s50_m512_eval_fused 2500 env BENCH_MODE=eval BENCH_MODEL=xlnet BENCH_MEM_LEN=512 BENCH_BATCH=32 BENCH_ATTN=fused python bench.py
run mems_s512_m512_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_MEM_LEN=512 BENCH_BATCH=8 BENCH_ATTN=fused python bench.py
run mems_s512_m512_einsum 2500 env BENCH_MODEL=xlnet BENCH_SEQ=512 BENCH_MEM_LEN=512 BENCH_BATCH=8 BENCH_ATTN=einsum python bench.py
run mems_e2e 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 16 --synthetic_sizes 48 16 16 --seed 42 \
    --mem_len 256 --attention_impl fused
run ls768_eval_fused 2500 env BENCH_MODE=eval BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=fused python bench.py
run ls768_eval_flash 2500 env BENCH_MODE=eval BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=flash python bench.py
run traj_fs_bert 2500 env BENCH_SEQ=768 BENCH_BATCH=8 BENCH_STEPS=12 python tools/exp_fused_vs_einsum_traj.py
run traj_fs_xlnet 2500 env BENCH_MODEL=xlnet BENCH_SEQ=768 BENCH_BATCH=8 BENCH_STEPS=12 python tools/exp_fused_vs_einsum_traj.py

if [ -n "$FAILED" ]; then echo "R4B DONE, FAILED STAGES:$FAILED"; else echo "R4B ALL OK"; fi
