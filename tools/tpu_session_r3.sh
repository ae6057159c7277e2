#!/bin/bash
# One-shot TPU measurement session for round 3 (VERDICT r2 next-items
# 2, 3, 4, 5, 6). Stages ordered by priority; each logs to /tmp/r3_*.log
# and drops /tmp/r3_*.ok on success, so re-running the script resumes
# from the first incomplete stage. Pings retry 3× (a single 240 s ping
# can time out under host-core contention while the tunnel is fine).
# Cold compiles through the tunnel take 10-25 min per new program
# (persistent cache at /tmp/jax_tpu_cache).
# TPU runs serialize — never run anything else on the TPU while this is up.
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r3_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r3_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r3_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r3_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

# 0. Headline regression bench (also warms the cache for the driver's
#    end-of-round bench).
run bench_bert 2500 python bench.py

# 1. MOSEI-scale full-geometry convergence (VERDICT next #2).
#    Needs .artifacts/bert_base_v128.bin (tools/make_warm_start_checkpoint.py).
[ -f .artifacts/bert_base_v128.bin ] || \
    python tools/make_warm_start_checkpoint.py
run e2e_mosei 3000 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosei --synthetic \
    --synthetic_sizes 16265 1869 4643 --n_epochs 2 --train_batch_size 48 \
    --seed 42 --pretrained_checkpoint .artifacts/bert_base_v128.bin \
    --attention_impl fused

# 2. XLNet full-geometry convergence, MOSI-scale, warm start (VERDICT next #3).
[ -f .artifacts/xlnet_base_v128.bin ] || \
    python tools/make_warm_start_checkpoint.py .artifacts/xlnet_base_v128.bin 128 xlnet
run e2e_xlnet 3000 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --synthetic \
    --synthetic_sizes 1281 229 685 --n_epochs 5 --train_batch_size 48 \
    --seed 42 --pretrained_checkpoint .artifacts/xlnet_base_v128.bin \
    --attention_impl fused

# 3. XLNet step attribution: device trace at xlnet-base b256 fused
#    (VERDICT next #4) + the matching regression bench.
run xlnet_trace 2500 env BENCH_MODEL=xlnet \
    python tools/profile_train_step.py /tmp/mag_trace_xlnet 256
run bench_xlnet 2500 env BENCH_MODEL=xlnet python bench.py

# 4. Batch-scaling inversion: traces at b512/b1024 on the packed fused
#    path (VERDICT next #5) + matching benches.
run b512_trace 2500 python tools/profile_train_step.py /tmp/mag_trace_b512 512
run b1024_trace 2500 python tools/profile_train_step.py /tmp/mag_trace_b1024 1024
run bench_b512 2500 env BENCH_BATCH=512 python bench.py
run bench_b1024 2500 env BENCH_BATCH=1024 python bench.py

# 5. bert-large device-trace re-capture at the intended batch 128
#    (VERDICT next #2b; batch passed POSITIONALLY — profile_train_step.py
#    does not read BENCH_BATCH) + regression bench.
run blarge_trace 2500 env BENCH_MODEL=bert-large \
    python tools/profile_train_step.py /tmp/mag_trace_blarge 128
run bench_large 2500 env BENCH_MODEL=bert-large BENCH_BATCH=128 python bench.py

# 6. Model-level fused-vs-einsum bf16 trajectory bound (VERDICT next #6):
#    20 steps, dropout off, full base geometry, both families.
run traj_bert 3000 python tools/exp_fused_vs_einsum_traj.py
run traj_xlnet 3000 env BENCH_MODEL=xlnet python tools/exp_fused_vs_einsum_traj.py

if [ -n "$FAILED" ]; then echo "SESSION DONE, FAILED STAGES:$FAILED"; else echo "ALL STAGES OK"; fi
