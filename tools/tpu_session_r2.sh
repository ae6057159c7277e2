#!/bin/bash
# One-shot TPU measurement session for the round-2 pending work
# (fired by tools/tpu_watch_and_run.sh when the tunnel recovers; each
# stage logs to /tmp/r2_*.log). Stages are independent, so a stage
# failure does NOT abort the session — but a dead tunnel does (the ping
# between stages prevents burning 2200 s per remaining stage on a wedge).
# TPU runs serialize — never run anything else on the TPU while this is up.
set -x
cd "$(dirname "$0")/.."

# BENCH_TIMEOUT_S must stay under the stage timeout but above the worst
# cold-compile (~25 min through the tunnel) so bench.py's watchdog doesn't
# kill a legitimately slow first compile and abort the stage.
export BENCH_TIMEOUT_S=2100
FAILED=""

ping_tpu() {
    timeout 240 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
        >/dev/null 2>&1 || { echo "TUNNEL DEAD — aborting session (done: see /tmp/r2_*.log)"; exit 1; }
}

run() { name=$1; shift
    ping_tpu
    if timeout 2200 "$@" >"/tmp/r2_${name}.log" 2>&1; then
        echo "stage ${name} ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

# 0. hardware correctness of the new kernel family (canary: also proves
#    the tunnel compiles + runs pallas)
run check_relik python tools/check_relik_tpu.py

# 1. regression check of the committed head-batched kernels
run bench_bert python bench.py
run bench_large env BENCH_MODEL=bert-large BENCH_BATCH=128 python bench.py

# 2. in-model XLNet bench: stream vs inkernel
run bench_xlnet_stream env BENCH_MODEL=xlnet python bench.py
run bench_xlnet_ik env BENCH_MODEL=xlnet BENCH_REL_BIAS=inkernel python bench.py

# 3. op-level timing: streamed vs in-kernel assembly
run exp_relik python tools/exp_rel_inkernel.py

# 4. QKV/output-projection mega-fusion probe (fwd + fwd/bwd standalone)
run exp_qkv python tools/exp_qkv_fusion.py

# 4b. productionized qkv_fusion path: hardware correctness + in-model A/B
run check_qkvproj python tools/check_qkvproj_tpu.py
run bench_bert_qkv env BENCH_QKV_FUSION=1 python bench.py
run bench_bert_qkv_res env BENCH_QKV_FUSION=1 BENCH_QKV_RESIDUAL=1 python bench.py

# 5. MOSEI-scale full-geometry convergence (16265/1869/4643 synthetic,
#    bert-base, warm start, fused attention) — extends the MOSI-scale
#    hardware-training evidence; MAG visual dim 35 forces a recompile
ping_tpu
if timeout 3000 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosei --synthetic \
    --synthetic_sizes 16265 1869 4643 --n_epochs 2 --train_batch_size 48 \
    --seed 42 --pretrained_checkpoint .artifacts/bert_base_v128.bin \
    --attention_impl fused >/tmp/r2_e2e_mosei.log 2>&1; then
    echo "stage e2e_mosei ok"
else
    echo "STAGE e2e_mosei FAILED (rc=$?)"; FAILED="$FAILED e2e_mosei"
fi

if [ -n "$FAILED" ]; then echo "SESSION DONE, FAILED STAGES:$FAILED"; else echo "ALL STAGES OK"; fi
tail -1 /tmp/r2_bench_xlnet_stream.log /tmp/r2_bench_xlnet_ik.log \
    /tmp/r2_bench_bert.log /tmp/r2_bench_large.log
