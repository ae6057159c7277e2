#!/bin/bash
# Round-5 session B: hardware evidence for the round-5 features.
#   canary       — fused-attention kernel suite (pallas_util refactor +
#                  einsum-fallback f32-accumulate change insurance)
#   train_export — full-geometry MAG-BERT CLI train producing an Orbax
#                  checkpoint AND a CLI-exported serving artifact
#   artifact     — execute the StableHLO serving artifact ON THE TPU
#                  (VERDICT r4 #2): parity vs live einsum forward at 3
#                  batch sizes, cross-platform re-execution on CPU, and
#                  a keep_attention_impl=True (tpu_custom_call) artifact
#                  flown once
#   mems_accum   — --mem_len 512 x --gradient_accumulation_step 2 e2e
#                  (VERDICT r4 #4): micro-batches chain as segments
#                  inside the accumulated step, on hardware
#   mems_predict — --predict_only --mem_len 512: the mems-trained
#                  checkpoint scored WITH memory through the Predictor
#   req_b256/32  — independent-request serving concurrency A/B
#                  (VERDICT r4 #8): in_flight 1 vs 2 vs 4 through
#                  Predictor.predict_requests
# Sentinel/resume harness as tpu_session_r3.sh: /tmp/r5b_<stage>.ok
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r5b_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r5b_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r5b_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r5b_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run canary 2500 python tools/check_fused_attention_tpu.py

[ -f /tmp/r5b_train_export.ok ] || rm -rf /tmp/r5b_ckpt
run train_export 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 8 --synthetic_sizes 32 8 8 --seed 42 \
    --attention_impl fused --checkpoint_dir /tmp/r5b_ckpt \
    --export_serving /tmp/r5b_cli_art.stablehlo

run artifact 3600 env CKPT_DIR=/tmp/r5b_ckpt ART_BATCHES=1,32,128 \
    python tools/check_serving_artifact_tpu.py

[ -f /tmp/r5b_mems_accum.ok ] || rm -rf /tmp/r5b_mems_ckpt
run mems_accum 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 24 --gradient_accumulation_step 2 \
    --synthetic_sizes 96 48 48 --seed 42 --attention_impl fused \
    --mem_len 512 --checkpoint_dir /tmp/r5b_mems_ckpt

run mems_predict 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model xlnet-base-cased --dataset mosi --synthetic \
    --synthetic_sizes 96 48 48 --seed 42 --attention_impl fused \
    --test_batch_size 24 --mem_len 512 --predict_only \
    --checkpoint_dir /tmp/r5b_mems_ckpt

run req_b256 2500 env LAT_MODE=requests LAT_BATCHES=256 LAT_REQUESTS=40 \
    python tools/bench_serving_latency.py
run req_b32 2500 env LAT_MODE=requests LAT_BATCHES=32 LAT_REQUESTS=60 \
    python tools/bench_serving_latency.py

if [ -n "$FAILED" ]; then echo "R5B DONE, FAILED STAGES:$FAILED"; else echo "R5B ALL OK"; fi
