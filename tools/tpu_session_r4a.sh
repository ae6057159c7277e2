#!/bin/bash
# Round-4 session A: execute the staged-but-never-run r3k + r3l work —
# hardware-validate the flash-streamed (fs) fused-attention tier for BOTH
# families — with the headline regressions front-loaded (VERDICT r3 #8:
# sessions die mid-window; lead with the regressions so BENCH stays
# trustworthy even if the long-seq stages starve).
#   headline       — bench bert S=50 regression (>=~3850 expected)
#   xl_headline    — bench xlnet S=50 regression (>=~2600 expected; the
#                    r3-final dispatch rewrite was never re-measured)
#   canary         — tools/check_fused_attention_tpu.py incl. NEW 2g
#                    (packed fs) and 2h (rel fs) hardware sections
#   e2e_s768       — full CLI train at --max_seq_length 768 fused (also
#                    validates driver.py's position-table extension)
#   ls768_*        — S=768 b16 train A/B fused vs einsum
#   ls1024_*       — S=1024 b8 train A/B (einsum expected OOM/crawl)
#   xl1024_*       — XLNet S=1024 b8 train A/B
# Sentinel/resume harness as tpu_session_r3.sh: /tmp/r4a_<stage>.ok
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
    echo "TUNNEL DEAD — aborting session (done: see /tmp/r4a_*.ok)"
    exit 1
}

run() { name=$1; tmo=$2; shift 2
    if [ -f "/tmp/r4a_${name}.ok" ]; then
        echo "stage ${name} already ok — skipping"
        return
    fi
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r4a_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r4a_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}

run headline 2500 python bench.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py
run canary 2500 python tools/check_fused_attention_tpu.py
run e2e_s768 2500 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosi --synthetic \
    --n_epochs 1 --train_batch_size 8 --synthetic_sizes 32 8 8 --seed 42 \
    --max_seq_length 768 --attention_impl fused
run ls768_fused 2500 env BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=fused python bench.py
run ls768_einsum 2500 env BENCH_SEQ=768 BENCH_BATCH=16 BENCH_ATTN=einsum python bench.py
run ls1024_fused 2500 env BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=fused python bench.py
run ls1024_einsum 2500 env BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=einsum python bench.py
run xl1024_fused 2500 env BENCH_MODEL=xlnet BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=fused python bench.py
run xl1024_einsum 2500 env BENCH_MODEL=xlnet BENCH_SEQ=1024 BENCH_BATCH=8 BENCH_ATTN=einsum python bench.py

if [ -n "$FAILED" ]; then echo "R4A DONE, FAILED STAGES:$FAILED"; else echo "R4A ALL OK"; fi
