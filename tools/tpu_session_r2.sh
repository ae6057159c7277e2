#!/bin/bash
# One-shot TPU measurement session for the ingredients rel-attention work
# (run when the tunnel recovers; each stage logs to /tmp/r2_*.log and the
# script stops on the first hardware failure so logs stay attributable).
# TPU runs serialize — never run anything else on the TPU while this is up.
set -x
cd "$(dirname "$0")/.."

run() { name=$1; shift; timeout 2200 "$@" >"/tmp/r2_${name}.log" 2>&1 \
    || { echo "STAGE ${name} FAILED (rc=$?)"; exit 1; }; echo "stage ${name} ok"; }

# 0. hardware correctness of the new kernel family
run check_relik python tools/check_relik_tpu.py

# 1. op-level timing: streamed vs in-kernel assembly
run exp_relik python tools/exp_rel_inkernel.py

# 2. in-model XLNet bench: stream vs inkernel
run bench_xlnet_stream env BENCH_MODEL=xlnet python bench.py
run bench_xlnet_ik env BENCH_MODEL=xlnet BENCH_REL_BIAS=inkernel python bench.py

# 3. headline + bert-large regression check (head-batched kernels committed)
run bench_bert python bench.py
run bench_large env BENCH_MODEL=bert-large BENCH_BATCH=128 python bench.py

# 4. QKV/output-projection mega-fusion probe (fwd + fwd/bwd standalone)
run exp_qkv python tools/exp_qkv_fusion.py

# 5. MOSEI-scale full-geometry convergence (16265/1869/4643 synthetic,
#    bert-base, warm start, fused attention) — extends the MOSI-scale
#    hardware-training evidence; MAG visual dim 35 forces a recompile
timeout 3000 python -m bert_multimodal_transformer_tpu.driver \
    --model bert-base-uncased --dataset mosei --synthetic \
    --synthetic_sizes 16265 1869 4643 --n_epochs 2 --train_batch_size 48 \
    --seed 42 --pretrained_checkpoint .artifacts/bert_base_v128.bin \
    --attention_impl fused >/tmp/r2_e2e_mosei.log 2>&1 \
    || { echo "STAGE e2e_mosei FAILED (rc=$?)"; exit 1; }
echo "stage e2e_mosei ok"

echo "ALL STAGES OK"
tail -1 /tmp/r2_bench_xlnet_stream.log /tmp/r2_bench_xlnet_ik.log \
    /tmp/r2_bench_bert.log /tmp/r2_bench_large.log
