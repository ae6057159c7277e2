#!/bin/bash
# Round-5 session D (final): regression + serving-table completion.
#   headline / xl_headline — the standard round-end regressions
#   xl_eval_b256 / b512    — XLNet serving throughput at the b512 sweet
#                            spot (train b512 now beats b256; the eval
#                            table lacked the b512 row)
#   bert_eval_b512         — re-confirm the 10759 ex/s serving peak
# Sentinel harness as prior sessions: /tmp/r5d_<stage>.ok
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
    echo "TUNNEL DEAD"; exit 1
}
run() { name=$1; tmo=$2; shift 2
    [ -f "/tmp/r5d_${name}.ok" ] && { echo "skip ${name}"; return; }
    ping_tpu
    if timeout "$tmo" "$@" >"/tmp/r5d_${name}.log" 2>&1; then
        echo "stage ${name} ok"; touch "/tmp/r5d_${name}.ok"
    else
        echo "STAGE ${name} FAILED (rc=$?)"; FAILED="$FAILED $name"
    fi
}
run headline 2500 python bench.py
run xl_headline 2500 env BENCH_MODEL=xlnet python bench.py
run xl_eval_b256 2500 env BENCH_MODE=eval BENCH_MODEL=xlnet BENCH_BATCH=256 python bench.py
run xl_eval_b512 2500 env BENCH_MODE=eval BENCH_MODEL=xlnet BENCH_BATCH=512 python bench.py
run bert_eval_b512 2500 env BENCH_MODE=eval BENCH_BATCH=512 python bench.py
if [ -n "$FAILED" ]; then echo "R5D DONE, FAILED:$FAILED"; else echo "R5D ALL OK"; fi
