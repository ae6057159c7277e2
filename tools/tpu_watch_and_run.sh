#!/bin/bash
# Poll the TPU tunnel; when a trivial op completes, run the r2 session.
# Single instance only (flock) — TPU runs must serialize.
cd "$(dirname "$0")/.."
exec 9>/tmp/tpu_watch.lock
flock -n 9 || { echo "another watcher holds the lock"; exit 1; }

while true; do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))
" >/tmp/tpu_ping.log 2>&1; then
        echo "TPU BACK $(date -u +%H:%M:%S)" >> /tmp/tpu_watch.log
        bash tools/tpu_session_r4a.sh >> /tmp/tpu_watch.log 2>&1
        echo "SESSION DONE rc=$? $(date -u +%H:%M:%S)" >> /tmp/tpu_watch.log
        exit 0
    fi
    echo "tpu down $(date -u +%H:%M:%S)" >> /tmp/tpu_watch.log
    sleep 120
done
