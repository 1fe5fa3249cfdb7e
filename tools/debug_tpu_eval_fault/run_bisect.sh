#!/bin/bash
# Sequential TPU bisection runner with health-check recovery waits.
# Each probe runs in a fresh process under timeout; a worker fault wedges the
# tunneled chip ~15 min, so after a failure we poll until the chip answers
# before the next probe. Results append to /tmp/bisect_log.txt.
set -u
cd /root/repo/tools/debug_tpu_eval_fault
LOG=/tmp/bisect_log.txt

health() {
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))" >/dev/null 2>&1
}

wait_healthy() {
    for i in $(seq 1 40); do
        if health; then echo "[healthy after $i checks]" >> "$LOG"; return 0; fi
        sleep 60
    done
    echo "[chip never recovered]" >> "$LOG"; return 1
}

probe() {
    local name="$1"; shift
    echo "=== $name : $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- $name rc=$rc ---" >> "$LOG"
    wait_healthy
}

echo "bisect run $(date -u)" > "$LOG"
wait_healthy || exit 1
probe split_trained refine_split.py trained
probe level1_einsum_only refine_leveled.py 1
probe level2_plus_aggregate refine_leveled.py 2
echo "DONE $(date -u)" >> "$LOG"
