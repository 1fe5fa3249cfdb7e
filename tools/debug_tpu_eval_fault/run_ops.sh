#!/bin/bash
# Op-level bisection sweep (see refine_ops.py). Appends to /tmp/ops_log.txt.
set -u
cd /root/repo/tools/debug_tpu_eval_fault
LOG=/tmp/ops_log.txt

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
    local name="$1"
    echo "=== ops $name : $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python refine_ops.py "$name" >> "$LOG" 2>&1
    echo "--- ops $name rc=$? ---" >> "$LOG"
    wait_healthy
}

echo "ops run $(date -u)" > "$LOG"
wait_healthy || exit 1
for p in "$@"; do
    probe "$p"
done
echo "DONE $(date -u)" >> "$LOG"
