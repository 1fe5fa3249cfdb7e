#!/bin/bash
# Input-substitution sweep for the standalone refine-stage TPU fault.
# Appends to /tmp/mix_log.txt; health-checks between probes (a fault wedges
# the tunneled worker ~5-15 min).
set -u
cd /root/repo/tools/debug_tpu_eval_fault
LOG=/tmp/mix_log.txt

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
    local spec="$1"
    echo "=== mix $spec : $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 1200 python refine_mix.py "$spec" >> "$LOG" 2>&1
    echo "--- mix $spec rc=$? ---" >> "$LOG"
    wait_healthy
}

echo "mix run $(date -u)" > "$LOG"
wait_healthy || exit 1
probe rrr
probe sss
probe rss
probe srs
probe ssr
echo "DONE $(date -u)" >> "$LOG"
