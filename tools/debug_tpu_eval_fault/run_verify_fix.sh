#!/bin/bash
# Verify the chunked-aggregate fix on the real chip:
#   1. refine_ops.py full  — the standalone refine stage at eval shapes
#   2. eval_ckpt.py full   — the ORIGINAL failing repro: single-dispatch
#                            Pix3D eval forward, trained ckpt, B=4 (N=12)
# Appends to /tmp/fix_log.txt.
set -u
cd /root/repo/tools/debug_tpu_eval_fault
LOG=/tmp/fix_log.txt

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
    timeout 2400 python "$@" >> "$LOG" 2>&1
    echo "--- $name rc=$? ---" >> "$LOG"
    wait_healthy
}

echo "fix verification $(date -u)" > "$LOG"
wait_healthy || exit 1
probe refine_full_patched refine_ops.py full
probe eval_ckpt_full eval_ckpt.py full
echo "DONE $(date -u)" >> "$LOG"
