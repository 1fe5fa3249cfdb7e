#!/bin/bash
# Run the round-3 on-chip work queue (ROADMAP.md environment note) in one pass.
# Safe to re-run; each stage logs under /tmp/onchip_r3/ and failures don't stop
# later stages. Probe first: if the tunnel is down every stage would hang.
set -u
OUT=${1:-/tmp/onchip_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unavailable — aborting"; exit 1; }

echo "== TPU-gated Pallas kernel tests (incl. batched chamfer grid) =="
MESHRCNN_TEST_TPU=1 timeout 1800 python -m pytest tests/test_chamfer_pallas.py -q \
  2>&1 | tee "$OUT/pallas_tests.log" | tail -2

echo "== bench (both models; drives BENCH_r03 format) =="
timeout 3600 python bench.py 2>&1 | tee "$OUT/bench.log" | tail -1

echo "== ShapeNet batch sweep (post project-then-align; B=12 used to OOM) =="
timeout 5400 python tools/batch_sweep.py --model ShapeNet --batches 3 6 12 24 \
  2>&1 | tee "$OUT/batch_sweep.log" | tail -4

echo "== A/B variants incl. donation-era default =="
timeout 5400 python tools/ab_trace.py r3_default gather_then_dense \
  2>&1 | tee "$OUT/ab.log" | tail -2

echo "== eval timing, fused single-dispatch metrics loop =="
# Pre-fusion on-chip record: 18.3 s/batch end-to-end at these exact shapes
# (PERFORMANCE.md round 3 — the loop then made ~8 dispatches/batch and pulled
# full voxel/vertex buffers to the host). batch_time meter is the comparand.
timeout 3600 python eval_model.py --model Pix3D --batchSize 4 \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --test_ratio 0.15 --output_path "$OUT/ev_p3d" \
  2>&1 | tee "$OUT/eval_pix3d.log" | tail -3
timeout 3600 python eval_model.py --model ShapeNet --batchSize 3 \
  --test_ratio 0.15 --output_path "$OUT/ev_sn" \
  2>&1 | tee "$OUT/eval_shapenet.log" | tail -3

echo "== ShapeNet step profile (165 ms composition) =="
timeout 3600 python tools/profile_step.py --model ShapeNet --top 25 \
  2>&1 | tee "$OUT/profile_shapenet.log" | tail -30

echo "== Pix3D step profile =="
timeout 3600 python tools/profile_step.py --model Pix3D --top 25 \
  2>&1 | tee "$OUT/profile_pix3d.log" | tail -30

echo "== done; logs in $OUT =="
