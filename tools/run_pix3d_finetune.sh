#!/bin/bash
# Phase 2 of the offline two-phase Pix3D curriculum: gentle SGD fine-tune of a
# warm Adam-trained detector (from tools/run_pix3d_detection_scale.sh), aiming
# to revive the mesh branch WITHOUT destroying detection.
#
# Why: the reference never trains from scratch — it COCO-initialises its
# detector (reference pix3d_model.py:163-178) and then runs its SGD
# warmup/step schedule (reference utils/train_utils.py:161-168, peak lr 0.02).
# Offline, phase 1 (Adam lr 1e-3) is our COCO-init equivalent: it produces a
# detector with held-out precision@1 AP ~1.0 but a saturated voxel head.
# Fine-tuning that warm detector with the VERBATIM reference schedule
# destabilized detection (AP_box 0.994 -> 0.286, PARITY.md round 5): the 0.02
# peak is calibrated for COCO weights on real Pix3D, not for this warm start.
# This script runs the gentle variant: flat SGD at a 10x-reduced LR.
#
# Usage: bash tools/run_pix3d_finetune.sh <warm_ckpt> <out_root> [lr] [epochs] [n]
set -euo pipefail
CKPT=${1:?path to phase-1 final checkpoint}
OUT=${2:-/root/pix3d_finetune}
LR=${3:-2e-3}
EPOCHS=${4:-12}
N=${5:-950}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SIZE=$(python -c "print(int(round($N / 0.85)))")

COMMON="--model Pix3D --dataRoot synthetic --batchSize 4 --num_sampels $N \
  --synthetic_size $SIZE \
  --optim SGD --lr $LR --weightDecay 0.0 --threshold 0.2 \
  --voxel 3.0 --chamfer 1.0 --normal 0.1 --edge 0.5 \
  --train_backbone --grad_clip 1.0 --no_pix3d_schedule \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --point_cloud_size 10000 --img_size 224 --print_freq 25 --workers 2"

echo "=== Pix3D gentle fine-tune (SGD lr $LR, $EPOCHS epochs) from $CKPT ==="
python train.py $COMMON --nEpoch "$EPOCHS" --model_path "$CKPT" \
  --checkpoint_root "$OUT/train" 2>&1 | tee "$OUT/train.log"
CKPT2=$(ls -d "$OUT"/train/Pix3D/GCN/*/final | head -1)
echo "fine-tuned checkpoint: $CKPT2"

echo "=== held-out eval (full eval_model.py path) ==="
python eval_model.py --model Pix3D --dataRoot synthetic --batchSize 4 \
  --synthetic_size "$SIZE" --model_path "$CKPT2" --threshold 0.2 \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --point_cloud_size 10000 --img_size 224 --test_ratio 0.15 \
  --output_path "$OUT/eval" 2>&1 | tee "$OUT/eval.log"
echo "=== pix3d fine-tune experiment done ==="
