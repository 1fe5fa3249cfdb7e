#!/bin/bash
# Phase 2 of the offline two-phase Pix3D curriculum: fine-tune a warm
# Adam-trained detector (from tools/run_pix3d_detection_scale.sh) so the mesh
# branch learns WITHOUT destroying detection.
#
# Why: the reference never trains from scratch — it COCO-initialises its
# detector (reference pix3d_model.py:163-178) and then runs its SGD
# warmup/step schedule (reference utils/train_utils.py:161-168, peak lr 0.02).
# Offline, phase 1 (Adam lr 1e-3) is our COCO-init equivalent: it produces a
# detector with held-out precision@1 AP ~0.85-1.0 but a voxel head parked in
# the all-off basin. Two phase-2 variants, both measured (PARITY.md round 5):
#
#   gentle <lr>  joint SGD at a flat reduced LR (the verbatim 0.02-peak
#                schedule destabilized detection, AP_box 0.994 -> 0.286;
#                flat 2e-3 keeps the detector but 6 epochs moved neither the
#                voxel head nor the classifier)
#   frozen       freeze the ENTIRE detector (the `backbone` subtree =
#                Mask R-CNN FPN+RPN+RoI heads, optax.multi_transform
#                set_to_zero — parallel/train_step.py:65-70) and run the
#                VERBATIM reference schedule on the mesh branch only.
#                Detection provably cannot move; the mesh branch gets the
#                recipe LR it needs to escape the all-off basin.
#
# Usage: bash tools/run_pix3d_finetune.sh <warm_ckpt> <out_root> <mode> [epochs] [n]
#        mode = "frozen" | a flat LR like "2e-3" (gentle joint mode)
set -euo pipefail
CKPT=${1:?path to phase-1 final checkpoint}
OUT=${2:-/root/pix3d_finetune}
MODE=${3:-frozen}
EPOCHS=${4:-12}
N=${5:-950}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SIZE=$(python -c "print(int(round($N / 0.85)))")

COMMON="--model Pix3D --dataRoot synthetic --batchSize 4 --num_sampels $N \
  --synthetic_size $SIZE \
  --optim SGD --weightDecay 0.0 --threshold 0.2 \
  --voxel 3.0 --chamfer 1.0 --normal 0.1 --edge 0.5 \
  --grad_clip 1.0 \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --point_cloud_size 10000 --img_size 224 --print_freq 25 --workers 2"

if [ "$MODE" = "frozen" ]; then
  # frozen detector + the reference's verbatim warmup/step schedule
  PHASE2="$COMMON"
else
  # gentle joint fine-tune at a flat LR
  PHASE2="$COMMON --train_backbone --no_pix3d_schedule --lr $MODE"
fi

echo "=== Pix3D phase-2 fine-tune (mode=$MODE, $EPOCHS epochs) from $CKPT ==="
python train.py $PHASE2 --nEpoch "$EPOCHS" --model_path "$CKPT" \
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
