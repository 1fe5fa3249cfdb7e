#!/bin/bash
# Pix3D accuracy experiment: drive the full detection + mesh stack to
# convergence on the synthetic Pix3D dataset and record the loss trajectory +
# held-out eval metrics (PARITY.md). Mirrors the reference recipe (BASELINE.md:
# SGD wd 1e-4, batch 4, threshold 0.2, warmup/step LR schedule, weights voxel=3
# chamfer=1 normal=0.1 edge=0.5) with two offline deviations: the synthetic
# dataset (no egress for real Pix3D) and --train_backbone from scratch with
# grad_clip (the reference warm-starts from a COCO-pretrained Mask R-CNN;
# converter correctness for that path is proven separately in
# tests/test_convert.py forward-activation parity).
#
# Usage: bash tools/run_pix3d_parity.sh <out_root> [n_samples] [n_epochs]
set -euo pipefail
# pin the reference normal estimator (kNN+PCA) so parity-run loss
# magnitudes stay comparable with the reference recipe; the framework
# default is exact face normals (ops/losses.py:mesh_loss)
export MESHRCNN_FACE_NORMALS=0
OUT=${1:-/root/pix3d_parity}
N=${2:-400}
EPOCHS=${3:-30}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

COMMON="--model Pix3D --dataRoot synthetic --batchSize 4 --num_sampels $N \
  --optim SGD --weightDecay 1e-4 --threshold 0.2 \
  --voxel 3.0 --chamfer 1.0 --normal 0.1 --edge 0.5 \
  --train_backbone --grad_clip 1.0 \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --point_cloud_size 10000 --img_size 224 --print_freq 25"

echo "=== Pix3D training ($EPOCHS epochs, $N synthetic samples) ==="
python train.py $COMMON --nEpoch "$EPOCHS" \
  --checkpoint_root "$OUT/train" 2>&1 | tee "$OUT/train.log"
CKPT=$(ls -d "$OUT"/train/Pix3D/GCN/*/final | head -1)
echo "checkpoint: $CKPT"

echo "=== held-out eval ==="
python eval_model.py --model Pix3D --dataRoot synthetic --batchSize 4 \
  --model_path "$CKPT" --threshold 0.2 \
  --vert_capacity 4096 --face_capacity 8192 --edge_capacity 16384 \
  --point_cloud_size 10000 --img_size 224 --test_ratio 0.15 \
  --output_path "$OUT/eval" 2>&1 | tee "$OUT/eval.log"
echo "=== pix3d parity experiment done ==="
