#!/bin/bash
# Accuracy-parity experiment (VERDICT.md round-1 item 1): replay the reference
# training recipe (reference README.md:77, report §Training method — 1500
# airplane samples, Adam, wd 0, lr 1e-4, batch 3, cubify threshold 0.2, loss
# weights voxel=1 chamfer=1 normal=0 edge=0.5, residual refinement, 25 epochs,
# voxel-only warm start) on the generated mini-ShapeNet, recording per-epoch
# loss meters (stats_*.st) and final eval F1@0.1/0.3 + voxel IoU.
#
# Usage: bash tools/run_parity_experiment.sh <data_root> <out_root>
set -euo pipefail
# pin the reference normal estimator (kNN+PCA) so parity-run loss
# magnitudes stay comparable with the reference recipe; the framework
# default is exact face normals (ops/losses.py:mesh_loss)
export MESHRCNN_FACE_NORMALS=0
DATA=${1:-/root/data_mini}
OUT=${2:-/root/parity}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# --train_backbone deviates from the reference's frozen-backbone GCN phase out
# of necessity: the reference freezes a ZOO-PRETRAINED ResNet-50 (offline here,
# and the generated mini-ShapeNet is single-class so classification pretraining
# via train_backbone.py has no signal). A frozen RANDOM backbone plateaus
# immediately (measured: chamfer flat at ~0.47 for 20 epochs); joint training is
# the closest offline equivalent of "meaningful features under the GCN".
COMMON="--model ShapeNet --dataRoot $DATA --batchSize 3 --num_sampels 1400 \
  --optim Adam --weightDecay 0.0 --lr 1e-4 --threshold 0.2 \
  --chamfer 1.0 --voxel 1.0 --normal 0.0 --edge 0.5 --residual \
  --train_backbone \
  --vert_capacity 8192 --face_capacity 16384 --edge_capacity 32768 \
  --point_cloud_size 10000 --print_freq 50"

echo "=== phase A: voxel-only warm start (10 epochs) ==="
python train.py $COMMON --voxel_only --nEpoch 10 \
  --checkpoint_root "$OUT/warm" 2>&1 | tee "$OUT/warm.log"
WARM=$(ls -d "$OUT"/warm/ShapeNet/GCN/*/final | head -1)
echo "warm checkpoint: $WARM"

echo "=== phase B: full model (25 epochs) ==="
python train.py $COMMON --nEpoch 25 --model_path "$WARM" \
  --checkpoint_root "$OUT/full" 2>&1 | tee "$OUT/full.log"
FULL=$(ls -d "$OUT"/full/ShapeNet/GCN/*/final | head -1)
echo "full checkpoint: $FULL"

echo "=== phase C: held-out eval (the 100 samples beyond the 1400 train split) ==="
python eval_model.py --model ShapeNet --dataRoot "$DATA" --batchSize 3 \
  --model_path "$FULL" --residual --threshold 0.2 \
  --vert_capacity 8192 --face_capacity 16384 --edge_capacity 32768 \
  --point_cloud_size 10000 --test_ratio 0.0666 \
  --output_path "$OUT/eval" 2>&1 | tee "$OUT/eval.log"
echo "=== parity experiment done ==="
