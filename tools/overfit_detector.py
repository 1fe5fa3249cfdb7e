#!/usr/bin/env python
"""Detector-path diagnostic: can the Pix3D eval stack *detect* at all?

Round-3 parity left held-out AP_box = AP_mask = 0 after 3k from-scratch steps
(PARITY.md) — the reference sidesteps scratch-init detection entirely by COCO
init (reference: pix3d_model.py:163-178). Before burning a long training run,
this script answers the sharp question: if the detector is *overfit* on a tiny
synthetic set, does the eval path (RPN proposals -> box head -> score filter ->
NMS -> valid slots) produce valid detections with IoU > 0.5? If yes, the path
is sound and held-out AP is purely a training-budget question; if no, there is
an eval-path bug to find.

Trains on a small synthetic Pix3D split with Adam (fastest overfit; the parity
run proper keeps the reference SGD recipe) and prints train/held-out
AP_box/AP_mask + mean best-IoU + valid-detection fraction every eval interval.

Usage: python tools/overfit_detector.py [--steps 2000] [--eval_every 250]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def detection_metrics(eval_step, state, batches, rng):
    """AP_box/AP_mask + diagnostics over a list of Batches."""
    import jax
    import jax.numpy as jnp
    from meshrcnn_tpu.ops.boxes import box_iou

    ap_box = ap_mask = iou_sum = valid_frac = 0.0
    n = 0
    for b in batches:
        out = eval_step(state, jnp.asarray(b.images))
        det = out.detections
        B, D = det.valid.shape
        gt_b = jnp.asarray(b.boxes).reshape(B, 4)
        ious = jax.vmap(lambda dbox, g: box_iou(dbox, g[None])[:, 0])(det.boxes, gt_b)
        ious_m = jnp.where(det.valid, ious, -1.0)
        best = jnp.argmax(ious_m, axis=1)
        ar = jnp.arange(B)
        raw_iou = ious[ar, best]
        ap_box += float(jnp.mean((jnp.where(det.valid[ar, best], raw_iou, 0.0)
                                  > 0.5).astype(jnp.float32))) * B
        iou_sum += float(jnp.sum(jnp.where(det.valid[ar, best], raw_iou, 0.0)))
        valid_frac += float(jnp.sum(jnp.any(det.valid, axis=1)))
        # mask IoU of the best slot, pasted
        from meshrcnn_tpu.utils.metrics import paste_mask_in_image_jax
        H, W = b.masks.shape[1], b.masks.shape[2]
        pasted = jax.vmap(lambda m, bx: paste_mask_in_image_jax(m, bx, H, W))(
            out.mask_probs[ar, best], det.boxes[ar, best])
        gt_m = jnp.asarray(b.masks) > 0.5
        pm = pasted > 0
        inter = jnp.sum(pm & gt_m, axis=(1, 2)).astype(jnp.float32)
        union = jnp.maximum(jnp.sum(pm | gt_m, axis=(1, 2)), 1).astype(jnp.float32)
        miou = jnp.where(det.valid[ar, best], inter / union, 0.0)
        ap_mask += float(jnp.mean((miou > 0.5).astype(jnp.float32))) * B
        n += B
    return {"ap_box": ap_box / n, "ap_mask": ap_mask / n,
            "mean_best_iou": iou_sum / n, "any_valid_frac": valid_frac / n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--train_n", type=int, default=24)
    ap.add_argument("--test_n", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--optim", default="adam")
    ap.add_argument("--img_size", type=int, default=224)
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from meshrcnn_tpu.core.config import CapacityConfig, LossWeights, TrainConfig
    from meshrcnn_tpu.data.datasets import SyntheticDataset, collate
    from meshrcnn_tpu.models.pix3d import Pix3DModel
    from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                  make_eval_step, make_train_step)

    caps = CapacityConfig(verts=2048, faces=4096, edges=8192)
    ds = SyntheticDataset(n=args.train_n + args.test_n, image_size=args.img_size,
                          num_voxels=32, num_classes=10, pix3d=True)
    idx = list(range(len(ds)))
    train_idx, test_idx = idx[: args.train_n], idx[args.train_n:]

    def batches_of(indices):
        out = []
        for i in range(0, len(indices) - args.batch + 1, args.batch):
            samples = [ds[j] for j in indices[i: i + args.batch]]
            out.append(collate(samples, 24, caps, image_size=args.img_size))
        return out

    train_batches = batches_of(train_idx)
    test_batches = batches_of(test_idx)
    print(f"{len(train_batches)} train batches, {len(test_batches)} test batches")

    model = Pix3DModel(num_classes=10, cubify_threshold=0.2,
                       vert_capacity=caps.verts, face_capacity=caps.faces,
                       edge_capacity=caps.edges, num_refinement_stages=3)
    config = TrainConfig(optimizer=args.optim, lr=args.lr, weight_decay=0.0,
                         batch_size=args.batch, point_cloud_size=2000,
                         train_backbone=True, grad_clip=1.0,
                         pix3d_schedule=False,
                         loss_weights=LossWeights(voxel=3.0, chamfer=1.0,
                                                  normal=0.1, edge=0.5))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               np.asarray(train_batches[0].images))
    step = jax.jit(make_train_step(model, config), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model))

    t0 = time.time()
    k = jax.random.PRNGKey(1)
    for i in range(args.steps):
        b = train_batches[i % len(train_batches)]
        k, sk = jax.random.split(k)
        state, metrics = step(state, b, sk)
        if (i + 1) % args.eval_every == 0 or i == 0:
            m = jax.device_get(metrics)
            tr = detection_metrics(eval_step, state, train_batches, rng)
            te = detection_metrics(eval_step, state, test_batches, rng)
            print(f"step {i + 1:5d} loss {float(m['loss']):.3f} "
                  f"| train AP_box {tr['ap_box']:.2f} AP_mask {tr['ap_mask']:.2f} "
                  f"iou {tr['mean_best_iou']:.3f} valid {tr['any_valid_frac']:.2f} "
                  f"| test AP_box {te['ap_box']:.2f} AP_mask {te['ap_mask']:.2f} "
                  f"iou {te['mean_best_iou']:.3f} valid {te['any_valid_frac']:.2f} "
                  f"| {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
