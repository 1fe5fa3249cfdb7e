#!/usr/bin/env python
"""Backbone-only training (reference: train_backbone.py:16-45, utils/train_utils.py:110-171).

For ShapeNet this trains the ResNet-50 classifier with softmax cross-entropy
(the reference's nll-on-softmax combination is degenerate — SURVEY.md §6 — so the
correct CE is used; logits/probs API is unchanged).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser(description="backbone training script")
parser.add_argument("--model", "-m", choices=["ShapeNet", "Pix3D"], required=True)
parser.add_argument("--backbone_path", "-bp", type=str, default="")
parser.add_argument("-c", "--classes", type=str, default=None)
parser.add_argument("--num_sampels", type=int, default=None)
parser.add_argument("--train_ratio", type=float, default=None)
parser.add_argument("--dataRoot", type=str, default="synthetic")
parser.add_argument("--batchSize", "-b", type=int, default=16)
parser.add_argument("--workers", type=int, default=4)
parser.add_argument("--nEpoch", type=int, default=10)
parser.add_argument("--optim", type=str, default="Adam", choices=["Adam", "SGD"])
parser.add_argument("--weightDecay", type=float, default=5e-6)
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--checkpoint_root", type=str, default="checkpoints")
parser.add_argument("--print_freq", type=int, default=10)


def main():
    options = parser.parse_args()
    import jax

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import optax
    from flax import struct

    from meshrcnn_tpu.core.config import CapacityConfig
    from meshrcnn_tpu.data.datasets import SyntheticDataset, dataLoader, shapeNet_Dataset
    from meshrcnn_tpu.models.resnet import ResNet50
    from meshrcnn_tpu.utils.checkpoint import checkpoint_dir, save_state
    from meshrcnn_tpu.utils.meters import AverageMeter, safe_print, save_stats

    if options.model == "Pix3D":
        return train_pix3d_backbone(options)

    classes = options.classes.split(",") if options.classes else None
    if options.dataRoot == "synthetic":
        dataset = SyntheticDataset(n=max(options.num_sampels or 64, options.batchSize))
    else:
        dataset = shapeNet_Dataset(options.dataRoot, classes)
    loader = dataLoader(dataset, options.batchSize, 48, CapacityConfig(gt_verts=64, gt_faces=64),
                        num_train_samples=options.num_sampels,
                        train_ratio=options.train_ratio, workers=options.workers)

    model = ResNet50(num_classes=13)
    sample = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.asarray(sample.images), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = (optax.adam(options.lr) if options.optim == "Adam"
          else optax.sgd(options.lr))
    tx = optax.chain(optax.add_decayed_weights(options.weightDecay), tx)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            (logits, _), upd = model.apply({"params": p, "batch_stats": batch_stats},
                                           images, train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, upd["batch_stats"])
        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss, acc

    ckpt_dir = checkpoint_dir(options.checkpoint_root, options.model, kind="backbone")
    meters = {"loss": AverageMeter("loss", ":.4f"),
              "acc": AverageMeter("acc", ":.3f"),
              "batch_time": AverageMeter("batch_time", ":6.3f")}
    for epoch in range(options.nEpoch):
        end = time.time()
        for i, batch in enumerate(loader):
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state,
                jnp.asarray(batch.images), jnp.asarray(batch.labels))
            meters["loss"].update(float(loss))
            meters["acc"].update(float(acc))
            meters["batch_time"].update(time.time() - end)
            end = time.time()
            if i % options.print_freq == 0:
                safe_print(f"epoch {epoch} [{i}/{len(loader)}] "
                           + "\t".join(str(m) for m in meters.values()))
        for m in meters.values():
            m.epoch_end()
        save_state({"params": params, "batch_stats": batch_stats},
                   os.path.join(ckpt_dir, "backbone"), step=epoch)
        save_stats(meters, os.path.join(ckpt_dir, f"stats_{epoch}.st"))
    safe_print("backbone training done")


def train_pix3d_backbone(options):
    """Mask R-CNN-only training: RPN + RoI + mask losses, no mesh branch
    (reference: train_backbone.py pix3d path via utils/train_utils.py:110-171)."""
    import jax
    import jax.numpy as jnp
    import optax

    from meshrcnn_tpu.core.config import CapacityConfig
    from meshrcnn_tpu.data.datasets import SyntheticDataset, dataLoader, pix3dDataset
    from meshrcnn_tpu.models.pix3d import Pix3DMaskRCNN
    from meshrcnn_tpu.utils.checkpoint import checkpoint_dir, save_state
    from meshrcnn_tpu.utils.meters import (AverageMeter, maskrcnn_metrics, safe_print, save_stats)

    classes = options.classes.split(",") if options.classes else None
    img_size = 224
    if options.dataRoot == "synthetic":
        dataset = SyntheticDataset(n=max(options.num_sampels or 64, options.batchSize),
                                   image_size=img_size, num_voxels=32,
                                   num_classes=10, pix3d=True)
    else:
        dataset = pix3dDataset(options.dataRoot, classes)
    loader = dataLoader(dataset, options.batchSize, 24,
                        CapacityConfig(gt_verts=64, gt_faces=64),
                        num_train_samples=options.num_sampels,
                        train_ratio=options.train_ratio, image_size=img_size,
                        workers=options.workers)

    model = Pix3DMaskRCNN(num_classes=10)
    sample = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(rng, jnp.asarray(sample.images[:1]), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    # Pix3D recipe: SGD + warmup 0.002->0.02 over 1k iters, /10 @8k/10k
    # (reference: utils/train_utils.py:161-168)
    def lr(step):
        warm = 0.002 + (0.02 - 0.002) * jnp.minimum(step / 1000.0, 1.0)
        decay = jnp.where(step >= 10000, 0.01, jnp.where(step >= 8000, 0.1, 1.0))
        return warm * decay
    tx = optax.chain(optax.add_decayed_weights(options.weightDecay), optax.sgd(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, boxes, labels, masks, key):
        def loss_fn(p):
            (dets, losses, _), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                gt_boxes=boxes, gt_labels=labels, gt_masks=masks, rng=key,
                mutable=["batch_stats"])
            total = sum(losses.values())
            return total, (losses, upd.get("batch_stats", batch_stats))
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                total, losses)

    ckpt_dir = checkpoint_dir(options.checkpoint_root, "Pix3D", kind="backbone")
    meters = maskrcnn_metrics()  # reference: train_utils.py:94-97
    meters["loss"] = AverageMeter("loss", ":.4f")
    for epoch in range(options.nEpoch):
        end = time.time()
        for i, batch in enumerate(loader):
            meters["data_loading"].update(time.time() - end)
            key = jax.random.fold_in(rng, epoch * 100000 + i)
            params, batch_stats, opt_state, total, losses = step(
                params, batch_stats, opt_state, jnp.asarray(batch.images),
                jnp.asarray(batch.boxes), jnp.asarray(batch.labels),
                jnp.asarray(batch.masks), key)
            meters["loss"].update(float(total))
            for k, v in losses.items():
                meters[k].update(float(v))
            meters["batch_time"].update(time.time() - end)
            end = time.time()
            if i % options.print_freq == 0:
                safe_print(f"epoch {epoch} [{i}/{len(loader)}] "
                           + "\t".join(str(m) for m in meters.values()))
        for m in meters.values():
            m.epoch_end()
        save_state({"params": params, "batch_stats": batch_stats},
                   os.path.join(ckpt_dir, "backbone"), step=epoch)
        save_stats(meters, os.path.join(ckpt_dir, f"stats_{epoch}.st"))
    safe_print("pix3d backbone training done")


if __name__ == "__main__":
    main()
