"""Epoch-level training and validation loops.

Rebuilds the reference harness (reference: utils/train_utils.py:110-250,
utils/eval_utils.py:93-194) around jitted steps: one compiled train step per batch
(no silent exception swallowing — capacity overflows surface as a metric), and an
eval loop that recomputes voxel+mesh losses as metrics, accumulates the
classification confusion matrix, and reports both the reference's confusion-based
f0_1/f0_3/f0_5 *and* the paper-correct point-cloud F1@0.1/0.3 (SURVEY.md §6).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import TrainConfig
from meshrcnn_tpu.ops.losses import batched_mesh_loss, voxel_loss
from meshrcnn_tpu.ops.sampling import batched_sample_points
from meshrcnn_tpu.ops.chamfer import nearest_neighbor
from meshrcnn_tpu.utils.meters import AverageMeter, ProgressMeter, gcn_metrics, safe_print
from meshrcnn_tpu.utils.metrics import f_score


def train_epoch(epoch: int, step_fn: Callable, state, loader, meters: Dict[str, AverageMeter],
                rng: jax.Array, print_freq: int = 10, shard_fn: Optional[Callable] = None,
                multi_step_fn: Optional[Callable] = None, steps_per_dispatch: int = 1,
                group_shard_fn: Optional[Callable] = None):
    """One training epoch (reference: train_utils.py:174-250).

    With ``multi_step_fn`` + ``steps_per_dispatch`` > 1, batches are staged into
    groups and scanned on-device in one dispatch each (amortising host round-trip
    latency); leftover batches at the epoch tail run through the single step.
    Groups stay on the host until stacked, then ``group_shard_fn`` (DP mode)
    places the [n_steps, B, ...] stack with axis-1 dp sharding in one transfer.
    """
    progress = ProgressMeter(len(loader), meters.values(), prefix=f"Epoch: [{epoch}]")
    end = time.time()

    def record(metrics, n, i):
        nonlocal end
        metrics = jax.device_get(metrics)
        for k, v in metrics.items():
            if k not in meters:
                meters[k] = AverageMeter(k, ":.4f")
            meters[k].update(float(v), n=n)
        meters["batch_time"].update(time.time() - end)
        end = time.time()
        if (i // max(steps_per_dispatch, 1)) % print_freq == 0:
            progress.display(i)

    def to_device(batch):
        batch = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, batch)
        return shard_fn(batch) if shard_fn is not None else batch

    group = []
    i = -1
    for i, batch in enumerate(loader):
        meters["data_loading"].update(time.time() - end)
        key = jax.random.fold_in(rng, epoch * 100000 + i)
        if multi_step_fn is None or steps_per_dispatch <= 1:
            state, metrics = step_fn(state, to_device(batch), key)
            record(metrics, 1, i)
            continue
        group.append(batch)
        if len(group) == steps_per_dispatch:
            from meshrcnn_tpu.parallel.train_step import stack_batches
            stacked = stack_batches(group)
            if group_shard_fn is not None:
                stacked = group_shard_fn(stacked)
            state, metrics = multi_step_fn(state, stacked, key)
            record(metrics, len(group), i)
            group = []
    # epoch tail: run leftovers one-by-one through the single step, keeping the
    # epoch-global batch index for the progress display
    for j, batch in enumerate(group):
        key = jax.random.fold_in(rng, epoch * 100000 + 90000 + j)
        state, metrics = step_fn(state, to_device(batch), key)
        record(metrics, 1, i - len(group) + 1 + j)

    for m in meters.values():
        m.epoch_end()
    return state, meters


from functools import partial

_voxel_loss_j = jax.jit(voxel_loss)


@partial(jax.jit, static_argnames=("threshold",))
def _voxel_iou_j(pred, gt, threshold: float = 0.5):
    """Occupancy IoU of thresholded predictions vs {0,1} targets."""
    p = pred > threshold
    t = gt > 0.5
    inter = jnp.sum(jnp.logical_and(p, t))
    union = jnp.maximum(jnp.sum(jnp.logical_or(p, t)), 1)
    return inter.astype(jnp.float32) / union.astype(jnp.float32)


@partial(jax.jit, static_argnames=("point_cloud_size", "num_neighbours", "tile"))
def _mesh_eval_losses(key, stage_verts, mesh, gt_verts, gt_faces, gt_faces_mask,
                      point_cloud_size, num_neighbours, tile):
    return batched_mesh_loss(key, stage_verts, mesh, gt_verts, gt_faces,
                             gt_faces_mask, point_cloud_size=point_cloud_size,
                             num_neighbours=num_neighbours, tile=tile)


@partial(jax.jit, static_argnames=("point_cloud_size", "tile"))
def _f1_distances(key, verts, faces, faces_mask, gt_verts, gt_faces, gt_faces_mask,
                  point_cloud_size, tile):
    """Sampled-cloud squared NN distances both ways, for F1@tau thresholds."""
    k_p, k_g = jax.random.split(key)
    cloud_p, valid_p = batched_sample_points(k_p, verts, faces, faces_mask,
                                             point_cloud_size)
    cloud_g, valid_g = batched_sample_points(k_g, gt_verts, gt_faces, gt_faces_mask,
                                             point_cloud_size)
    nn = jax.vmap(lambda p, q: nearest_neighbor(p, q, tile)[0])
    return nn(cloud_p, cloud_g), nn(cloud_g, cloud_p), valid_p & valid_g


def validate(epoch: int, eval_step: Callable, state, loader,
             config: TrainConfig, num_classes: int, rng: jax.Array,
             voxel_only: bool = False, f1_taus=(0.1, 0.3),
             print_freq: int = 10) -> dict:
    """Dataset evaluation (reference: eval_utils.py:93-194).

    Returns a metrics dict with voxel/chamfer/normal/edge losses, the reference's
    confusion-based f0_1/f0_3/f0_5 (eval_utils.py:177-179) and true point-cloud
    F1@tau (the BASELINE.md north-star metric).
    """
    meters = gcn_metrics(voxel_only)
    confusion = np.zeros((num_classes, num_classes), dtype=np.int64)
    f1_sums = {t: 0.0 for t in f1_taus}
    f1_count = 0
    end = time.time()
    for i, batch in enumerate(loader):
        meters["data_loading"].update(time.time() - end)
        images = jnp.asarray(batch.images)
        out = eval_step(state, images)
        key = jax.random.fold_in(rng, i)

        gt_vox = jnp.asarray(batch.voxels)
        meters["voxel_loss"].update(float(_voxel_loss_j(out.voxels, gt_vox)))
        if "voxel_iou" not in meters:
            meters["voxel_iou"] = AverageMeter("voxel_iou", ":.4f")
        meters["voxel_iou"].update(float(_voxel_iou_j(out.voxels, gt_vox)))

        preds = np.asarray(jnp.argmax(out.logits, axis=-1))
        for p, t in zip(preds, np.asarray(batch.labels)):
            confusion[int(t), int(p)] += 1

        if not voxel_only:
            chamfer, normal, edge = _mesh_eval_losses(
                key, list(out.stage_verts[1:]), out.mesh,
                jnp.asarray(batch.gt_verts), jnp.asarray(batch.gt_faces),
                jnp.asarray(batch.gt_faces_mask),
                point_cloud_size=config.point_cloud_size,
                num_neighbours=config.normal_k, tile=config.distance_tile)
            meters["chamfer_loss"].update(float(chamfer))
            meters["normal_loss"].update(float(normal))
            meters["edge_loss"].update(float(edge))

            # true point-cloud F1@tau on the final stage: one batched NN pass,
            # taus are host-side thresholds on the squared NN distances
            d_p, d_g, valid = _f1_distances(
                jax.random.fold_in(key, 7), out.stage_verts[-1], out.mesh.faces,
                out.mesh.faces_mask, jnp.asarray(batch.gt_verts),
                jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
                config.point_cloud_size, config.distance_tile)
            d_p, d_g, valid = np.asarray(d_p), np.asarray(d_g), np.asarray(valid)
            for b in range(images.shape[0]):
                if valid[b]:
                    for tau in f1_taus:
                        thr = tau * tau
                        prec = float((d_p[b] < thr).mean())
                        rec = float((d_g[b] < thr).mean())
                        f1_sums[tau] += 2 * prec * rec / max(prec + rec, 1e-12)
                    f1_count += 1

        meters["batch_time"].update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            safe_print(f"eval [{i}/{len(loader)}] voxel {meters['voxel_loss'].avg:.4f}")

    results = {k: m.avg for k, m in meters.items()}
    # reference parity: F-beta over the classification confusion matrix
    for beta, name in ((0.1, "f0_1"), (0.3, "f0_3"), (0.5, "f0_5")):
        results[name] = float(np.nanmean(f_score(confusion, beta=beta)))
    for tau in f1_taus:
        results[f"F1@{tau}"] = f1_sums[tau] / max(f1_count, 1)
    results["confusion"] = confusion
    return results


def validate_pix3d(epoch: int, eval_step: Callable, state, loader,
                   config: TrainConfig, num_classes: int, rng: jax.Array,
                   voxel_only: bool = False, f1_taus=(0.1, 0.3),
                   print_freq: int = 10) -> dict:
    """Pix3D dataset evaluation (reference: eval_utils.py:93-194, pix3d branch).

    Per image the best-IoU detection vs the GT box is selected (get_max_box /
    get_only_max, eval_utils.py:10-90); its box/mask/mesh drive AP_box, AP_mask,
    the voxel+mesh losses, the classification confusion matrix and AP_mesh
    (mesh_precision_recall over per-class confusion f-scores at beta 0.3).

    Naming note (kept for reference parity): "AP_box"/"AP_mask" are computed on
    exactly ONE detection per image — the best-IoU one — so they are
    precision@1 at IoU 0.5, not the COCO-style ranked average precision the
    names suggest. The reference computes the same quantity under the same
    names (eval_utils.py:103-130).
    """
    from meshrcnn_tpu.utils.metrics import (calc_precision_box, calc_precision_mask,
                                            mesh_precision_recall, paste_mask_in_image)

    meters = gcn_metrics(voxel_only)
    for k in ("AP_box", "AP_mask"):
        meters[k] = AverageMeter(k, ":.4f")
    confusion = np.zeros((num_classes, num_classes), dtype=np.int64)
    f1_sums = {t: 0.0 for t in f1_taus}
    f1_count = 0
    end = time.time()
    for i, batch in enumerate(loader):
        meters["data_loading"].update(time.time() - end)
        images = jnp.asarray(batch.images)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        out = eval_step(state, images)
        key = jax.random.fold_in(rng, i)
        D = out.detections.boxes.shape[1]

        det_boxes = np.asarray(out.detections.boxes)
        det_labels = np.asarray(out.detections.labels)
        det_valid = np.asarray(out.detections.valid)
        mask_probs = np.asarray(out.mask_probs)
        gt_boxes = np.asarray(batch.boxes).reshape(B, 4)
        gt_masks = np.asarray(batch.masks)
        gt_labels = np.asarray(batch.labels)

        # best-IoU detection per image (eval_utils.py:10-13)
        from meshrcnn_tpu.utils.metrics import box_iou as np_box_iou
        best_idx = np.zeros((B,), dtype=np.int64)
        for b in range(B):
            ious = np_box_iou(det_boxes[b], gt_boxes[b][None])[:, 0]
            ious = np.where(det_valid[b], ious, -1.0)
            best_idx[b] = int(np.argmax(ious))

        best_boxes = det_boxes[np.arange(B), best_idx]
        best_labels = det_labels[np.arange(B), best_idx]
        pasted = [paste_mask_in_image(mask_probs[b, best_idx[b]], best_boxes[b], H, W)
                  for b in range(B)]
        meters["AP_box"].update(calc_precision_box(best_boxes, gt_boxes))
        meters["AP_mask"].update(calc_precision_mask(pasted, gt_masks))

        # get_only_max analog: pick the best detection's mesh slot per image
        slot = np.arange(B) * D + best_idx
        voxels = jnp.asarray(np.asarray(out.voxels)[slot])
        gt_vox = jnp.asarray(batch.voxels)
        meters["voxel_loss"].update(float(_voxel_loss_j(voxels, gt_vox)))
        if "voxel_iou" not in meters:
            meters["voxel_iou"] = AverageMeter("voxel_iou", ":.4f")
        meters["voxel_iou"].update(float(_voxel_iou_j(voxels, gt_vox)))

        for p, t in zip(best_labels, gt_labels):
            confusion[int(t), int(p)] += 1

        if not voxel_only:
            sel = jnp.asarray(slot)
            mesh = jax.tree_util.tree_map(lambda x: x[sel], out.mesh)
            stage_verts = [jnp.asarray(np.asarray(v)[slot]) for v in out.stage_verts]
            chamfer, normal, edge = _mesh_eval_losses(
                key, stage_verts[1:], mesh,
                jnp.asarray(batch.gt_verts), jnp.asarray(batch.gt_faces),
                jnp.asarray(batch.gt_faces_mask),
                point_cloud_size=config.point_cloud_size,
                num_neighbours=config.normal_k, tile=config.distance_tile)
            meters["chamfer_loss"].update(float(chamfer))
            meters["normal_loss"].update(float(normal))
            meters["edge_loss"].update(float(edge))

            d_p, d_g, valid = _f1_distances(
                jax.random.fold_in(key, 7), stage_verts[-1], mesh.faces,
                mesh.faces_mask, jnp.asarray(batch.gt_verts),
                jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
                config.point_cloud_size, config.distance_tile)
            d_p, d_g, valid = np.asarray(d_p), np.asarray(d_g), np.asarray(valid)
            for b in range(B):
                if valid[b]:
                    for tau in f1_taus:
                        thr = tau * tau
                        prec = float((d_p[b] < thr).mean())
                        rec = float((d_g[b] < thr).mean())
                        f1_sums[tau] += 2 * prec * rec / max(prec + rec, 1e-12)
                    f1_count += 1

        meters["batch_time"].update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            safe_print(f"pix3d eval [{i}/{len(loader)}] AP_box {meters['AP_box'].avg:.3f}")

    results = {k: m.avg for k, m in meters.items()}
    for beta, name in ((0.1, "f0_1"), (0.3, "f0_3"), (0.5, "f0_5")):
        results[name] = float(np.nanmean(f_score(confusion, beta=beta)))
    results["AP_mesh"] = mesh_precision_recall(confusion, f_score(confusion, 0.3))
    for tau in f1_taus:
        results[f"F1@{tau}"] = f1_sums[tau] / max(f1_count, 1)
    results["confusion"] = confusion
    return results
