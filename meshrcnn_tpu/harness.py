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


def _timed_iter(loader, meter: AverageMeter):
    """Iterate ``loader`` booking ONLY the ``next()`` wall time to ``meter``.

    The previous loops measured data_loading as "time since the last drain",
    which silently swallowed the first dispatch's XLA compile / compile-cache
    deserialization (tens of seconds) into the data_loading average — on short
    synthetic runs that misattribution dominated every reported meter.
    """
    it = iter(loader)
    while True:
        t0 = time.time()
        try:
            batch = next(it)
        except StopIteration:
            return
        meter.update(time.time() - t0)
        yield batch


def _book_step_time(meters: Dict[str, AverageMeter], dt: float) -> None:
    """First completed step of a fresh run is warmup (compile / cache load),
    reported under its own meter; every later step is a real batch_time."""
    bt = meters["batch_time"]
    if bt.count == 0 and not bt.history:
        if "warmup_time" not in meters:
            meters["warmup_time"] = AverageMeter("warmup_time", ":6.3f")
        if meters["warmup_time"].count == 0:
            meters["warmup_time"].update(dt)
            return
    bt.update(dt)


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
        # blocks on step i's device work; step i+1 is already enqueued (the
        # one-deep pipeline below) — the host-side meter accounting and any
        # transfer latency hide behind the next step's compute
        nonlocal end
        metrics = jax.device_get(metrics)
        for k, v in metrics.items():
            if k not in meters:
                meters[k] = AverageMeter(k, ":.4f")
            meters[k].update(float(v), n=n)
        _book_step_time(meters, time.time() - end)
        end = time.time()
        if (i // max(steps_per_dispatch, 1)) % print_freq == 0:
            progress.display(i)

    def to_device(batch):
        batch = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, batch)
        return shard_fn(batch) if shard_fn is not None else batch

    # one-deep pipeline: the next step only needs the device-side state future,
    # so it is dispatched BEFORE the previous step's metrics are pulled
    pending = None

    def dispatch(fn, *args, n, i):
        nonlocal state, pending
        state, metrics = fn(state, *args)
        prev, pending = pending, (metrics, n, i)
        if prev is not None:
            record(*prev)

    group = []
    i = -1
    for i, batch in enumerate(_timed_iter(loader, meters["data_loading"])):
        key = jax.random.fold_in(rng, epoch * 100000 + i)
        if multi_step_fn is None or steps_per_dispatch <= 1:
            dispatch(step_fn, to_device(batch), key, n=1, i=i)
            continue
        group.append(batch)
        if len(group) == steps_per_dispatch:
            from meshrcnn_tpu.parallel.train_step import stack_batches
            stacked = stack_batches(group)
            if group_shard_fn is not None:
                stacked = group_shard_fn(stacked)
            dispatch(multi_step_fn, stacked, key, n=len(group), i=i)
            group = []
    # epoch tail: run leftovers one-by-one through the single step, keeping the
    # epoch-global batch index for the progress display
    for j, batch in enumerate(group):
        key = jax.random.fold_in(rng, epoch * 100000 + 90000 + j)
        dispatch(step_fn, to_device(batch), key, n=1, i=i - len(group) + 1 + j)
    if pending is not None:
        record(*pending)

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


def _f1_per_sample(key, verts, faces, faces_mask, gt_verts, gt_faces,
                   gt_faces_mask, point_cloud_size, tile, taus):
    """Per-sample point-cloud F1 at each tau: ([N, T] f1, [N] valid)."""
    d_p, d_g, valid = _f1_distances(key, verts, faces, faces_mask, gt_verts,
                                    gt_faces, gt_faces_mask, point_cloud_size, tile)
    f1s = []
    for tau in taus:
        thr = tau * tau
        prec = jnp.mean((d_p < thr).astype(jnp.float32), axis=1)    # [N]
        rec = jnp.mean((d_g < thr).astype(jnp.float32), axis=1)
        f1s.append(2 * prec * rec / jnp.maximum(prec + rec, 1e-12))
    return jnp.stack(f1s, axis=1), valid                             # [N, T], [N]


def _f1_terms(key, verts, faces, faces_mask, gt_verts, gt_faces, gt_faces_mask,
              point_cloud_size, tile, taus):
    """Per-tau (sum of per-sample F1, valid count) — the on-device form of the
    host F1 accumulation loop (prec/rec are means over each sample's own cloud)."""
    f1, valid = _f1_per_sample(key, verts, faces, faces_mask, gt_verts, gt_faces,
                               gt_faces_mask, point_cloud_size, tile, taus)
    return (jnp.sum(jnp.where(valid[:, None], f1, 0.0), axis=0),     # [T]
            jnp.sum(valid.astype(jnp.int32)))


@partial(jax.jit, static_argnames=("point_cloud_size", "num_neighbours", "tile",
                                   "taus", "voxel_only"))
def _shapenet_eval_metrics(key, out, gt_vox, gt_verts, gt_faces, gt_faces_mask,
                           point_cloud_size, num_neighbours, tile, taus,
                           voxel_only):
    """ALL per-batch eval metrics in one compiled program.

    The eval loop used to make ~8 separate jit dispatches + host syncs per batch
    (each a tunnel round-trip on the target setup) and round-tripped multi-MB
    outputs through numpy; this computes everything on-device and returns only
    scalars + a [B] preds vector (reference metric semantics preserved:
    eval_utils.py:93-194).
    """
    res = {"voxel_loss": voxel_loss(out.voxels, gt_vox),
           "voxel_iou": _voxel_iou_j(out.voxels, gt_vox),
           "preds": jnp.argmax(out.logits, axis=-1).astype(jnp.int32)}
    if not voxel_only:
        chamfer, normal, edge = batched_mesh_loss(
            key, list(out.stage_verts[1:]), out.mesh, gt_verts, gt_faces,
            gt_faces_mask, point_cloud_size=point_cloud_size,
            num_neighbours=num_neighbours, tile=tile)
        res.update(chamfer_loss=chamfer, normal_loss=normal, edge_loss=edge)
        res["f1_sum"], res["f1_count"] = _f1_terms(
            jax.random.fold_in(key, 7), out.stage_verts[-1], out.mesh.faces,
            out.mesh.faces_mask, gt_verts, gt_faces, gt_faces_mask,
            point_cloud_size, tile, taus)
    return res


@partial(jax.jit, static_argnames=("point_cloud_size", "num_neighbours", "tile",
                                   "taus", "voxel_only", "ranked"))
def _pix3d_eval_metrics(key, out, gt_boxes, gt_masks, gt_vox, gt_verts, gt_faces,
                        gt_faces_mask, point_cloud_size, num_neighbours, tile,
                        taus, voxel_only, ranked=False):
    """Pix3D per-batch eval metrics in one compiled program.

    Best-IoU detection selection (eval_utils.py:10-13), AP_box/AP_mask
    (metrics.py:31-53) with on-device mask pasting, slot-selected voxel + mesh
    losses and point-cloud F1 — one dispatch, scalar-sized host transfer.

    With ``ranked=True`` the program additionally emits the per-detection-slot
    records that true score-ranked AP needs (scores, labels, validity, box IoU,
    pasted-mask IoU, and mesh F1@0.3 per slot) — [B, D]-sized, still a tiny
    transfer. The host (validate_pix3d) accumulates these across the dataset
    and computes class-mean ranked AP50_box/AP50_mask/AP_mesh alongside the
    reference's precision@1 "AP_box"/"AP_mask".
    """
    from meshrcnn_tpu.ops.boxes import box_iou as box_iou_j
    from meshrcnn_tpu.utils.metrics import paste_mask_in_image_jax

    det = out.detections
    B, D = det.valid.shape
    H, W = gt_masks.shape[1], gt_masks.shape[2]
    gt_b = gt_boxes.reshape(B, 4)

    # best-IoU detection per image; invalid slots score -1
    ious = jax.vmap(lambda dbox, g: box_iou_j(dbox, g[None])[:, 0])(det.boxes, gt_b)
    ious = jnp.where(det.valid, ious, -1.0)
    best = jnp.argmax(ious, axis=1)                                  # [B]
    ar = jnp.arange(B)
    best_boxes = det.boxes[ar, best]
    best_labels = det.labels[ar, best].astype(jnp.int32)

    # AP_box recomputes the raw (unmasked) IoU of the selected box, exactly as
    # the host calc_precision_box did on the selected slots
    raw_iou = jax.vmap(lambda p, g: box_iou_j(g[None], p[None])[0, 0])(best_boxes, gt_b)
    res = {"best_labels": best_labels,
           "ap_box": jnp.mean((raw_iou > 0.5).astype(jnp.float32))}

    pasted = jax.vmap(lambda m, bx: paste_mask_in_image_jax(m, bx, H, W))(
        out.mask_probs[ar, best], best_boxes)                        # [B, H, W]
    gt_m = gt_masks > 0.5
    pm = pasted > 0
    inter = jnp.sum(pm & gt_m, axis=(1, 2)).astype(jnp.float32)
    union = jnp.maximum(jnp.sum(pm | gt_m, axis=(1, 2)), 1).astype(jnp.float32)
    res["ap_mask"] = jnp.mean(((inter / union) > 0.5).astype(jnp.float32))

    if ranked:
        # per-slot records for score-ranked AP (host-side accumulation)
        res["det_scores"] = det.scores
        res["det_labels"] = det.labels.astype(jnp.int32)
        res["det_valid"] = det.valid
        res["det_box_iou"] = ious                                    # [B, D]
        pasted_all = jax.vmap(jax.vmap(
            lambda m, bx: paste_mask_in_image_jax(m, bx, H, W)))(
                out.mask_probs, det.boxes)                           # [B, D, H, W]
        pa = pasted_all > 0
        inter_a = jnp.sum(pa & gt_m[:, None], axis=(2, 3)).astype(jnp.float32)
        union_a = jnp.maximum(jnp.sum(pa | gt_m[:, None], axis=(2, 3)),
                              1).astype(jnp.float32)
        res["det_mask_iou"] = inter_a / union_a

    # get_only_max analog: the best detection's mesh/voxel slot per image
    slot = ar * D + best
    res["voxel_loss"] = voxel_loss(out.voxels[slot], gt_vox)
    res["voxel_iou"] = _voxel_iou_j(out.voxels[slot], gt_vox)

    if not voxel_only:
        mesh = jax.tree_util.tree_map(lambda x: x[slot], out.mesh)
        stage_verts = [v[slot] for v in out.stage_verts]
        chamfer, normal, edge = batched_mesh_loss(
            key, stage_verts[1:], mesh, gt_verts, gt_faces, gt_faces_mask,
            point_cloud_size=point_cloud_size, num_neighbours=num_neighbours,
            tile=tile)
        res.update(chamfer_loss=chamfer, normal_loss=normal, edge_loss=edge)
        res["f1_sum"], res["f1_count"] = _f1_terms(
            jax.random.fold_in(key, 7), stage_verts[-1], mesh.faces,
            mesh.faces_mask, gt_verts, gt_faces, gt_faces_mask,
            point_cloud_size, tile, taus)
        if ranked:
            # paper AP_mesh criterion: per-detection mesh F1@0.3 (ICCV'19 §5);
            # meshes live flat at [B*D], so tile each image's GT D times
            rep = lambda x: jnp.repeat(x, D, axis=0)
            f1bd, validbd = _f1_per_sample(
                jax.random.fold_in(key, 11), out.stage_verts[-1],
                out.mesh.faces, out.mesh.faces_mask, rep(gt_verts),
                rep(gt_faces), rep(gt_faces_mask), point_cloud_size, tile,
                (0.3,))
            res["det_mesh_f1"] = jnp.where(validbd, f1bd[:, 0],
                                           0.0).reshape(B, D)
    return res


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
    meters["voxel_iou"] = AverageMeter("voxel_iou", ":.4f")
    confusion = np.zeros((num_classes, num_classes), dtype=np.int64)
    taus = tuple(f1_taus)
    f1_sums = {t: 0.0 for t in taus}
    f1_count = 0
    end = time.time()

    def drain(m_dev, labels, idx):
        # blocks on batch idx's device work; batch idx+1 is already enqueued
        nonlocal f1_count, end
        m = jax.device_get(m_dev)
        meters["voxel_loss"].update(float(m["voxel_loss"]))
        meters["voxel_iou"].update(float(m["voxel_iou"]))
        for p, t in zip(m["preds"], labels):
            confusion[int(t), int(p)] += 1
        if not voxel_only:
            meters["chamfer_loss"].update(float(m["chamfer_loss"]))
            meters["normal_loss"].update(float(m["normal_loss"]))
            meters["edge_loss"].update(float(m["edge_loss"]))
            for j, tau in enumerate(taus):
                f1_sums[tau] += float(m["f1_sum"][j])
            f1_count += int(m["f1_count"])
        _book_step_time(meters, time.time() - end)
        end = time.time()
        if idx % print_freq == 0:
            safe_print(f"eval [{idx}/{len(loader)}] voxel {meters['voxel_loss'].avg:.4f}")

    # one-deep software pipeline: dispatch batch i+1's forward + fused metrics
    # (JAX dispatch is async) BEFORE blocking on batch i's scalars, so the host
    # round-trip and meter accounting hide behind the next batch's device work
    pending = None
    for i, batch in enumerate(_timed_iter(loader, meters["data_loading"])):
        images = jnp.asarray(batch.images)
        out = eval_step(state, images)
        key = jax.random.fold_in(rng, i)
        # one fused metrics dispatch + ONE host transfer of scalars per batch
        # (the model outputs never leave the device)
        m_dev = _shapenet_eval_metrics(
            key, out, jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
            jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
            config.point_cloud_size, config.normal_k, config.distance_tile,
            taus, voxel_only)
        prev, pending = pending, (m_dev, np.asarray(batch.labels))
        if prev is not None:
            drain(*prev, i - 1)
    if pending is not None:
        drain(*pending, i)

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
                   print_freq: int = 10, ranked_ap: bool = True) -> dict:
    """Pix3D dataset evaluation (reference: eval_utils.py:93-194, pix3d branch).

    Per image the best-IoU detection vs the GT box is selected (get_max_box /
    get_only_max, eval_utils.py:10-90); its box/mask/mesh drive AP_box, AP_mask,
    the voxel+mesh losses, the classification confusion matrix and AP_mesh
    (mesh_precision_recall over per-class confusion f-scores at beta 0.3).

    Naming note (kept for reference parity): "AP_box"/"AP_mask" are computed on
    exactly ONE detection per image — the best-IoU one — so they are
    precision@1 at IoU 0.5, not the COCO-style ranked average precision the
    names suggest. The reference computes the same quantity under the same
    names (eval_utils.py:103-130). With ``ranked_ap=True`` (default) TRUE
    score-ranked class-mean AP is additionally reported — AP50_box / AP50_mask
    at IoU 0.5 and AP_mesh_ranked at mesh F1@0.3 > 0.5 (the paper's criterion)
    — accumulated from per-slot records the fused device program emits.
    """
    from meshrcnn_tpu.utils.metrics import detection_map, mesh_precision_recall

    meters = gcn_metrics(voxel_only)
    meters["voxel_iou"] = AverageMeter("voxel_iou", ":.4f")
    for k in ("AP_box", "AP_mask"):
        meters[k] = AverageMeter(k, ":.4f")
    confusion = np.zeros((num_classes, num_classes), dtype=np.int64)
    taus = tuple(f1_taus)
    f1_sums = {t: 0.0 for t in taus}
    f1_count = 0
    # flat per-detection accumulators for ranked AP (host-side, tiny)
    det_records = {k: [] for k in ("scores", "labels", "image_ids", "box_iou",
                                   "mask_iou", "mesh_f1")}
    gt_labels_by_image: Dict[int, int] = {}
    n_images = 0
    end = time.time()

    def drain(m_dev, labels, idx):
        # blocks on batch idx's device work; batch idx+1 is already enqueued
        nonlocal f1_count, n_images, end
        m = jax.device_get(m_dev)
        meters["AP_box"].update(float(m["ap_box"]))
        meters["AP_mask"].update(float(m["ap_mask"]))
        meters["voxel_loss"].update(float(m["voxel_loss"]))
        meters["voxel_iou"].update(float(m["voxel_iou"]))
        for p, t in zip(m["best_labels"], labels):
            confusion[int(t), int(p)] += 1
        if ranked_ap:
            valid = np.asarray(m["det_valid"], bool)         # [B, D]
            B_, D_ = valid.shape
            img_ids = np.broadcast_to(
                (n_images + np.arange(B_))[:, None], (B_, D_))
            for b in range(B_):
                gt_labels_by_image[n_images + b] = int(labels[b])
            det_records["scores"].append(np.asarray(m["det_scores"])[valid])
            det_records["labels"].append(np.asarray(m["det_labels"])[valid])
            det_records["image_ids"].append(img_ids[valid])
            det_records["box_iou"].append(np.asarray(m["det_box_iou"])[valid])
            det_records["mask_iou"].append(np.asarray(m["det_mask_iou"])[valid])
            if not voxel_only:
                det_records["mesh_f1"].append(np.asarray(m["det_mesh_f1"])[valid])
        n_images += len(labels)
        if not voxel_only:
            meters["chamfer_loss"].update(float(m["chamfer_loss"]))
            meters["normal_loss"].update(float(m["normal_loss"]))
            meters["edge_loss"].update(float(m["edge_loss"]))
            for j, tau in enumerate(taus):
                f1_sums[tau] += float(m["f1_sum"][j])
            f1_count += int(m["f1_count"])
        _book_step_time(meters, time.time() - end)
        end = time.time()
        if idx % print_freq == 0:
            safe_print(f"pix3d eval [{idx}/{len(loader)}] AP_box {meters['AP_box'].avg:.3f}")

    # one-deep software pipeline (see validate): batch i+1's forward + fused
    # metrics dispatch before blocking on batch i's scalars. The fused program
    # does best-IoU selection, mask pasting, AP/voxel/mesh metrics on-device —
    # the pre-fusion loop made ~8 dispatches + host syncs per batch and pulled
    # the full voxel/vertex buffers over the wire, then pushed selections back.
    pending = None
    for i, batch in enumerate(_timed_iter(loader, meters["data_loading"])):
        images = jnp.asarray(batch.images)
        out = eval_step(state, images)
        key = jax.random.fold_in(rng, i)
        m_dev = _pix3d_eval_metrics(
            key, out, jnp.asarray(batch.boxes), jnp.asarray(batch.masks),
            jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
            jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
            config.point_cloud_size, config.normal_k, config.distance_tile,
            taus, voxel_only, ranked_ap)
        prev, pending = pending, (m_dev, np.asarray(batch.labels))
        if prev is not None:
            drain(*prev, i - 1)
    if pending is not None:
        drain(*pending, i)

    results = {k: m.avg for k, m in meters.items()}
    for beta, name in ((0.1, "f0_1"), (0.3, "f0_3"), (0.5, "f0_5")):
        results[name] = float(np.nanmean(f_score(confusion, beta=beta)))
    results["AP_mesh"] = mesh_precision_recall(confusion, f_score(confusion, 0.3))
    if ranked_ap and gt_labels_by_image:
        cat = {k: (np.concatenate(v) if v else np.zeros(0))
               for k, v in det_records.items()}
        common = (cat["scores"], cat["labels"], cat["image_ids"])
        results["AP50_box"] = detection_map(
            *common, cat["box_iou"], gt_labels_by_image)["mAP"]
        results["AP50_mask"] = detection_map(
            *common, cat["mask_iou"], gt_labels_by_image)["mAP"]
        if not voxel_only:
            results["AP_mesh_ranked"] = detection_map(
                *common, cat["mesh_f1"], gt_labels_by_image)["mAP"]
    for tau in f1_taus:
        results[f"F1@{tau}"] = f1_sums[tau] / max(f1_count, 1)
    results["confusion"] = confusion
    return results
