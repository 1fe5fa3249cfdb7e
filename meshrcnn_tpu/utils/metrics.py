"""Evaluation metrics: confusion F-beta, detection AP helpers, and true
point-cloud F1@tau.

Rebuilds reference utils/metrics.py plus the paper-correct mesh metric. The
reference's ``f0_1/f0_3/f0_5`` are F-beta over the *classification confusion matrix*
(reference: utils/eval_utils.py:177-179, metrics.py:7-28) — NOT the paper's
point-cloud F1@tau. Both are provided: ``f_score`` for behavioural parity and
``point_cloud_f1`` for the north-star metric (BASELINE.md caveats).
"""
from __future__ import annotations

import numpy as np

from meshrcnn_tpu.ops.chamfer import nearest_neighbor


def f_score(confusion_matrix: np.ndarray, beta: float = 1.0) -> np.ndarray:
    """Per-class F-beta x100 from a confusion matrix (reference: metrics.py:7-28)."""
    cm = np.asarray(confusion_matrix, dtype=np.float64)
    tp = np.diag(cm)
    precision = tp / np.maximum(cm.sum(axis=0), 1e-12)
    recall = tp / np.maximum(cm.sum(axis=1), 1e-12)
    b2 = beta * beta
    denom = np.maximum(b2 * precision + recall, 1e-12)
    return 100.0 * (1 + b2) * precision * recall / denom


def point_cloud_f1(pred_points, gt_points, tau: float = 0.1):
    """True F1@tau between two sampled clouds (Mesh R-CNN paper metric).

    precision = fraction of predicted points within sqrt(tau) of a GT point (squared
    distances compared against tau^2 per the standard protocol with tau as a distance
    threshold); recall symmetric; F1 harmonic mean. Returns (f1, precision, recall).
    """
    import jax.numpy as jnp
    d_p, _ = nearest_neighbor(jnp.asarray(pred_points), jnp.asarray(gt_points))
    d_g, _ = nearest_neighbor(jnp.asarray(gt_points), jnp.asarray(pred_points))
    thresh = tau * tau
    precision = float((np.asarray(d_p) < thresh).mean())
    recall = float((np.asarray(d_g) < thresh).mean())
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return f1, precision, recall


def paste_mask_in_image(mask: np.ndarray, box, height: int, width: int,
                        threshold: float = 0.5) -> np.ndarray:
    """Paste a KxK RoI mask (probabilities) into a full-size binary image mask
    (torchvision paste_masks_in_image semantics, used by the reference's transform
    postprocess before AP_mask)."""
    from PIL import Image
    x1, y1, x2, y2 = [int(round(float(v))) for v in np.asarray(box).reshape(4)]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(max(x2, x1 + 1), width), min(max(y2, y1 + 1), height)
    w, h = x2 - x1, y2 - y1
    resized = np.asarray(Image.fromarray(np.asarray(mask, dtype=np.float32))
                         .resize((w, h), Image.BILINEAR))
    out = np.zeros((height, width), dtype=np.int32)
    out[y1:y2, x1:x2] = (resized > threshold).astype(np.int32)
    return out


def paste_mask_in_image_jax(mask, box, height: int, width: int,
                            threshold: float = 0.5):
    """Device-side paste: inverse bilinear warp of a KxK RoI mask into a static
    [height, width] binary grid (torchvision ``F.interpolate(mode='bilinear')``
    paste semantics).

    Matches :func:`paste_mask_in_image` (the numpy/PIL path) bit-for-bit when the
    clamped box is at least as large as the mask (the production case — 28x28
    masks pasted into >=28px detections); for *smaller* boxes PIL antialiases its
    downscale while this stays pure bilinear, which is exactly what torchvision
    does — the numpy path's PIL resize is the deviating one there. Static output
    shape (box coords are traced scalars), so a whole batch pastes in one
    compiled program — this is what lets AP_mask run on-device in the fused
    eval-metrics dispatch instead of a per-image host loop.
    """
    import jax.numpy as jnp

    mask = jnp.asarray(mask, jnp.float32)
    kh, kw = mask.shape
    # mirror paste_mask_in_image's rounding/clamping exactly (jnp.round and
    # Python round() both round half to even)
    b = jnp.round(jnp.asarray(box, jnp.float32).reshape(4))
    x1 = jnp.maximum(b[0], 0.0)
    y1 = jnp.maximum(b[1], 0.0)
    x2 = jnp.minimum(jnp.maximum(b[2], x1 + 1.0), float(width))
    y2 = jnp.minimum(jnp.maximum(b[3], y1 + 1.0), float(height))
    w = x2 - x1
    h = y2 - y1

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    u = (xs - x1 + 0.5) * (kw / w) - 0.5   # mask-space column of each pixel centre
    v = (ys - y1 + 0.5) * (kh / h) - 0.5
    # edge-clamp == PIL's boundary window renormalisation for support-1 bilinear
    u = jnp.clip(u, 0.0, kw - 1.0)
    v = jnp.clip(v, 0.0, kh - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    uf = u - u0.astype(jnp.float32)
    vf = v - v0.astype(jnp.float32)
    u1 = jnp.minimum(u0 + 1, kw - 1)
    v1 = jnp.minimum(v0 + 1, kh - 1)

    top = mask[v0][:, u0] * (1 - uf)[None, :] + mask[v0][:, u1] * uf[None, :]
    bot = mask[v1][:, u0] * (1 - uf)[None, :] + mask[v1][:, u1] * uf[None, :]
    val = top * (1 - vf)[:, None] + bot * vf[:, None]
    inside = (((xs >= x1) & (xs < x2))[None, :]
              & ((ys >= y1) & (ys < y2))[:, None])
    return (inside & (val > threshold)).astype(jnp.int32)


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xyxy boxes a [N,4] x b [M,4] (pure numpy)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def calc_precision_box(pred_boxes, gt_boxes, iou_thresh: float = 0.5) -> float:
    """Fraction of (gt, best-pred) pairs with IoU > thresh (reference:
    metrics.py:31-38 — one matched prediction per sample)."""
    pred_boxes = np.asarray(pred_boxes).reshape(-1, 4)
    gt_boxes = np.asarray(gt_boxes).reshape(-1, 4)
    if pred_boxes.size == 0:
        return 0.0
    count = 0
    for gt, pred in zip(gt_boxes, pred_boxes):
        if box_iou(gt[None], pred[None])[0, 0] > iou_thresh:
            count += 1
    return count / len(pred_boxes)


def calc_precision_mask(pred_masks, gt_masks, iou_thresh: float = 0.5) -> float:
    """Fraction of predicted masks with pixel IoU > thresh vs their PAIRED GT mask
    (reference: metrics.py:43-53 zips mask with gt_mask — each prediction is
    scored against its own image's ground truth, not the whole batch stack)."""
    hits = 0
    pred_masks = [np.asarray(m).astype(bool) for m in pred_masks]
    gt = np.asarray(gt_masks).astype(bool)
    assert len(gt) == len(pred_masks), (len(gt), len(pred_masks))
    for mb, g in zip(pred_masks, gt):
        inter = np.logical_and(mb, g).sum()
        union = np.logical_or(mb, g).sum()
        if union > 0 and inter / union > iou_thresh:
            hits += 1
    return hits / max(len(pred_masks), 1)


def ranked_average_precision(scores, is_match, image_ids, num_gt) -> float:
    """All-point interpolated AP of a score-ranked detection list.

    ``is_match[i]`` says detection i passes the TP criterion against its own
    image's single ground-truth object (this dataset family has exactly one GT
    instance per image — reference data/dataloader.py:132-150). A GT can be
    matched by at most one detection: the highest-scored matching one is the TP,
    every later match on the same image is an FP (standard VOC/COCO duplicate
    rule). AP integrates the precision envelope over recall (VOC 2010+ /
    COCO-without-101-point-quantization convention).

    This is the true ranked AP the reference's "AP_box"/"AP_mask" names suggest
    but don't compute (reference metrics.py:31-53 is precision@1 on the best-IoU
    detection; kept separately for behavioural parity).
    """
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    is_match = np.asarray(is_match, dtype=bool).reshape(-1)
    image_ids = np.asarray(image_ids).reshape(-1)
    if num_gt <= 0:
        return float("nan")
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    seen: set = set()
    tp = np.zeros(order.size, dtype=np.float64)
    for r, i in enumerate(order):
        img = image_ids[i]
        if is_match[i] and img not in seen:
            seen.add(img)
            tp[r] = 1.0
    ctp = np.cumsum(tp)
    recall = ctp / num_gt
    precision = ctp / np.arange(1, order.size + 1)
    # precision envelope: p(r) = max precision at recall >= r
    for k in range(precision.size - 2, -1, -1):
        precision[k] = max(precision[k], precision[k + 1])
    # integrate over recall steps (recall only moves where tp == 1)
    prev_r = 0.0
    ap = 0.0
    for k in range(order.size):
        if tp[k]:
            ap += (recall[k] - prev_r) * precision[k]
            prev_r = recall[k]
    return float(ap)


def detection_map(scores, pred_labels, image_ids, criterion,
                  gt_labels_by_image, thresh: float = 0.5) -> dict:
    """Class-mean ranked AP (mAP@thresh) over a whole eval run.

    Inputs are flat per-detection arrays: ``criterion`` is the match quantity
    (box IoU for AP_box, pasted-mask IoU for AP_mask, point-cloud F1@0.3 for the
    paper's AP_mesh — Mesh R-CNN ICCV'19 §5 scores a detection as TP when its
    mesh F1@0.3 exceeds 0.5). A detection matches when criterion > thresh AND
    its predicted class equals its image's GT class; AP is computed per class
    over that class's detections and GT images, then averaged over classes with
    at least one GT (COCO convention). Returns {"mAP": float, "per_class": {c: ap}}.
    """
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    pred_labels = np.asarray(pred_labels).reshape(-1)
    image_ids = np.asarray(image_ids).reshape(-1)
    criterion = np.asarray(criterion, dtype=np.float64).reshape(-1)
    gt_labels_by_image = dict(gt_labels_by_image)

    per_class = {}
    classes = sorted({int(v) for v in gt_labels_by_image.values()})
    for c in classes:
        num_gt = sum(1 for v in gt_labels_by_image.values() if int(v) == c)
        sel = pred_labels == c
        match = (criterion[sel] > thresh) & np.asarray(
            [int(gt_labels_by_image[i]) == c for i in image_ids[sel]], dtype=bool
        ) if sel.any() else np.zeros(0, bool)
        per_class[c] = ranked_average_precision(
            scores[sel], match, image_ids[sel], num_gt)
    valid = [v for v in per_class.values() if not np.isnan(v)]
    return {"mAP": float(np.mean(valid)) if valid else 0.0,
            "per_class": per_class}


def mesh_precision_recall(confusion, f1_scores, f1_thresh: float = 0.5) -> float:
    """AUC of per-class precision vs recall with TPs zeroed where the (confusion-
    based) f1 score <= thresh (reference: metrics.py:56-62, sklearn auc; the
    recall axis is sorted here — sklearn requires monotonic x, which the reference
    left to chance)."""
    from sklearn.metrics import auc
    cm = np.asarray(confusion, dtype=np.float64)
    tp = np.diag(cm).copy()
    f = np.asarray(f1_scores, dtype=np.float64)
    tp[f <= f1_thresh] = 0.0
    precision = 100.0 * tp / (1e-8 + cm.sum(axis=1))
    recall = 100.0 * tp / (1e-8 + cm.sum(axis=0))
    order = np.argsort(recall)
    r, p = recall[order], precision[order]
    if len(r) < 2 or r[0] == r[-1]:
        return float(p.mean())
    return float(auc(r, p))
