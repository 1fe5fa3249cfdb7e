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
    """Fraction of predicted masks with pixel IoU > thresh (reference: metrics.py:43-53)."""
    hits = 0
    pred_masks = np.asarray(pred_masks)
    gt = np.asarray(gt_masks).astype(bool)
    for m in pred_masks:
        mb = np.asarray(m).astype(bool)
        inter = np.logical_and(mb, gt).sum()
        union = np.logical_or(mb, gt).sum()
        if union > 0 and inter / union > iou_thresh:
            hits += 1
    return hits / max(len(pred_masks), 1)


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
