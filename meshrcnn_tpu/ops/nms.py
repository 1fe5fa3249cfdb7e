"""Fixed-shape non-maximum suppression for XLA.

TPU-native replacement for torchvision's C++/CUDA ``batched_nms``
(reference: meshRCNN/layers.py:672; SURVEY.md §2.9). The classic data-dependent
loop becomes a static ``fori_loop`` over the score-sorted candidate list: at each
step the highest-scoring still-alive box is selected and every box with
IoU > threshold against it is killed. Output is a keep-mask + selection order, all
shapes static. Class-aware batching uses the standard coordinate-offset trick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meshrcnn_tpu.ops.boxes import box_iou


@partial(jax.jit, static_argnames=("max_keep",))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, max_keep: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set.

    Args:
      boxes: [N, 4] xyxy; scores: [N]; valid: [N] bool (padded rows False).
      iou_threshold: suppression threshold.
      max_keep: number of selection slots to fill (static).

    Returns:
      order: [max_keep] int32 indices into the input, score-descending; padded
        slots hold -1. keep_mask: [max_keep] bool.
    """
    n = boxes.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    s = jnp.where(valid, scores, neg_inf)
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        alive, order, kmask = carry
        cand = jnp.where(alive, s, neg_inf)
        best = jnp.argmax(cand).astype(jnp.int32)
        ok = cand[best] > neg_inf
        order = order.at[i].set(jnp.where(ok, best, -1))
        kmask = kmask.at[i].set(ok)
        # kill the selected box and everything overlapping it
        suppress = (iou[best] > iou_threshold) & ok
        alive = alive & ~suppress
        alive = alive.at[best].set(False)
        return alive, order, kmask

    init = (valid, jnp.full((max_keep,), -1, jnp.int32),
            jnp.zeros((max_keep,), bool))
    _, order, kmask = jax.lax.fori_loop(0, max_keep, body, init)
    return order, kmask


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                     valid: jnp.ndarray, iou_threshold: float,
                     max_keep: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (per-class independence)."""
    if boxes.shape[0] == 0:
        return (jnp.full((max_keep,), -1, jnp.int32), jnp.zeros((max_keep,), bool))
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    return nms_mask(shifted, scores, valid, iou_threshold, max_keep)
