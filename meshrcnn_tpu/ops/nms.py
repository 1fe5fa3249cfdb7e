"""Fixed-shape non-maximum suppression for XLA.

TPU-native replacement for torchvision's C++/CUDA ``batched_nms``
(reference: meshRCNN/layers.py:672; SURVEY.md §2.9). Instead of the classic
data-dependent loop — or its naive static port, one ``fori_loop`` iteration per
selection slot (max_keep sequential argmax steps: ~2500 serial iterations per
Pix3D RPN pass) — greedy NMS is solved as the unique fixed point of its own
recurrence over the score-sorted list:

    keep[i] = valid[i] and not any(keep[j] and iou[i, j] > t for j < i)

Iterating ``keep -> f(keep)`` from all-valid converges to exactly the greedy
solution (induction on suppression-chain depth: after m sweeps every box whose
longest suppressor chain is <= m is final; any fixed point satisfies the greedy
recurrence, which has a unique solution), and real box sets have chain depth
~5-10 — each sweep is one fully-parallel [N, N] masked reduction on the VPU, so
the serial depth drops from max_keep to chain depth. Output is a keep-mask +
selection order, all shapes static. Class-aware batching uses the standard
coordinate-offset trick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meshrcnn_tpu.ops.boxes import box_iou


@partial(jax.jit, static_argnames=("max_keep",))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, max_keep: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set (see module docstring).

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
    # stable score-descending order: ties resolve to the lower index, matching
    # the sequential argmax tie-break
    sort_idx = jnp.argsort(-s, stable=True).astype(jnp.int32)
    sv = s[sort_idx] > neg_inf
    iou = box_iou(boxes[sort_idx], boxes[sort_idx])
    # sup[i, j]: higher-scored j (j < i) overlaps i beyond the threshold
    lower_tri = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                 < jax.lax.broadcasted_iota(jnp.int32, (n, n), 0))
    sup = (iou > iou_threshold) & lower_tri

    def cond(carry):
        _, changed, it = carry
        return changed & (it < n)

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(sup & keep[None, :], axis=1)
        new_keep = sv & ~suppressed
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (sv, jnp.bool_(True), 0))

    # selection order: the first max_keep kept boxes in score order, scattered
    # into their selection slots (cumsum compaction; overflow slot dropped)
    slot = jnp.where(keep, jnp.cumsum(keep) - 1, max_keep)
    slot = jnp.minimum(slot, max_keep)
    order = (jnp.full((max_keep + 1,), -1, jnp.int32)
             .at[slot].set(sort_idx, mode="drop"))[:max_keep]
    return order, order >= 0


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
