"""Region proposal network with static-shape anchor generation and proposal selection.

TPU-native equivalent of torchvision's RPN used by the reference Mask R-CNN
(reference: pix3d_model.py:147; SURVEY.md §2.9 "RPN + anchor generation"). All the
classically dynamic steps are fixed-shape here: per-level top-k objectness
pre-selection, masked greedy NMS, and a final top-k to a static proposal count.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from meshrcnn_tpu.ops.boxes import (box_iou, clip_boxes_to_image, decode_boxes,
                                    encode_boxes, small_box_mask)
from meshrcnn_tpu.ops.matcher import (BELOW_LOW, BETWEEN, balanced_sample,
                                      match_boxes, smooth_l1)
from meshrcnn_tpu.ops.nms import nms_mask

ANCHOR_SIZES = (32, 64, 128, 256, 512)          # one per P2..P6 level
ASPECT_RATIOS = (0.5, 1.0, 2.0)


def generate_anchors(feature_shapes: Sequence[tuple[int, int]],
                     image_size: tuple[int, int]) -> List[jnp.ndarray]:
    """Per-level anchor boxes [H*W*A, 4] xyxy centred on feature cells."""
    H, W = image_size
    out = []
    for lvl, (fh, fw) in enumerate(feature_shapes):
        size = ANCHOR_SIZES[lvl]
        stride_y = H / fh
        stride_x = W / fw
        base = []
        for ar in ASPECT_RATIOS:
            h = size * (ar ** 0.5)
            w = size / (ar ** 0.5)
            base.append([-w / 2, -h / 2, w / 2, h / 2])
        base = jnp.asarray(base)                                # [A, 4]
        ys = (jnp.arange(fh) + 0.5) * stride_y
        xs = (jnp.arange(fw) + 0.5) * stride_x
        cx, cy = jnp.meshgrid(xs, ys)                           # [fh, fw]
        centers = jnp.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        anchors = (centers + base[None]).reshape(-1, 4)
        out.append(anchors)
    return out


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness / bbox-delta 1x1 heads (torchvision RPNHead).

    Convs compute in ``dtype`` (bf16 on TPU); logits/deltas are cast back to f32
    at the head boundary — box decoding and the BCE/smooth-L1 losses need f32.
    """

    num_anchors: int = len(ASPECT_RATIOS)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            B = t.shape[0]
            logits.append(cls(t).reshape(B, -1).astype(jnp.float32))
            deltas.append(reg(t).reshape(B, -1, 4).astype(jnp.float32))
        return logits, deltas


def select_proposals(logits: Sequence[jnp.ndarray], deltas: Sequence[jnp.ndarray],
                     anchors: Sequence[jnp.ndarray], image_size: tuple[int, int],
                     pre_nms_top_n: int, post_nms_top_n: int,
                     nms_thresh: float = 0.7, min_size: float = 1e-3
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode + top-k + per-level NMS + global top-k, all static shapes.

    Returns (proposals [B, post_nms_top_n, 4], scores, valid mask).

    Proposals are detached (torchvision RPN decodes from pred_bbox_deltas
    .detach(), rpn.py in torchvision): RoI-head losses must not backprop into
    the RPN through the proposal coordinates — the RPN trains from its own
    loss only. Also spares autodiff the whole selection/NMS backward.
    """
    logits = [jax.lax.stop_gradient(l) for l in logits]
    deltas = [jax.lax.stop_gradient(d) for d in deltas]
    B = logits[0].shape[0]
    all_boxes, all_scores, all_valid = [], [], []
    for lvl, (lg, dl, anc) in enumerate(zip(logits, deltas, anchors)):
        k = min(pre_nms_top_n, anc.shape[0])
        top_s, top_i = jax.lax.top_k(lg, k)                     # [B, k]
        sel_deltas = jnp.take_along_axis(dl, top_i[..., None], axis=1)
        sel_anchors = anc[top_i]                                # [B, k, 4]
        boxes = decode_boxes(sel_deltas, sel_anchors)
        boxes = clip_boxes_to_image(boxes, image_size)
        valid = small_box_mask(boxes, min_size)

        # selection slots: we never keep more than post_nms_top_n proposals per
        # level, so the sequential greedy loop only needs that many iterations.
        m_keep = min(k, post_nms_top_n)

        def lvl_nms(bx, sc, vd):
            order, keep = nms_mask(bx, sc, vd, nms_thresh, max_keep=m_keep)
            safe = jnp.where(order >= 0, order, 0)
            return bx[safe], jnp.where(keep, sc[safe], -jnp.inf), keep

        boxes, scores, valid = jax.vmap(lvl_nms)(boxes, top_s, valid)
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_valid.append(valid)

    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)
    n_keep = min(post_nms_top_n, boxes.shape[1])
    top_s, top_i = jax.lax.top_k(scores, n_keep)
    boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    valid = jnp.take_along_axis(valid, top_i, axis=1) & (top_s > -jnp.inf)
    return boxes, top_s, valid


def rpn_loss(key: jax.Array, logits: Sequence[jnp.ndarray],
             deltas: Sequence[jnp.ndarray], anchors: Sequence[jnp.ndarray],
             gt_boxes: jnp.ndarray,
             batch_size_per_image: int = 256, positive_fraction: float = 0.5,
             fg_iou: float = 0.7, bg_iou: float = 0.3):
    """RPN objectness BCE + box smooth-L1 (torchvision RPN loss semantics).

    gt_boxes: [B, G, 4] (pix3d: G=1). Returns (loss_objectness, loss_rpn_box_reg).
    """
    lg = jnp.concatenate(logits, axis=1)                        # [B, N]
    dl = jnp.concatenate(deltas, axis=1)                        # [B, N, 4]
    anc = jnp.concatenate(anchors, axis=0)                      # [N, 4]
    B = lg.shape[0]
    G = gt_boxes.shape[1]
    gt_valid = jnp.ones((G,), bool)

    def per_image(k, lg_i, dl_i, gt_i):
        iou = box_iou(anc, gt_i)
        matches = match_boxes(iou, gt_valid, fg_iou, bg_iou, allow_low_quality=True)
        positive = matches >= 0
        negative = matches == BELOW_LOW
        idx, is_pos, valid = balanced_sample(k, positive, negative,
                                             batch_size_per_image, positive_fraction)
        matched_gt = gt_i[jnp.clip(matches, 0, G - 1)]          # [N, 4]
        targets = encode_boxes(matched_gt, anc)
        obj_t = positive.astype(jnp.float32)
        sl = lg_i[idx]
        st = obj_t[idx]
        sv = valid.astype(jnp.float32)
        bce = optax_sigmoid_bce(sl, st) * sv
        n_sampled = jnp.maximum(sv.sum(), 1.0)
        obj_loss = bce.sum() / n_sampled
        box_l = smooth_l1(dl_i[idx], targets[idx]).sum(-1) * is_pos.astype(jnp.float32)
        box_loss = box_l.sum() / n_sampled
        return obj_loss, box_loss

    keys = jax.random.split(key, B)
    obj, box = jax.vmap(per_image)(keys, lg, dl, gt_boxes)
    return obj.mean(), box.mean()


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid binary cross entropy."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
