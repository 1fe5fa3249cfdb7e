"""Box math: IoU, clipping, small-box filtering, encode/decode — pure jnp.

TPU-native replacement for torchvision's C++ box ops used by the reference
(reference: meshRCNN/layers.py:638-666 clip/remove_small/nms wiring,
meshRCNN/utils.py:112-123 box_iou for RoI filtering; SURVEY.md §2.9). All functions
are fixed-shape and mask-friendly: filtering returns boolean masks instead of
compacted arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

# torchvision BoxCoder default weights (faster_rcnn.py) and clamp
BBOX_XFORM_CLIP = 4.135166556742356  # log(1000/16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between a [N,4] and b [M,4] xyxy boxes -> [N,M]."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def clip_boxes_to_image(boxes: jnp.ndarray, image_size: tuple[int, int]) -> jnp.ndarray:
    """Clamp xyxy boxes into [0, W] x [0, H]."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float = 1e-2) -> jnp.ndarray:
    """True where both sides >= min_size (mask analog of remove_small_boxes)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def encode_boxes(reference: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression targets (dx,dy,dw,dh) from proposals to reference boxes."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    gx = (reference[..., 0] + reference[..., 2]) * 0.5
    gy = (reference[..., 1] + reference[..., 3]) * 0.5
    gw = jnp.maximum(reference[..., 2] - reference[..., 0], 1e-6)
    gh = jnp.maximum(reference[..., 3] - reference[..., 1], 1e-6)
    return jnp.stack([wx * (gx - px) / pw, wy * (gy - py) / ph,
                      ww * jnp.log(gw / pw), wh * jnp.log(gh / ph)], axis=-1)


def decode_boxes(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply (dx,dy,dw,dh) deltas to anchor/proposal boxes (xyxy)."""
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    cx = dx * pw + px
    cy = dy * ph + py
    nw = jnp.exp(dw) * pw
    nh = jnp.exp(dh) * ph
    return jnp.stack([cx - 0.5 * nw, cy - 0.5 * nh,
                      cx + 0.5 * nw, cy + 0.5 * nh], axis=-1)
