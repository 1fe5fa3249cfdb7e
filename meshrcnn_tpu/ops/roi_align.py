"""RoIAlign and multiscale (FPN) RoIAlign as batched XLA gathers.

TPU-native replacement for torchvision's C++/CUDA ``MultiScaleRoIAlign``
(reference: meshRCNN/layers.py:5, 819-842; pix3d_model.py:173-175; SURVEY.md §2.9).
For each RoI an ``output_size x output_size`` grid of bins is sampled with
``sampling_ratio`` bilinear points per bin and averaged — the exact RoIAlign
semantics (Mask R-CNN paper) — implemented as one fixed-shape gather per FPN level
with level assignment done by masking, so the whole op jits with static shapes.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def roi_align(fmap: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int, sampling_ratio: int = 2) -> jnp.ndarray:
    """Batched single-level RoIAlign: fmap [B,H,W,C], boxes [B,R,4] -> [B,R,os,os,C].

    Implemented batched with flattened global-index gathers (batch offset folded
    into the index) — vmapped gathers hit the XLA-TPU slow path (ops/gather.py).
    """
    B, H, W, C = fmap.shape
    R = boxes.shape[1]
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]   # [B, R]
    bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
    bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
    s = max(sampling_ratio, 1)

    # sample grid: for bin (i,j), points at y1 + (i + (k+0.5)/s) * bin_h
    grid = (jnp.arange(output_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    grid = grid.reshape(-1)                                       # [P = os*s]
    ys = y1[..., None] + grid * bin_h[..., None]                  # [B, R, P]
    xs = x1[..., None] + grid * bin_w[..., None]

    ys = jnp.clip(ys, 0.0, H - 1)
    xs = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)

    flat = fmap.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None, None]
    P = ys.shape[-1]

    def gather(yi, xi):                   # [B,R,P] x [B,R,P] -> [B,R,P,P,C]
        idx = base + yi[..., :, None] * W + xi[..., None, :]
        return flat[idx.reshape(-1)].reshape(B, R, P, P, C)

    f00 = gather(y0i, x0i)
    f01 = gather(y0i, x1i)
    f10 = gather(y1i, x0i)
    f11 = gather(y1i, x1i)
    wy0 = (1.0 - fy)[..., :, None, None]
    wy1 = fy[..., :, None, None]
    wx0 = (1.0 - fx)[..., None, :, None]
    wx1 = fx[..., None, :, None]
    vals = (f00 * wy0 * wx0 + f01 * wy0 * wx1 + f10 * wy1 * wx0 + f11 * wy1 * wx1)
    # [B, R, os*s, os*s, C] -> average s x s samples per bin
    O = output_size
    vals = vals.reshape(B, R, O, s, O, s, C)
    return vals.mean(axis=(3, 5))


def multiscale_roi_align(feature_maps: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         image_size: tuple[int, int], output_size: int,
                         sampling_ratio: int = 2,
                         canonical_scale: int = 224,
                         canonical_level: int = 4) -> jnp.ndarray:
    """FPN-level-aware RoIAlign (torchvision MultiScaleRoIAlign semantics).

    Level assignment: k = floor(k0 + log2(sqrt(area)/224)) clamped to available
    levels (FPN paper eqn. 1). Instead of pooling every level for every box and
    mask-selecting (4x the gather work plus 4 full [B,R,os,os,C] mask-multiply
    passes — profiled at a large share of the Pix3D step, PERFORMANCE.md), the
    levels are zero-padded to a common spatial size and stacked, the per-RoI
    level index becomes part of the flat gather offset, and each RoI samples
    ONLY its own level. The padding is never read: sample coordinates are
    clipped to the assigned level's true bounds per RoI.

    feature_maps: list of [B, H_l, W_l, C] from highest resolution to lowest.
    boxes: [B, R, 4] xyxy in image coordinates. Returns [B, R, os, os, C].
    """
    L = len(feature_maps)
    B, _, _, C = feature_maps[0].shape
    R = boxes.shape[1]
    H, W = image_size
    Hs = [f.shape[1] for f in feature_maps]
    Ws = [f.shape[2] for f in feature_maps]
    Hm, Wm = max(Hs), max(Ws)
    stack = jnp.stack(
        [jnp.pad(f, ((0, 0), (0, Hm - f.shape[1]), (0, Wm - f.shape[2]), (0, 0)))
         for f in feature_maps], axis=1)                          # [B, L, Hm, Wm, C]

    areas = jnp.maximum((boxes[..., 2] - boxes[..., 0])
                        * (boxes[..., 3] - boxes[..., 1]), 1e-6)
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_scale))
    k = jnp.clip(k, 2, 2 + L - 1).astype(jnp.int32) - 2            # [B, R] 0-based

    scales = jnp.asarray([h / H for h in Hs], jnp.float32)[k]      # [B, R]
    Hl = jnp.asarray(Hs, jnp.int32)[k]                             # [B, R]
    Wl = jnp.asarray(Ws, jnp.int32)[k]

    b = boxes * scales[..., None]
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]    # [B, R]
    bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
    bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
    s = max(sampling_ratio, 1)
    grid = (jnp.arange(output_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    grid = grid.reshape(-1)                                        # [P = os*s]
    ys = y1[..., None] + grid * bin_h[..., None]                   # [B, R, P]
    xs = x1[..., None] + grid * bin_w[..., None]

    ys = jnp.clip(ys, 0.0, (Hl - 1)[..., None].astype(jnp.float32))
    xs = jnp.clip(xs, 0.0, (Wl - 1)[..., None].astype(jnp.float32))
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, (Hl - 1)[..., None])
    x1i = jnp.minimum(x0i + 1, (Wl - 1)[..., None])

    flat = stack.reshape(B * L * Hm * Wm, C)
    off = ((jnp.arange(B, dtype=jnp.int32)[:, None] * L + k) * (Hm * Wm))  # [B, R]
    P = ys.shape[-1]

    def gather(yi, xi):                    # [B,R,P] x [B,R,P] -> [B,R,P,P,C]
        idx = off[..., None, None] + yi[..., :, None] * Wm + xi[..., None, :]
        return flat[idx.reshape(-1)].reshape(B, R, P, P, C)

    f00 = gather(y0i, x0i)
    f01 = gather(y0i, x1i)
    f10 = gather(y1i, x0i)
    f11 = gather(y1i, x1i)
    wy0 = (1.0 - fy)[..., :, None, None]
    wy1 = fy[..., :, None, None]
    wx0 = (1.0 - fx)[..., None, :, None]
    wx1 = fx[..., None, :, None]
    vals = (f00 * wy0 * wx0 + f01 * wy0 * wx1 + f10 * wy1 * wx0 + f11 * wy1 * wx1)
    O = output_size
    vals = vals.reshape(B, R, O, s, O, s, C)
    return vals.mean(axis=(3, 5))
