"""RoIAlign and multiscale (FPN) RoIAlign — separable-matmul on the MXU.

TPU-native replacement for torchvision's C++/CUDA ``MultiScaleRoIAlign``
(reference: meshRCNN/layers.py:5, 819-842; pix3d_model.py:173-175; SURVEY.md §2.9).
For each RoI an ``output_size x output_size`` grid of bins is sampled with
``sampling_ratio`` bilinear points per bin and averaged — the exact RoIAlign
semantics (Mask R-CNN paper).

Two implementations, selected by ``MESHRCNN_MATMUL_ROIALIGN`` (default on):

* **Separable matmul** (default): bilinear sampling factorizes per axis —
  out[r,i,j] = sum_y sum_x WY[r,i,y] * WX[r,j,x] * fmap[y,x] — and the s x s
  bin average folds into the axis weights ((1/s) sum over sample rows), so the
  whole op is TWO dense einsums on the MXU. The per-RoI FPN level one-hot
  folds into WY, so level selection costs nothing extra. This replaced the
  corner-gather path after profiling: at Pix3D production shapes the gathers
  and their backward scatter-adds were ~29% of the whole train step (94 ms —
  XLA:TPU gathers run ~0.5 GB/s; the dense einsums are ~200 GFLOP/step on a
  197 TFLOP/s MXU). The backward is einsum transposes — no scatters at all.
* **Corner gather** (``MESHRCNN_MATMUL_ROIALIGN=0``): one fixed-shape
  flattened-index gather per bilinear corner (vmapped gathers hit the XLA-TPU
  slow path, ops/gather.py). Kept as the semantic reference; equality is
  pytest-pinned.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp


def _use_matmul() -> bool:
    return os.environ.get("MESHRCNN_MATMUL_ROIALIGN", "1") == "1"


# ---------------------------------------------------------------------------
# separable-matmul path
# ---------------------------------------------------------------------------

def _axis_weights(start, bin_size, hi, size: int, output_size: int, s: int):
    """Dense bin-averaged bilinear weights along one axis.

    start: [B, R] RoI lower edge (level units); bin_size: [B, R];
    hi: [B, R] float32 max valid coordinate (level extent - 1);
    size: static padded axis length; s: sampling_ratio.
    Returns [B, R, output_size, size] float32 with sum 1 per (b, r, bin).
    """
    O = output_size
    grid = (jnp.arange(O, dtype=jnp.float32)[:, None]
            + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s).reshape(-1)
    cs = start[..., None] + grid * bin_size[..., None]            # [B, R, O*s]
    cs = jnp.clip(cs, 0.0, hi[..., None])
    c0 = jnp.floor(cs)
    f = cs - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, hi[..., None].astype(jnp.int32))
    pos = jnp.arange(size, dtype=jnp.int32)
    w = ((pos == c0i[..., None]).astype(jnp.float32) * (1.0 - f)[..., None]
         + (pos == c1i[..., None]).astype(jnp.float32) * f[..., None])
    B, R = start.shape
    # fold the bin average into the weights: mean over the s sample rows
    return w.reshape(B, R, O, s, size).mean(axis=3)               # [B, R, O, size]


def _apply_separable(stack2d: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray,
                     Wm: int, C: int) -> jnp.ndarray:
    """stack2d [B, Y, Wm*C] (Y = rows, possibly L*Hm), wy [B, R, O, Y],
    wx [B, R, O, Wm] -> [B, R, O, O, C]."""
    dt = stack2d.dtype
    acc = jnp.float32
    tmp = jnp.einsum("broy,byq->broq", wy.astype(dt), stack2d,
                     preferred_element_type=acc)                   # [B,R,O,Wm*C]
    B, R, O = wy.shape[:3]
    tmp = tmp.reshape(B, R, O, Wm, C).astype(dt)
    out = jnp.einsum("brjx,brixc->brijc", wx.astype(dt), tmp,
                     preferred_element_type=acc)                   # [B,R,O,O,C]
    return out


def _roi_align_mm(fmap, boxes, spatial_scale, output_size, sampling_ratio):
    B, H, W, C = fmap.shape
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
    bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
    s = max(sampling_ratio, 1)
    hiy = jnp.full(y1.shape, H - 1, jnp.float32)
    hix = jnp.full(x1.shape, W - 1, jnp.float32)
    wy = _axis_weights(y1, bin_h, hiy, H, output_size, s)
    wx = _axis_weights(x1, bin_w, hix, W, output_size, s)
    return _apply_separable(fmap.reshape(B, H, W * C), wy, wx, W, C)


def _multiscale_roi_align_mm(stack, k, Hs, Ws, boxes, image_size,
                             output_size, sampling_ratio):
    """stack [B, L, Hm, Wm, C]; k [B, R] 0-based level per RoI."""
    B, L, Hm, Wm, C = stack.shape
    H, _ = image_size
    scales = jnp.asarray([h / H for h in Hs], jnp.float32)[k]      # [B, R]
    Hl = jnp.asarray(Hs, jnp.int32)[k]
    Wl = jnp.asarray(Ws, jnp.int32)[k]
    b = boxes * scales[..., None]
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
    bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
    s = max(sampling_ratio, 1)
    wy = _axis_weights(y1, bin_h, (Hl - 1).astype(jnp.float32), Hm,
                       output_size, s)                             # [B,R,O,Hm]
    wx = _axis_weights(x1, bin_w, (Wl - 1).astype(jnp.float32), Wm,
                       output_size, s)
    # fold the level one-hot into the row weights: [B,R,O,L,Hm] -> [B,R,O,L*Hm]
    lvl = (jnp.arange(L, dtype=jnp.int32) == k[..., None]).astype(jnp.float32)
    wyl = (wy[:, :, :, None, :] * lvl[:, :, None, :, None]).reshape(
        B, wy.shape[1], output_size, L * Hm)
    return _apply_separable(stack.reshape(B, L * Hm, Wm * C), wyl, wx, Wm, C)


# ---------------------------------------------------------------------------
# corner-gather path (semantic reference; MESHRCNN_MATMUL_ROIALIGN=0)
# ---------------------------------------------------------------------------

def roi_align(fmap: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int, sampling_ratio: int = 2) -> jnp.ndarray:
    """Batched single-level RoIAlign: fmap [B,H,W,C], boxes [B,R,4] -> [B,R,os,os,C]."""
    if _use_matmul():
        return _roi_align_mm(fmap, boxes, spatial_scale, output_size,
                             sampling_ratio)
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
    levels (FPN paper eqn. 1). The levels are zero-padded to a common spatial
    size and stacked; each RoI reads ONLY its own level (matmul path: the level
    one-hot folds into the row weights; gather path: the level index folds into
    the flat gather offset). The padding is never read: sample coordinates are
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

    if _use_matmul():
        return _multiscale_roi_align_mm(stack, k, Hs, Ws, boxes, image_size,
                                        output_size, sampling_ratio)

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
