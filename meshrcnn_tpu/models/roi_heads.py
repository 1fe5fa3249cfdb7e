"""RoI heads with RoI-feature passthrough — the 'ModifiedRoIHead' of the TPU build.

Rebuilds the reference's ModifiedRoIHead (reference: meshRCNN/layers.py:616-811),
whose defining change vs stock torchvision is that the *pooled box RoI features are
returned in both train and eval* (third return value, layers.py:811) so the voxel
branch can consume them, with surviving-box index tracking through
score-filter/NMS back to feature rows (layers.py:654-684).

Fixed-shape redesign: proposals, sampled training rois, and detections all live in
static-capacity buffers with validity masks; the reference's filter chains become
mask compositions; ``feature_indices = box_idx // (num_classes - 1)``
(layers.py:683) survives verbatim as integer math on kept indices.

Config mirrors ``pretrained_MaskRcnn``'s custom head build (pix3d_model.py:172-176):
num_classes=10, detections_per_img=3, 12x12 box RoI pool with sampling_ratio=1,
plus the standard 14x14 mask pool -> 4-conv mask head -> 28x28 logits.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from meshrcnn_tpu.ops.boxes import (box_iou, clip_boxes_to_image, decode_boxes,
                                    encode_boxes, small_box_mask)
from meshrcnn_tpu.ops.matcher import BELOW_LOW, balanced_sample, match_boxes, smooth_l1
from meshrcnn_tpu.ops.nms import batched_nms_mask
from meshrcnn_tpu.ops.roi_align import multiscale_roi_align, roi_align

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)  # torchvision BoxCoder default


@struct.dataclass
class Detections:
    """Fixed-capacity per-image detections (capacity = detections_per_img)."""
    boxes: jax.Array        # [B, D, 4]
    labels: jax.Array       # [B, D] int32 (1-based classes, 0 = invalid)
    scores: jax.Array       # [B, D]
    valid: jax.Array        # [B, D] bool
    roi_features: jax.Array  # [B, D, pool, pool, C] — the GCN features


class TwoMLPHead(nn.Module):
    """flatten -> fc1024 -> relu -> fc1024 -> relu (torchvision TwoMLPHead).

    The fc6 matmul ([R, pool*pool*256] x [.., 1024]) is the heaviest single op of
    the box branch; it computes in ``dtype`` (bf16 on TPU) with an f32 output.
    """

    representation_size: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc7")(x))
        return x.astype(jnp.float32)


class FastRCNNPredictor(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits = nn.Dense(self.num_classes, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return logits, deltas


class MaskHead(nn.Module):
    """4x (conv3x3 256 + relu) -> deconv x2 -> relu -> 1x1 num_classes logits.

    Convs compute in ``dtype``; logits cast back to f32 for the mask BCE.
    """

    num_classes: int
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, R = x.shape[:2]
        x = x.reshape(B * R, *x.shape[2:])
        for i in range(4):
            x = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.hidden, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="conv5_mask")(x))
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="mask_fcn_logits")(x).astype(jnp.float32)
        return x.reshape(B, R, *x.shape[1:])


class RoIHeads(nn.Module):
    """Box + mask heads with RoI-feature passthrough (fixed shapes)."""

    num_classes: int = 10
    box_pool_size: int = 12
    box_sampling_ratio: int = 1
    mask_pool_size: int = 14
    mask_sampling_ratio: int = 2
    detections_per_img: int = 3
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    fg_iou: float = 0.5
    bg_iou: float = 0.5
    mask_rois: int = 64  # static cap on positive proposals fed to the mask head
    dtype: jnp.dtype = jnp.float32  # head conv/matmul compute dtype
    post_nms_prefilter: int = 576  # total pre-NMS candidate budget, split
                                   # per-class: K_c = 576 // (C-1) = 64 at the
                                   # Pix3D config (see _postprocess)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], proposals: jnp.ndarray,
                 proposals_valid: jnp.ndarray, image_size: tuple[int, int],
                 train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,     # [B, G, 4]
                 gt_labels: Optional[jnp.ndarray] = None,    # [B] int32 (1-based)
                 gt_masks: Optional[jnp.ndarray] = None,     # [B, H, W]
                 rng: Optional[jax.Array] = None):
        B = proposals.shape[0]
        losses = {}

        if train:
            assert gt_boxes is not None and gt_labels is not None and rng is not None
            proposals, proposals_valid, labels, reg_targets, is_pos = (
                self._select_training_samples(rng, proposals, proposals_valid,
                                              gt_boxes, gt_labels))

        # ---- box branch -------------------------------------------------------
        box_feats = multiscale_roi_align(list(features[:4]), proposals, image_size,
                                         self.box_pool_size, self.box_sampling_ratio)
        x = TwoMLPHead(dtype=self.dtype, name="box_head")(box_feats)
        class_logits, box_deltas = FastRCNNPredictor(self.num_classes,
                                                     name="box_predictor")(x)
        box_deltas = box_deltas.reshape(B, -1, self.num_classes, 4)

        if train:
            v = proposals_valid.astype(jnp.float32)
            ce = _softmax_ce(class_logits, labels) * v
            losses["loss_classifier"] = ce.sum() / jnp.maximum(v.sum(), 1.0)
            # class-specific deltas at the GT class, positives only
            cls_idx = jnp.clip(labels, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                box_deltas, cls_idx[..., None, None].astype(jnp.int32)
                .repeat(4, -1), axis=2)[:, :, 0]
            pm = (is_pos & proposals_valid).astype(jnp.float32)
            bl = smooth_l1(sel, reg_targets).sum(-1) * pm
            losses["loss_box_reg"] = bl.sum() / jnp.maximum(v.sum(), 1.0)

        detections = self._postprocess(box_feats, class_logits, box_deltas,
                                       proposals, proposals_valid, image_size)

        # ---- mask branch ------------------------------------------------------
        mask_probs = None
        if train:
            if gt_masks is not None:
                losses["loss_mask"] = self._mask_loss(
                    rng, features, proposals, labels, is_pos & proposals_valid,
                    gt_boxes, gt_labels, gt_masks, image_size)
        else:
            det_feats = multiscale_roi_align(list(features[:4]), detections.boxes,
                                             image_size, self.mask_pool_size,
                                             self.mask_sampling_ratio)
            mask_logits = MaskHead(self.num_classes, dtype=self.dtype,
                                   name="mask_head")(det_feats)
            cls = jnp.clip(detections.labels, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                jnp.transpose(mask_logits, (0, 1, 4, 2, 3)),
                cls[..., None, None, None].astype(jnp.int32), axis=2)[:, :, 0]
            mask_probs = jax.nn.sigmoid(sel)  # [B, D, 28, 28] at the predicted class

        return detections, losses, mask_probs

    # ------------------------------------------------------------------ helpers

    def _select_training_samples(self, rng, proposals, proposals_valid,
                                 gt_boxes, gt_labels):
        """Append GT, match at fg/bg IoU 0.5, sample 512 @ 25% positives
        (reference: layers.py:702-704 via torchvision select_training_samples)."""
        B, G = gt_boxes.shape[:2]
        proposals = jnp.concatenate([proposals, gt_boxes], axis=1)
        proposals_valid = jnp.concatenate(
            [proposals_valid, jnp.ones((B, G), bool)], axis=1)
        gt_valid = jnp.ones((G,), bool)

        def per_image(k, props, pvalid, gt_b, gt_l):
            iou = box_iou(props, gt_b)
            iou = jnp.where(pvalid[:, None], iou, -1.0)
            matches = match_boxes(iou, gt_valid, self.fg_iou, self.bg_iou)
            positive = (matches >= 0) & pvalid
            negative = (matches == BELOW_LOW) & pvalid
            idx, is_pos, valid = balanced_sample(k, positive, negative,
                                                 self.batch_size_per_image,
                                                 self.positive_fraction)
            sp = props[idx]
            matched = jnp.clip(matches[idx], 0, G - 1)
            lab = jnp.where(is_pos, gt_l, 0).astype(jnp.int32)  # gt_l scalar class
            tgt = encode_boxes(gt_b[matched], sp, BOX_REG_WEIGHTS)
            return sp, valid, lab, tgt, is_pos

        keys = jax.random.split(rng, B)
        return jax.vmap(per_image)(keys, proposals, proposals_valid,
                                   gt_boxes, gt_labels)

    def _postprocess(self, box_feats, class_logits, box_deltas, proposals,
                     proposals_valid, image_size) -> Detections:
        """Fixed-shape port of postprocess_detections (layers.py:621-685)."""
        B, R = class_logits.shape[:2]
        C = self.num_classes
        scores = jax.nn.softmax(class_logits, axis=-1)
        boxes = decode_boxes(box_deltas, proposals[:, :, None, :], BOX_REG_WEIGHTS)
        boxes = clip_boxes_to_image(boxes, image_size)

        # drop background column; flatten (proposal, class) pairs
        fg_boxes = boxes[:, :, 1:].reshape(B, R * (C - 1), 4)
        fg_scores = scores[:, :, 1:].reshape(B, R * (C - 1))
        labels = jnp.broadcast_to(
            jnp.arange(1, C, dtype=jnp.int32)[None, None], (B, R, C - 1)
        ).reshape(B, R * (C - 1))
        valid = (jnp.broadcast_to(proposals_valid[:, :, None], (B, R, C - 1))
                 .reshape(B, R * (C - 1)))
        valid = valid & (fg_scores > self.score_thresh) & small_box_mask(fg_boxes)

        # PER-CLASS score top-K prefilter before NMS: the full (proposal, class)
        # flattening is R*(C-1) = 4608 candidates at production config, whose
        # pairwise-IoU matrix is ~85 MB/image — yet only detections_per_img=3
        # survive. Suppression is class-aware (batched NMS offsets boxes by
        # label), so a candidate only competes within its own class; keeping the
        # top-K_c per class (K_c = prefilter // (C-1) = 64 at defaults) makes
        # this a BOUNDED APPROXIMATION, not exact: a weaker same-class second
        # object is lost only if >= K_c higher-scored candidates of that class
        # outrank it — i.e. >= 64 near-duplicates of a dominant object that all
        # survived the RPN's 0.7-IoU NMS AND classify as the same class
        # (duplicate-saturation failure mode; ADVICE r2 finding 1 — the old
        # global top-256 claimed exactness and could saturate across classes).
        # Reference postprocess_detections (layers.py:621-685) runs the dynamic
        # equivalent where the IoU matrix never materialises.
        Kc = min(R, max(self.detections_per_img,
                        self.post_nms_prefilter // (C - 1)))
        sc3 = jnp.where(valid, fg_scores, -jnp.inf).reshape(B, R, C - 1)
        pre_sc_c, pre_r = jax.lax.top_k(sc3.transpose(0, 2, 1), Kc)  # [B, C-1, Kc]
        cls_off = jnp.arange(C - 1, dtype=jnp.int32)[None, :, None]
        pre_idx = (pre_r * (C - 1) + cls_off).reshape(B, (C - 1) * Kc)
        pre_sc = pre_sc_c.reshape(B, (C - 1) * Kc)
        take = lambda a: jnp.take_along_axis(a, pre_idx, axis=1)
        pre_boxes = jnp.take_along_axis(fg_boxes, pre_idx[..., None], axis=1)
        pre_labels = take(labels)
        pre_valid = take(valid) & jnp.isfinite(pre_sc)

        def per_image(bx, sc, lb, vd):
            order, keep = batched_nms_mask(bx, sc, lb, vd, self.nms_thresh,
                                           self.detections_per_img)
            safe = jnp.where(order >= 0, order, 0)
            return bx[safe], lb[safe], jnp.where(keep, sc[safe], 0.0), keep, safe

        b, l, s, k, safe_pre = jax.vmap(per_image)(pre_boxes, pre_sc, pre_labels,
                                                   pre_valid)
        # map prefiltered slots back to original (proposal, class) flat indices
        safe = jnp.take_along_axis(pre_idx, safe_pre, axis=1)
        # feature_indices = box_idx // (num_classes - 1) (layers.py:683); gathered
        # flat (a vmapped gather of [12,12,256] rows hits the XLA-TPU slow path)
        from meshrcnn_tpu.ops.gather import batched_gather_rows
        feat_idx = safe // (C - 1)
        f = batched_gather_rows(box_feats.reshape(B, R, -1), feat_idx).reshape(
            (B, self.detections_per_img) + box_feats.shape[2:])
        # the voxel/GCN mesh branch downstream is f32 (bf16 heads stop here)
        return Detections(boxes=b, labels=jnp.where(k, l, 0), scores=s, valid=k,
                          roi_features=f.astype(jnp.float32))

    def _mask_loss(self, rng, features, proposals, labels, pos_mask,
                   gt_boxes, gt_labels, gt_masks, image_size):
        """BCE of the GT-class mask logits vs the GT mask cropped to each positive
        proposal (torchvision maskrcnn_loss; reference layers.py:766-769)."""
        B = proposals.shape[0]
        M = self.mask_rois
        k = jax.random.fold_in(rng, 101)

        # take up to M positive proposals per image (randomized top-k)
        score = jnp.where(pos_mask, jax.random.uniform(k, pos_mask.shape), -jnp.inf)
        _, idx = jax.lax.top_k(score, M)
        sel_valid = jnp.take_along_axis(pos_mask, idx, axis=1)
        sel_props = jnp.take_along_axis(proposals, idx[..., None].repeat(4, -1), axis=1)

        pooled = multiscale_roi_align(list(features[:4]), sel_props, image_size,
                                      self.mask_pool_size, self.mask_sampling_ratio)
        logits = MaskHead(self.num_classes, dtype=self.dtype,
                          name="mask_head")(pooled)  # [B,M,28,28,C]
        cls = jnp.broadcast_to(jnp.clip(gt_labels, 0, self.num_classes - 1)[:, None],
                               (B, M)).astype(jnp.int32)
        sel_logits = jnp.take_along_axis(
            jnp.transpose(logits, (0, 1, 4, 2, 3)),
            cls[..., None, None, None], axis=2)[:, :, 0]          # [B, M, 28, 28]

        # crop GT masks to each proposal at 28x28 via roi_align on the mask image
        # (stop_gradient: targets are thresholded GT — keeps autodiff from ever
        # building the gather's backward scatter over the [B, H, W] mask image)
        out_sz = logits.shape[2]
        targets = jax.lax.stop_gradient(
            roi_align(gt_masks[..., None].astype(jnp.float32), sel_props,
                      1.0, out_sz, sampling_ratio=2)[..., 0])
        targets = (targets >= 0.5).astype(jnp.float32)

        bce = (jnp.maximum(sel_logits, 0) - sel_logits * targets
               + jnp.log1p(jnp.exp(-jnp.abs(sel_logits))))
        w = sel_valid.astype(jnp.float32)[..., None, None]
        return (bce * w).sum() / jnp.maximum(w.sum() * out_sz * out_sz, 1.0)


def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                                axis=-1)[..., 0]
