"""The Pix3D Mesh R-CNN model: Mask R-CNN backbone -> RoI features -> voxel branch
-> cubify -> GCN refinement.

TPU-native rebuild of the reference Pix3D path (reference: meshRCNN/pix3d_model.py).
``Pix3DMaskRCNN`` composes the FPN trunk, RPN and the RoI heads with RoI-feature
passthrough (the reference's Pix3DMask_RCNN forward rethreading, pix3d_model.py:126-160);
``Pix3DModel`` mirrors Pix3DModel.forward (pix3d_model.py:46-117):

  * train: RoI features of the postprocessed detections are filtered to the single
    best-IoU RoI per image vs the GT box (filter_ROI_input, meshRCNN/utils.py:112-123)
    and only that one RoI drives the voxel/mesh branch (mesh_index = 1/image);
  * eval: every detection (fixed capacity ``detections_per_img``) gets a voxel grid
    and mesh — the ragged 'mesh_index = detections per image' list becomes a
    [B, D] validity mask over a fixed [B*D] mesh batch.

TPU deviation, by design: images must be a fixed-size batch [B, H, W, 3] (the data
layer resizes + rescales boxes/masks); torchvision's dynamic GeneralizedRCNNTransform
has no XLA analog (SURVEY.md §7 static-shape principle).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from meshrcnn_tpu.core.mesh import MeshBatch
from meshrcnn_tpu.models.fpn import ResNetFPN
from meshrcnn_tpu.models.layers import VertixRefinePix3D, VoxelBranch
from meshrcnn_tpu.models.roi_heads import Detections, RoIHeads
from meshrcnn_tpu.models.rpn import RPNHead, generate_anchors, rpn_loss, select_proposals
from meshrcnn_tpu.ops.boxes import box_iou
from meshrcnn_tpu.ops.cubify import CubifyOverflow, cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency


@struct.dataclass
class Pix3DOutput:
    detections: Optional[Detections]
    mask_probs: Any                  # [B, D, 28, 28] eval-mode mask probabilities
    backbone_losses: Any             # dict of RPN + RoI losses (train)
    voxels: Any                      # [N, V, V, V]; N = B (train) or B*D (eval)
    mesh: Optional[MeshBatch]
    stage_verts: Any
    mesh_valid: Any                  # [N] bool — which mesh slots are real
    overflow: Optional[CubifyOverflow]


class Pix3DMaskRCNN(nn.Module):
    """FPN + RPN + RoI heads; returns (detections, losses, roi_features, mask_probs).

    reference: pix3d_model.py:120-160 and pretrained_MaskRcnn's head configuration
    (pix3d_model.py:163-178: 12x12 box pool, sampling_ratio=1, 3 detections/img,
    num_classes=10).
    """

    num_classes: int = 10
    detections_per_img: int = 3
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    roi_batch_size: int = 512
    mask_rois: int = 64
    compute_dtype: str = "bfloat16"  # conv/matmul dtype for FPN/RPN/RoI heads;
                                     # norms, box math and losses stay f32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_labels: Optional[jnp.ndarray] = None,
                 gt_masks: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        H, W = images.shape[1:3]
        dtype = jnp.dtype(self.compute_dtype)
        feats = ResNetFPN(dtype=dtype, name="backbone")(images, train)  # [p2..p5, p6]
        logits, deltas = RPNHead(dtype=dtype, name="rpn_head")(feats)
        anchors = generate_anchors([f.shape[1:3] for f in feats], (H, W))

        proposals, _, prop_valid = select_proposals(
            logits, deltas, anchors, (H, W),
            pre_nms_top_n=self.rpn_pre_nms_top_n,
            post_nms_top_n=self.rpn_post_nms_top_n)

        losses = {}
        if train:
            obj_l, box_l = rpn_loss(jax.random.fold_in(rng, 3), logits, deltas,
                                    anchors, gt_boxes)
            losses["loss_objectness"] = obj_l
            losses["loss_rpn_box_reg"] = box_l

        detections, head_losses, mask_probs = RoIHeads(
            num_classes=self.num_classes,
            detections_per_img=self.detections_per_img,
            batch_size_per_image=self.roi_batch_size,
            mask_rois=self.mask_rois,
            dtype=dtype,
            name="roi_heads")(feats, proposals, prop_valid, (H, W), train=train,
                              gt_boxes=gt_boxes, gt_labels=gt_labels,
                              gt_masks=gt_masks,
                              rng=None if rng is None else jax.random.fold_in(rng, 5))
        losses.update(head_losses)
        return detections, losses, mask_probs


def filter_roi_input(gt_boxes: jnp.ndarray, detections: Detections) -> jnp.ndarray:
    """Keep the single RoI feature whose detection box best overlaps the GT box
    (reference: meshRCNN/utils.py:112-123). gt_boxes [B, 1, 4] -> [B, p, p, C]."""
    def per_image(gt, det_boxes, det_valid, feats):
        iou = box_iou(gt, det_boxes)[0]                     # [D]
        iou = jnp.where(det_valid, iou, -1.0)
        best = jnp.argmax(iou).astype(jnp.int32)
        return feats[best]
    return jax.vmap(per_image)(gt_boxes, detections.boxes, detections.valid,
                               detections.roi_features)


class Pix3DModel(nn.Module):
    """reference: pix3d_model.py:21-117 (constructor defaults 22-28)."""

    num_classes: int = 10
    cubify_threshold: float = 0.2
    voxel_out_channels: int = 24
    vertex_feature_dim: int = 128
    num_refinement_stages: int = 3
    voxel_only: bool = False
    detections_per_img: int = 3
    vert_capacity: int = 4096
    face_capacity: int = 8192
    edge_capacity: int = 16384
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    roi_batch_size: int = 512
    mask_rois: int = 64
    backbone_dtype: str = "bfloat16"  # detection-stack compute dtype (see Pix3DMaskRCNN)
    # Param-free per-RoI RMS normalization of the features feeding the mesh
    # branch (voxel head + refinement vert-align). The reference has no such
    # layer (its RoI features come from a COCO-initialised FPN and arrive at
    # std ~1, reference pix3d_model.py:163-178); a FROM-SCRATCH FPN feeds the
    # mesh branch at std ~100, which drives the voxel logits into deep
    # (soft-clamped) saturation from step one and parks the branch in the
    # all-off basin — measured in the round-5 two-phase curriculum runs
    # (PARITY.md): neither flat SGD 2e-3 nor the verbatim 0.02-peak recipe
    # schedule on the mesh branch alone escaped it in ~2-3k steps. Off by
    # default (reference-faithful); from-scratch recipes turn it on.
    mesh_feature_norm: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_labels: Optional[jnp.ndarray] = None,
                 gt_masks: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None) -> Pix3DOutput:
        B, H, W, _ = images.shape
        detections, bb_losses, mask_probs = Pix3DMaskRCNN(
            num_classes=self.num_classes,
            detections_per_img=self.detections_per_img,
            rpn_pre_nms_top_n=self.rpn_pre_nms_top_n,
            rpn_post_nms_top_n=self.rpn_post_nms_top_n,
            roi_batch_size=self.roi_batch_size,
            mask_rois=self.mask_rois,
            compute_dtype=self.backbone_dtype,
            name="backbone")(images, train, gt_boxes, gt_labels, gt_masks, rng)

        if train:
            # best-IoU RoI per image drives the mesh branch (mesh_index = 1/image)
            roi = filter_roi_input(gt_boxes, detections)       # [B, p, p, C]
            mesh_valid = jnp.ones((B,), bool)
            feat_img_idx = jnp.arange(B, dtype=jnp.int32)
        else:
            # one mesh per detection slot; invalid slots masked
            D = self.detections_per_img
            roi = detections.roi_features.reshape(
                B * D, *detections.roi_features.shape[2:])
            mesh_valid = detections.valid.reshape(B * D)
            feat_img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)

        if self.mesh_feature_norm:
            # scale-invariant mesh-branch input: x / rms(x) per RoI map
            rms = jnp.sqrt(jnp.mean(jnp.square(roi), axis=(1, 2, 3),
                                    keepdims=True) + 1e-6)
            roi = roi / rms

        voxels_nhwc = VoxelBranch(self.voxel_out_channels, name="voxelBranch")(roi)
        voxels = jnp.transpose(voxels_nhwc, (0, 3, 1, 2))      # [N, 24, 24, 24]

        if self.voxel_only:
            return Pix3DOutput(detections=detections, mask_probs=mask_probs,
                               backbone_losses=bb_losses, voxels=voxels, mesh=None,
                               stage_verts=(), mesh_valid=mesh_valid, overflow=None)

        mesh, overflow = cubify(voxels, self.cubify_threshold,
                                vert_capacity=self.vert_capacity,
                                face_capacity=self.face_capacity,
                                edge_capacity=self.edge_capacity)
        # kill meshes of invalid detection slots
        mesh = mesh.replace(
            verts_mask=mesh.verts_mask & mesh_valid[:, None],
            faces_mask=mesh.faces_mask & mesh_valid[:, None],
            edges_mask=mesh.edges_mask & mesh_valid[:, None])

        # the refinement stages pool from this sample's RoI feature map
        roi_for_align = roi                                    # [N, p, p, C]
        topo = precompute_adjacency(mesh.edges, mesh.edges_mask, self.vert_capacity)
        stage_verts = _run_refine_stages(roi_for_align, mesh.verts, topo, (H, W),
                                         self.vertex_feature_dim,
                                         self.num_refinement_stages)

        return Pix3DOutput(detections=detections, mask_probs=mask_probs,
                           backbone_losses=bb_losses, voxels=voxels, mesh=mesh,
                           stage_verts=stage_verts, mesh_valid=mesh_valid,
                           overflow=overflow)


def _run_refine_stages(roi_for_align, verts0, topo, image_size,
                       num_features: int, num_stages: int):
    """The refine0..refine{n-1} VertixRefinePix3D loop — single source of truth.

    Must be called from within an ``nn.compact`` ``__call__``: the cells bind
    to the CALLER's scope, which is exactly what keeps Pix3DModel and
    Pix3DRefineStages parameter-path-compatible (same "refine{i}" top-level
    names in both modules' param dicts).
    """
    stage_verts = [verts0]
    verts, feats_v = VertixRefinePix3D(use_input_features=False,
                                       num_features=num_features,
                                       name="refine0")(roi_for_align, verts0,
                                                       topo, image_size)
    stage_verts.append(verts)
    for i in range(1, num_stages):
        verts, feats_v = VertixRefinePix3D(use_input_features=True,
                                           num_features=num_features,
                                           name=f"refine{i}")(roi_for_align, verts,
                                                              topo, image_size,
                                                              vert_feats=feats_v)
        stage_verts.append(verts)
    return tuple(stage_verts)


class Pix3DRefineStages(nn.Module):
    """The refinement-stage tail of Pix3DModel as a standalone module.

    Submodule names ("refine0".."refine{n-1}") match Pix3DModel's top-level
    scope exactly, so this applies directly with a full Pix3DModel params dict
    (flax looks params up by path; the backbone/voxelBranch subtrees are simply
    unused). Exists for the split eval dispatch (parallel/train_step.py
    make_split_eval_step): compiling cubify together with these stages in one
    XLA program faults the TPU runtime (ROADMAP.md "Known issue"), while the
    same math as a separate program runs fine. A CPU test pins output equality
    with the single-dispatch forward (tests/test_pix3d.py).
    """

    vertex_feature_dim: int = 128
    num_refinement_stages: int = 3

    @nn.compact
    def __call__(self, roi_for_align: jnp.ndarray, verts0: jnp.ndarray,
                 topo, image_size: tuple[int, int]):
        return _run_refine_stages(roi_for_align, verts0, topo, image_size,
                                  self.vertex_feature_dim,
                                  self.num_refinement_stages)
