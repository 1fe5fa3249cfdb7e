"""The ShapeNet Mesh R-CNN model: ResNet-50 -> voxel branch -> cubify -> GCN refinement.

TPU-native rebuild of the reference composition root (reference:
meshRCNN/shapenet_model.py:17-101). The module is *functional*: it maps images to an
output pytree of fixed-shape arrays (voxel grid, padded mesh, per-stage vertex
positions, class logits); losses are computed outside by ``meshrcnn_tpu.ops.losses``
so the RNG for differentiable sampling stays explicit and the whole train step is
one jit-compiled program. A parity wrapper reproducing the reference's
train-returns-losses / eval-returns-predictions dict API lives in
``meshrcnn_tpu.models.api``.

Dataflow matches shapenet_model.py:43-99 step by step:
  backbone -> (logits, [c2..c5]) -> 4.8x align-corners bilinear upscale of c5
  -> VoxelBranch(2048->48) -> [B,48,48,48] occupancy -> cubify(threshold)
  -> refine stage 0 (no input features) -> stages 1..n-1 (with features),
yielding stage positions [cubify, s1, s2, s3].
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from meshrcnn_tpu.core.mesh import MeshBatch
from meshrcnn_tpu.models.layers import (ResVertixRefineShapenet, VertixRefineShapeNet,
                                        VoxelBranch)
from meshrcnn_tpu.models.resnet import ResNet50
from meshrcnn_tpu.ops.cubify import CubifyOverflow, cubify
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency
from meshrcnn_tpu.utils.image import resize_bilinear_align_corners, scaled_size


@struct.dataclass
class ShapeNetOutput:
    """Fixed-shape output pytree of one forward pass."""
    logits: Any                     # [B, num_classes]
    voxels: Any                     # [B, 48, 48, 48] occupancy probabilities
    mesh: Optional[MeshBatch]       # cubify topology (None if voxel_only)
    stage_verts: Any                # tuple of [B, Vmax, 3]: cubify + each refine stage
    overflow: Optional[CubifyOverflow]


class ShapeNetModel(nn.Module):
    """reference: shapenet_model.py:17-101 (constructor defaults 18-24)."""

    num_classes: int = 13
    residual: bool = False
    cubify_threshold: float = 0.2
    voxel_in_channels: int = 2048
    voxel_out_channels: int = 48
    vertex_feature_dim: int = 128
    num_refinement_stages: int = 3
    voxel_only: bool = False
    upscale_factor: float = 4.8
    vert_capacity: int = 8192
    face_capacity: int = 16384
    edge_capacity: int = 32768
    backbone_dtype: str = "bfloat16"  # conv compute dtype; BN/params stay f32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> ShapeNetOutput:
        B, H, W, _ = images.shape
        logits, feature_maps = ResNet50(num_classes=self.num_classes,
                                        dtype=jnp.dtype(self.backbone_dtype),
                                        name="backbone")(images, train)

        c5 = feature_maps[-1]
        out_hw = (scaled_size(c5.shape[1], self.upscale_factor),
                  scaled_size(c5.shape[2], self.upscale_factor))
        upscaled = resize_bilinear_align_corners(c5, out_hw)
        vox_nhwc = VoxelBranch(self.voxel_out_channels, name="voxelBranch")(upscaled)
        # NHWC channel axis is the depth (z) axis of the occupancy grid:
        # [B, y, x, z] -> [B, z, y, x] as in the reference's NCHW layout.
        voxels = jnp.transpose(vox_nhwc, (0, 3, 1, 2))

        if self.voxel_only:
            return ShapeNetOutput(logits=logits, voxels=voxels, mesh=None,
                                  stage_verts=(), overflow=None)

        mesh, overflow = cubify(voxels, self.cubify_threshold,
                                vert_capacity=self.vert_capacity,
                                face_capacity=self.face_capacity,
                                edge_capacity=self.edge_capacity)

        # sort orders + segment boundaries shared by every GraphConv this step
        topo = precompute_adjacency(mesh.edges, mesh.edges_mask, self.vert_capacity)

        refine_cls = ResVertixRefineShapenet if self.residual else VertixRefineShapeNet
        stage_verts = [mesh.verts]
        verts, feats = refine_cls(use_input_features=False,
                                  num_features=self.vertex_feature_dim,
                                  name="refine0")(feature_maps, mesh.verts,
                                                  topo, (H, W))
        stage_verts.append(verts)
        for i in range(1, self.num_refinement_stages):
            verts, feats = refine_cls(use_input_features=True,
                                      num_features=self.vertex_feature_dim,
                                      name=f"refine{i}")(feature_maps, verts,
                                                         topo, (H, W),
                                                         vert_feats=feats)
            stage_verts.append(verts)

        return ShapeNetOutput(logits=logits, voxels=voxels, mesh=mesh,
                              stage_verts=tuple(stage_verts), overflow=overflow)
