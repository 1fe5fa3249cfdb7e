"""The padded training batch pytree.

Replaces the reference ``Batch`` (reference: data/dataloader.py:11-77), which carried
ragged concatenated meshes + Python index lists and a .to(device) method. Here a batch
is a pytree of fixed-shape arrays, so it shards with ``jax.sharding`` and crosses the
jit boundary as-is.
"""
from __future__ import annotations

from typing import Any, Optional

from flax import struct


@struct.dataclass
class Batch:
    images: Any            # [B, H, W, 3] float in [0, 1]
    voxels: Any            # [B, V, V, V] {0,1} ground-truth occupancy
    gt_verts: Any          # [B, Vgt, 3]
    gt_verts_mask: Any     # [B, Vgt] bool
    gt_faces: Any          # [B, Fgt, 3] int32
    gt_faces_mask: Any     # [B, Fgt] bool
    labels: Any            # [B] int32 class labels (ShapeNet backbone targets)
    # Pix3D-only detection targets (None for ShapeNet):
    boxes: Optional[Any] = None    # [B, 1, 4] xyxy ground-truth box
    masks: Optional[Any] = None    # [B, H, W] binary instance mask

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]
