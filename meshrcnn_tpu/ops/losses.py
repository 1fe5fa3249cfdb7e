"""Differentiable mesh + voxel losses on padded buffers.

TPU-native rebuild of the reference loss suite (reference: meshRCNN/loss_functions.py):
voxel BCE, per-stage chamfer / normal / edge losses, summed over refinement stages.
Conventions matched for numeric parity (SURVEY.md §6 caveats):
  * point clouds are normalized per sample inside sampling (mesh_sampling.py:33-34);
  * chamfer is the *sum* of both one-sided sums divided by the cloud size once
    (loss_functions.py:65-66);
  * normal loss is the negated summed |cos| divided by cloud size
    (loss_functions.py:69-72);
  * edge loss is the mean squared edge length with a *batch-global* edge count
    normaliser (loss_functions.py:175-189 "normalizes as a whole and not per sample").
Changes vs the reference, by design: the edge loss gathers edge endpoints directly
([B,E,2] index into [B,V,3]) instead of building a full V x V distance matrix
(loss_functions.py:47-48); empty/overflowed meshes contribute zero loss via masks
instead of raising + skipping the batch (train_utils.py:134-137).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from meshrcnn_tpu.core.mesh import MeshBatch
from meshrcnn_tpu.ops.chamfer import batched_normal_distance, chamfer_distance
from meshrcnn_tpu.ops.sampling import batched_sample_points


def voxel_loss(voxel_pred: jnp.ndarray, voxel_gt: jnp.ndarray,
               eps: float = 1e-7) -> jnp.ndarray:
    """Mean BCE between predicted occupancy probabilities and {0,1} targets.

    Reference: loss_functions.py:10-14 (binary_cross_entropy on probabilities —
    the voxel branch ends in a sigmoid).
    """
    p = jnp.clip(voxel_pred, eps, 1.0 - eps)
    t = voxel_gt.astype(p.dtype)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def edge_loss(verts: jnp.ndarray, edges: jnp.ndarray,
              edges_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared edge length over all valid edges in the batch.

    verts [B,V,3], edges [B,E,2], edges_mask [B,E]. Direct endpoint gather replaces
    the reference's full p2p-matrix + COO gather (loss_functions.py:175-189); the
    normaliser is the total valid-edge count across the batch, matching its
    batch-global convention.
    """
    # take_rows_mxu: the endpoint gathers' backward is a one-hot MXU segment
    # sum instead of a serialized scatter-add into verts (ops/gather.py)
    from meshrcnn_tpu.ops.gather import take_rows_mxu
    v0 = take_rows_mxu(verts, edges[..., 0])
    v1 = take_rows_mxu(verts, edges[..., 1])
    d = v0 - v1                      # [B, E, 3]
    sq = jnp.sum(d * d, axis=-1)     # [B, E]
    m = edges_mask.astype(verts.dtype)
    total = jnp.sum(sq * m)
    count = jnp.maximum(jnp.sum(m), 1.0)
    return total / count


def mesh_loss(key: jax.Array,
              pred_verts: jnp.ndarray,
              pred_mesh: MeshBatch,
              gt_verts: jnp.ndarray, gt_faces: jnp.ndarray, gt_faces_mask: jnp.ndarray,
              point_cloud_size: int = 10000,
              num_neighbours: int = 10,
              tile: int = 2048,
              compute_normal: bool = True) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chamfer / normal / edge losses for one refinement stage.

    Reference: loss_functions.py:40-74. ``pred_verts`` [B,V,3] are this stage's
    positions on the topology of ``pred_mesh`` (faces/edges from cubify); GT meshes
    come padded from the data layer. Both clouds are re-sampled here with fresh
    randomness, as the reference does per stage.

    ``compute_normal=False`` statically skips the kNN + PCA-normal pipeline and
    returns 0.0 for the normal term. The train step sets it from the recipe's
    normal weight: with weight 0 (the reference's ShapeNet recipe, README.md:77)
    the normal value would be computed purely to be *reported*, and on TPU that
    pipeline (kNN candidate kernel + merges + eigensolver, both clouds x 3
    stages) profiles at ~70 ms of a ~350 ms step. Eval paths keep computing it —
    there it is a real metric.

    Normal estimator (``MESHRCNN_FACE_NORMALS``, default on): both clouds are
    sampled *from triangles*, whose exact unit normals the sampler returns for
    free (sampling.batched_sample_points) — so the default uses those directly
    instead of re-estimating normals from the sampled cloud by kNN + PCA, the
    reference's construction (loss_functions.py:129-170, a Mesh R-CNN-paper
    choice inherited from point-cloud pipelines that lack the mesh). This is a
    documented deviation: the face normal IS the surface normal at the sampled
    point (the PCA estimate converges to it as k neighbours localize), it is
    exact rather than 0.97-recall approximate, its backward is a cross-product
    VJP instead of eigensolver + neighbour-gather transposes, and it removes
    the entire self-kNN pipeline (~36% of the Pix3D step — PERFORMANCE.md
    round 3). ``MESHRCNN_FACE_NORMALS=0`` restores the reference's kNN + PCA
    estimator bit-for-bit (parity harnesses pin it).
    """
    import os
    e_loss = edge_loss(pred_verts, pred_mesh.edges, pred_mesh.edges_mask)
    face_normals = (compute_normal
                    and os.environ.get("MESHRCNN_FACE_NORMALS", "1") == "1")

    k_pred, k_gt = jax.random.split(key)
    norm_p = norm_g = None
    if face_normals:
        cloud_p, valid_p, norm_p = batched_sample_points(
            k_pred, pred_verts, pred_mesh.faces, pred_mesh.faces_mask,
            point_cloud_size, return_normals=True)
        cloud_g, valid_g, norm_g = batched_sample_points(
            k_gt, gt_verts, gt_faces, gt_faces_mask, point_cloud_size,
            return_normals=True)
    else:
        cloud_p, valid_p = batched_sample_points(
            k_pred, pred_verts, pred_mesh.faces, pred_mesh.faces_mask,
            point_cloud_size)
        cloud_g, valid_g = batched_sample_points(
            k_gt, gt_verts, gt_faces, gt_faces_mask, point_cloud_size)
    valid = (valid_p & valid_g).astype(jnp.float32)      # [B]

    use_fused = (jax.default_backend() == "tpu"
                 and os.environ.get("MESHRCNN_FUSED_CHAMFER", "1") == "1")
    if use_fused:
        if os.environ.get("MESHRCNN_BATCHED_CHAMFER", "1") == "1":
            # fused bidirectional Pallas kernel with the batch folded into the
            # kernel grid: one launch for all B samples, compiled once
            # regardless of B (VERDICT r2 weak item 6). The lax.map wrapper it
            # replaces cost ~6.7 ms/stage of scan-carry dynamic-slice traffic
            # on top of ~6.3 ms of kernel time (hlo_stats, PERFORMANCE.md r3).
            from meshrcnn_tpu.ops.chamfer_pallas import chamfer_sums_fused_batched
            cham_p, idx_p, cham_g, idx_g = chamfer_sums_fused_batched(cloud_p, cloud_g)
        else:
            # A/B fallback: per-sample kernel under lax.map (pre-r3 shape)
            from meshrcnn_tpu.ops.chamfer_pallas import chamfer_sums_fused
            cham_p, idx_p, cham_g, idx_g = jax.lax.map(
                lambda pg: chamfer_sums_fused(pg[0], pg[1]), (cloud_p, cloud_g))
    else:
        # XLA fallback: two independent tiled NN sweeps (vmap-safe matmul + min)
        def per_sample_nn(p, g):
            return chamfer_distance(p, g, tile)

        cham_p, idx_p, cham_g, idx_g = jax.vmap(per_sample_nn)(cloud_p, cloud_g)
    chamfer = jnp.sum((cham_p + cham_g) * valid) / point_cloud_size
    if compute_normal:
        align_p, align_g = batched_normal_distance(cloud_p, cloud_g, idx_p, idx_g,
                                                   k=num_neighbours, tile=tile,
                                                   normals_p=norm_p,
                                                   normals_q=norm_g)
        normal = -jnp.sum((align_p + align_g) * valid) / point_cloud_size
    else:
        normal = jnp.zeros((), dtype=jnp.float32)
    return chamfer, normal, e_loss


def batched_mesh_loss(key: jax.Array,
                      stage_verts: Sequence[jnp.ndarray],
                      pred_mesh: MeshBatch,
                      gt_verts: jnp.ndarray, gt_faces: jnp.ndarray,
                      gt_faces_mask: jnp.ndarray,
                      point_cloud_size: int = 10000,
                      num_neighbours: int = 10,
                      tile: int = 2048,
                      compute_normal: bool = True) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sum of mesh_loss over every refinement stage (reference: loss_functions.py:17-37)."""
    chamfer = normal = edge = 0.0
    for i, verts in enumerate(stage_verts):
        k = jax.random.fold_in(key, i)
        c, n, e = mesh_loss(k, verts, pred_mesh, gt_verts, gt_faces, gt_faces_mask,
                            point_cloud_size, num_neighbours, tile, compute_normal)
        chamfer = chamfer + c
        normal = normal + n
        edge = edge + e
    return chamfer, normal, edge
