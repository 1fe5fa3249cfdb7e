"""Differentiable surface point sampling from padded meshes.

TPU-native redesign of the reference's ``sample`` (reference: utils/mesh_sampling.py:6-36,
after https://arxiv.org/pdf/1901.11461.pdf): area-weighted face selection followed by
the sqrt-barycentric trick. The reference uses ``torch.multinomial`` (native CUDA op,
SURVEY.md §2.9); here face selection is inverse-CDF sampling with ``jax.random`` —
a cumsum over face probabilities plus a vectorised ``searchsorted`` — which is fully
jittable and respects face masks (padded faces have zero area, hence zero probability).

Barycentric weights match the reference exactly (mesh_sampling.py:20-31):
    w0 = 1 - sqrt(xi1); w1 = (1 - xi2) sqrt(xi1); w2 = xi2 sqrt(xi1).
The sampled cloud is normalized per sample exactly like the reference
(mesh_sampling.py:33-34 -> process.py:7-20): centered, and scaled by the max point
norm only if any |coordinate| exceeds 1.

Gradients flow through the vertex positions (the face gather), matching the
reference's effective gradient path (multinomial choice is non-differentiable there too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from meshrcnn_tpu.core.mesh import normalize_verts


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray,
               faces_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Triangle surface areas |AB x AC| / 2 (reference: mesh_sampling.py:39-57).

    verts [V, 3], faces [F, 3] -> [F]; masked faces get area 0.
    """
    tri = verts[faces]                       # [F, 3, 3]
    ab = tri[:, 1] - tri[:, 0]
    ac = tri[:, 2] - tri[:, 0]
    n = jnp.cross(ab, ac)
    areas = 0.5 * jnp.linalg.norm(n, axis=-1)
    if faces_mask is not None:
        areas = jnp.where(faces_mask, areas, 0.0)
    return areas


def sample_points(key: jax.Array, verts: jnp.ndarray, faces: jnp.ndarray,
                  faces_mask: jnp.ndarray, num_points: int,
                  normalize: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a point cloud from one padded mesh.

    Returns:
      points [num_points, 3]; valid [] bool (False when the mesh has no real faces —
      the cloud is then all zeros; callers zero the sample's loss, replacing the
      reference's try/except batch skip).
    """
    pts, valid = batched_sample_points(key, verts[None], faces[None],
                                       faces_mask[None], num_points, normalize)
    return pts[0], valid[0]


def batched_sample_points(key: jax.Array, verts: jnp.ndarray, faces: jnp.ndarray,
                          faces_mask: jnp.ndarray, num_points: int,
                          normalize: bool = True, return_normals: bool = False):
    """Batched sampling: verts [B,V,3], faces [B,F,3], faces_mask [B,F].

    Replaces the reference's per-sample Python loop ``batched_mesh_sampling``
    (loss_functions.py:80-89). Implemented batched with flattened global-index
    gathers rather than vmap — batched-dimension gathers hit an XLA-TPU slow
    path (see ops/gather.py). Returns ([B, N, 3], [B] valid).

    ``return_normals=True`` additionally returns the unit face normal of the
    triangle each point was drawn from ([B, N, 3]) — the exact surface normal
    at the sampled point, computed from the already-gathered corner vertices
    (two subtractions + a cross product; ~free). Normals are invariant to the
    per-sample cloud normalization (centering + isotropic scale). Degenerate
    (zero-area) faces fall back to +z; area-weighted selection never picks
    them on valid meshes, so the fallback is a numerical guard only.
    """
    from meshrcnn_tpu.ops.gather import (batched_gather_rows,
                                         batched_searchsorted,
                                         counting_searchsorted,
                                         take_rows_mxu,
                                         use_counting_search)

    B, V, _ = verts.shape
    F = faces.shape[1]
    k_face, k1, k2 = jax.random.split(key, 3)

    # The area path's gradient is identically zero: areas feed only the
    # integer face_idx (through probs/cdf/searchsorted comparisons), so
    # stop_gradient spares autodiff the dead [B,F,9]->[B,V,3] scatter-adds.
    tri = batched_gather_rows(jax.lax.stop_gradient(verts),
                              faces.reshape(B, F * 3)).reshape(B, F, 3, 3)
    ab = tri[:, :, 1] - tri[:, :, 0]
    ac = tri[:, :, 2] - tri[:, :, 0]
    areas = 0.5 * jnp.linalg.norm(jnp.cross(ab, ac), axis=-1)   # [B, F]
    areas = jnp.where(faces_mask, areas, 0.0)
    total = jnp.sum(areas, axis=1)                               # [B]
    valid = total > 1e-12
    probs = areas / jnp.where(valid, total, 1.0)[:, None]
    cdf = jnp.cumsum(probs, axis=1)
    u = jax.random.uniform(k_face, (B, num_points))
    # TPU: gather-free counting searchsorted (one fused compare-reduce;
    # the bisection's ~14 gather rounds profiled ~4 ms/call at F=16k, N=10k)
    if use_counting_search():
        face_idx = counting_searchsorted(cdf, u, side="left")
    else:
        face_idx = batched_searchsorted(cdf, u, side="left")
    face_idx = jnp.clip(face_idx, 0, F - 1)

    # chosen[b,n,k] = verts[b, faces[b, face_idx[b,n], k]] — the two gather
    # levels composed into ONE row gather of verts whose backward is a one-hot
    # MXU segment sum (take_rows_mxu) instead of two serialized scatter-adds
    # (profiled ~10 ms/step in the loss backward, PERFORMANCE.md round 3).
    corner = face_idx[:, :, None] * 3 + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 3), 2)                                # [B, N, 3]
    vidx = batched_gather_rows(
        faces.reshape(B, F * 3).astype(jnp.int32)[..., None],
        corner.reshape(B, num_points * 3))[..., 0]              # [B, N*3]
    chosen = take_rows_mxu(verts, vidx).reshape(B, num_points, 3, 3)
    xi1_sqrt = jnp.sqrt(jax.random.uniform(k1, (B, num_points)))
    xi2 = jax.random.uniform(k2, (B, num_points))
    w0 = 1.0 - xi1_sqrt
    w1 = (1.0 - xi2) * xi1_sqrt
    w2 = xi2 * xi1_sqrt
    ws = jnp.stack([w0, w1, w2], axis=-1)    # [B, N, 3]
    pts = jnp.einsum("bnvd,bnv->bnd", chosen, ws,
                     precision=jax.lax.Precision.HIGHEST)
    if normalize:
        pts = jax.vmap(normalize_verts)(pts)
    pts = jnp.where(valid[:, None, None], pts, 0.0)
    if not return_normals:
        return pts, valid
    n = jnp.cross(chosen[:, :, 1] - chosen[:, :, 0],
                  chosen[:, :, 2] - chosen[:, :, 0])          # [B, N, 3]
    norm2 = jnp.sum(n * n, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], n.dtype), n.shape)
    # substitute BEFORE rsqrt: where() does not stop NaN gradients from the
    # untaken branch (same hardening as chamfer.smallest_eigenvector)
    n = jnp.where(norm2 > 1e-20, n, fallback)
    normals = n / jnp.sqrt(jnp.maximum(
        jnp.sum(n * n, axis=-1, keepdims=True), 1e-20))
    normals = jnp.where(valid[:, None, None], normals, 0.0)
    return pts, valid, normals
