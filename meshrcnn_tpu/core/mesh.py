"""Fixed-capacity padded mesh batch — the core data type of the TPU framework.

The reference (alondj/Mesh_R-CNN_Computer_Vision_project) batches ragged meshes by
concatenating per-sample vertex/face matrices along dim 0 and carrying Python lists
``vertice_index``/``face_index``/``mesh_index`` to split them again
(reference: meshRCNN/layers.py:16-20, data/dataloader.py:21-29). That representation
forces dynamic shapes, Python loops and host round-trips — all poison for XLA.

Here every mesh batch is a pytree of *fixed-capacity* arrays with validity masks:

    verts      [B, Vmax, 3]  float   padded vertex positions
    verts_mask [B, Vmax]     bool    True where the vertex is real
    faces      [B, Fmax, 3]  int32   indices into the per-sample vertex axis
    faces_mask [B, Fmax]     bool
    edges      [B, Emax, 2]  int32   unique undirected edges (i < j)
    edges_mask [B, Emax]     bool

Padded face/edge rows point at vertex slot 0 so every gather stays in-bounds; the
masks make padded rows contribute nothing to any op or loss. The whole training step
therefore compiles to a single XLA program with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MeshBatch:
    """A batch of triangle meshes in fixed-capacity padded form."""

    verts: jax.Array       # [B, Vmax, 3] float
    verts_mask: jax.Array  # [B, Vmax] bool
    faces: jax.Array       # [B, Fmax, 3] int32
    faces_mask: jax.Array  # [B, Fmax] bool
    edges: jax.Array       # [B, Emax, 2] int32
    edges_mask: jax.Array  # [B, Emax] bool

    @property
    def batch_size(self) -> int:
        return self.verts.shape[0]

    @property
    def vert_capacity(self) -> int:
        return self.verts.shape[1]

    @property
    def face_capacity(self) -> int:
        return self.faces.shape[1]

    @property
    def edge_capacity(self) -> int:
        return self.edges.shape[1]

    def num_verts(self) -> jax.Array:
        """[B] number of real vertices per sample."""
        return jnp.sum(self.verts_mask.astype(jnp.int32), axis=1)

    def num_faces(self) -> jax.Array:
        return jnp.sum(self.faces_mask.astype(jnp.int32), axis=1)

    def num_edges(self) -> jax.Array:
        return jnp.sum(self.edges_mask.astype(jnp.int32), axis=1)

    def replace_verts(self, verts: jax.Array) -> "MeshBatch":
        """New MeshBatch with updated vertex positions (same topology)."""
        return self.replace(verts=verts)


def normalize_verts(verts: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Center vertices and scale into the unit ball if they fall outside it.

    Mirrors the reference's ``normalize_mesh`` (reference: utils/process.py:7-20):
    subtract the mean, then divide by the max vertex norm *only* when the max
    absolute coordinate exceeds 1. Masked (padded) rows are excluded from the
    statistics and zeroed in the output.
    """
    if mask is None:
        centered = verts - jnp.mean(verts, axis=0, keepdims=True)
        needs = jnp.max(jnp.abs(centered)) > 1.0
        factor = jnp.sqrt(jnp.max(jnp.sum(centered * centered, axis=-1)))
        factor = jnp.where(needs, jnp.maximum(factor, 1e-12), 1.0)
        return centered / factor
    m = mask.astype(verts.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(verts * m, axis=0, keepdims=True) / n
    centered = (verts - mean) * m
    needs = jnp.max(jnp.abs(centered)) > 1.0
    factor = jnp.sqrt(jnp.max(jnp.sum(centered * centered, axis=-1)))
    factor = jnp.where(needs, jnp.maximum(factor, 1e-12), 1.0)
    return centered / factor


def pad_mesh_np(vertices, faces, vert_capacity: int, face_capacity: int,
                edge_capacity: int | None = None):
    """Host-side (numpy) padding of one ragged mesh into fixed-capacity buffers.

    Used by the data layer to collate ground-truth meshes. Meshes larger than the
    capacity are truncated (and the caller is expected to report it — the reference
    silently skipped whole batches on failure instead, utils/train_utils.py:134-137).

    Returns dict of numpy arrays: verts [Vmax,3] f32, verts_mask [Vmax] bool,
    faces [Fmax,3] i32, faces_mask [Fmax] bool (+ edges if edge_capacity given).
    """
    import numpy as np

    v = np.asarray(vertices, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int32)
    nv = min(v.shape[0], vert_capacity)
    # keep only faces whose vertices survived truncation
    f = f[(f < nv).all(axis=1)] if v.shape[0] > vert_capacity else f
    nf = min(f.shape[0], face_capacity)
    verts = np.zeros((vert_capacity, 3), dtype=np.float32)
    verts[:nv] = v[:nv]
    verts_mask = np.zeros((vert_capacity,), dtype=bool)
    verts_mask[:nv] = True
    faces_out = np.zeros((face_capacity, 3), dtype=np.int32)
    faces_out[:nf] = f[:nf]
    faces_mask = np.zeros((face_capacity,), dtype=bool)
    faces_mask[:nf] = True
    out = dict(verts=verts, verts_mask=verts_mask, faces=faces_out, faces_mask=faces_mask)
    if edge_capacity is not None:
        # host-side unique undirected edges
        e = np.concatenate([f[:nf][:, [0, 1]], f[:nf][:, [1, 2]], f[:nf][:, [0, 2]]], axis=0)
        e = np.sort(e, axis=1)
        e = np.unique(e, axis=0) if e.size else e.reshape(0, 2)
        ne = min(e.shape[0], edge_capacity)
        edges = np.zeros((edge_capacity, 2), dtype=np.int32)
        edges[:ne] = e[:ne]
        edges_mask = np.zeros((edge_capacity,), dtype=bool)
        edges_mask[:ne] = True
        out.update(edges=edges, edges_mask=edges_mask)
    return out
