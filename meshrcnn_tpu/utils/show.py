"""matplotlib 3D visualisation of meshes, voxels and point clouds.

Rebuild of reference utils/show.py:23-84 (trisurf / voxel / scatter renderers)
on numpy inputs, with the reference's conveniences: str paths load from disk,
meshes outside the unit ball are normalized, an ``alpha``-degree x-rotation is
applied before rendering, and the point-cloud view samples the mesh surface.
Additionally accepts padded buffers + masks directly (the framework's native
mesh representation).
"""
from __future__ import annotations

import numpy as np

from meshrcnn_tpu.utils.rotation import rotation


def _unpad(arr, mask):
    arr = np.asarray(arr)
    if mask is None:
        return arr
    return arr[np.asarray(mask).astype(bool)]


def _as_mesh(mesh_or_verts, faces=None):
    """(verts, faces) from a path, a Mesh/(v,f) pair, or separate arrays."""
    if isinstance(mesh_or_verts, str):
        from meshrcnn_tpu.data.serialization import load_mesh
        m = load_mesh(mesh_or_verts)
        return np.asarray(m.vertices), np.asarray(m.faces)
    if faces is None:
        v, f = mesh_or_verts  # Mesh namedtuple or (verts, faces) pair
        return np.asarray(v), np.asarray(f)
    return np.asarray(mesh_or_verts), np.asarray(faces)


def show_mesh(vertices, faces=None, verts_mask=None, faces_mask=None,
              alpha: float = 0.0, show: bool = True):
    """Render a triangle mesh with plot_trisurf (reference: show.py:23-46).

    ``vertices`` may be an OBJ path, a Mesh/(verts, faces) pair, or a padded
    verts array with ``faces`` (+ optional masks). Meshes outside the unit
    ball are normalized; 1-based face indexing is fixed up; ``alpha`` rotates
    about x in degrees; axes span [-1, 1] with the reference's (x, z, -y)
    plotting convention.
    """
    import matplotlib.pyplot as plt

    v, f = _as_mesh(vertices, faces)
    v = _unpad(v, verts_mask)
    f = _unpad(f, faces_mask).astype(np.int64)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    if len(v) and len(f):
        if np.abs(v).max() > 1:
            from meshrcnn_tpu.data.process import normalize_mesh
            v = np.asarray(normalize_mesh(v))
        if f.min() == 1:
            f = f - 1
        v = v @ rotation(alpha)
        ax.set_xlim([-1, 1]); ax.set_ylim([-1, 1]); ax.set_zlim([-1, 1])
        ax.plot_trisurf(v[:, 0], -v[:, 2], f, v[:, 1], shade=True, color="grey")
    if show:
        plt.show()
    return fig


def show_voxels(voxels, threshold: float = 0.5, show: bool = True):
    """Render an occupancy grid (reference: show.py:49-62). Accepts a path."""
    import matplotlib.pyplot as plt

    if isinstance(voxels, str):
        from meshrcnn_tpu.data.serialization import load_voxels
        voxels = load_voxels(voxels)
    grid = np.asarray(voxels) > threshold
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.voxels(grid, facecolors="grey", edgecolor="k")
    if show:
        plt.show()
    return fig


def show_mesh_pointCloud(mesh, faces=None, alpha: float = -90.0,
                         num_points: int = 5000, show: bool = True,
                         verts_mask=None, faces_mask=None):
    """Scatter a cloud sampled from the mesh surface (reference: show.py:65-84).

    Accepts a path / Mesh / (verts, faces) like show_mesh, or a raw [N, 3]
    point array (rotated and scattered directly).
    """
    import matplotlib.pyplot as plt

    arr = np.asarray(mesh) if not isinstance(mesh, (str, tuple)) else None
    if arr is not None and faces is None and arr.ndim == 2 and arr.shape[1] == 3 \
            and verts_mask is None:
        points = arr
    else:
        v, f = _as_mesh(mesh, faces)
        v = _unpad(v, verts_mask)
        f = _unpad(f, faces_mask).astype(np.int64)
        points = _sample_surface(v, f, num_points)
    points = points @ rotation(alpha)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1)
    if show:
        plt.show()
    return fig


def _sample_surface(verts: np.ndarray, faces: np.ndarray, n: int) -> np.ndarray:
    """Area-weighted surface sampling, host-side numpy (viz only — the
    differentiable on-device sampler is ops/sampling.py)."""
    if len(faces) == 0 or len(verts) == 0:
        return np.zeros((0, 3), np.float32)
    a, b, c = (verts[faces[:, i]] for i in range(3))
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    p = areas / max(areas.sum(), 1e-12)
    rng = np.random.RandomState(0)
    idx = rng.choice(len(faces), size=n, p=p)
    u, w = rng.rand(n, 1), rng.rand(n, 1)
    flip = (u + w) > 1
    u, w = np.where(flip, 1 - u, u), np.where(flip, 1 - w, w)
    return (a[idx] + u * (b[idx] - a[idx]) + w * (c[idx] - a[idx])).astype(np.float32)
