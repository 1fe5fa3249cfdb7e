"""matplotlib 3D visualisation of meshes, voxels and point clouds.

Rebuild of reference utils/show.py:23-84 (trisurf / voxel / scatter renderers) on
numpy inputs; accepts padded buffers + masks directly.
"""
from __future__ import annotations

import numpy as np


def _unpad(arr, mask):
    arr = np.asarray(arr)
    if mask is None:
        return arr
    return arr[np.asarray(mask).astype(bool)]


def show_mesh(vertices, faces, verts_mask=None, faces_mask=None, show: bool = True):
    """Render a triangle mesh with plot_trisurf (reference: show.py:23-44)."""
    import matplotlib.pyplot as plt

    v = _unpad(vertices, verts_mask)
    f = _unpad(np.asarray(faces), faces_mask)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    if len(v) and len(f):
        ax.plot_trisurf(v[:, 0], v[:, 1], f, v[:, 2], shade=True, color="grey")
    if show:
        plt.show()
    return fig


def show_voxels(voxels, threshold: float = 0.5, show: bool = True):
    """Render an occupancy grid (reference: show.py:47-62)."""
    import matplotlib.pyplot as plt

    grid = np.asarray(voxels) > threshold
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.voxels(grid, edgecolor="k")
    if show:
        plt.show()
    return fig


def show_mesh_pointCloud(points, show: bool = True):
    """Scatter a sampled point cloud (reference: show.py:65-84)."""
    import matplotlib.pyplot as plt

    p = np.asarray(points).reshape(-1, 3)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=1)
    if show:
        plt.show()
    return fig
