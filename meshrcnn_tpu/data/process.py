"""Host-side mesh/voxel preprocessing (numpy).

Rebuilds reference utils/process.py: mesh normalization into the unit ball and
voxel grid resampling (adaptive max-pool down / nearest up, process.py:23-39 —
torch ``interpolate`` defaults to nearest).
"""
from __future__ import annotations

import numpy as np


def normalize_mesh(vertices: np.ndarray) -> np.ndarray:
    """Center on the mean; scale by max vertex norm only if outside the unit cube
    (reference: process.py:7-20)."""
    v = np.asarray(vertices, dtype=np.float32)
    v = v - v.mean(axis=0)
    if np.max(np.abs(v)) <= 1:
        return v
    factor = np.sqrt((v * v).sum(axis=1).max())
    return v / factor


def _adaptive_max_pool_1d_bounds(in_size: int, out_size: int):
    starts = (np.arange(out_size) * in_size) // out_size
    ends = -(-((np.arange(out_size) + 1) * in_size) // out_size)
    return starts, ends


def resample_voxels(voxels: np.ndarray, n: int) -> np.ndarray:
    """Up/downsample a [B, M, M, M] grid to [B, n, n, n] (reference: process.py:23-39).

    Down: adaptive max pool (occupancy-preserving). Up: nearest neighbour.
    """
    v = np.asarray(voxels)
    assert v.ndim == 4, "expects batched input BxVxVxV"
    m = v.shape[1]
    if m == n:
        return v
    if m > n:
        # separable adaptive max pool: reduce one axis at a time
        s, e = _adaptive_max_pool_1d_bounds(m, n)
        for axis in (1, 2, 3):
            v = np.stack([v.take(range(s[i], e[i]), axis=axis).max(axis=axis)
                          for i in range(n)], axis=axis)
        return v
    idx = (np.arange(n) * m) // n
    return v[:, idx][:, :, idx][:, :, :, idx]
