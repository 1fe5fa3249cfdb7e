"""Batched row-gather helpers that avoid XLA-TPU's batched-gather slow path.

A vmapped ``x[i]`` (gather with batch dimensions) triggers a pathological XLA TPU
lowering — measured ~4 minutes of compile time and ~2x runtime for a [3, 32k] row
gather — while the same gather expressed over a flattened [B*N, C] array with
global indices compiles in ~2s. Every hot gather in the framework goes through
these helpers instead of vmapped fancy indexing.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def batched_gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, ...], idx [B, M] int -> [B, M, ...] with out[b, m] = x[b, idx[b, m]]."""
    B, N = x.shape[:2]
    M = idx.shape[1]
    flat = x.reshape((B * N,) + x.shape[2:])
    offsets = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    g = flat[(idx.astype(jnp.int32) + offsets).reshape(-1)]
    return g.reshape((B, M) + x.shape[2:])


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Single-sample alias (documents intent): x [N, ...], idx [M] -> [M, ...]."""
    return x[idx.astype(jnp.int32)]


def take_along_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(x, idx, axis=1) for 2-D x via one flat gather.

    x [N, C], idx [N, K] -> [N, K]. jnp.take_along_axis lowers to a batched
    gather (the XLA-TPU slow path); the flattened global-index gather does not.
    """
    N, C = x.shape
    base = (jnp.arange(N, dtype=jnp.int32) * C)[:, None]
    return x.reshape(-1)[(idx.astype(jnp.int32) + base).reshape(-1)].reshape(idx.shape)


def batched_searchsorted(keys: jnp.ndarray, queries: jnp.ndarray,
                         side: str = "left") -> jnp.ndarray:
    """searchsorted over a batch of sorted key rows, scatter/batched-gather-free.

    keys [B, K] ascending per row, queries [B, Q] -> insertion indices [B, Q].
    Iterative bisection (ceil(log2 K) rounds) whose probes are flattened
    global-index gathers; a vmapped jnp.searchsorted measured ~40 ms/step in the
    train profile, this runs in ~1 ms.
    """
    B, K = keys.shape
    Q = queries.shape[1]
    lo = jnp.zeros((B, Q), jnp.int32)
    hi = jnp.full((B, Q), K, jnp.int32)
    steps = int(np.ceil(np.log2(K + 1))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        kv = batched_gather_rows(keys[..., None], jnp.minimum(mid, K - 1))[..., 0]
        if side == "left":
            go_right = kv < queries
        else:
            go_right = kv <= queries
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.where(mid < hi, mid, hi))
    return lo

