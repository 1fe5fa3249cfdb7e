"""Batched row-gather helpers that avoid XLA-TPU's batched-gather slow path.

A vmapped ``x[i]`` (gather with batch dimensions) triggers a pathological XLA TPU
lowering — measured ~4 minutes of compile time and ~2x runtime for a [3, 32k] row
gather — while the same gather expressed over a flattened [B*N, C] array with
global indices compiles in ~2s. Every hot gather in the framework goes through
these helpers instead of vmapped fancy indexing.
"""
from __future__ import annotations

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
