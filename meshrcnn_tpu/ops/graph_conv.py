"""Neighbour aggregation over padded edge lists — the GraphConv primitive.

TPU-native replacement for the reference's sparse-COO scatter-add
``aggregate_neighbours`` (reference: meshRCNN/utils.py:52-97): instead of a ragged
2xE COO index into a batch-concatenated vertex matrix, each sample carries a
fixed-capacity [Emax, 2] unique undirected edge list with a mask, and the neighbour
sum is two masked segment-sums (one per direction) vmapped over the batch. All
shapes static, compiles to one fused XLA scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _aggregate_single(feats: jnp.ndarray, edges: jnp.ndarray,
                      edges_mask: jnp.ndarray) -> jnp.ndarray:
    """sum_{j in N(i)} feats[j] for one sample.

    feats: [V, C]; edges: [E, 2] unique undirected (lo, hi); edges_mask: [E].
    Padded edges are (0, 0); their contribution is masked to zero before scatter.
    """
    m = edges_mask.astype(feats.dtype)[:, None]
    src_a = feats[edges[:, 1]] * m   # contribution to edge endpoint lo from hi
    src_b = feats[edges[:, 0]] * m   # contribution to hi from lo
    out = jnp.zeros_like(feats)
    out = out.at[edges[:, 0]].add(src_a)
    out = out.at[edges[:, 1]].add(src_b)
    return out


def aggregate_neighbours(feats: jnp.ndarray, edges: jnp.ndarray,
                         edges_mask: jnp.ndarray) -> jnp.ndarray:
    """Batched neighbour feature sum.

    Args:
      feats: [B, V, C] padded vertex features.
      edges: [B, E, 2] int32 unique undirected edges.
      edges_mask: [B, E] bool.

    Returns:
      [B, V, C] where row i holds sum of features of i's neighbours.
    """
    return jax.vmap(_aggregate_single)(feats, edges, edges_mask)
