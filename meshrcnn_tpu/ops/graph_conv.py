"""Neighbour aggregation over padded edge lists — the GraphConv primitive.

TPU-native replacement for the reference's sparse-COO scatter-add
``aggregate_neighbours`` (reference: meshRCNN/utils.py:52-97). Two XLA-TPU
pathologies shape this implementation:

  * scatter-add with duplicate indices: ~8 minutes of compile time and a slow
    sequential lowering — so the segment sum is computed scatter-free: sort
    contributions by destination, one cumulative sum, and prefix-difference at
    segment boundaries found by vectorised binary search (pure gathers);
  * gathers with batch dimensions (vmapped ``x[i]``): similarly pathological to
    compile — so every gather runs flattened over [B*N, C] with global indices
    (ops/gather.py).

The sort order and segment boundaries depend only on the mesh *topology*, which a
refinement network reuses across ~21 GraphConv calls per step — so they are
precomputed once per cubify output (``precompute_adjacency``) and each aggregation
is just gather -> cumsum -> boundary-gather. The op carries a custom VJP exploiting
that undirected aggregation is self-adjoint (A = A^T): the backward pass is the
same aggregation applied to the cotangent.

Padded edges carry a sentinel destination V; their (garbage) contributions sort to
the tail segment that no vertex reads, so no masking multiply is needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from meshrcnn_tpu.ops.gather import (batched_gather_rows, batched_searchsorted,
                                     use_counting_search)


@struct.dataclass
class EdgeTopology:
    """Precomputed per-direction sort order + segment boundaries of an edge list."""
    src_lo: jax.Array     # [B, E] source vertex per lo-sorted slot
    starts_lo: jax.Array  # [B, V]
    ends_lo: jax.Array    # [B, V]
    src_hi: jax.Array     # [B, E]
    starts_hi: jax.Array  # [B, V]
    ends_hi: jax.Array    # [B, V]


def precompute_adjacency(edges: jnp.ndarray, edges_mask: jnp.ndarray,
                         num_vertices: int) -> EdgeTopology:
    """Build the reusable aggregation plan for a padded undirected edge list."""
    V = num_vertices
    sentinel = jnp.int32(V)
    lo = edges[..., 0].astype(jnp.int32)
    hi = edges[..., 1].astype(jnp.int32)
    lo_k = jnp.where(edges_mask, lo, sentinel)
    hi_k = jnp.where(edges_mask, hi, sentinel)
    v_ids = jnp.arange(V, dtype=jnp.int32)

    # pack (dst_key, src) into one int32 and sort THAT directly: the argsort +
    # two permutation gathers cost ~0.7 ms each of row-serialized index
    # gathers on TPU (hlo_stats, PERFORMANCE.md round 3); one radix sort of
    # the packed keys needs none. The largest packed field is the sentinel
    # key V itself, needing S = V.bit_length() bits (values 0..V fit since
    # 2^S - 1 >= V), so the pack fits int32 whenever 2*S <= 31
    # (V <= 32767 — both recipe capacities); larger capacities keep the
    # argsort path. Within-segment order becomes src-sorted instead of
    # slot-sorted, which only permutes f32 summation order inside each
    # <=deg-sized segment.
    import os
    shift = max(int(V).bit_length(), 1)
    packable = (2 * shift <= 31
                and os.environ.get("MESHRCNN_PACKED_TOPO", "1") == "1")

    def direction(dst_keys, src):
        if packable:
            # clamp to V-1: padded slots' src is whatever the buffer holds;
            # the sentinel key bits alone already route them to the unread
            # tail segment, and keeping src < V means a gather of the sorted
            # sources can never read across the sample boundary (row V of the
            # flattened [B*V, C] features belongs to the NEXT sample)
            src_c = jnp.clip(src.astype(jnp.int32), 0, V - 1)
            packed = jnp.sort((dst_keys << shift) | src_c, axis=1)
            keys = packed >> shift
            src_sorted = packed & ((1 << shift) - 1)
        else:
            order = jnp.argsort(dst_keys, axis=1)
            keys = batched_gather_rows(dst_keys[..., None], order)[..., 0]
            # padded slots must not contribute: redirect their source to the
            # sentinel segment... they already are (key = V sorts last). Same
            # V-1 clamp as the packed path: no cross-sample gather from the
            # unread tail.
            src_sorted = batched_gather_rows(
                jnp.clip(src.astype(jnp.int32), 0, V - 1)[..., None],
                order)[..., 0]
        if use_counting_search():
            # integer keys + contiguous queries 0..V-1: both boundaries come
            # from ONE histogram (ends = cumulative counts, starts = ends -
            # hist) — a single fused compare-reduce instead of 2 bisections
            # x ~log2(E) rounds of random-index gathers (ops/gather.py).
            hist = jnp.sum(keys[:, None, :] == v_ids[None, :, None], axis=-1,
                           dtype=jnp.int32)                        # [B, V]
            ends = jnp.cumsum(hist, axis=1)
            starts = ends - hist
        else:
            v_q = jnp.broadcast_to(v_ids[None, :], (keys.shape[0], V))
            starts = batched_searchsorted(keys, v_q, side="left")
            ends = batched_searchsorted(keys, v_q, side="right")
        return src_sorted, starts, ends

    src_lo, starts_lo, ends_lo = direction(lo_k, hi)   # contributions to lo from hi
    src_hi, starts_hi, ends_hi = direction(hi_k, lo)   # contributions to hi from lo
    return EdgeTopology(src_lo=src_lo, starts_lo=starts_lo, ends_lo=ends_lo,
                        src_hi=src_hi, starts_hi=starts_hi, ends_hi=ends_hi)


def _cumsum_block() -> int:
    """Trace-time block size for the prefix-sum matmul (A/B: MESHRCNN_CUMSUM_BLOCK).

    The MAC cost of the lower-triangular matmul scales linearly with the block
    size; 128 is exactly one MXU tile and quarters the FLOPs vs the original
    512 (same-session A/B in PERFORMANCE.md round 3 picked the default).
    """
    import os
    return int(os.environ.get("MESHRCNN_CUMSUM_BLOCK", "128"))


def _cumsum_precision():
    """Trace-time precision for the prefix-sum matmul (MESHRCNN_CUMSUM_PRECISION).

    The lower-triangular factor is 0/1 — exactly representable in bf16 — so
    HIGH (3 bf16 passes, splitting only the data operand's mantissa) already
    carries ~22 mantissa bits of the f32 contributions at half the HIGHEST
    cost; the same argument as ops/gather.py's one-hot segment sum. The
    residual error lands on the cumsum, whose segment *differences* the
    aggregation reads — bounded by ~1e-6 relative to the running sum, the
    precision class the existing MXU-backward path already accepts.
    """
    import os
    name = os.environ.get("MESHRCNN_CUMSUM_PRECISION", "high").upper()
    return getattr(jax.lax.Precision, name)


def _blocked_cumsum(x: jnp.ndarray, block: int | None = None) -> jnp.ndarray:
    """Prefix sum over axis 1 of [B, E, C] as one MXU pass.

    XLA lowers jnp.cumsum to a log-depth scan (~15 full-array passes at E=32k);
    a lower-triangular matmul per block + a tiny cross-block offset cumsum does it
    in a single pass and runs on the MXU instead of the VPU.
    """
    if block is None:
        block = _cumsum_block()
    B, E, C = x.shape
    nb = -(-E // block)
    pad = nb * block - E
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    blocks = xp.reshape(B, nb, block, C)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    within = jnp.einsum("ts,bnsc->bntc", tri, blocks,
                        precision=_cumsum_precision(),
                        preferred_element_type=jnp.float32)
    # block totals = the f32 within-cumsum's last row (a bf16 blocks.sum
    # would re-accumulate in bf16 — and this is free)
    totals = within[:, :, -1, :]                            # [B, nb, C]
    offsets = jnp.cumsum(totals, axis=1) - totals           # tiny log-scan
    out = within + offsets[:, :, None, :]
    return out.reshape(B, nb * block, C)[:, :E]


def _sorted_segment_sum(contrib: jnp.ndarray, starts: jnp.ndarray,
                        ends: jnp.ndarray) -> jnp.ndarray:
    B, E, C = contrib.shape
    s = _blocked_cumsum(contrib)
    # segment sum = s[end-1] - s[start-1] with s[-1] := 0. Masked selects
    # instead of prepending a zero row: the concatenate materialised a full
    # [B, E+1, C] copy of the cumsum (profiled 6.6 ms/step across the 21
    # GraphConv calls, fwd+bwd, PERFORMANCE.md round 3).
    hi = batched_gather_rows(s, jnp.maximum(ends - 1, 0))
    lo = batched_gather_rows(s, jnp.maximum(starts - 1, 0))
    hi = jnp.where((ends > 0)[..., None], hi, 0.0)
    lo = jnp.where((starts > 0)[..., None], lo, 0.0)
    return hi - lo


# Chunking threshold/size for the (now OPT-IN) lax.map workaround. History: at
# B=12 (Pix3D eval: 4 images x 3 detections) the compiled gather->blocked-
# cumsum->boundary-gather pipeline for BOTH edge directions in one program
# reproducibly faulted the round-3 TPU worker while B<=8 and per-sample
# lax.map ran fine (bisection: tools/debug_tpu_eval_fault/BUG_REPORT.md). The
# round-5 shape matrix + full-CLI repro show the fault no longer reproduces on
# the current runtime (BUG_REPORT.md addendum), so _chunking_active only
# engages under MESHRCNN_AGG_CHUNK=1 / MESHRCNN_FORCE_AGG_CHUNK=1.
_AGG_SAFE_BATCH = 8
_AGG_CHUNK = 4


def _agg_bf16() -> bool:
    """Trace-time switch: gather + prefix-sum the edge contributions in bf16.

    The aggregation's cost is bandwidth — the [B, E, C] contribution gathers
    and their cumsum dominate the profiled step (PERFORMANCE.md round 3);
    bf16 halves every byte of it and makes the tri matmul a single native
    MXU pass (bf16 x bf16 products are exact, accumulation stays f32 via
    preferred_element_type). Cost: contributions round to bf16 (~4e-3
    relative) before summation. Measured −7.3 ms on the ShapeNet step
    (PERFORMANCE.md round 3) but REJECTED as a default by the round-5
    learning-parity protocol: train trajectories track the f32 baseline, yet
    trained models consistently lose fine-geometry accuracy on held-out data
    (F1@0.1 0.40 → ~0.29 across seeds; PARITY.md round 5) — the forward
    rounding in 21 stacked GraphConvs blurs exactly the sub-0.1 details the
    fine threshold scores. Opt-in via MESHRCNN_AGG_BF16=1 for
    throughput-over-fidelity runs.
    """
    import os
    return os.environ.get("MESHRCNN_AGG_BF16", "0") == "1"


def _aggregate_one_chunk(feats: jnp.ndarray, topo: EdgeTopology) -> jnp.ndarray:
    f = feats.astype(jnp.bfloat16) if _agg_bf16() else feats
    out = _sorted_segment_sum(batched_gather_rows(f, topo.src_lo),
                              topo.starts_lo, topo.ends_lo)
    out = out + _sorted_segment_sum(batched_gather_rows(f, topo.src_hi),
                                    topo.starts_hi, topo.ends_hi)
    return out.astype(feats.dtype)


def _chunking_active(B: int) -> bool:
    """Round-5 status: the worker fault NO LONGER REPRODUCES on the current
    XLA:TPU runtime — tools/agg_shape_matrix.py probed both shipped capacity
    families at B in {8, 10, 12, 16} (including the bisected faulting shape
    B=12 / V=4096 / E=16384, 3 repeats) and the original full
    `eval_model.py --model Pix3D` repro, all clean on 2026-08-19
    (BUG_REPORT.md addendum). The lax.map workaround is therefore OPT-IN:
    re-enable with MESHRCNN_AGG_CHUNK=1 if a future runtime regresses; tests
    keep the chunked path pinned equal via MESHRCNN_FORCE_AGG_CHUNK=1.
    MESHRCNN_AGG_CHUNK_DISABLE=1 bypasses everything (diagnostics)."""
    import os
    if os.environ.get("MESHRCNN_AGG_CHUNK_DISABLE", "0") == "1":
        return False
    if os.environ.get("MESHRCNN_FORCE_AGG_CHUNK", "0") == "1":
        return B > _AGG_SAFE_BATCH
    return (B > _AGG_SAFE_BATCH and jax.default_backend() == "tpu"
            and os.environ.get("MESHRCNN_AGG_CHUNK", "0") == "1")


def _aggregate_impl(feats: jnp.ndarray, topo: EdgeTopology) -> jnp.ndarray:
    B = feats.shape[0]
    if not _chunking_active(B):
        return _aggregate_one_chunk(feats, topo)
    # lax.map over sub-batches of the known-good training shape; zero-padded
    # tail samples have empty segments (starts = ends = 0) and produce zeros
    nc = -(-B // _AGG_CHUNK)
    pad = nc * _AGG_CHUNK - B
    f = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
    t = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, ((0, pad), (0, 0))), topo)
    f = f.reshape(nc, _AGG_CHUNK, *feats.shape[1:])
    t = jax.tree_util.tree_map(
        lambda a: a.reshape(nc, _AGG_CHUNK, a.shape[-1]), t)
    out = jax.lax.map(lambda args: _aggregate_one_chunk(*args), (f, t))
    return out.reshape(nc * _AGG_CHUNK, *out.shape[2:])[:B]


@jax.custom_vjp
def _aggregate(feats: jnp.ndarray, topo: EdgeTopology) -> jnp.ndarray:
    return _aggregate_impl(feats, topo)


def _aggregate_fwd(feats, topo):
    return _aggregate_impl(feats, topo), topo


def _aggregate_bwd(topo, g):
    # undirected adjacency is symmetric: VJP(g) = A g = aggregate(g)
    df = _aggregate_impl(g, topo)
    zero_topo = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), topo)
    return df, zero_topo


_aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)


def aggregate_neighbours(feats: jnp.ndarray, topo_or_edges, edges_mask=None
                         ) -> jnp.ndarray:
    """Batched neighbour feature sum: [B, V, C] -> [B, V, C].

    Accepts either a precomputed EdgeTopology (preferred: reuse across the many
    GraphConv calls sharing one mesh) or raw (edges [B,E,2], edges_mask [B,E]).
    """
    if isinstance(topo_or_edges, EdgeTopology):
        topo = topo_or_edges
    else:
        topo = precompute_adjacency(topo_or_edges, edges_mask, feats.shape[1])
    return _aggregate(feats, topo)
