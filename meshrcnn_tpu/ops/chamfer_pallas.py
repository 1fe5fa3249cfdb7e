"""Fused bidirectional nearest-neighbour Pallas kernel for chamfer distances.

One kernel pass over the [N, M] distance tiles produces BOTH directions'
min/argmin (p->q and q->p). The XLA path (ops/chamfer.nearest_neighbor) needs two
independent tile sweeps — two full rounds of distance computation; fusing them
halves the MXU work and HBM traffic of the chamfer loss, the hot numeric core of
every refinement stage (reference equivalent: the full 10k x 10k bmm p2p matrix +
torch.min at loss_functions.py:93-102, 192-220).

Layout notes (see pallas_guide): points are fed transposed-and-padded as [8, N]
so the lane dimension is the (tile-aligned) point axis; the per-tile distance
block d = |p|^2 + |q|^2 - 2 p.q lives in VMEM only. Row-direction outputs are
accumulated in a revisited block (grid minor axis sweeps q tiles); the
q-direction produces one partial row per p-tile, reduced outside the kernel
(O(N/TILE x M), trivial). Padded points carry +BIG coordinates so they never win
a min; their output slots are sliced off.

``chamfer_distance_fused`` wraps the kernel with a custom VJP: the forward saves
the argmin indices; the backward is closed-form — 2(p_i - q_{a_i}) for the gather
side and a scatter-free sorted segment-sum (same trick as ops/graph_conv.py) for
the scattered side.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
BIG = 1.0e8


def _pad_points_t(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """[N, 3] -> transposed [8, n_pad] with BIG padding (rows 3..7 zero)."""
    n = x.shape[0]
    xt = jnp.zeros((8, n_pad), dtype=jnp.float32)
    xt = xt.at[:3, :n].set(x.T.astype(jnp.float32))
    if n_pad > n:
        xt = xt.at[:3, n:].set(BIG)
    return xt


def _gram_dot(a, b, bf16: bool):
    """K=8 gram on the MXU: a [8, X], b [8, Y] -> [X, Y] f32.

    bf16=True rounds the point coordinates to bf16 and runs ONE native MXU
    pass instead of HIGHEST's multi-pass f32 emulation. Distance error is
    ~4e-3 relative — enough to flip near-tie argmins only; the returned min
    VALUES are recomputed exactly from the indices outside the kernel
    (_exact_sums), so loss numerics are unaffected by the gram precision.
    """
    if bf16:
        return jax.lax.dot_general(a.astype(jnp.bfloat16),
                                   b.astype(jnp.bfloat16),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _kernel_body(pt_ref, qt_ref, minp_ref, argp_ref, minq_part_ref,
                 argq_part_ref, i, j, *, dual: bool = False,
                 bf16_gram: bool = False):
    pt = pt_ref[:]                     # [8, TP]
    qt = qt_ref[:]                     # [8, TQ]
    pq = _gram_dot(pt, qt, bf16_gram)                              # [TP, TQ]
    pp = jnp.sum(pt * pt, axis=0)      # [TP]
    qq = jnp.sum(qt * qt, axis=0)      # [TQ]
    d = pp[:, None] + qq[None, :] - 2.0 * pq

    # p -> q direction: running min over j (block revisited; j is the minor
    # axis). The block is 8 sublanes tall (a 1-sublane block is only legal
    # when it equals the full array dim, which the batched [B*8, n_pad]
    # layout can't satisfy); row 0 is real, rows 1..7 are written once at
    # j == 0 and sliced off outside.
    if dual:
        # dual-gram orientation: compute the SAME distances transposed
        # ([TQ, TP]) with a second MXU gram so this direction's min/argmin
        # reduces along the SUBLANE axis like the q-direction's — the
        # lane-axis reduce is the kernel's VPU bottleneck while the MXU sits
        # ~idle (K=8 gram). Values agree to MXU rounding (the transposed
        # gram's f32 passes round differently in the last ulp — measured
        # 2/1500 near-tie argmin flips; tests pin allclose + 99.9% argmin).
        qp = _gram_dot(qt, pt, bf16_gram)                            # [TQ, TP]
        dT = qq[:, None] + pp[None, :] - 2.0 * qp
        tile_min = jnp.min(dT, axis=0)
        tile_arg = jnp.argmin(dT, axis=0).astype(jnp.int32) + j * d.shape[1]
    else:
        tile_min = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + j * d.shape[1]

    @pl.when(j == 0)
    def _():
        minp_ref[:] = jnp.concatenate(
            [tile_min[None, :],
             jnp.full((7, d.shape[0]), BIG, dtype=jnp.float32)], axis=0)
        argp_ref[:] = jnp.concatenate(
            [tile_arg[None, :], jnp.zeros((7, d.shape[0]), jnp.int32)], axis=0)

    @pl.when(j > 0)
    def _():
        prev = minp_ref[0, :]
        take = tile_min < prev
        minp_ref[0, :] = jnp.where(take, tile_min, prev)
        argp_ref[0, :] = jnp.where(take, tile_arg, argp_ref[0, :])

    # q -> p direction: one partial row per p tile, reduced outside. The block is
    # 8 sublanes tall (TPU tiling minimum); rows 1..7 are neutralised with BIG.
    filler = jnp.full((7, d.shape[1]), BIG, dtype=jnp.float32)
    minq_part_ref[:] = jnp.concatenate([jnp.min(d, axis=0)[None, :], filler], axis=0)
    arg0 = jnp.argmin(d, axis=0).astype(jnp.int32) + i * d.shape[0]
    argq_part_ref[:] = jnp.concatenate(
        [arg0[None, :], jnp.zeros((7, d.shape[1]), jnp.int32)], axis=0)


def _kernel(pt_ref, qt_ref, minp_ref, argp_ref, minq_part_ref, argq_part_ref,
            *, dual: bool = False, bf16_gram: bool = False):
    _kernel_body(pt_ref, qt_ref, minp_ref, argp_ref, minq_part_ref,
                 argq_part_ref, pl.program_id(0), pl.program_id(1), dual=dual,
                 bf16_gram=bf16_gram)


def _kernel_b(pt_ref, qt_ref, minp_ref, argp_ref, minq_part_ref, argq_part_ref,
              *, dual: bool = False, bf16_gram: bool = False):
    """Rank-2 batched wrapper: grid (B, I, J); the batch is resolved entirely
    by the BlockSpec index maps, so the body only needs (i, j)."""
    _kernel_body(pt_ref, qt_ref, minp_ref, argp_ref, minq_part_ref,
                 argq_part_ref, pl.program_id(1), pl.program_id(2), dual=dual,
                 bf16_gram=bf16_gram)


def _use_dual_gram() -> bool:
    """Trace-time gate for the dual-gram kernel body (same-session A/B via
    MESHRCNN_CHAMFER_DUALGRAM; the flag is a static jit arg so toggling between
    jit instances in one process selects the path)."""
    import os
    return os.environ.get("MESHRCNN_CHAMFER_DUALGRAM", "1") == "1"


def _use_bf16_gram() -> bool:
    """Trace-time gate: bf16 distance grams in the chamfer kernel
    (MESHRCNN_CHAMFER_BF16GRAM). Loss VALUES are safe because the sums are
    recomputed exactly from the argmin indices (_exact_sums); only near-tie
    argmin selection differs (~1% of assignments). Measured −15.4 ms on the
    Pix3D recipe step / −11.6 ms on ShapeNet (PERFORMANCE.md round 5) — but
    REJECTED as a default: the mis-assignments feed the chamfer GRADIENT, and
    models trained with them lose fine-geometry accuracy (held-out F1@0.1
    0.40 → 0.26–0.33 across seeds, PARITY.md round 5) even though every loss
    value and loss-equality test stays green. Opt-in for throughput-over-
    fidelity runs."""
    import os
    return os.environ.get("MESHRCNN_CHAMFER_BF16GRAM", "0") == "1"


def _tile_q() -> int:
    """Q-axis tile width (MESHRCNN_CHAMFER_TILEQ, default TILE). Wider q tiles
    cut the revisited-minp traffic and the grid's per-cell overhead linearly in
    J; VMEM holds ~3 [TILE, TILE_Q] f32 blocks, so 2048 is the practical max.

    The value feeds BlockSpec lane widths directly, so it must be a positive
    multiple of 128 (the TPU lane tiling) — anything else dies deep inside
    Mosaic with an opaque compile error. Validate here with a clear message.

    Default 1024 since round 5 (numerics-neutral: same f32 math, different
    tile order — only exact-tie argmins can land differently): alone it is
    ~noise-to-−1 ms; with the opt-in bf16 gram it adds a consistent further
    −1.3 ms on the Pix3D step (PERFORMANCE.md round 5 A/B tables).
    """
    import os
    raw = os.environ.get("MESHRCNN_CHAMFER_TILEQ", "1024")
    try:
        tile_q = int(raw)
    except ValueError:
        raise ValueError(f"MESHRCNN_CHAMFER_TILEQ={raw!r} is not an integer")
    if tile_q < 128 or tile_q % 128 != 0:
        raise ValueError(
            f"MESHRCNN_CHAMFER_TILEQ={tile_q} must be a multiple of 128 and "
            ">= 128 (TPU lane tiling; BlockSpec lane widths)")
    return tile_q


@partial(jax.jit, static_argnames=("dual", "bf16_gram", "tile_q"))
def _chamfer_bidir_pallas(p: jnp.ndarray, q: jnp.ndarray, dual: bool = False,
                          bf16_gram: bool = False, tile_q: int = TILE):
    N = p.shape[0]
    M = q.shape[0]
    n_pad = -(-N // TILE) * TILE
    m_pad = -(-M // tile_q) * tile_q
    I = n_pad // TILE
    J = m_pad // tile_q
    pt = _pad_points_t(p, n_pad)
    qt = _pad_points_t(q, m_pad)

    grid = (I, J)
    minp, argp, minq_part, argq_part = pl.pallas_call(
        partial(_kernel, dual=dual, bf16_gram=bf16_gram),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((8 * I, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((8 * I, m_pad), jnp.int32),
        ],
    )(pt, qt)

    d_p = minp[0, :N]
    i_p = jnp.clip(argp[0, :N], 0, M - 1)
    # reduce the q-direction partials over p tiles (rows 1..7 of each block are BIG)
    best_row = jnp.argmin(minq_part, axis=0)                       # [m_pad]
    d_q = jnp.min(minq_part, axis=0)[:M]
    i_q = jnp.take_along_axis(argq_part, best_row[None, :], axis=0)[0, :M]
    i_q = jnp.clip(i_q, 0, N - 1)
    return d_p, i_p, d_q, i_q


def _segment_sum_by_key(values: jnp.ndarray, keys: jnp.ndarray,
                        num_segments: int, chunk: int = 512) -> jnp.ndarray:
    """Scatter-free exact sum of values [E, C] grouped by keys [E] -> [V, C].

    Chunked one-hot matmul on the MXU: exact f32 accumulation (a cumsum-based
    prefix-difference loses ~1e-1 absolute here to cancellation over 10k rows),
    ~0.5 ms for E = V = 10k, C = 3.
    """
    E = keys.shape[0]
    n_chunks = -(-num_segments // chunk)
    pad_v = n_chunks * chunk
    k = keys.astype(jnp.int32)

    def body(c_idx, _):
        ids = c_idx * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
        onehot = (k[None, :] == ids[:, None]).astype(values.dtype)   # [chunk, E]
        return c_idx + 1, jnp.dot(onehot, values,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)

    _, out = jax.lax.scan(body, 0, None, length=n_chunks)
    return out.reshape(pad_v, values.shape[1])[:num_segments]


def _exact_sums(p, q, i_p, i_q):
    """Chamfer sums recomputed exactly from the argmin indices.

    The kernel's min values come through the Gram identity |p|^2+|q|^2-2p.q,
    which cancels catastrophically for near points (and inherits the gram's
    precision); the difference form (p - q_a)^2 is exact in f32 given the
    assignment and costs two O(N) gathers. This makes the loss VALUE
    independent of in-kernel gram precision — the indices are the only kernel
    output that matters, and the closed-form VJP already differentiates
    exactly this fixed-assignment objective.
    """
    d_p = jnp.sum((p - q[i_p]) ** 2, axis=-1)
    d_q = jnp.sum((q - p[i_q]) ** 2, axis=-1)
    return jnp.sum(d_p), jnp.sum(d_q)


def _run_fused(p, q):
    _, i_p, _, i_q = _chamfer_bidir_pallas(
        p, q, dual=_use_dual_gram(), bf16_gram=_use_bf16_gram(),
        tile_q=_tile_q())
    s_p, s_q = _exact_sums(p, q, i_p, i_q)
    return s_p, i_p, s_q, i_q


@jax.custom_vjp
def chamfer_sums_fused(p: jnp.ndarray, q: jnp.ndarray):
    """(sum_i min_j d, idx_p, sum_j min_i d, idx_q) via the fused Pallas kernel."""
    return _run_fused(p, q)


def _fwd(p, q):
    s_p, i_p, s_q, i_q = _run_fused(p, q)
    return (s_p, i_p, s_q, i_q), (p, q, i_p, i_q)


def _bwd(res, cots):
    p, q, i_p, i_q = res
    g1, _, g2, _ = cots            # cotangents of the two sums (indices: int, none)
    N, M = p.shape[0], q.shape[0]
    # L1 = sum_i |p_i - q_{a_i}|^2
    diff1 = p - q[i_p]                                  # [N, 3]
    dp = 2.0 * g1 * diff1
    dq = -2.0 * g1 * _segment_sum_by_key(diff1, i_p, M)
    # L2 = sum_j |q_j - p_{b_j}|^2
    diff2 = q - p[i_q]                                  # [M, 3]
    dq = dq + 2.0 * g2 * diff2
    dp = dp - 2.0 * g2 * _segment_sum_by_key(diff2, i_q, N)
    return dp, dq


chamfer_sums_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# batched variant: grid over (batch, p tiles, q tiles)
# ---------------------------------------------------------------------------

def _chamfer_bidir_pallas_batched(p: jnp.ndarray, q: jnp.ndarray,
                                  dual: bool = False, bf16_gram: bool = False,
                                  tile_q: int = TILE):
    """Batched fused bidirectional NN: p [B,N,3], q [B,M,3] -> per-sample
    (d_p [B,N], i_p [B,N], d_q [B,M], i_q [B,M]).

    Operand/result layout is RANK-2 with the batch folded into the row axis
    (points [B*8, n_pad], results [B, n_pad] / [B*8I, m_pad]) and the batch
    resolved by the BlockSpec index maps. The rank-3 layout this replaced
    ((1, 8, TILE) blocks over [B, 8, n_pad]) compiled but ran ~80x slower per
    grid cell than the single-sample kernel (8.4 ms vs 4x26 us at B=4,
    N=M=10k — Pix3D step profile, PERFORMANCE.md round 3): Mosaic handles the
    leading-unit-dim blocks via per-cell relayouts. With rank-2 blocks the
    kernel body is BYTE-IDENTICAL to the single-sample kernel's.
    """
    B, N = p.shape[0], p.shape[1]
    M = q.shape[1]
    n_pad = -(-N // TILE) * TILE
    m_pad = -(-M // tile_q) * tile_q
    I = n_pad // TILE
    J = m_pad // tile_q
    pt = jax.vmap(_pad_points_t, in_axes=(0, None))(p, n_pad)   # [B, 8, n_pad]
    qt = jax.vmap(_pad_points_t, in_axes=(0, None))(q, m_pad)
    pt2 = pt.reshape(B * 8, n_pad)
    qt2 = qt.reshape(B * 8, m_pad)

    minp, argp, minq_part, argq_part = pl.pallas_call(
        partial(_kernel_b, dual=dual, bf16_gram=bf16_gram),
        grid=(B, I, J),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda b, i, j: (b, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda b, i, j: (b * I + i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_q), lambda b, i, j: (b * I + i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B * 8, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B * 8 * I, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((B * 8 * I, m_pad), jnp.int32),
        ],
    )(pt2, qt2)

    d_p = minp.reshape(B, 8, n_pad)[:, 0, :N]
    i_p = jnp.clip(argp.reshape(B, 8, n_pad)[:, 0, :N], 0, M - 1)
    minq_part = minq_part.reshape(B, 8 * I, m_pad)
    argq_part = argq_part.reshape(B, 8 * I, m_pad)
    best_row = jnp.argmin(minq_part, axis=1)                        # [B, m_pad]
    d_q = jnp.min(minq_part, axis=1)[:, :M]
    i_q = jnp.take_along_axis(argq_part, best_row[:, None, :], axis=1)[:, 0, :M]
    i_q = jnp.clip(i_q, 0, N - 1)
    return d_p, i_p, d_q, i_q


def _exact_sums_batched(p, q, i_p, i_q):
    """Batched _exact_sums: sums recomputed from indices (see _exact_sums)."""
    d_p = jnp.sum((p - jnp.take_along_axis(q, i_p[..., None], axis=1)) ** 2,
                  axis=-1)                                          # [B, N]
    d_q = jnp.sum((q - jnp.take_along_axis(p, i_q[..., None], axis=1)) ** 2,
                  axis=-1)
    return jnp.sum(d_p, axis=1), jnp.sum(d_q, axis=1)


def _run_fused_batched(p, q):
    _, i_p, _, i_q = _chamfer_bidir_pallas_batched(
        p, q, _use_dual_gram(), _use_bf16_gram(), _tile_q())
    s_p, s_q = _exact_sums_batched(p, q, i_p, i_q)
    return s_p, i_p, s_q, i_q


@jax.custom_vjp
def chamfer_sums_fused_batched(p: jnp.ndarray, q: jnp.ndarray):
    """Per-sample (sum_i min_j d [B], idx_p [B,N], sum_j min_i d [B], idx_q [B,M]).

    Batched analog of chamfer_sums_fused — one kernel launch for the whole
    batch; the backward is the same closed form vmapped over the batch.
    """
    return _run_fused_batched(p, q)


def _fwd_batched(p, q):
    s_p, i_p, s_q, i_q = _run_fused_batched(p, q)
    return (s_p, i_p, s_q, i_q), (p, q, i_p, i_q)


def _bwd_batched(res, cots):
    p, q, i_p, i_q = res
    g1, _, g2, _ = cots                      # [B] cotangents of the two sums
    N, M = p.shape[1], q.shape[1]
    seg = jax.vmap(_segment_sum_by_key, in_axes=(0, 0, None))
    diff1 = p - jnp.take_along_axis(q, i_p[..., None], axis=1)       # [B, N, 3]
    dp = 2.0 * g1[:, None, None] * diff1
    dq = -2.0 * g1[:, None, None] * seg(diff1, i_p, M)
    diff2 = q - jnp.take_along_axis(p, i_q[..., None], axis=1)       # [B, M, 3]
    dq = dq + 2.0 * g2[:, None, None] * diff2
    dp = dp - 2.0 * g2[:, None, None] * seg(diff2, i_q, N)
    return dp, dq


chamfer_sums_fused_batched.defvjp(_fwd_batched, _bwd_batched)


# ---------------------------------------------------------------------------
# kNN candidate kernel: subtile-min candidates without materialising [N, M]
# ---------------------------------------------------------------------------

def _knn_kernel_j(pt_ref, qt_ref, vals_ref, args_ref, j, *, subtile: int):
    """One (p-tile, q-tile) block: distance gram in VMEM, per-subtile min/argmin.

    The XLA lowering of the same computation materialises every [N, TILE]
    distance block to HBM between the dot and the reduce (profiled ~45 ms/step
    across the normal-loss kNN calls, PERFORMANCE.md); here the gram never
    leaves VMEM and only the [TP, TILE/subtile] candidates are written.
    """
    pt = pt_ref[:]                     # [8, TP]
    qt = qt_ref[:]                     # [8, TQ]
    # gram computed TRANSPOSED ([TQ, TP]): q subtiles then live on the sublane
    # axis, so the subtile split is a tile-preserving leading-dim reshape and
    # the reduced output block [G, TP] satisfies Mosaic's (8, 128) tiling —
    # splitting the lane dim (d.reshape(tp, g, s)) does not lower.
    qp = jax.lax.dot_general(qt, pt, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)   # [TQ, TP]
    pp = jnp.sum(pt * pt, axis=0)
    qq = jnp.sum(qt * qt, axis=0)
    d = qq[:, None] + pp[None, :] - 2.0 * qp                       # [TQ, TP]
    tq, tp = d.shape
    g = tq // subtile
    dg = d.reshape(g, subtile, tp)
    vals_ref[:] = jnp.min(dg, axis=1)                              # [G, TP]
    sub = jnp.argmin(dg, axis=1).astype(jnp.int32)                 # [G, TP]
    base = j * tq + jax.lax.broadcasted_iota(jnp.int32, (g, tp), 0) * subtile
    args_ref[:] = sub + base


def _knn_kernel(pt_ref, qt_ref, vals_ref, args_ref, *, subtile: int):
    _knn_kernel_j(pt_ref, qt_ref, vals_ref, args_ref, pl.program_id(1),
                  subtile=subtile)


def knn_candidates_pallas(p: jnp.ndarray, q: jnp.ndarray, subtile: int = 64,
                          tile: int = TILE) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Subtile-min kNN candidates of q for each point of p (TPU Pallas path).

    Returns (vals [N, M_pad/subtile], idx) — same candidate semantics as the
    XLA path in ops/chamfer.knn at the same subtile; the caller runs the exact
    top-k merge. Candidate selection is not differentiated (indices are
    discrete; gradients flow through the downstream gathers): INPUTS are
    stop_gradient'ed so autodiff's all-zero-tangent fast path binds the
    pallas_call as a constant — jvp-tracing the kernel itself trips
    `pl.program_id` outside a grid context (pallas has no jvp rule here).
    """
    from functools import partial as _partial
    p = jax.lax.stop_gradient(p)
    q = jax.lax.stop_gradient(q)
    N = p.shape[0]
    M = q.shape[0]
    n_pad = -(-N // tile) * tile
    m_pad = -(-M // tile) * tile
    I = n_pad // tile
    J = m_pad // tile
    assert tile % subtile == 0, (tile, subtile)
    # the candidate block is (G, tile): Mosaic needs the sublane dim
    # divisible by 8, so cap the subtile at tile // 8
    subtile = min(subtile, tile // 8)
    G = tile // subtile
    pt = _pad_points_t(p, n_pad)
    qt = _pad_points_t(q, m_pad)

    vals, args = pl.pallas_call(
        _partial(_knn_kernel, subtile=subtile),
        grid=(I, J),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, tile), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((J * G, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((J * G, n_pad), jnp.int32),
        ],
    )(pt, qt)
    # padded q columns carry BIG coordinates -> huge distances, never selected
    # by the merge top-k (provided M >= k real points, which callers guarantee)
    return (jax.lax.stop_gradient(vals.T[:N]),
            jax.lax.stop_gradient(jnp.clip(args.T[:N], 0, M - 1)))


def _knn_kernel_b(pt_ref, qt_ref, vals_ref, args_ref, *, subtile: int):
    """Rank-2 batched _knn_kernel: grid (B, I, J), batch resolved by the
    BlockSpec index maps (see _chamfer_bidir_pallas_batched's layout note —
    the rank-3 leading-unit-dim blocks this replaced cost per-cell relayouts),
    body identical to _knn_kernel up to the j grid position."""
    _knn_kernel_j(pt_ref, qt_ref, vals_ref, args_ref, pl.program_id(2),
                  subtile=subtile)


def knn_candidates_pallas_batched(p: jnp.ndarray, q: jnp.ndarray,
                                  subtile: int = 64, tile: int = TILE
                                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched subtile-min kNN candidates: p [B,N,3], q [B,M,3] ->
    (vals [B, N, C], idx [B, N, C]) with C = M_pad/subtile candidates per point.

    One kernel launch for the whole batch — replaces the lax.map over
    ``knn_candidates_pallas`` whose per-sample while loops serialized the
    normal-loss kNN (6 identical ~7.8 ms whiles in the Pix3D step profile:
    3 refinement stages x 2 clouds). Candidate semantics per sample are
    IDENTICAL to the single-sample kernel (same tile math, same index bases).
    """
    from functools import partial as _partial
    p = jax.lax.stop_gradient(p)
    q = jax.lax.stop_gradient(q)
    B, N = p.shape[0], p.shape[1]
    M = q.shape[1]
    n_pad = -(-N // tile) * tile
    m_pad = -(-M // tile) * tile
    I = n_pad // tile
    J = m_pad // tile
    assert tile % subtile == 0, (tile, subtile)
    # the candidate block is (G, tile): Mosaic needs the sublane dim
    # divisible by 8, so cap the subtile at tile // 8
    subtile = min(subtile, tile // 8)
    G = tile // subtile
    pt = jax.vmap(_pad_points_t, in_axes=(0, None))(p, n_pad)      # [B, 8, n_pad]
    qt = jax.vmap(_pad_points_t, in_axes=(0, None))(q, m_pad)
    pt2 = pt.reshape(B * 8, n_pad)
    qt2 = qt.reshape(B * 8, m_pad)

    vals, args = pl.pallas_call(
        _partial(_knn_kernel_b, subtile=subtile),
        grid=(B, I, J),
        in_specs=[
            pl.BlockSpec((8, tile), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda b, i, j: (b, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, tile), lambda b, i, j: (b * J + j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile), lambda b, i, j: (b * J + j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * J * G, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B * J * G, n_pad), jnp.int32),
        ],
    )(pt2, qt2)
    vals = jnp.swapaxes(vals.reshape(B, J * G, n_pad), 1, 2)[:, :N]  # [B, N, C]
    args = jnp.swapaxes(args.reshape(B, J * G, n_pad), 1, 2)[:, :N]
    return (jax.lax.stop_gradient(vals),
            jax.lax.stop_gradient(jnp.clip(args, 0, M - 1)))
