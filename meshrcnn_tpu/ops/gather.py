"""Batched row-gather helpers that avoid XLA-TPU's batched-gather slow path.

A vmapped ``x[i]`` (gather with batch dimensions) triggers a pathological XLA TPU
lowering — measured ~4 minutes of compile time and ~2x runtime for a [3, 32k] row
gather — while the same gather expressed over a flattened [B*N, C] array with
global indices compiles in ~2s. Every hot gather in the framework goes through
these helpers instead of vmapped fancy indexing.
"""
from __future__ import annotations

import numpy as np
import jax
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


def use_counting_search() -> bool:
    """Trace-time switch for the gather-free counting searchsorted/compaction.

    Default: on for the TPU backend (where XLA's random-index gathers stream at
    ~0.5 GB/s and dominate cubify/sampling, PERFORMANCE.md round 3), off on
    CPU (whose gathers are cheap and whose VPU-style fused reduces are not).
    MESHRCNN_COUNTING_SEARCH=0/1 forces either path on any backend (tests pin
    equality on CPU via =1).
    """
    import os
    env = os.environ.get("MESHRCNN_COUNTING_SEARCH")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def counting_searchsorted(keys: jnp.ndarray, queries: jnp.ndarray,
                          side: str = "left") -> jnp.ndarray:
    """Gather-free searchsorted: count keys below each query.

    keys [B, K] ascending per row, queries [B, Q] -> insertion indices [B, Q],
    identical to ``batched_searchsorted`` (for sorted rows the insertion index
    IS the count of keys < q, resp. <= q for side='right').

    Rationale: XLA:TPU lowers random-index gathers to ~30 ns/element, so the
    bisection path costs ceil(log2 K) rounds x Q gathered elements — ~4 ms for
    the sampler's K=16384, Q=10k. The counting form is one fused
    broadcast-compare-reduce on the VPU: O(K*Q) cells but ~0.5 ns/cell and no
    gathers at all. Profitable whenever K*Q is below a few G cells; the binary
    search stays the fallback for huge K (see ``compact_from_cumsum`` for the
    contiguous-query case where hierarchy removes the K*Q blowup).
    """
    if side == "left":
        cmp = keys[:, None, :] < queries[:, :, None]
    else:
        cmp = keys[:, None, :] <= queries[:, :, None]
    return jnp.sum(cmp, axis=-1, dtype=jnp.int32)


def compact_from_cumsum(cum: jnp.ndarray, capacity: int, block: int = 128):
    """Stream-compaction slot->source mapping with O(capacity)-sized gathers.

    cum: [B, N] inclusive cumsum of keep flags (int). Returns
    (src [B, capacity] int32, mask [B, capacity] bool, count [B] int32) with
    src[b, s] = index of the (s+1)-th kept entry — exactly
    ``batched_searchsorted(cum, s+1, side='left')`` but without the bisection's
    ~log2(N) rounds of random-index gathers (profiled 28.7 ms/step across
    cubify's three compactions at N up to 1.3M; this form measures ~1 ms).

    Structure: split N into blocks of ``block``. The block containing slot s
    comes from ONE counting pass against the per-block cumsum tails
    ([B, cap, N/block] cells); the kept-count before it is blockcum[b_of-1]
    (tiny gather); the position within the block is a counting compare over
    the slot's own within-block cumsum row (gathered [B, cap, block]). All
    remaining gathers are O(capacity) rows, never O(N).
    """
    B, N = cum.shape
    pad = (-N) % block
    if pad:
        cum_p = jnp.concatenate(
            [cum, jnp.broadcast_to(cum[:, -1:], (B, pad))], axis=1)
    else:
        cum_p = cum
    Np = N + pad
    nb = Np // block
    c = cum_p.reshape(B, nb, block)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), cum.dtype), c[:, :-1, -1]], axis=1)     # [B, nb]
    within = c - prev[:, :, None]            # inclusive within-block cumsum
    blockcum = c[:, :, -1]                   # [B, nb] inclusive block tails

    s = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    # level 1: containing block via ONE counting pass ([B, cap, nb] cells);
    # the kept-count before it reads blockcum[b_of-1] with a tiny [B, cap]
    # gather (a where-sum over the same [B, cap, nb] grid doubled this
    # fusion's time, PERFORMANCE.md round 3)
    b_of = jnp.sum(blockcum[:, None, :] <= s[None, :, None], axis=-1,
                   dtype=jnp.int32)                                # [B, cap]
    b_of = jnp.clip(b_of, 0, nb - 1)
    lo = jnp.where(
        b_of > 0,
        batched_gather_rows(blockcum[..., None],
                            jnp.maximum(b_of - 1, 0))[..., 0], 0)
    o = jnp.clip(s[None, :] - lo, 0, block - 1)
    # level 2: gather ONLY slot-containing blocks' within-rows ([B, cap,
    # block]) instead of tabulating positions for every input block
    # ([B, N, block] cells — ~1 ms/step at cubify's N=1.3M)
    wrow = batched_gather_rows(within, b_of)                       # [B, cap, block]
    pos = jnp.sum((wrow <= o[..., None]).astype(jnp.int32), axis=-1)
    src = jnp.minimum(b_of * block + pos, N - 1)
    count = cum[:, -1].astype(jnp.int32)
    mask = s[None, :] < jnp.minimum(count, capacity)[:, None]
    return src, mask, count


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



def use_mxu_scatter() -> bool:
    """Trace-time switch for the matmul-backward gathers (``take_rows_mxu``).

    Default: on for the TPU backend, where XLA lowers the transpose of a
    random-index gather to a serialized scatter-add (profiled 19 ms/step
    across the sampler + vert-align backwards, PERFORMANCE.md round 3); a
    chunked one-hot matmul computes the same segment sums on the ~idle MXU.
    Off on CPU (scatters are cheap there, dense one-hot work is not).
    MESHRCNN_MXU_SCATTER=0/1 forces either path (tests pin closeness).
    """
    import os
    env = os.environ.get("MESHRCNN_MXU_SCATTER")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def batched_segment_sum_matmul(values: jnp.ndarray, keys: jnp.ndarray,
                               num_segments: int, chunk: int = 512,
                               precision=None) -> jnp.ndarray:
    """Per-sample segment sum as chunked one-hot MXU matmuls, scatter-free.

    values [B, N, C] grouped by keys [B, N] (row-local ids) -> [B, R, C] with
    R = num_segments. Out-of-range keys (e.g. a sentinel R) drop out — no
    one-hot row matches them. Precision: the one-hot factor is exactly
    representable in bf16, so ``HIGH`` (3-pass) already gives ~1e-7 relative
    error on the f32 values at half the HIGHEST cost; that is the default.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGH
    B, N, C = values.shape
    # don't pad tiny segment counts (e.g. a 5x5 feature map) to a full chunk
    chunk = min(chunk, max(128, -(-num_segments // 128) * 128))
    nc = -(-num_segments // chunk)

    def body(c_idx, _):
        ids = c_idx * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0)[:, 0]
        onehot = (keys[:, None, :] == ids[None, :, None]).astype(values.dtype)
        return c_idx + 1, jnp.einsum("bsn,bnc->bsc", onehot, values,
                                     precision=precision,
                                     preferred_element_type=jnp.float32)

    _, out = jax.lax.scan(body, 0, None, length=nc)      # [nc, B, chunk, C]
    out = jnp.moveaxis(out, 0, 1).reshape(B, nc * chunk, C)
    return out[:, :num_segments]


@jax.custom_vjp
def _take_rows_mxu(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return batched_gather_rows(x, idx)


def _take_rows_mxu_fwd(x, idx):
    return batched_gather_rows(x, idx), (idx, x.shape[1])


def _take_rows_mxu_bwd(res, g):
    import numpy as _np
    idx, R = res
    dx = batched_segment_sum_matmul(g, idx.astype(jnp.int32), R)
    didx = _np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dx, didx


_take_rows_mxu.defvjp(_take_rows_mxu_fwd, _take_rows_mxu_bwd)


def take_rows_mxu(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``batched_gather_rows`` whose BACKWARD is a one-hot MXU matmul.

    x [B, R, C] float, idx [B, Q] int -> [B, Q, C]. Forward is byte-identical
    to batched_gather_rows; the VJP wrt x is ``batched_segment_sum_matmul``
    instead of XLA's serialized scatter-add (the TPU pathology this exists
    for). Falls back to the plain gather (autodiff scatter) off-TPU, and for
    channel counts below MESHRCNN_MXU_SCATTER_MIN_C: at tiny C the one-hot
    matmul degenerates (XLA materialises the [chunk, N] one-hot to HBM and
    the MXU M-dim is C/128 utilised — a Pallas kernel measured even worse,
    8.2 vs 2.9 ms; PERFORMANCE.md round 3), so narrow call sites may prefer
    the scatter. The default threshold is set by the same-session A/B.
    """
    import os
    min_c = int(os.environ.get("MESHRCNN_MXU_SCATTER_MIN_C", "32"))
    if use_mxu_scatter() and x.shape[-1] >= min_c:
        return _take_rows_mxu(x, idx)
    return batched_gather_rows(x, idx)
