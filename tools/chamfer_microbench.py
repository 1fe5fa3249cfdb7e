"""Microbenchmark of the fused chamfer Pallas kernel (same-session numbers).

Times chamfer_sums_fused at the production cloud size (10k x 10k) and reports
ms/call plus the DMA-volume analysis for the double-buffering question
(VERDICT r2 weak item 8 / next-6): the kernel's q-tile re-fetch volume is
I*J*16KB ~ 6.4 MB/call; at ~800 GB/s HBM that is <10 us — the kernel is MXU-
bound, so explicit DMA double-buffering (beyond Mosaic's automatic block
pipelining) has no headroom. This prints the measurement that statement rests
on.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meshrcnn_tpu.ops.chamfer import chamfer_distance
    from meshrcnn_tpu.ops.chamfer_pallas import (chamfer_sums_fused,
                                                 chamfer_sums_fused_batched,
                                                 knn_candidates_pallas,
                                                 knn_candidates_pallas_batched)

    N = M = 10000
    B = int(os.environ.get("MESHRCNN_MB_BATCH", "4"))
    r = np.random.RandomState(0)
    p = jnp.asarray(r.randn(N, 3).astype(np.float32))
    q = jnp.asarray(r.randn(M, 3).astype(np.float32))
    pb = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    qb = jnp.asarray(r.randn(B, M, 3).astype(np.float32))

    out = {"batch": B}
    cases = (
        ("pallas_fused", jax.jit(lambda: chamfer_sums_fused(p, q)[0])),
        ("xla_two_sweeps", jax.jit(lambda: chamfer_distance(p, q)[0])),
        ("pallas_fused_batched",
         jax.jit(lambda: chamfer_sums_fused_batched(pb, qb)[0])),
        ("pallas_fused_laxmap",
         jax.jit(lambda: jax.lax.map(
             lambda pq: chamfer_sums_fused(pq[0], pq[1])[0], (pb, qb)))),
        ("knn_cand", jax.jit(lambda: knn_candidates_pallas(p, q, 64)[0])),
        ("knn_cand_batched",
         jax.jit(lambda: knn_candidates_pallas_batched(pb, qb, 64)[0])),
    )
    for name, fn in cases:
        fn().block_until_ready()          # compile
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            v = fn()
        v.block_until_ready()
        ms = 1000.0 * (time.perf_counter() - t0) / iters
        out[name + "_ms"] = round(ms, 3)

    # roofline context: the distance gram is 2*N*M*8 flops (f32 on MXU)
    flops = 2.0 * N * M * 8
    out["gram_gflop"] = round(flops / 1e9, 2)
    out["pallas_achieved_tflops"] = round(
        flops / (out["pallas_fused_ms"] / 1e3) / 1e12, 2)
    out["qtile_dma_mb_per_call"] = round((N / 512) * (M / 512) * 16384 / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
