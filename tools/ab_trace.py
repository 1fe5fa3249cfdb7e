"""Same-session A/B measurement of the env-gated kernel paths.

Measures the full ShapeNet train step with each variant back-to-back in ONE
process (same chip session), so the deltas are trustworthy on the shared
tunneled chip (PERFORMANCE.md measurement rule; VERDICT r2 weak item 2). The
env gates are read at trace time, so toggling os.environ between jit
instances selects the path.

    python tools/ab_trace.py            # all variants, one JSON line each
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, env, bench kwargs) — first entry is the shipped default configuration.
VARIANTS = [
    ("r3_default", {"MESHRCNN_FUSED_CHAMFER": "1", "MESHRCNN_FUSED_KNN": "1",
                    "MESHRCNN_BATCHED_CHAMFER": "1", "MESHRCNN_CUMSUM_BLOCK": "128"},
     {}),
    ("bisection_search", {"MESHRCNN_COUNTING_SEARCH": "0"}, {}),
    ("single_gram_chamfer", {"MESHRCNN_CHAMFER_DUALGRAM": "0"}, {}),
    ("scatter_add_bwd", {"MESHRCNN_MXU_SCATTER": "0"}, {}),
    ("mxu_all_widths", {"MESHRCNN_MXU_SCATTER_MIN_C": "0"}, {}),
    ("cumsum_block_512", {"MESHRCNN_CUMSUM_BLOCK": "512"}, {}),
    ("cumsum_block_256", {"MESHRCNN_CUMSUM_BLOCK": "256"}, {}),
    ("unbatched_chamfer_laxmap", {"MESHRCNN_CUMSUM_BLOCK": "128",
                                  "MESHRCNN_BATCHED_CHAMFER": "0"}, {}),
    ("gather_then_dense", {"MESHRCNN_PROJECT_FIRST": "0"}, {}),
    ("with_normal_metric", {"MESHRCNN_BATCHED_CHAMFER": "1"},
     {"report_unweighted": True}),
    ("xla_chamfer", {"MESHRCNN_FUSED_CHAMFER": "0"}, {}),
    ("xla_knn", {"MESHRCNN_FUSED_CHAMFER": "1", "MESHRCNN_FUSED_KNN": "0"},
     {"report_unweighted": True}),
    ("cumsum_highest", {"MESHRCNN_CUMSUM_PRECISION": "HIGHEST"}, {}),
    ("argsort_topo", {"MESHRCNN_PACKED_TOPO": "0"}, {}),
    # round-5 A/B arms (PERFORMANCE.md r5): tile_q 1024 is the default; the
    # bf16 arms are the measured OPT-IN headroom (rejected as defaults,
    # PARITY.md r5)
    ("agg_bf16", {"MESHRCNN_AGG_BF16": "1"}, {}),
    ("chamfer_tileq512", {"MESHRCNN_CHAMFER_TILEQ": "512"}, {}),
    ("chamfer_bf16gram", {"MESHRCNN_CHAMFER_BF16GRAM": "1"}, {}),
    ("chamfer_tileq1024", {"MESHRCNN_CHAMFER_TILEQ": "1024"}, {}),
    ("chamfer_tileq2048", {"MESHRCNN_CHAMFER_TILEQ": "2048"}, {}),
    ("chamfer_bf16_tileq1024", {"MESHRCNN_CHAMFER_BF16GRAM": "1",
                                "MESHRCNN_CHAMFER_TILEQ": "1024"}, {}),
]

BASE_ENV = {"MESHRCNN_FUSED_CHAMFER": "1", "MESHRCNN_FUSED_KNN": "1",
            "MESHRCNN_BATCHED_CHAMFER": "1", "MESHRCNN_CUMSUM_BLOCK": "128",
            "MESHRCNN_PROJECT_FIRST": "1", "MESHRCNN_BATCHED_KNN": "1",
            "MESHRCNN_MATMUL_ROIALIGN": "1", "MESHRCNN_FACE_NORMALS": "1",
            "MESHRCNN_COUNTING_SEARCH": "1", "MESHRCNN_CHAMFER_DUALGRAM": "1",
            "MESHRCNN_MXU_SCATTER": "1", "MESHRCNN_MXU_SCATTER_MIN_C": "32",
            "MESHRCNN_CUMSUM_PRECISION": "HIGH", "MESHRCNN_PACKED_TOPO": "1",
            # round-5: tile_q 1024 is default (numerics-neutral); the bf16
            # variants stay OPT-IN — fast but rejected as defaults by the
            # held-out fine-accuracy cost (PARITY.md round 5)
            "MESHRCNN_AGG_BF16": "0", "MESHRCNN_CHAMFER_BF16GRAM": "0",
            "MESHRCNN_CHAMFER_TILEQ": "1024"}

# Pix3D variants (the normal loss carries weight 0.1 there, so the kNN path is
# live in the recipe step — unlike ShapeNet, where it is elided at weight 0)
PIX3D_VARIANTS = [
    ("p3_r3_default", {}, {}),
    ("p3_bisection_search", {"MESHRCNN_COUNTING_SEARCH": "0"}, {}),
    ("p3_single_gram_chamfer", {"MESHRCNN_CHAMFER_DUALGRAM": "0"}, {}),
    ("p3_scatter_add_bwd", {"MESHRCNN_MXU_SCATTER": "0"}, {}),
    ("p3_laxmap_knn", {"MESHRCNN_BATCHED_KNN": "0"}, {}),
    ("p3_xla_knn", {"MESHRCNN_FUSED_KNN": "0"}, {}),
    ("p3_gather_roialign", {"MESHRCNN_MATMUL_ROIALIGN": "0"}, {}),
    ("p3_pca_normals", {"MESHRCNN_FACE_NORMALS": "0"}, {}),
    ("p3_cumsum_highest", {"MESHRCNN_CUMSUM_PRECISION": "HIGHEST"}, {}),
    ("p3_argsort_topo", {"MESHRCNN_PACKED_TOPO": "0"}, {}),
    ("p3_agg_bf16", {"MESHRCNN_AGG_BF16": "1"}, {}),
    ("p3_chamfer_tileq512", {"MESHRCNN_CHAMFER_TILEQ": "512"}, {}),
    # round-4 chamfer kernel variants — the ~25 ms/step chamfer cost lives on
    # this step (3 stages x B=4 at 10k x 10k clouds)
    ("p3_chamfer_bf16gram", {"MESHRCNN_CHAMFER_BF16GRAM": "1"}, {}),
    ("p3_chamfer_tileq1024", {"MESHRCNN_CHAMFER_TILEQ": "1024"}, {}),
    ("p3_chamfer_tileq2048", {"MESHRCNN_CHAMFER_TILEQ": "2048"}, {}),
    ("p3_chamfer_bf16_tileq1024", {"MESHRCNN_CHAMFER_BF16GRAM": "1",
                                   "MESHRCNN_CHAMFER_TILEQ": "1024"}, {}),
]


def main():
    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    import bench

    args = sys.argv[1:]
    pix3d = "--pix3d" in args
    only = [a for a in args if a != "--pix3d"] or None
    variants = PIX3D_VARIANTS if pix3d else VARIANTS
    for name, env, kwargs in variants:
        if only and name not in only:
            continue
        os.environ.update(BASE_ENV)
        os.environ.update(env)
        if pix3d:
            result, times = bench.bench_pix3d(4, **kwargs)
        else:
            result, times = bench.bench_shapenet(3, **kwargs)
        out = {"variant": name, "samples_per_sec": result["value"],
               "ms_per_step": round(1000.0 * float(np.median(times)) / bench.N_STEPS, 1),
               "window_s": [round(t, 3) for t in times]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
