"""Same-session A/B measurement of the env-gated kernel paths.

Measures the full ShapeNet train step with each variant back-to-back in ONE
process (same chip session), so the deltas are trustworthy on the shared
tunneled chip (PERFORMANCE.md measurement rule; VERDICT r2 weak item 2). The
env gates (MESHRCNN_FUSED_CHAMFER / MESHRCNN_FUSED_KNN) are read at trace
time, so toggling os.environ between jit instances selects the path.

    python tools/ab_trace.py            # all variants, one JSON line each
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

VARIANTS = [
    ("fused_both", {"MESHRCNN_FUSED_CHAMFER": "1", "MESHRCNN_FUSED_KNN": "1"}),
    ("xla_chamfer", {"MESHRCNN_FUSED_CHAMFER": "0", "MESHRCNN_FUSED_KNN": "1"}),
    ("xla_knn", {"MESHRCNN_FUSED_CHAMFER": "1", "MESHRCNN_FUSED_KNN": "0"}),
    ("xla_both", {"MESHRCNN_FUSED_CHAMFER": "0", "MESHRCNN_FUSED_KNN": "0"}),
]


def main():
    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    import bench

    for name, env in VARIANTS:
        os.environ.update(env)
        result, times = bench.bench_shapenet(3)
        out = {"variant": name, "samples_per_sec": result["value"],
               "ms_per_step": round(1000.0 * float(np.median(times)) / 20, 1),
               "window_s": [round(t, 3) for t in times]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
