"""Same-session batch-size scaling sweep (VERDICT r2 weak item 3/next-4).

Runs the bench measurement for several batch sizes in ONE process back-to-back,
so the numbers are comparable (the shared tunneled chip's bandwidth varies
across sessions; see PERFORMANCE.md measurement note). Prints one JSON line per
batch with samples/s, ms/step, window times and MFU fields.

    python tools/batch_sweep.py --model ShapeNet --batches 3 6 12 24
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["ShapeNet", "Pix3D"], default="ShapeNet")
    ap.add_argument("--batches", type=int, nargs="+", default=[3, 6, 12, 24])
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    import bench

    fn = bench.bench_pix3d if args.model == "Pix3D" else bench.bench_shapenet
    for B in args.batches:
        result, times = fn(B)
        result["batch"] = B
        result["ms_per_step"] = round(1000.0 * float(np.median(times)) / bench.N_STEPS, 1)
        result["window_s"] = [round(t, 3) for t in times]
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
