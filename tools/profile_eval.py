"""Capture an xprof trace of one eval batch (forward + fused metrics) and
print top HLO ops — the eval-path sibling of tools/profile_step.py.

The eval CLIs run two programs per batch (harness.validate/_pix3d): the
eval-mode forward and the fused metrics dispatch. This traces N repetitions
of that pair at production shapes so PERFORMANCE.md's eval timings can name
where the batch time actually goes.

    python tools/profile_eval.py --model Pix3D --batch 4 --top 25
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["ShapeNet", "Pix3D"], default="Pix3D")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--vert_capacity", type=int, default=4096)
    ap.add_argument("--face_capacity", type=int, default=8192)
    ap.add_argument("--edge_capacity", type=int, default=16384)
    ap.add_argument("--log_dir", default=None)
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meshrcnn_tpu.core.config import CapacityConfig, TrainConfig
    from meshrcnn_tpu.data.datasets import SyntheticDataset, dataLoader
    from meshrcnn_tpu.harness import _pix3d_eval_metrics, _shapenet_eval_metrics
    from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                  make_eval_step)

    is_pix3d = args.model == "Pix3D"
    B = args.batch or (4 if is_pix3d else 3)
    caps = CapacityConfig(verts=args.vert_capacity, faces=args.face_capacity,
                          edges=args.edge_capacity)
    config = TrainConfig(point_cloud_size=10000)
    num_voxels = 24 if is_pix3d else 48
    num_classes = 10 if is_pix3d else 13
    ds = SyntheticDataset(n=4 * B, image_size=137, num_voxels=32,
                          num_classes=num_classes, pix3d=is_pix3d)
    loader = dataLoader(ds, B, num_voxels, caps, test=True, train_ratio=0.5,
                        image_size=224 if is_pix3d else None)
    batch = next(iter(loader))

    if is_pix3d:
        from meshrcnn_tpu.models.pix3d import Pix3DModel
        model = Pix3DModel(num_classes=num_classes, vert_capacity=caps.verts,
                           face_capacity=caps.faces, edge_capacity=caps.edges)
    else:
        from meshrcnn_tpu.models.shapenet import ShapeNetModel
        model = ShapeNetModel(num_classes=num_classes, vert_capacity=caps.verts,
                              face_capacity=caps.faces, edge_capacity=caps.edges)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng, np.asarray(batch.images))
    eval_step = make_eval_step(model)

    images = jnp.asarray(batch.images)
    taus = (0.1, 0.3)

    def one(key):
        out = eval_step(state, images)
        if is_pix3d:
            return _pix3d_eval_metrics(
                key, out, jnp.asarray(batch.boxes), jnp.asarray(batch.masks),
                jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
                jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
                config.point_cloud_size, config.normal_k, config.distance_tile,
                taus, False)
        return _shapenet_eval_metrics(
            key, out, jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
            jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
            config.point_cloud_size, config.normal_k, config.distance_tile,
            taus, False)

    m = one(rng)                      # compile outside the trace
    jax.block_until_ready(m)
    import time
    t0 = time.time()
    for i in range(args.steps):
        m = one(jax.random.fold_in(rng, i))
    jax.block_until_ready(m)
    wall = (time.time() - t0) / args.steps

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="meshrcnn_evtrace_")
    jax.profiler.start_trace(log_dir)
    for i in range(args.steps):
        m = one(jax.random.fold_in(rng, i))
    jax.block_until_ready(m)
    jax.profiler.stop_trace()

    from profile_step import hlo_stats_rows
    rows = hlo_stats_rows(log_dir)

    def col(row, *names):
        for n in names:
            if n in row and row[n] is not None:
                return row[n]
        return None

    for r in rows:
        r["_t"] = float(col(r, "Total time (us)", "total_time_us",
                            "Avg. time (us)", "occurrences_total_time_us") or 0.0)
        r["_cat"] = str(col(r, "HLO op category", "category", "Category") or "?")
        r["_name"] = str(col(r, "HLO op name", "hlo_op_name", "HLO op") or "?")[:90]
    total = sum(r["_t"] for r in rows)
    print(json.dumps({"model": args.model, "batch": B, "steps": args.steps,
                      "device_us_per_batch": round(total / max(args.steps, 1), 1),
                      "wall_s_per_batch": round(wall, 3),
                      "trace_dir": log_dir}))
    cats = {}
    for r in rows:
        cats[r["_cat"]] = cats.get(r["_cat"], 0.0) + r["_t"]
    print("\n-- category rollup (us/batch) --")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t/args.steps:10.1f}  {100*t/max(total,1e-9):5.1f}%  {c}")
    print(f"\n-- top {args.top} ops (us/batch) --")
    for r in sorted(rows, key=lambda r: -r["_t"])[:args.top]:
        print(f"{r['_t']/args.steps:10.1f}  {100*r['_t']/max(total,1e-9):5.1f}%  "
              f"{r['_cat'][:24]:24s} {r['_name']}")


if __name__ == "__main__":
    main()
