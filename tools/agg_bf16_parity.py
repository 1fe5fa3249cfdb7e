"""Learning-parity clearance for numerics-affecting kernel defaults.

VERDICT r3/r4 carried `MESHRCNN_AGG_BF16` (−7.3 ms ≈ 7% of the ShapeNet step)
as measured-but-unclaimed headroom because it rounds the GraphConv edge
contributions to bf16 *before* the neighbour sum — a real forward-numerics
change that must clear the PARITY.md learning-parity protocol before becoming
the default. This script runs that protocol: N short end-to-end ShapeNet
training arms in ONE process (same seeds, same pre-collated batches, identical
everything except the env gate), recording per-epoch train losses and a final
fused-metrics eval on held-out batches for each arm.

Accept criterion (mirrors PARITY.md round-3 regression check): monotone loss
trajectories in every arm, per-epoch voxel/chamfer trajectories tracking the
baseline within a few percent, and held-out metrics within noise of baseline.

    python tools/agg_bf16_parity.py [--epochs 5] [--n 240]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [
    ("baseline", {"MESHRCNN_AGG_BF16": "0", "MESHRCNN_CHAMFER_BF16GRAM": "0",
                  "MESHRCNN_CHAMFER_TILEQ": "512"}),
    ("agg_bf16", {"MESHRCNN_AGG_BF16": "1", "MESHRCNN_CHAMFER_BF16GRAM": "0",
                  "MESHRCNN_CHAMFER_TILEQ": "512"}),
    # the full prospective round-5 default set (agg bf16 + chamfer variants)
    ("combo", {"MESHRCNN_AGG_BF16": "1", "MESHRCNN_CHAMFER_BF16GRAM": "1",
               "MESHRCNN_CHAMFER_TILEQ": "1024"}),
    # chamfer variants alone (isolates the gram/tiling change from AGG_BF16)
    ("chamfer_only", {"MESHRCNN_AGG_BF16": "0", "MESHRCNN_CHAMFER_BF16GRAM": "1",
                      "MESHRCNN_CHAMFER_TILEQ": "1024"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--arms", nargs="*", default=None)
    ap.add_argument("--seed", type=int, default=1,
                    help="training rng seed (vary to measure the baseline's "
                         "own run-to-run noise floor for trajectory deltas)")
    args = ap.parse_args()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from meshrcnn_tpu.core.config import CapacityConfig, LossWeights, TrainConfig
    from meshrcnn_tpu.data.datasets import SyntheticDataset, collate
    from meshrcnn_tpu.harness import _shapenet_eval_metrics
    from meshrcnn_tpu.models.shapenet import ShapeNetModel
    from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                  make_eval_step, make_train_step)

    caps = CapacityConfig(verts=2048, faces=4096, edges=8192)
    n_train = args.n - args.n // 6          # ~1/6 held out
    ds = SyntheticDataset(n=args.n, image_size=137, num_voxels=32,
                          num_classes=13, pix3d=False)

    def batches_of(lo, hi):
        out = []
        for i in range(lo, hi - args.batch + 1, args.batch):
            out.append(collate([ds[j] for j in range(i, i + args.batch)], 48, caps))
        return out

    train_batches = batches_of(0, n_train)
    test_batches = batches_of(n_train, args.n)
    print(f"{len(train_batches)} train / {len(test_batches)} held-out batches",
          flush=True)

    # ShapeNet airplane recipe weights (reference README.md:77)
    model = ShapeNetModel(num_classes=13, residual=True, cubify_threshold=0.2,
                          vert_capacity=caps.verts, face_capacity=caps.faces,
                          edge_capacity=caps.edges, num_refinement_stages=3)
    config = TrainConfig(optimizer="adam", lr=1e-4, weight_decay=0.0,
                         batch_size=args.batch, point_cloud_size=2048,
                         normal_k=10, distance_tile=1024, train_backbone=True,
                         loss_weights=LossWeights(voxel=1.0, chamfer=1.0,
                                                  normal=0.0, edge=0.5))

    results = {}
    for name, env in ARMS:
        if args.arms and name not in args.arms:
            continue
        os.environ.update(env)
        # the fused metrics program is a module-level jit: clear it so each
        # arm's heldout eval traces under ITS env (the kernel gates are read
        # at trace time; a warm cache would silently reuse the first arm's)
        if hasattr(_shapenet_eval_metrics, "clear_cache"):
            _shapenet_eval_metrics.clear_cache()
        t0 = time.time()
        state = create_train_state(model, config, jax.random.PRNGKey(0),
                                   np.asarray(train_batches[0].images))
        step = jax.jit(make_train_step(model, config), donate_argnums=(0,))
        eval_step = jax.jit(make_eval_step(model))
        k = jax.random.PRNGKey(args.seed)
        epochs = []
        for e in range(args.epochs):
            sums, cnt = {}, 0
            for b in train_batches:
                k, sk = jax.random.split(k)
                state, metrics = step(state, b, sk)
                m = jax.device_get(metrics)
                for key in ("voxel_loss", "chamfer_loss", "edge_loss", "loss"):
                    if key in m:
                        sums[key] = sums.get(key, 0.0) + float(m[key])
                cnt += 1
            row = {key: round(v / cnt, 5) for key, v in sums.items()}
            epochs.append(row)
            print(json.dumps({"arm": name, "epoch": e, **row,
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)
        # held-out fused eval metrics (voxel IoU + chamfer + F1@0.1/0.3)
        agg, nb = {}, 0
        for i, b in enumerate(test_batches):
            m = jax.device_get(_shapenet_eval_metrics(
                jax.random.PRNGKey(100 + i), eval_step(state, b.images),
                b.voxels, b.gt_verts, b.gt_faces, b.gt_faces_mask,
                config.point_cloud_size, config.normal_k, config.distance_tile,
                (0.1, 0.3), False))
            for key in ("voxel_loss", "voxel_iou", "chamfer_loss"):
                agg[key] = agg.get(key, 0.0) + float(m[key])
            agg["f1_01"] = agg.get("f1_01", 0.0) + float(m["f1_sum"][0])
            agg["f1_03"] = agg.get("f1_03", 0.0) + float(m["f1_sum"][1])
            agg["f1_n"] = agg.get("f1_n", 0) + int(m["f1_count"])
            nb += 1
        heldout = {k2: round(v / nb, 5) for k2, v in agg.items()
                   if k2 not in ("f1_01", "f1_03", "f1_n")}
        fn = max(agg["f1_n"], 1)
        heldout["F1@0.1"] = round(agg["f1_01"] / fn, 5)
        heldout["F1@0.3"] = round(agg["f1_03"] / fn, 5)
        results[name] = {"epochs": epochs, "heldout": heldout}
        print(json.dumps({"arm": name, "heldout": heldout}), flush=True)

    if len(results) > 1 and "baseline" in results:
        base = results["baseline"]
        verdicts = {}
        for name, r in results.items():
            if name == "baseline":
                continue
            rel = {}
            for key in ("voxel_loss", "chamfer_loss"):
                a = r["epochs"][-1][key]
                b = base["epochs"][-1][key]
                rel[key] = round(abs(a - b) / max(abs(b), 1e-9), 4)
            rel["heldout_f1_03_delta"] = round(
                r["heldout"]["F1@0.3"] - base["heldout"]["F1@0.3"], 4)
            verdicts[name] = rel
        print("PARITY_SUMMARY " + json.dumps(verdicts), flush=True)


if __name__ == "__main__":
    main()
