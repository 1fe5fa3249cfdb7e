#!/usr/bin/env python
"""Dataset evaluation script — CLI mirrors the reference (reference: eval_model.py:13-44).

Computes voxel/chamfer/normal/edge losses, the reference's confusion-based
f0_1/f0_3/f0_5 and true point-cloud F1@0.1/0.3, then pickles the metrics dict to
``metrics_<model>.st`` (reference: eval_model.py:123-127).
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

parser = argparse.ArgumentParser(description="dataset evaluation script")
parser.add_argument("--model", "-m", choices=["ShapeNet", "Pix3D"], required=True)
parser.add_argument("--featDim", type=int, default=128)
parser.add_argument("--model_path", type=str, default="",
                    help="path to the checkpoint to evaluate")
parser.add_argument("--num_refinement_stages", "-nr", type=int, default=3)
parser.add_argument("--threshold", "-th", type=float, default=0.2)
parser.add_argument("--residual", default=False, action="store_true")
parser.add_argument("--voxel_only", default=False, action="store_true",
                    help="evaluate only the voxel branch (matches --voxel_only training)")
parser.add_argument("--synthetic_size", type=int, default=64,
                    help="total size of the synthetic dataset (dataRoot="
                         "synthetic); pass the SAME value train.py was given "
                         "so the seed-42 split's test side is disjoint from "
                         "the training indices")
parser.add_argument("--test_ratio", type=float, default=1.0,
                    help="ratio of samples to test")
parser.add_argument("-c", "--classes", type=str, default=None)
parser.add_argument("--dataRoot", type=str, default="synthetic")
parser.add_argument("--batchSize", "-b", type=int, default=16)
parser.add_argument("--workers", type=int, default=4)
parser.add_argument("--output_path", type=str, default=".")
parser.add_argument("--vert_capacity", type=int, default=8192)
parser.add_argument("--face_capacity", type=int, default=16384)
parser.add_argument("--edge_capacity", type=int, default=32768)
parser.add_argument("--point_cloud_size", type=int, default=10000)
parser.add_argument("--img_size", type=int, default=224,
                    help="fixed Pix3D input size")
parser.add_argument("--rpn_post_nms_top_n", type=int, default=512)
parser.add_argument("--num_devices", type=int, default=None,
                    help="dp mesh size for data-parallel eval "
                         "(default: 1; batchSize must be divisible by it)")
parser.add_argument("--backbone_dtype", type=str, default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="Pix3D detection-stack compute dtype; 'auto' = bfloat16 "
                         "on accelerators, float32 on CPU (pin float32 for f32 "
                         "checkpoints)")
parser.add_argument("--split_eval", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="Pix3D only: run the eval forward as three chained XLA "
                         "programs (detection+voxel | cubify+topo | refinement) "
                         "instead of one. Since the round-3 chunked-aggregation "
                         "fix (ROADMAP.md) the single dispatch runs fine on TPU "
                         "and is faster, so 'auto' = off; 'on' is kept as a "
                         "debugging/robustness fallback")
parser.add_argument("--mesh_feature_norm", default=False, action="store_true",
                    help="param-free RMS norm of the RoI features feeding the "
                         "mesh branch (needed for from-scratch Pix3D recipes; "
                         "must match between train and eval)")


def main():
    options = parser.parse_args()
    import jax

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from meshrcnn_tpu.core.config import (CapacityConfig, TrainConfig,
                                          resolve_backbone_dtype)
    from meshrcnn_tpu.data.datasets import (SyntheticDataset, dataLoader,
                                            pix3dDataset, shapeNet_Dataset)
    from meshrcnn_tpu.harness import validate, validate_pix3d
    from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step
    from meshrcnn_tpu.utils.checkpoint import load_state
    from meshrcnn_tpu.utils.meters import safe_print

    is_pix3d = options.model == "Pix3D"
    classes = options.classes.split(",") if options.classes else None
    capacities = CapacityConfig(verts=options.vert_capacity,
                                faces=options.face_capacity,
                                edges=options.edge_capacity)
    config = TrainConfig(point_cloud_size=options.point_cloud_size,
                         batch_size=options.batchSize)
    num_voxels = 24 if is_pix3d else 48
    num_classes = 10 if is_pix3d else 13

    if options.dataRoot == "synthetic":
        dataset = SyntheticDataset(n=options.synthetic_size,
                                   image_size=options.img_size if is_pix3d else 137,
                                   num_voxels=32, num_classes=num_classes,
                                   pix3d=is_pix3d)
    elif is_pix3d:
        dataset = pix3dDataset(options.dataRoot, classes)
    else:
        dataset = shapeNet_Dataset(options.dataRoot, classes)
    # reference eval: test=True split with 1 - test_ratio train fraction
    loader = dataLoader(dataset, options.batchSize, num_voxels, capacities,
                        test=True, train_ratio=max(1e-9, 1.0 - options.test_ratio),
                        image_size=options.img_size if is_pix3d else None,
                        workers=options.workers)

    if is_pix3d:
        from meshrcnn_tpu.models.pix3d import Pix3DModel
        model = Pix3DModel(num_classes=10,
                           cubify_threshold=options.threshold,
                           vertex_feature_dim=options.featDim,
                           num_refinement_stages=options.num_refinement_stages,
                           voxel_only=options.voxel_only,
                           vert_capacity=capacities.verts,
                           face_capacity=capacities.faces,
                           edge_capacity=capacities.edges,
                           rpn_post_nms_top_n=options.rpn_post_nms_top_n,
                           backbone_dtype=resolve_backbone_dtype(options.backbone_dtype),
                           mesh_feature_norm=options.mesh_feature_norm)
    else:
        from meshrcnn_tpu.models.shapenet import ShapeNetModel
        model = ShapeNetModel(num_classes=13, residual=options.residual,
                              cubify_threshold=options.threshold,
                              vertex_feature_dim=options.featDim,
                              num_refinement_stages=options.num_refinement_stages,
                              voxel_only=options.voxel_only,
                              vert_capacity=capacities.verts,
                              face_capacity=capacities.faces,
                              edge_capacity=capacities.edges)
    sample_batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng, np.asarray(sample_batch.images))
    if options.model_path:
        try:
            state = load_state(options.model_path, state)
            safe_print(f"loaded checkpoint {options.model_path}")
        except Exception:
            # structure mismatch — e.g. the checkpoint was trained with
            # --train_backbone (plain optimizer chain) while eval's fresh state
            # uses the frozen-backbone multi_transform template. Eval never
            # touches the optimizer, so params/batch_stats are all that matter.
            from meshrcnn_tpu.utils.checkpoint import load_state_partial
            state, (n_loaded, n_total) = load_state_partial(options.model_path, state)
            safe_print(f"partially loaded checkpoint {options.model_path} "
                       f"({n_loaded}/{n_total} param leaves)")
            if n_loaded < n_total:
                safe_print("warning: some eval-model params were not in the "
                           "checkpoint (voxel-only checkpoint into a full model?)")

    split = is_pix3d and not options.voxel_only and options.split_eval == "on"
    n_dev = options.num_devices or 1
    if n_dev > 1:
        # data-parallel eval: batch shards over the dp mesh, outputs merge as
        # batch-sharded pytrees (reference: dataParallel/gather.py:66-92)
        from jax.sharding import Mesh
        from meshrcnn_tpu.parallel.train_step import make_dp_eval_step
        assert options.batchSize % n_dev == 0, "batchSize must divide over devices"
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
        eval_step = make_dp_eval_step(model, mesh, split=split)
    elif split and is_pix3d:
        # three chained XLA programs (debug/robustness fallback; the round-3
        # chunked-aggregation fix made the single dispatch work on TPU —
        # ROADMAP.md "RESOLVED in round 3")
        from meshrcnn_tpu.parallel.train_step import make_split_eval_step
        safe_print("using split Pix3D eval dispatch")
        eval_step = make_split_eval_step(model)
    else:
        eval_step = make_eval_step(model)
    validate_fn = validate_pix3d if is_pix3d else validate
    results = validate_fn(0, eval_step, state, loader, config,
                          num_classes=num_classes, rng=rng,
                          voxel_only=options.voxel_only)
    safe_print({k: v for k, v in results.items() if k != "confusion"})

    os.makedirs(options.output_path, exist_ok=True)
    out = os.path.join(options.output_path, f"metrics_{options.model}.st")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    safe_print(f"metrics saved to {out}")


if __name__ == "__main__":
    main()
