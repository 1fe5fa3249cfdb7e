#!/usr/bin/env python
"""GCN training script — CLI surface mirrors the reference (reference: train.py:19-74).

TPU-native: builds the flax model, a jitted (optionally shard_map data-parallel)
train step, and runs epoch loops with orbax checkpointing per epoch. Pass
``--dataRoot synthetic`` to train on the built-in synthetic dataset (no downloads).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(description="GCN training script")
# model args (reference: train.py:21-40)
parser.add_argument("--model", "-m", choices=["ShapeNet", "Pix3D"], required=True,
                    help="the model we wish to train")
parser.add_argument("--featDim", type=int, default=128, help="number of vertex features")
parser.add_argument("--model_path", default="",
                    help="path of a pretrained model to continue training")
parser.add_argument("--backbone_path", "-bp", type=str, default="",
                    help="path of a pretrained backbone checkpoint")
parser.add_argument("--num_refinement_stages", "-nr", type=int, default=3,
                    help="number of mesh refinement stages")
parser.add_argument("--threshold", "-th", type=float, default=0.2,
                    help="Cubify threshold")
parser.add_argument("--voxel_only", default=False, action="store_true",
                    help="only train the voxel branch (curriculum warm start)")
parser.add_argument("--residual", default=False, action="store_true",
                    help="use residual refinement for ShapeNet")
parser.add_argument("--train_backbone", default=False, action="store_true",
                    help="train the backbone in addition to the GCN")
# loss args (reference: train.py:42-52)
parser.add_argument("--chamfer", type=float, default=1.0, help="chamfer loss weight")
parser.add_argument("--voxel", type=float, default=1.0, help="voxel loss weight")
parser.add_argument("--normal", type=float, default=0.1, help="normal loss weight")
parser.add_argument("--edge", type=float, default=0.5, help="edge loss weight")
parser.add_argument("--backbone", type=float, default=1.0, help="backbone loss weight")
# dataset/loader args (reference: train.py:54-68)
parser.add_argument("--num_sampels", type=int, default=None,
                    help="number of samples to take from the dataset")
parser.add_argument("--synthetic_size", type=int, default=None,
                    help="total size of the synthetic dataset (dataRoot="
                         "synthetic). Set it LARGER than --num_sampels to "
                         "leave genuinely held-out samples for eval_model.py "
                         "run with the same --synthetic_size: both CLIs then "
                         "share one seed-42 shuffle, train takes the first "
                         "num_sampels indices and eval's test split the rest")
parser.add_argument("--train_ratio", type=float, default=None,
                    help="ratio of samples used for training")
parser.add_argument("-c", "--classes", type=str, default=None,
                    help="comma separated classes of examples in the dataset")
parser.add_argument("--dataRoot", type=str, default="synthetic", help="dataset root")
parser.add_argument("--batchSize", "-b", type=int, default=16, help="batch size")
parser.add_argument("--workers", type=int, default=4,
                    help="prefetch threads collating upcoming batches while "
                         "the device runs the current step (0 = synchronous)")
parser.add_argument("--nEpoch", type=int, default=10, help="number of epochs")
# optimizer args (reference: train.py:70-74)
parser.add_argument("--optim", type=str, default="Adam", choices=["Adam", "SGD"])
parser.add_argument("--weightDecay", type=float, default=5e-6)
parser.add_argument("--lr", type=float, default=1e-4)
# TPU-specific
parser.add_argument("--vert_capacity", type=int, default=8192)
parser.add_argument("--face_capacity", type=int, default=16384)
parser.add_argument("--edge_capacity", type=int, default=32768)
parser.add_argument("--point_cloud_size", type=int, default=10000)
parser.add_argument("--checkpoint_root", type=str, default="checkpoints")
parser.add_argument("--num_devices", type=int, default=None,
                    help="dp mesh size (default: all local devices)")
parser.add_argument("--print_freq", type=int, default=10)
parser.add_argument("--img_size", type=int, default=224,
                    help="fixed Pix3D input size (TPU-static stand-in for the "
                         "reference's dynamic min-800 resize)")
parser.add_argument("--rpn_pre_nms_top_n", type=int, default=1000)
parser.add_argument("--rpn_post_nms_top_n", type=int, default=512)
parser.add_argument("--roi_batch_size", type=int, default=512)
parser.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="train steps fused into one device dispatch via lax.scan "
                         "(amortises host round-trip latency; composes with "
                         "--num_devices data parallelism)")
parser.add_argument("--grad_clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 disables; useful for "
                         "scratch-init Pix3D where the reference assumed COCO init)")
parser.add_argument("--no_pix3d_schedule", default=False, action="store_true",
                    help="use --lr directly instead of the reference's Pix3D "
                         "warmup/step schedule")
parser.add_argument("--backbone_dtype", type=str, default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="Pix3D detection-stack compute dtype (norms/box-math/"
                         "losses stay f32). 'auto' = bfloat16 on accelerators, "
                         "float32 on CPU — pin float32 to evaluate/resume f32 "
                         "checkpoints bit-stably")
parser.add_argument("--report_unweighted_losses", default=False, action="store_true",
                    help="force-compute loss terms whose weight is 0 so they appear "
                         "in step metrics (the reference's behavior); by default "
                         "zero-weight terms are statically elided from the step "
                         "(e.g. the normal kNN/PCA pipeline at normal=0)")
parser.add_argument("--multihost", default=False, action="store_true",
                    help="initialise jax.distributed for multi-host training "
                         "(grads pmean over ICI+DCN through the same dp axis)")
parser.add_argument("--mesh_feature_norm", default=False, action="store_true",
                    help="param-free RMS norm of the RoI features feeding the "
                         "mesh branch (needed for from-scratch Pix3D recipes; "
                         "must match between train and eval)")


def main():
    options = parser.parse_args()
    import jax

    if options.multihost:
        # multi-host: same shard_map/psum path, collectives ride ICI within a
        # slice and DCN across hosts (SURVEY.md §2.8 TPU-native equivalent)
        jax.distributed.initialize()

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from jax.sharding import Mesh

    from meshrcnn_tpu.core.config import (CapacityConfig, LossWeights, TrainConfig,
                                          resolve_backbone_dtype)
    from meshrcnn_tpu.data.datasets import (SyntheticDataset, dataLoader,
                                            pix3dDataset, shapeNet_Dataset)
    from meshrcnn_tpu.harness import train_epoch
    from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                  make_dp_train_step,
                                                  make_train_step, shard_batch)
    from meshrcnn_tpu.utils.checkpoint import checkpoint_dir, load_state, save_state
    from meshrcnn_tpu.utils.meters import gcn_metrics, safe_print, save_stats

    is_pix3d = options.model == "Pix3D"
    devices = jax.devices()
    n_dev = options.num_devices or len(devices)
    safe_print(f"{options.model} training\n used devices: {n_dev} ({devices[0].platform})\n"
               f" epochs: {options.nEpoch}\n")
    safe_print(f"options were:\n{options}\n")

    classes = options.classes.split(",") if options.classes else None
    capacities = CapacityConfig(verts=options.vert_capacity,
                                faces=options.face_capacity,
                                edges=options.edge_capacity)
    weights = LossWeights(chamfer=options.chamfer, voxel=options.voxel,
                          normal=options.normal, edge=options.edge,
                          backbone=options.backbone)
    config = TrainConfig(optimizer=options.optim.lower(), lr=options.lr,
                         weight_decay=options.weightDecay,
                         batch_size=options.batchSize, epochs=options.nEpoch,
                         train_backbone=options.train_backbone,
                         point_cloud_size=options.point_cloud_size,
                         loss_weights=weights, grad_clip=options.grad_clip,
                         pix3d_schedule=is_pix3d and not options.no_pix3d_schedule,
                         report_unweighted_losses=options.report_unweighted_losses)

    num_voxels = 24 if is_pix3d else 48
    if options.dataRoot == "synthetic":
        dataset = SyntheticDataset(n=max(options.synthetic_size
                                         or options.num_sampels or 64,
                                         options.batchSize),
                                   image_size=137 if not is_pix3d else options.img_size,
                                   num_voxels=32,
                                   num_classes=10 if is_pix3d else 13,
                                   pix3d=is_pix3d)
    elif is_pix3d:
        dataset = pix3dDataset(options.dataRoot, classes)
    else:
        dataset = shapeNet_Dataset(options.dataRoot, classes)

    loader = dataLoader(dataset, options.batchSize, num_voxels, capacities,
                        num_train_samples=options.num_sampels,
                        train_ratio=options.train_ratio,
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
                           rpn_pre_nms_top_n=options.rpn_pre_nms_top_n,
                           rpn_post_nms_top_n=options.rpn_post_nms_top_n,
                           roi_batch_size=options.roi_batch_size,
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
    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(model, config, rng, np.asarray(sample_batch.images))
    if options.model_path:
        try:
            state = load_state(options.model_path, state)
            safe_print(f"loaded checkpoint {options.model_path}")
        except Exception:
            # structure mismatch (e.g. voxel-only warm-start checkpoint resumed
            # into the full model): merge matching subtrees, fresh opt state
            from meshrcnn_tpu.utils.checkpoint import load_state_partial
            state, (n_loaded, n_total) = load_state_partial(options.model_path, state)
            safe_print(f"partially loaded checkpoint {options.model_path} "
                       f"({n_loaded}/{n_total} param leaves)")
    elif options.backbone_path:
        if options.backbone_path.endswith((".pth", ".pt")):
            # torchvision zoo checkpoint -> converted flax params
            from meshrcnn_tpu.utils.torch_convert import (load_pretrained_maskrcnn,
                                                          load_pretrained_resnet50,
                                                          merge_backbone_params)
            if is_pix3d:
                bp, bs = load_pretrained_maskrcnn(options.backbone_path,
                                                  num_classes=10)
            else:
                bp, bs = load_pretrained_resnet50(options.backbone_path,
                                                  num_classes=13)
            state = merge_backbone_params(state, bp, bs)
        else:
            # orbax backbone-only checkpoint from train_backbone.py
            import orbax.checkpoint as ocp
            from meshrcnn_tpu.utils.torch_convert import merge_backbone_params
            bb = ocp.StandardCheckpointer().restore(
                os.path.abspath(options.backbone_path))
            state = merge_backbone_params(state, bb["params"], bb["batch_stats"])
        safe_print(f"loaded backbone {options.backbone_path}")

    shard_fn = None
    multi_step_fn = None
    group_shard_fn = None
    if n_dev > 1:
        mesh = Mesh(np.array(devices[:n_dev]), ("dp",))
        step_fn = make_dp_train_step(model, config, mesh, donate=True)
        shard_fn = lambda b: shard_batch(b, mesh)
        if options.steps_per_dispatch > 1:
            from meshrcnn_tpu.parallel.train_step import (make_multi_step,
                                                          shard_stacked_batch)
            multi_step_fn = make_multi_step(model, config,
                                            options.steps_per_dispatch, mesh=mesh,
                                            donate=True)
            group_shard_fn = lambda b: shard_stacked_batch(b, mesh)
    else:
        step_fn = jax.jit(make_train_step(model, config), donate_argnums=(0,))
        if options.steps_per_dispatch > 1:
            from meshrcnn_tpu.parallel.train_step import make_multi_step
            multi_step_fn = make_multi_step(model, config,
                                            options.steps_per_dispatch, donate=True)

    ckpt_dir = checkpoint_dir(options.checkpoint_root, options.model)
    meters = gcn_metrics(options.voxel_only)
    for epoch in range(options.nEpoch):
        state, meters = train_epoch(epoch, step_fn, state, loader, meters,
                                    rng, print_freq=options.print_freq,
                                    shard_fn=shard_fn,
                                    multi_step_fn=multi_step_fn,
                                    steps_per_dispatch=options.steps_per_dispatch,
                                    group_shard_fn=group_shard_fn)
        save_state(state, os.path.join(ckpt_dir, "model"), step=epoch)
        save_stats(meters, os.path.join(ckpt_dir, f"stats_{epoch}.st"))
        safe_print(f"epoch {epoch} done; checkpoint + stats saved to {ckpt_dir}")
    save_state(state, os.path.join(ckpt_dir, "final"))
    safe_print("training done")


if __name__ == "__main__":
    main()
