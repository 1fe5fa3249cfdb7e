#!/usr/bin/env python
"""Single-image inference + artifact export (reference: demo.py:18-103).

Runs the eval forward on one image and saves, per object i:
  <name>_voxel_obj{i}.npy                      — binarised 48^3 occupancy mask
  <name>_mesh_stage{s}_obj_{i}.obj, s in 0..3  — per-refinement-stage meshes
matching the reference's artifact layout (demo.py:89-103, shapenet_ex/).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser("model inference script")
parser.add_argument("--model", "-m", choices=["ShapeNet", "Pix3D"], required=True)
parser.add_argument("--featDim", type=int, default=128)
parser.add_argument("--modelPath", type=str, default="",
                    help="path to the trained checkpoint")
parser.add_argument("--num_refinement_stages", "-nr", type=int, default=3)
parser.add_argument("--threshold", "-th", type=float, default=0.5)
parser.add_argument("--residual", default=False, action="store_true")
parser.add_argument("--imagePath", type=str, required=True)
parser.add_argument("--savePath", type=str, default="eval/")
parser.add_argument("--show", default=False, action="store_true",
                    help="display the predicted voxels and meshes")
parser.add_argument("--vert_capacity", type=int, default=8192)
parser.add_argument("--face_capacity", type=int, default=16384)
parser.add_argument("--edge_capacity", type=int, default=32768)
parser.add_argument("--img_size", type=int, default=224, help="Pix3D input size")
parser.add_argument("--mesh_feature_norm", default=False, action="store_true",
                    help="param-free RMS norm of the RoI features feeding the "
                         "mesh branch (needed for from-scratch Pix3D recipes; "
                         "must match between train and eval)")


def main():
    options = parser.parse_args()
    import jax

    from meshrcnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import PIL.Image

    from meshrcnn_tpu.core.config import TrainConfig
    from meshrcnn_tpu.models.shapenet import ShapeNetModel
    from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step
    from meshrcnn_tpu.utils.checkpoint import load_state
    from meshrcnn_tpu.data.serialization import save_mesh, save_voxels

    is_pix3d = options.model == "Pix3D"
    img = PIL.Image.open(options.imagePath).convert("RGB")
    if is_pix3d:
        img = img.resize((options.img_size, options.img_size), PIL.Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32)
    if arr.max() > 1.0:
        arr = arr / 255.0
    images = arr[None]  # [1, H, W, 3]

    if is_pix3d:
        from meshrcnn_tpu.models.pix3d import Pix3DModel
        model = Pix3DModel(num_classes=10,
                           cubify_threshold=options.threshold,
                           vertex_feature_dim=options.featDim,
                           num_refinement_stages=options.num_refinement_stages,
                           vert_capacity=options.vert_capacity,
                           face_capacity=options.face_capacity,
                           edge_capacity=options.edge_capacity,
                           mesh_feature_norm=options.mesh_feature_norm)
    else:
        model = ShapeNetModel(num_classes=13, residual=options.residual,
                              cubify_threshold=options.threshold,
                              vertex_feature_dim=options.featDim,
                              num_refinement_stages=options.num_refinement_stages,
                              vert_capacity=options.vert_capacity,
                              face_capacity=options.face_capacity,
                              edge_capacity=options.edge_capacity)
    state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0), images)
    if options.modelPath:
        try:
            state = load_state(options.modelPath, state)
            print(f"loaded checkpoint {options.modelPath}")
        except Exception:
            # opt-state structure mismatch (different --train_backbone at train
            # time); inference only needs params/batch_stats
            from meshrcnn_tpu.utils.checkpoint import load_state_partial
            state, (n_loaded, n_total) = load_state_partial(options.modelPath, state)
            print(f"partially loaded checkpoint {options.modelPath} "
                  f"({n_loaded}/{n_total} param leaves)")
            if n_loaded == 0:
                # ADVICE r2 finding 4: a totally-failed load must not silently
                # run inference on random init
                raise SystemExit(
                    f"error: no parameters could be loaded from "
                    f"{options.modelPath} — wrong/corrupt checkpoint?")
            if n_loaded < n_total:
                print("warning: some params missing from the checkpoint "
                      "(voxel-only checkpoint into a full model?)")

    out = make_eval_step(model)(state, images)

    os.makedirs(options.savePath, exist_ok=True)
    name = os.path.join(options.savePath,
                        os.path.splitext(os.path.basename(options.imagePath))[0])

    voxels = np.asarray(out.voxels)
    # pix3d: one object per valid detection slot; shapenet: one per image
    obj_valid = (np.asarray(out.mesh_valid) if hasattr(out, "mesh_valid")
                 else np.ones((voxels.shape[0],), bool))
    for i in range(voxels.shape[0]):
        if obj_valid[i]:
            save_voxels(voxels[i], f"{name}_voxel_obj{i}", threshold=options.threshold)

    mesh = out.mesh
    vmask = np.asarray(mesh.verts_mask)
    fmask = np.asarray(mesh.faces_mask)
    for s, verts in enumerate(out.stage_verts):
        v = np.asarray(verts)
        faces = np.asarray(mesh.faces)
        for i in range(v.shape[0]):
            if obj_valid[i]:
                save_mesh(v[i][vmask[i]], faces[i][fmask[i]],
                          f"{name}_mesh_stage{s}_obj_{i}")
    print(f"saved artifacts under {options.savePath}")

    if options.show:
        from meshrcnn_tpu.utils.show import show_mesh, show_voxels
        show_voxels(voxels[0], threshold=options.threshold)
        show_mesh(np.asarray(out.stage_verts[-1])[0], np.asarray(mesh.faces)[0],
                  vmask[0], fmask[0])


if __name__ == "__main__":
    main()
