#!/usr/bin/env python
"""Generate a reproducible mini-ShapeNet in the real on-disk layout.

The environment has no egress, so the real ShapeNetRendering/ShapeNetVox32
archives (reference: download_dataset.py:28-75) cannot be downloaded. This tool
fabricates a small dataset in the exact same directory layout so that the full
real-data pipeline — ``download_dataset.py --render_meshes --build_manifest`` →
``shapeNet_Dataset`` → ``train.py`` — runs end-to-end:

  <root>/ShapeNetVox32/<synset>/<model_id>/model.binvox   (32^3 RLE grids)
  <root>/ShapeNetRendering/<synset>/<model_id>/rendering/NN.png (137x137 RGB)

Shapes are unions of 2-4 random solid ellipsoids/boxes on the 32^3 lattice —
varied, connected, and learnable. Each rendering is a depth-shaded orthographic
projection of the *same* grid along a per-view axis, so the image determines the
shape and an image->voxel model has true signal to fit (the reference's renders
are ray-traced ShapeNet views; the learning problem is analogous).

Used by the accuracy-parity experiment (PARITY.md) to replay the reference
training recipe (reference: README.md:77, report §Training method).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser("mini-ShapeNet generator")
parser.add_argument("--root", type=str, required=True)
parser.add_argument("--num_models", type=int, default=128)
parser.add_argument("--views", type=int, default=2)
parser.add_argument("--synset", type=str, default="02691156",
                    help="synset id the models are filed under (default: airplane)")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--img_size", type=int, default=137)


def make_grid(rng: np.random.RandomState, V: int = 32) -> np.ndarray:
    """Union of 2-4 random solid ellipsoids/boxes, clipped to the lattice."""
    g = np.zeros((V, V, V), dtype=bool)
    idx = np.stack(np.meshgrid(*[np.arange(V)] * 3, indexing="ij"), -1)
    for _ in range(rng.randint(2, 5)):
        c = rng.uniform(V * 0.3, V * 0.7, size=3)
        r = rng.uniform(V * 0.08, V * 0.28, size=3)
        if rng.rand() < 0.5:
            g |= (((idx - c) / r) ** 2).sum(-1) <= 1.0          # ellipsoid
        else:
            g |= (np.abs(idx - c) <= r).all(-1)                 # box
    # guarantee non-empty
    if not g.any():
        g[V // 2 - 2:V // 2 + 2, V // 2 - 2:V // 2 + 2, V // 2 - 2:V // 2 + 2] = True
    return g


def render_view(grid: np.ndarray, view: int, img_size: int) -> np.ndarray:
    """Depth-shaded orthographic projection along a per-view axis -> uint8 RGB."""
    import PIL.Image
    # per-view canonical orientation: permute axes then project along axis 0
    perms = [(0, 1, 2), (1, 2, 0), (2, 0, 1), (0, 2, 1), (1, 0, 2), (2, 1, 0)]
    g = np.transpose(grid, perms[view % len(perms)])
    if view % 2 == 1:
        g = g[::-1]
    V = g.shape[0]
    depth_idx = np.argmax(g, axis=0)                 # first occupied voxel
    hit = g.any(axis=0)
    shade = np.where(hit, 1.0 - depth_idx / V, 0.0)  # nearer -> brighter
    thickness = g.sum(axis=0) / V                    # second channel: mass
    img = np.stack([shade, thickness, hit.astype(np.float32)], -1)
    pil = PIL.Image.fromarray((img * 255).astype(np.uint8))
    return np.asarray(pil.resize((img_size, img_size), PIL.Image.BILINEAR))


def main():
    from meshrcnn_tpu.data.serialization import write_binvox
    import PIL.Image

    opt = parser.parse_args()
    rng = np.random.RandomState(opt.seed)
    vox_root = os.path.join(opt.root, "ShapeNetVox32", opt.synset)
    render_root = os.path.join(opt.root, "ShapeNetRendering", opt.synset)
    for m in range(opt.num_models):
        mid = f"model{m:04d}"
        grid = make_grid(rng)
        vdir = os.path.join(vox_root, mid)
        os.makedirs(vdir, exist_ok=True)
        write_binvox(grid, os.path.join(vdir, "model.binvox"))
        rdir = os.path.join(render_root, mid, "rendering")
        os.makedirs(rdir, exist_ok=True)
        for v in range(opt.views):
            img = render_view(grid, v, opt.img_size)
            PIL.Image.fromarray(img).save(os.path.join(rdir, f"{v:02d}.png"))
    print(f"wrote {opt.num_models} models x {opt.views} views under {opt.root}")


if __name__ == "__main__":
    main()
