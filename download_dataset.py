#!/usr/bin/env python
"""Dataset download + preparation tooling (reference: download_dataset.py).

Capabilities mirrored:
  * download pix3d.zip / ShapeNetRendering.tgz / ShapeNetVox32.tgz (28-75);
  * render ShapeNet GT meshes by running cubify(0.5) on the 32^3 binvox grids in
    batches, normalized and saved as OBJ — i.e. the ground truth meshes *are*
    cubify output (84-116), here produced by the TPU cubify op;
  * build the shapenet.json manifest with synset-id -> class-name mapping (119-174).
"""
from __future__ import annotations

import argparse
import json
import os
import urllib.request

import numpy as np

# synset-id -> class-name map (reference: download_dataset.py:119-147)
SYNSET_TO_CLASS = {
    "02691156": "airplane", "02828884": "bench", "02933112": "closet",
    "02958343": "car", "03001627": "chair", "03211117": "tv",
    "03636649": "lamp", "03691459": "stereo", "03797390": "gun",
    "04256520": "sofa", "04379243": "table", "04401088": "phone",
    "04530566": "ship",
}

URLS = {
    "pix3d": "http://pix3d.csail.mit.edu/data/pix3d.zip",
    "shapenet_rendering": "http://ftp.cs.stanford.edu/cs/cvgl/ShapeNetRendering.tgz",
    "shapenet_vox32": "http://ftp.cs.stanford.edu/cs/cvgl/ShapeNetVox32.tgz",
}

parser = argparse.ArgumentParser("dataset download and preparation")
parser.add_argument("--download_pix3d", action="store_true")
parser.add_argument("--download_shapenet", action="store_true")
parser.add_argument("--render_meshes", action="store_true",
                    help="generate GT meshes via cubify(0.5) from binvox grids")
parser.add_argument("--build_manifest", action="store_true")
parser.add_argument("--root", type=str, default="dataset")
parser.add_argument("--batch", type=int, default=16,
                    help="cubify batch size for mesh rendering (reference used 16)")


def download(url: str, dest: str) -> None:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    print(f"downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def render_shapenet_meshes(root: str, batch_size: int = 16) -> None:
    """Cubify 32^3 binvox grids at threshold 0.5 into normalized OBJ GT meshes
    (reference: download_dataset.py:84-116)."""
    import jax.numpy as jnp

    from meshrcnn_tpu.data.process import normalize_mesh
    from meshrcnn_tpu.data.serialization import load_voxels, save_mesh
    from meshrcnn_tpu.ops.cubify import cubify

    paths = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".binvox"):
                paths.append(os.path.join(dirpath, f))
    print(f"rendering {len(paths)} GT meshes via cubify(0.5)")
    for i in range(0, len(paths), batch_size):
        chunk = paths[i:i + batch_size]
        grids = np.stack([np.asarray(load_voxels(p), dtype=np.float32) for p in chunk])
        mesh, _ = cubify(jnp.asarray(grids), 0.5, vert_capacity=8192,
                         face_capacity=16384, edge_capacity=32768)
        vm = np.asarray(mesh.verts_mask)
        fm = np.asarray(mesh.faces_mask)
        verts = np.asarray(mesh.verts)
        faces = np.asarray(mesh.faces)
        for b, p in enumerate(chunk):
            v = normalize_mesh(verts[b][vm[b]])
            save_mesh(v, faces[b][fm[b]], p.replace(".binvox", ""))


def build_manifest(root: str) -> None:
    """Build shapenet.json records {img, category, voxel, model}
    (reference: download_dataset.py:119-174)."""
    records = []
    render_root = os.path.join(root, "ShapeNetRendering")
    vox_root = os.path.join(root, "ShapeNetVox32")
    for synset, cls in SYNSET_TO_CLASS.items():
        sdir = os.path.join(render_root, synset)
        if not os.path.isdir(sdir):
            continue
        for model_id in sorted(os.listdir(sdir)):
            png_dir = os.path.join(sdir, model_id, "rendering")
            vox = os.path.join(vox_root, synset, model_id, "model.binvox")
            obj = vox.replace(".binvox", ".obj")
            if not (os.path.isdir(png_dir) and os.path.isfile(vox)):
                continue
            for png in sorted(os.listdir(png_dir)):
                if png.endswith(".png"):
                    records.append({"img": os.path.join(png_dir, png),
                                    "category": cls, "voxel": vox, "model": obj})
    out = os.path.join(root, "shapenet.json")
    with open(out, "w") as f:
        json.dump(records, f)
    print(f"wrote {len(records)} records to {out}")


def main():
    options = parser.parse_args()
    if options.download_pix3d:
        download(URLS["pix3d"], os.path.join(options.root, "pix3d.zip"))
    if options.download_shapenet:
        download(URLS["shapenet_rendering"],
                 os.path.join(options.root, "ShapeNetRendering.tgz"))
        download(URLS["shapenet_vox32"],
                 os.path.join(options.root, "ShapeNetVox32.tgz"))
    if options.render_meshes:
        render_shapenet_meshes(options.root, options.batch)
    if options.build_manifest:
        build_manifest(options.root)


if __name__ == "__main__":
    main()
