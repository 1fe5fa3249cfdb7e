"""Configuration dataclasses for models, losses and training.

Mirrors the reference's flag surface (reference: train.py:19-74, eval_model.py:13-44,
demo.py:18-40) as structured config; the CLI scripts build these from argparse so the
command-line API matches the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


def resolve_backbone_dtype(choice: str) -> str:
    """Resolve the --backbone_dtype CLI flag to a concrete dtype string.

    'auto' keeps the TPU-fast bfloat16 default on accelerator backends but pins
    float32 on CPU, so parity runs and checkpoints trained before the bf16
    default see unchanged numerics (the detection stack's norms, box math and
    losses are f32 either way — this selects the conv/matmul dtype only).
    """
    if choice != "auto":
        return choice
    import jax
    return "float32" if jax.default_backend() == "cpu" else "bfloat16"


@dataclasses.dataclass
class LossWeights:
    """Weighted loss sum keys, matching train_gcn's loss_weights dict
    (reference: utils/train_utils.py:208-225; flags train.py:42-52)."""
    chamfer: float = 1.0
    voxel: float = 1.0
    normal: float = 0.1
    edge: float = 0.5
    backbone: float = 1.0


@dataclasses.dataclass
class CapacityConfig:
    """Static per-sample capacities for padded mesh buffers (SURVEY.md §7)."""
    verts: int = 8192
    faces: int = 16384
    edges: int = 32768
    gt_verts: int = 4096
    gt_faces: int = 8192


@dataclasses.dataclass
class ShapeNetConfig:
    """ShapeNet model hyperparameters (reference: shapenet_model.py:18-24)."""
    num_classes: int = 13
    residual: bool = False
    cubify_threshold: float = 0.2
    vertex_feature_dim: int = 128
    num_refinement_stages: int = 3
    voxel_only: bool = False
    num_voxels: int = 48
    image_size: int = 137
    capacities: CapacityConfig = dataclasses.field(default_factory=CapacityConfig)


@dataclasses.dataclass
class Pix3DConfig:
    """Pix3D model hyperparameters (reference: pix3d_model.py:22-28)."""
    num_classes: int = 10
    cubify_threshold: float = 0.2
    vertex_feature_dim: int = 128
    num_refinement_stages: int = 3
    voxel_only: bool = False
    num_voxels: int = 24
    detections_per_img: int = 3
    capacities: CapacityConfig = dataclasses.field(default_factory=CapacityConfig)


@dataclasses.dataclass
class TrainConfig:
    """Optimizer / schedule / loop config (reference: train.py:56-74)."""
    optimizer: str = "adam"           # 'adam' | 'sgd'
    lr: float = 1e-4
    weight_decay: float = 5e-6
    batch_size: int = 16
    epochs: int = 10
    train_backbone: bool = False
    point_cloud_size: int = 10000
    normal_k: int = 10
    distance_tile: int = 2048
    loss_weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    # Pix3D LR schedule (reference: utils/train_utils.py:161-168): linear warmup
    # 0.002 -> 0.02 over first 1k iters, /10 at 8k and 10k.
    pix3d_schedule: bool = False
    grad_clip: float = 0.0            # global-norm clip; 0 disables
    # skip the param/opt/BN update when the loss or any gradient is non-finite,
    # reporting it via the grads_finite metric (the jit-safe analog of the
    # reference's try/except batch skip, train_utils.py:202-205)
    skip_nonfinite: bool = True
    # Loss terms with weight 0 are statically elided from the train step (they
    # contribute nothing to gradients; the normal term's kNN+PCA pipeline costs
    # ~70 ms of a ~350 ms ShapeNet step). Set True to force-compute them anyway
    # so their values appear in the step metrics — the reference's behavior
    # (mesh_loss computes everything; train_gcn weights it, train_utils.py:208-225).
    report_unweighted_losses: bool = False
    seed: int = 0
    num_devices: Optional[int] = None  # None = all local devices
