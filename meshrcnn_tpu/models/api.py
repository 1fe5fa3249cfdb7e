"""Reference-compatible model API: ``model(images, targets) -> dict``.

The reference models are stateful torch modules whose forward returns a loss dict in
training mode and a prediction dict in eval mode (reference:
meshRCNN/shapenet_model.py:43-99, pix3d_model.py:46-117). These wrappers reproduce
that surface on top of the functional TPU models so a user of the reference can port
call sites directly:

    model = ShapeNetAPI(residual=True, cubify_threshold=0.2)
    losses = model(images, targets)        # train-mode dict of scalar losses
                                           # (loss EVALUATION only — no update)
    metrics = model.step(images, targets)  # one jitted optimizer update of
                                           # model.state (the .backward() +
                                           # opt.step() analog)
    model.eval()
    preds = model(images)                  # {'backbone', 'voxels',
                                           #  'vertex_positions', 'faces',
                                           #  'edge_index', 'vertice_index',
                                           #  'face_index', 'mesh_index', ...}

Ragged outputs: the reference returns ∑V-concatenated tensors plus Python index
lists; here the padded buffers are converted to the same convention on the host
(``to_ragged``) — vertex_positions is a list of per-stage [sum V, 3] arrays,
vertice_index/face_index are per-sample counts, edge_index is a 2 x E COO array —
numerically the same shapes the reference's eval loop consumes.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import (CapacityConfig, LossWeights, Pix3DConfig,
                                      ShapeNetConfig, TrainConfig)


def to_ragged(stage_verts, mesh, mesh_valid=None):
    """Convert padded stage outputs to the reference's ragged-concat convention."""
    vmask = np.asarray(mesh.verts_mask)
    fmask = np.asarray(mesh.faces_mask)
    emask = np.asarray(mesh.edges_mask)
    faces = np.asarray(mesh.faces)
    edges = np.asarray(mesh.edges)
    B = vmask.shape[0]
    keep = range(B) if mesh_valid is None else [b for b in range(B)
                                                if bool(np.asarray(mesh_valid)[b])]
    vertice_index = [int(vmask[b].sum()) for b in keep]
    face_index = [int(fmask[b].sum()) for b in keep]
    offsets = np.cumsum([0] + vertice_index[:-1])

    stages = []
    for verts in stage_verts:
        v = np.asarray(verts)
        stages.append(np.concatenate([v[b][vmask[b]] for b in keep], axis=0))
    cat_faces = np.concatenate([faces[b][fmask[b]] for b in keep], axis=0)
    # reference faces are per-sample local indices (shapenet_model output contract)
    cat_edges = np.concatenate(
        [edges[b][emask[b]] + off for b, off in zip(keep, offsets)], axis=0)
    edge_index = np.concatenate([cat_edges.T, cat_edges.T[::-1]], axis=1)
    return stages, cat_faces, edge_index, vertice_index, face_index


class _BaseAPI:
    def __init__(self):
        self._training = True
        self._train_step = None

    def train(self):
        self._training = True
        return self

    def eval(self):
        self._training = False
        return self

    @property
    def training(self):
        return self._training

    def step(self, images, targets: Batch) -> dict:
        """Apply ONE jitted optimizer update to the wrapper's state.

        The TPU analog of the reference's training iteration
        ``losses = model(images, targets); loss.backward(); optimizer.step()``
        (reference: utils/train_utils.py:174-250) — train-mode ``__call__`` only
        *evaluates* the losses and never mutates ``self.state``; this is the
        call that moves the parameters. Returns the step's metrics dict
        (losses + grads_finite), with self.state advanced by one step.
        """
        import jax
        import jax.numpy as jnp

        if not self._training:
            raise RuntimeError("step() requires training mode; call .train()")
        images = jnp.asarray(images)
        self._ensure_state(images)
        if self._train_step is None:
            from meshrcnn_tpu.parallel.train_step import make_train_step
            self._train_step = jax.jit(make_train_step(self.model, self.config))
        key = jax.random.fold_in(self._rng, self._step_count)
        self._step_count += 1
        self.state, metrics = self._train_step(self.state, targets, key)
        return metrics


class ShapeNetAPI(_BaseAPI):
    """Stateful reference-style wrapper around ShapeNetModel (shapenet_model.py:17-101)."""

    def __init__(self, residual: bool = False, cubify_threshold: float = 0.2,
                 vertex_feature_dim: int = 128, num_refinement_stages: int = 3,
                 voxel_only: bool = False, num_classes: int = 13,
                 voxel_out_channels: int = 48,
                 vert_capacity: int = 8192, face_capacity: int = 16384,
                 edge_capacity: int = 32768, config: Optional[TrainConfig] = None,
                 seed: int = 0, model_config: Optional[ShapeNetConfig] = None):
        super().__init__()
        import jax
        from meshrcnn_tpu.models.shapenet import ShapeNetModel
        from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                      make_eval_step)

        cfg = model_config or ShapeNetConfig(
            num_classes=num_classes, residual=residual,
            cubify_threshold=cubify_threshold,
            vertex_feature_dim=vertex_feature_dim,
            num_refinement_stages=num_refinement_stages, voxel_only=voxel_only,
            num_voxels=voxel_out_channels,
            capacities=CapacityConfig(verts=vert_capacity, faces=face_capacity,
                                      edges=edge_capacity))
        self.model_config = cfg
        self.model = ShapeNetModel(
            num_classes=cfg.num_classes, residual=cfg.residual,
            voxel_out_channels=cfg.num_voxels,
            cubify_threshold=cfg.cubify_threshold,
            vertex_feature_dim=cfg.vertex_feature_dim,
            num_refinement_stages=cfg.num_refinement_stages,
            voxel_only=cfg.voxel_only,
            vert_capacity=cfg.capacities.verts, face_capacity=cfg.capacities.faces,
            edge_capacity=cfg.capacities.edges)
        self.config = config or TrainConfig(loss_weights=LossWeights())
        self._rng = jax.random.PRNGKey(seed)
        self.state = None
        self._eval_step = make_eval_step(self.model)
        self._create_train_state = create_train_state
        self._step_count = 0

    def _ensure_state(self, images):
        if self.state is None:
            self.state = self._create_train_state(self.model, self.config,
                                                  self._rng, images)

    def load(self, path: str):
        # usable before any forward (reference allows load_dict anytime,
        # train_utils.py:19-30): lazily init state on a dummy image — parameter
        # shapes are channel-shaped, not spatial, so a small image suffices
        from meshrcnn_tpu.utils.checkpoint import load_state
        self._ensure_state(np.zeros((1, 64, 64, 3), np.float32))
        self.state = load_state(path, self.state)
        return self

    def __call__(self, images, targets: Optional[Batch] = None) -> dict:
        import jax
        import jax.numpy as jnp
        from meshrcnn_tpu.parallel.train_step import shapenet_loss_fn

        images = jnp.asarray(images)
        self._ensure_state(images)

        if self._training:
            if targets is None:
                raise ValueError("In training mode, targets should be passed")
            key = jax.random.fold_in(self._rng, self._step_count)
            self._step_count += 1
            _, (metrics, _) = shapenet_loss_fn(self.model, self.config,
                                               self.state.params,
                                               self.state.batch_stats, targets, key)
            return {k: v for k, v in metrics.items() if k != "loss"}

        out = self._eval_step(self.state, images)
        result = {"backbone": jax.nn.softmax(out.logits, axis=-1),
                  "voxels": out.voxels}
        if self.model.voxel_only:
            return result
        stages, faces, edge_index, v_index, f_index = to_ragged(
            out.stage_verts, out.mesh)
        result.update(vertex_positions=stages, faces=faces, edge_index=edge_index,
                      vertice_index=v_index, face_index=f_index,
                      mesh_index=[1] * images.shape[0])
        return result


class Pix3DAPI(_BaseAPI):
    """Stateful reference-style wrapper around Pix3DModel (pix3d_model.py:21-117)."""

    def __init__(self, cubify_threshold: float = 0.2, vertex_feature_dim: int = 128,
                 num_refinement_stages: int = 3, voxel_only: bool = False,
                 num_classes: int = 10, detections_per_img: int = 3,
                 vert_capacity: int = 4096, face_capacity: int = 8192,
                 edge_capacity: int = 16384, config: Optional[TrainConfig] = None,
                 seed: int = 0, model_config: Optional[Pix3DConfig] = None,
                 **model_kwargs):
        super().__init__()
        import jax
        from meshrcnn_tpu.models.pix3d import Pix3DModel
        from meshrcnn_tpu.parallel.train_step import (create_train_state,
                                                      make_eval_step)

        cfg = model_config or Pix3DConfig(
            num_classes=num_classes, cubify_threshold=cubify_threshold,
            vertex_feature_dim=vertex_feature_dim,
            num_refinement_stages=num_refinement_stages, voxel_only=voxel_only,
            detections_per_img=detections_per_img,
            capacities=CapacityConfig(verts=vert_capacity, faces=face_capacity,
                                      edges=edge_capacity))
        self.model_config = cfg
        self.model = Pix3DModel(
            num_classes=cfg.num_classes, cubify_threshold=cfg.cubify_threshold,
            vertex_feature_dim=cfg.vertex_feature_dim,
            num_refinement_stages=cfg.num_refinement_stages,
            voxel_only=cfg.voxel_only,
            detections_per_img=cfg.detections_per_img,
            vert_capacity=cfg.capacities.verts, face_capacity=cfg.capacities.faces,
            edge_capacity=cfg.capacities.edges,
            **model_kwargs)
        self.config = config or TrainConfig(pix3d_schedule=True, optimizer="sgd",
                                            train_backbone=True)
        self._rng = jax.random.PRNGKey(seed)
        self.state = None
        self._eval_step = make_eval_step(self.model)
        self._create_train_state = create_train_state
        self._step_count = 0

    def _ensure_state(self, images):
        if self.state is None:
            self.state = self._create_train_state(self.model, self.config,
                                                  self._rng, images)

    def load(self, path: str):
        # see ShapeNetAPI.load — usable before any forward
        from meshrcnn_tpu.utils.checkpoint import load_state
        self._ensure_state(np.zeros((1, 64, 64, 3), np.float32))
        self.state = load_state(path, self.state)
        return self

    def __call__(self, images, targets: Optional[Batch] = None) -> dict:
        import jax
        import jax.numpy as jnp
        from meshrcnn_tpu.parallel.train_step import pix3d_loss_fn

        images = jnp.asarray(images)
        self._ensure_state(images)

        if self._training:
            if targets is None:
                raise ValueError("In training mode, targets should be passed")
            key = jax.random.fold_in(self._rng, self._step_count)
            self._step_count += 1
            _, (metrics, _) = pix3d_loss_fn(self.model, self.config,
                                            self.state.params,
                                            self.state.batch_stats, targets, key)
            return {k: v for k, v in metrics.items() if k != "loss"}

        out = self._eval_step(self.state, images)
        det = out.detections
        backbone = [dict(boxes=np.asarray(det.boxes[b]),
                         labels=np.asarray(det.labels[b]),
                         scores=np.asarray(det.scores[b]),
                         valid=np.asarray(det.valid[b]),
                         masks=np.asarray(out.mask_probs[b]))
                    for b in range(images.shape[0])]
        result = {"backbone": backbone, "voxels": out.voxels}
        if self.model.voxel_only:
            return result
        stages, faces, edge_index, v_index, f_index = to_ragged(
            out.stage_verts, out.mesh, out.mesh_valid)
        mesh_index = np.asarray(det.valid).sum(axis=1).astype(int).tolist()
        result.update(vertex_positions=stages, faces=faces, edge_index=edge_index,
                      vertice_index=v_index, face_index=f_index,
                      mesh_index=mesh_index)
        return result
