"""End-to-end smoke tests: full ShapeNet model forward + jitted train step,
single device and shard_map data-parallel over the 8-device virtual CPU mesh
(the TPU-build analog of the reference's cpu/cuda device parametrization,
SURVEY.md §4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import TrainConfig, LossWeights
from meshrcnn_tpu.models.shapenet import ShapeNetModel
from meshrcnn_tpu.parallel.train_step import (create_train_state, make_dp_train_step,
                                              make_eval_step, make_train_step,
                                              shard_batch)

TINY = dict(num_classes=13, residual=False, cubify_threshold=0.2,
            voxel_out_channels=8, vert_capacity=512, face_capacity=1024,
            edge_capacity=2048, num_refinement_stages=3)


def tiny_batch(B=2, H=48):
    rng = np.random.RandomState(0)
    images = rng.rand(B, H, H, 3).astype(np.float32)
    # model voxel grid for H=48: c5 is 2x2 -> floor(2*4.8)=9 -> deconv x2 -> 18
    assert H == 48
    gh = 18
    voxels = (rng.rand(B, 8, gh, gh) > 0.5).astype(np.float32)
    gt_verts = np.zeros((B, 16, 3), dtype=np.float32)
    gt_verts[:, :8] = rng.randn(B, 8, 3)
    gt_verts_mask = np.zeros((B, 16), dtype=bool)
    gt_verts_mask[:, :8] = True
    gt_faces = np.zeros((B, 24, 3), dtype=np.int32)
    gt_faces[:, :6] = rng.randint(0, 8, (B, 6, 3))
    gt_faces_mask = np.zeros((B, 24), dtype=bool)
    gt_faces_mask[:, :6] = True
    labels = rng.randint(0, 13, (B,)).astype(np.int32)
    return Batch(images=jnp.asarray(images), voxels=jnp.asarray(voxels),
                 gt_verts=jnp.asarray(gt_verts), gt_verts_mask=jnp.asarray(gt_verts_mask),
                 gt_faces=jnp.asarray(gt_faces), gt_faces_mask=jnp.asarray(gt_faces_mask),
                 labels=jnp.asarray(labels))


def tiny_config(**kw):
    return TrainConfig(optimizer="adam", lr=1e-3, batch_size=2, point_cloud_size=64,
                       normal_k=4, distance_tile=32, train_backbone=False,
                       loss_weights=LossWeights(), **kw)


@pytest.fixture(scope="module")
def model_and_state():
    model = ShapeNetModel(**TINY)
    batch = tiny_batch()
    state = create_train_state(model, tiny_config(), jax.random.PRNGKey(0), batch.images)
    return model, state, batch


def test_forward_shapes(model_and_state):
    model, state, batch = model_and_state
    out = make_eval_step(model)(state, batch.images)
    B = batch.images.shape[0]
    assert out.logits.shape == (B, 13)
    assert out.voxels.shape[0] == B and out.voxels.shape[1] == 8
    assert len(out.stage_verts) == 4  # cubify + 3 refinement stages
    for sv in out.stage_verts:
        assert sv.shape == (B, 512, 3)
    # refinement must move vertices (tanh offsets are nonzero at init)
    d = np.abs(np.asarray(out.stage_verts[1] - out.stage_verts[0]))
    assert d.max() > 0


def test_train_step_decreases_nothing_nan(model_and_state):
    model, state, batch = model_and_state
    config = tiny_config()
    step = jax.jit(make_train_step(model, config))
    key = jax.random.PRNGKey(1)
    s1, metrics = step(state, batch, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    assert float(metrics["voxel_loss"]) > 0
    assert float(metrics["chamfer_loss"]) > 0
    assert int(s1.step) == 1
    # frozen backbone: its params must not move; refine params must move
    p0 = jax.tree_util.tree_leaves(state.params["backbone"])
    p1 = jax.tree_util.tree_leaves(s1.params["backbone"])
    assert all(np.allclose(a, b) for a, b in zip(p0, p1))
    r0 = np.asarray(state.params["refine0"]["graphConv0"]["w0"])
    r1 = np.asarray(s1.params["refine0"]["graphConv0"]["w0"])
    assert not np.allclose(r0, r1)


def test_dp_train_step_matches_metrics(model_and_state):
    model, state, batch8 = model_and_state
    config = tiny_config()
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("dp",))
    batch = tiny_batch(B=8)
    dp_step = make_dp_train_step(model, config, mesh)
    sb = shard_batch(batch, mesh)
    s1, metrics = dp_step(state, sb, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"dp metric {k} not finite"
    assert int(s1.step) == 1
