"""Metric-layer tests: pairwise mask precision (reference metrics.py:43-53),
device-side mask pasting vs the numpy/PIL path, and equality of the fused
single-dispatch eval-metrics programs with a straightforward host
recomputation of the same quantities (reference eval loop semantics,
utils/eval_utils.py:93-194).
"""
import numpy as np
import jax
import jax.numpy as jnp

from test_pix3d import TINY as P3D_TINY
from test_pix3d import tiny_batch as p3d_tiny_batch
from test_train_step import TINY as SN_TINY
from test_train_step import tiny_batch as sn_tiny_batch
from test_train_step import tiny_config

from meshrcnn_tpu.utils.metrics import (calc_precision_box, calc_precision_mask,
                                        paste_mask_in_image,
                                        paste_mask_in_image_jax)


def test_calc_precision_mask_is_pairwise():
    """Each prediction scores against ITS OWN image's GT (reference zips the
    lists); scoring against the stacked batch union was a real bug for B>1."""
    H = 16
    gt = np.zeros((2, H, H), np.float32)
    gt[0, 2:10, 2:10] = 1.0       # image 0 GT square
    gt[1, 8:16, 8:16] = 1.0       # image 1 GT square elsewhere
    pred0 = gt[0].astype(np.int32)            # exact match for image 0
    pred1 = np.zeros((H, H), np.int32)
    pred1[0:4, 0:4] = 1                        # misses image 1's GT entirely
    # pairwise: pred0 IoU=1 (hit), pred1 IoU=0 (miss) -> 0.5
    assert calc_precision_mask([pred0, pred1], gt) == 0.5
    # swapping the pairing must flip the result (broadcast-vs-stack would not)
    assert calc_precision_mask([pred1, pred0], gt) == 0.0


def test_paste_mask_jax_matches_numpy_upscale():
    """Inverse-warp paste == PIL-resize paste for boxes >= mask size, including
    boxes clamped at the image border (the deviation for sub-mask-size boxes —
    PIL antialias vs pure bilinear — is documented on the function)."""
    rng = np.random.RandomState(3)
    H = W = 48
    K = 12
    boxes = np.array([
        [4.0, 6.0, 30.0, 40.0],       # interior, upscale
        [-8.0, -5.0, 20.0, 25.0],     # clipped at top-left
        [30.0, 20.0, 70.0, 55.0],     # clipped at bottom-right
        [10.3, 11.7, 25.9, 26.2],     # fractional coords (rounding path)
    ], np.float32)
    for i, box in enumerate(boxes):
        mask = rng.rand(K, K).astype(np.float32)
        # keep values away from the 0.5 threshold so a last-ulp resample
        # difference cannot flip a pixel
        mask = np.where(np.abs(mask - 0.5) < 0.05, mask + 0.1, mask)
        ref = paste_mask_in_image(mask, box, H, W)
        got = np.asarray(paste_mask_in_image_jax(jnp.asarray(mask),
                                                 jnp.asarray(box), H, W))
        assert got.shape == (H, W)
        np.testing.assert_array_equal(got, ref, err_msg=f"box {i}")


def _host_f1_sums(d_p, d_g, valid, taus):
    f1_sums = {t: 0.0 for t in taus}
    count = 0
    for b in range(d_p.shape[0]):
        if valid[b]:
            for tau in taus:
                thr = tau * tau
                prec = float((d_p[b] < thr).mean())
                rec = float((d_g[b] < thr).mean())
                f1_sums[tau] += 2 * prec * rec / max(prec + rec, 1e-12)
            count += 1
    return f1_sums, count


def test_shapenet_eval_metrics_match_host_recomputation():
    """The fused single-dispatch metrics program returns the same numbers the
    eval loop previously computed with per-metric dispatches + host loops."""
    from meshrcnn_tpu.harness import (_f1_distances, _shapenet_eval_metrics,
                                      _voxel_iou_j)
    from meshrcnn_tpu.models.shapenet import ShapeNetModel
    from meshrcnn_tpu.ops.losses import batched_mesh_loss, voxel_loss
    from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step

    model = ShapeNetModel(**SN_TINY)
    config = tiny_config()
    batch = sn_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    out = make_eval_step(model)(state, jnp.asarray(batch.images))
    key = jax.random.PRNGKey(5)
    taus = (0.1, 0.3)

    m = jax.device_get(_shapenet_eval_metrics(
        key, out, jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        config.point_cloud_size, config.normal_k, config.distance_tile,
        taus, False))

    # host recomputation, piece by piece (the pre-fusion eval-loop dataflow)
    assert np.allclose(m["voxel_loss"],
                       float(voxel_loss(out.voxels, jnp.asarray(batch.voxels))),
                       rtol=1e-5)
    assert np.allclose(m["voxel_iou"],
                       float(_voxel_iou_j(out.voxels, jnp.asarray(batch.voxels))),
                       rtol=1e-5)
    np.testing.assert_array_equal(m["preds"],
                                  np.asarray(jnp.argmax(out.logits, axis=-1)))
    chamfer, normal, edge = batched_mesh_loss(
        key, list(out.stage_verts[1:]), out.mesh, jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        point_cloud_size=config.point_cloud_size, num_neighbours=config.normal_k,
        tile=config.distance_tile)
    assert np.allclose(m["chamfer_loss"], float(chamfer), rtol=1e-4)
    assert np.allclose(m["normal_loss"], float(normal), rtol=1e-4, atol=1e-6)
    assert np.allclose(m["edge_loss"], float(edge), rtol=1e-4)
    d_p, d_g, valid = _f1_distances(
        jax.random.fold_in(key, 7), out.stage_verts[-1], out.mesh.faces,
        out.mesh.faces_mask, jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        config.point_cloud_size, config.distance_tile)
    f1_sums, count = _host_f1_sums(np.asarray(d_p), np.asarray(d_g),
                                   np.asarray(valid), taus)
    assert int(m["f1_count"]) == count
    for j, tau in enumerate(taus):
        assert np.allclose(m["f1_sum"][j], f1_sums[tau], rtol=1e-4, atol=1e-6)


def test_pix3d_eval_metrics_match_host_recomputation():
    """Fused Pix3D metrics == the pre-fusion host dataflow: best-IoU selection,
    AP_box on the selected raw boxes, AP_mask via paste+pairwise IoU, voxel and
    mesh losses on the selected slots, F1 accumulation."""
    from meshrcnn_tpu.harness import (_f1_distances, _pix3d_eval_metrics,
                                      _voxel_iou_j)
    from meshrcnn_tpu.models.pix3d import Pix3DModel
    from meshrcnn_tpu.ops.losses import batched_mesh_loss, voxel_loss
    from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step
    from meshrcnn_tpu.utils.metrics import box_iou as np_box_iou

    model = Pix3DModel(**P3D_TINY)
    config = tiny_config()
    batch = p3d_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    out = make_eval_step(model)(state, jnp.asarray(batch.images))
    key = jax.random.PRNGKey(9)
    taus = (0.1, 0.3)
    B = batch.images.shape[0]
    H = W = batch.images.shape[1]
    D = out.detections.boxes.shape[1]

    m = jax.device_get(_pix3d_eval_metrics(
        key, out, jnp.asarray(batch.boxes), jnp.asarray(batch.masks),
        jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        config.point_cloud_size, config.normal_k, config.distance_tile,
        taus, False))

    det_boxes = np.asarray(out.detections.boxes)
    det_valid = np.asarray(out.detections.valid)
    gt_boxes = np.asarray(batch.boxes).reshape(B, 4)
    best_idx = np.zeros((B,), np.int64)
    for b in range(B):
        ious = np_box_iou(det_boxes[b], gt_boxes[b][None])[:, 0]
        best_idx[b] = int(np.argmax(np.where(det_valid[b], ious, -1.0)))
    best_boxes = det_boxes[np.arange(B), best_idx]
    np.testing.assert_array_equal(
        m["best_labels"], np.asarray(out.detections.labels)[np.arange(B), best_idx])
    assert np.allclose(m["ap_box"], calc_precision_box(best_boxes, gt_boxes))

    # host AP_mask recompute uses the SAME paste kernel (jax) so this pins the
    # selection + pairwise-IoU logic; PIL-vs-bilinear paste parity is covered by
    # test_paste_mask_jax_matches_numpy_upscale (untrained tiny-model boxes can
    # be smaller than the 28px mask, where PIL antialiases and bilinear doesn't)
    mask_probs = np.asarray(out.mask_probs)
    pasted = [np.asarray(paste_mask_in_image_jax(
        jnp.asarray(mask_probs[b, best_idx[b]]), jnp.asarray(best_boxes[b]), H, W))
        for b in range(B)]
    assert np.allclose(m["ap_mask"],
                       calc_precision_mask(pasted, np.asarray(batch.masks)))

    slot = np.arange(B) * D + best_idx
    voxels = jnp.asarray(np.asarray(out.voxels)[slot])
    assert np.allclose(m["voxel_loss"],
                       float(voxel_loss(voxels, jnp.asarray(batch.voxels))),
                       rtol=1e-5)
    assert np.allclose(m["voxel_iou"],
                       float(_voxel_iou_j(voxels, jnp.asarray(batch.voxels))),
                       rtol=1e-5)

    sel = jnp.asarray(slot)
    mesh = jax.tree_util.tree_map(lambda x: x[sel], out.mesh)
    stage_verts = [jnp.asarray(np.asarray(v)[slot]) for v in out.stage_verts]
    chamfer, normal, edge = batched_mesh_loss(
        key, stage_verts[1:], mesh, jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        point_cloud_size=config.point_cloud_size, num_neighbours=config.normal_k,
        tile=config.distance_tile)
    assert np.allclose(m["chamfer_loss"], float(chamfer), rtol=1e-4)
    assert np.allclose(m["normal_loss"], float(normal), rtol=1e-4, atol=1e-6)
    assert np.allclose(m["edge_loss"], float(edge), rtol=1e-4)
    d_p, d_g, valid = _f1_distances(
        jax.random.fold_in(key, 7), stage_verts[-1], mesh.faces, mesh.faces_mask,
        jnp.asarray(batch.gt_verts), jnp.asarray(batch.gt_faces),
        jnp.asarray(batch.gt_faces_mask), config.point_cloud_size,
        config.distance_tile)
    f1_sums, count = _host_f1_sums(np.asarray(d_p), np.asarray(d_g),
                                   np.asarray(valid), taus)
    assert int(m["f1_count"]) == count
    for j, tau in enumerate(taus):
        assert np.allclose(m["f1_sum"][j], f1_sums[tau], rtol=1e-4, atol=1e-6)


def test_ranked_average_precision_hand_fixture():
    """Hand-computed all-point AP: envelope interpolation + the one-match-per-GT
    duplicate rule (VOC/COCO convention)."""
    from meshrcnn_tpu.utils.metrics import ranked_average_precision

    # ranks: TP(img0), FP, TP(img1), TP(img2) over 3 GT images
    # recall 1/3, 1/3, 2/3, 1; precision 1, 1/2, 2/3, 3/4; envelope 1,.75,.75,.75
    # AP = 1/3*1 + 1/3*0.75 + 1/3*0.75 = 0.8333...
    ap = ranked_average_precision(
        scores=[0.9, 0.8, 0.7, 0.6], is_match=[True, False, True, True],
        image_ids=[0, 1, 1, 2], num_gt=3)
    assert np.isclose(ap, 1 / 3 + 0.25 + 0.25)

    # duplicate rule: both detections match image 0 but only the higher-scored
    # one is a TP; the second is an FP and does not raise recall
    ap = ranked_average_precision([0.9, 0.8], [True, True], [0, 0], num_gt=1)
    assert np.isclose(ap, 1.0)
    # and the duplicate really costs precision when it outranks a real match
    ap = ranked_average_precision([0.9, 0.8, 0.7], [True, True, True],
                                  [0, 0, 1], num_gt=2)
    # ranks: TP, FP(dup), TP -> recall .5, .5, 1; prec 1, .5, 2/3; env 1, 2/3, 2/3
    assert np.isclose(ap, 0.5 * 1.0 + 0.5 * (2 / 3))

    assert ranked_average_precision([], [], [], num_gt=5) == 0.0
    assert np.isnan(ranked_average_precision([0.5], [True], [0], num_gt=0))
    # perfect detector
    assert np.isclose(ranked_average_precision(
        [0.9, 0.8], [True, True], [0, 1], num_gt=2), 1.0)


def test_detection_map_per_class():
    """Class-mean mAP: a detection only matches when its predicted class equals
    the image's GT class; classes average independently."""
    from meshrcnn_tpu.utils.metrics import detection_map

    gt = {0: 1, 1: 1, 2: 2}  # images 0,1 are class 1; image 2 is class 2
    # class 1: det on img0 (iou .9, correct class) + det on img1 predicted as
    # class 2 (iou .9, WRONG class -> counts under class 2 as FP)
    out = detection_map(
        scores=[0.9, 0.8, 0.7],
        pred_labels=[1, 2, 2],
        image_ids=[0, 1, 2],
        criterion=[0.9, 0.9, 0.6],
        gt_labels_by_image=gt)
    # class 1: one TP of two GT -> recall caps at .5, precision 1 -> AP = .5
    assert np.isclose(out["per_class"][1], 0.5)
    # class 2: ranked [FP(img1 wrong-class), TP(img2)] -> AP = 1*0.5? no:
    # recall after TP = 1/1, precision at that rank = 1/2; envelope = .5
    assert np.isclose(out["per_class"][2], 0.5)
    assert np.isclose(out["mAP"], 0.5)

    # criterion below threshold -> no match
    out = detection_map([0.9], [1], [0], [0.4], {0: 1})
    assert out["mAP"] == 0.0


def test_pix3d_eval_metrics_ranked_records():
    """ranked=True emits per-slot records equal to a host recomputation: box
    IoU vs the image GT, pasted-mask IoU per slot, and mesh F1@0.3 shapes."""
    from meshrcnn_tpu.harness import _pix3d_eval_metrics
    from meshrcnn_tpu.models.pix3d import Pix3DModel
    from meshrcnn_tpu.parallel.train_step import create_train_state, make_eval_step
    from meshrcnn_tpu.utils.metrics import box_iou as np_box_iou

    model = Pix3DModel(**P3D_TINY)
    config = tiny_config()
    batch = p3d_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    out = make_eval_step(model)(state, jnp.asarray(batch.images))
    key = jax.random.PRNGKey(9)
    B = batch.images.shape[0]
    H = W = batch.images.shape[1]
    D = out.detections.boxes.shape[1]

    m = jax.device_get(_pix3d_eval_metrics(
        key, out, jnp.asarray(batch.boxes), jnp.asarray(batch.masks),
        jnp.asarray(batch.voxels), jnp.asarray(batch.gt_verts),
        jnp.asarray(batch.gt_faces), jnp.asarray(batch.gt_faces_mask),
        config.point_cloud_size, config.normal_k, config.distance_tile,
        (0.1, 0.3), False, True))

    for k, dt in (("det_scores", None), ("det_labels", np.int32),
                  ("det_box_iou", None), ("det_mask_iou", None),
                  ("det_mesh_f1", None)):
        assert m[k].shape == (B, D), k
    assert m["det_valid"].shape == (B, D)

    det_boxes = np.asarray(out.detections.boxes)
    det_valid = np.asarray(out.detections.valid)
    gt_boxes = np.asarray(batch.boxes).reshape(B, 4)
    gt_masks = np.asarray(batch.masks) > 0.5
    mask_probs = np.asarray(out.mask_probs)
    for b in range(B):
        ious = np_box_iou(det_boxes[b], gt_boxes[b][None])[:, 0]
        ious = np.where(det_valid[b], ious, -1.0)
        np.testing.assert_allclose(m["det_box_iou"][b], ious, rtol=1e-5,
                                   atol=1e-6)
        for d in range(D):
            pasted = np.asarray(paste_mask_in_image_jax(
                jnp.asarray(mask_probs[b, d]), jnp.asarray(det_boxes[b, d]),
                H, W)) > 0
            inter = np.logical_and(pasted, gt_masks[b]).sum()
            union = max(np.logical_or(pasted, gt_masks[b]).sum(), 1)
            np.testing.assert_allclose(m["det_mask_iou"][b, d], inter / union,
                                       rtol=1e-5, atol=1e-6)
    # mesh F1 is in [0, 1] and zero wherever sampling was invalid
    assert (m["det_mesh_f1"] >= 0).all() and (m["det_mesh_f1"] <= 1 + 1e-6).all()
