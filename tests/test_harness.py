"""Eval-harness coverage: drive harness.validate / validate_pix3d end-to-end on
tiny synthetic batches and assert every reported metric exists and is finite
(reference: utils/eval_utils.py:93-194 — previously exercised only by manually
running eval_model.py; VERDICT round-1 weak item 4).
"""
import numpy as np
import jax
import pytest

from test_pix3d import TINY as P3D_TINY
from test_pix3d import tiny_batch as p3d_tiny_batch
from test_train_step import TINY as SN_TINY
from test_train_step import tiny_batch as sn_tiny_batch
from test_train_step import tiny_config

from meshrcnn_tpu.harness import train_epoch, validate, validate_pix3d
from meshrcnn_tpu.models.pix3d import Pix3DModel
from meshrcnn_tpu.models.shapenet import ShapeNetModel
from meshrcnn_tpu.parallel.train_step import (create_train_state, make_eval_step,
                                              make_train_step)
from meshrcnn_tpu.utils.meters import gcn_metrics

SN_KEYS = ("voxel_loss", "voxel_iou", "chamfer_loss", "normal_loss", "edge_loss",
           "f0_1", "f0_3", "f0_5", "F1@0.1", "F1@0.3")
P3D_KEYS = SN_KEYS + ("AP_box", "AP_mask", "AP_mesh")


def check_metrics(results, keys, num_classes):
    for k in keys:
        assert k in results, k
        assert np.isfinite(results[k]), (k, results[k])
    # F-beta / F1 live in [0, 1]; losses are non-negative except normal (cosine)
    for k in ("f0_1", "f0_3", "f0_5", "F1@0.1", "F1@0.3"):
        assert 0.0 <= results[k] <= 1.0, (k, results[k])
    assert results["voxel_loss"] >= 0 and results["edge_loss"] >= 0
    assert results["confusion"].shape == (num_classes, num_classes)
    assert results["confusion"].sum() == 4  # 2 batches x B=2 images


def test_validate_shapenet_metrics():
    model = ShapeNetModel(**SN_TINY)
    config = tiny_config()
    batch = sn_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    loader = [batch, sn_tiny_batch()]
    results = validate(0, make_eval_step(model), state, loader, config,
                       num_classes=13, rng=jax.random.PRNGKey(1))
    check_metrics(results, SN_KEYS, 13)


def test_validate_pix3d_metrics():
    model = Pix3DModel(**P3D_TINY)
    config = tiny_config()
    batch = p3d_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    loader = [batch, p3d_tiny_batch()]
    results = validate_pix3d(0, make_eval_step(model), state, loader, config,
                             num_classes=10, rng=jax.random.PRNGKey(1))
    check_metrics(results, P3D_KEYS, 10)
    assert np.isfinite(results["AP_box"]) and 0.0 <= results["AP_box"] <= 1.0
    assert 0.0 <= results["AP_mask"] <= 1.0 and 0.0 <= results["AP_mesh"] <= 1.0


def test_validate_voxel_only_paths():
    """--voxel_only eval must work through the fused-metrics loops for BOTH
    models (this was the only TPU-side Pix3D eval story before the aggregation
    fault fix; reference --voxel_only semantics, train.py:34-35)."""
    config = tiny_config()

    sn = ShapeNetModel(voxel_only=True, **SN_TINY)
    batch = sn_tiny_batch()
    state = create_train_state(sn, config, jax.random.PRNGKey(0), batch.images)
    res = validate(0, make_eval_step(sn), state, [batch], config,
                   num_classes=13, rng=jax.random.PRNGKey(1), voxel_only=True)
    assert np.isfinite(res["voxel_loss"]) and np.isfinite(res["voxel_iou"])
    assert "chamfer_loss" not in res and "F1@0.1" in res  # F1 reported as 0-count avg

    p3 = Pix3DModel(voxel_only=True, **P3D_TINY)
    batch = p3d_tiny_batch()
    state = create_train_state(p3, config, jax.random.PRNGKey(0), batch.images)
    res = validate_pix3d(0, make_eval_step(p3), state, [batch], config,
                         num_classes=10, rng=jax.random.PRNGKey(1), voxel_only=True)
    for k in ("voxel_loss", "voxel_iou", "AP_box", "AP_mask"):
        assert np.isfinite(res[k]), k
    assert "chamfer_loss" not in res


def test_train_epoch_multi_step_group_and_tail():
    """steps_per_dispatch staging through train_epoch: 3 batches at 2 steps per
    dispatch = one scanned group + one leftover through the single step (the
    pipelined dispatch must drain across the group/tail boundary)."""
    from meshrcnn_tpu.parallel.train_step import make_multi_step

    model = ShapeNetModel(**SN_TINY)
    config = tiny_config()
    batch = sn_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    step = jax.jit(make_train_step(model, config))
    multi = make_multi_step(model, config, 2)
    meters = gcn_metrics(voxel_only=False)
    new_state, meters = train_epoch(0, step, state, [batch, batch, batch], meters,
                                    jax.random.PRNGKey(2), print_freq=100,
                                    multi_step_fn=multi, steps_per_dispatch=2)
    assert int(new_state.step) == 3
    assert len(meters["loss"].history) == 1
    assert np.isfinite(meters["loss"].history[-1])


def test_train_epoch_updates_state_and_meters():
    """train_epoch drives the jitted step over a loader and folds metrics into
    the meters (reference: train_utils.py:174-250)."""
    model = ShapeNetModel(**SN_TINY)
    config = tiny_config()
    batch = sn_tiny_batch()
    state = create_train_state(model, config, jax.random.PRNGKey(0), batch.images)
    step = jax.jit(make_train_step(model, config))
    meters = gcn_metrics(voxel_only=False)
    new_state, meters = train_epoch(0, step, state, [batch, batch], meters,
                                    jax.random.PRNGKey(2), print_freq=100)
    assert int(new_state.step) == 2
    # epoch_end() archived the epoch average into history and reset the meter
    assert len(meters["loss"].history) == 1
    assert np.isfinite(meters["loss"].history[-1])
    # params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda a, x: a + float(np.abs(np.asarray(x)).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params, state.params), 0.0)
    assert moved > 0
