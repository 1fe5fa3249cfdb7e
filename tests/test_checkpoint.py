"""Checkpoint save/restore semantics (reference: utils/train_utils.py:11-30
save_state/load_dict, plus the optimizer state the reference never saved).

Covers the cross-optimizer-structure restore: a checkpoint written by a
--train_backbone run (plain optax chain opt_state) must still load into an
eval/demo session whose fresh state uses the frozen-backbone multi_transform
template — params/batch_stats only, via load_state_partial.
"""
import numpy as np
import jax
import pytest

from test_train_step import TINY, tiny_batch, tiny_config

from meshrcnn_tpu.models.shapenet import ShapeNetModel
from meshrcnn_tpu.parallel.train_step import create_train_state
from meshrcnn_tpu.utils.checkpoint import load_state, load_state_partial, save_state


def test_partial_restore_across_optimizer_structures(tmp_path):
    import dataclasses

    model = ShapeNetModel(**TINY)
    batch = tiny_batch()
    # writer: backbone trained -> plain chain opt_state
    w_cfg = dataclasses.replace(tiny_config(), train_backbone=True)
    w_state = create_train_state(model, w_cfg, jax.random.PRNGKey(0), batch.images)
    path = save_state(w_state, str(tmp_path / "ckpt"))

    # reader: frozen backbone -> multi_transform opt_state template
    r_cfg = tiny_config()
    r_state = create_train_state(model, r_cfg, jax.random.PRNGKey(1), batch.images)
    with pytest.raises(Exception):
        load_state(path, r_state)  # strict restore must reject the mismatch

    merged, (n_loaded, n_total) = load_state_partial(path, r_state)
    assert n_loaded == n_total  # same model -> every param leaf restores
    for a, b in zip(jax.tree_util.tree_leaves(merged.params),
                    jax.tree_util.tree_leaves(w_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_round_trip_exact(tmp_path):
    model = ShapeNetModel(**TINY)
    batch = tiny_batch()
    cfg = tiny_config()
    state = create_train_state(model, cfg, jax.random.PRNGKey(2), batch.images)
    path = save_state(state, str(tmp_path / "rt"), step=3)
    assert path.endswith("_3")
    restored = load_state(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_counts_shape_mismatches(tmp_path):
    """n_loaded must count leaves that actually MERGED: a checkpoint from a
    different model width shares param paths but mismatches shapes, and must
    NOT report a full load (the demo/eval failed-load guards key off this)."""
    batch = tiny_batch()
    cfg = tiny_config()
    w_state = create_train_state(ShapeNetModel(**TINY), cfg,
                                 jax.random.PRNGKey(0), batch.images)
    path = save_state(w_state, str(tmp_path / "w"))

    # reader: same architecture, different refinement width -> same paths,
    # mismatched shapes on every refine-cell leaf
    wide = ShapeNetModel(**{**TINY, "vertex_feature_dim": 64})
    r_state = create_train_state(wide, cfg, jax.random.PRNGKey(1), batch.images)
    merged, (n_loaded, n_total) = load_state_partial(path, r_state)
    assert n_loaded < n_total
    # mismatched leaves keep their fresh init (merge skipped, not corrupted)
    fresh = jax.tree_util.tree_leaves(r_state.params)
    got = jax.tree_util.tree_leaves(merged.params)
    assert any(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(got, fresh))
