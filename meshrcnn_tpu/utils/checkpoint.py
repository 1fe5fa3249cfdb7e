"""Orbax checkpointing of params + optimizer state + batch stats.

Replaces the reference's per-epoch ``state_dict`` pickles (reference:
utils/train_utils.py:11-30, train.py:186-223) and fixes its gap: optimizer state
*is* checkpointed here (the reference never saved it — SURVEY.md §5.4). The
directory/versioning convention mirrors the reference:
checkpoints/<Model>/GCN/<iso-date>/model_{epoch}.
"""
from __future__ import annotations

import datetime
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def checkpoint_dir(root: str, model_name: str, kind: str = "GCN") -> str:
    """checkpoints/<Model>/<kind>/<iso-date>/ (reference: train.py:186-192)."""
    date = datetime.date.today().isoformat()
    path = os.path.join(root, model_name, kind, date)
    os.makedirs(path, exist_ok=True)
    return path


def save_state(state, path: str, step: Optional[int] = None) -> str:
    """Save a TrainState pytree with orbax; returns the checkpoint path."""
    path = os.path.abspath(path if step is None else f"{path}_{step}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    return path


def load_state(path: str, target):
    """Restore a TrainState saved by save_state into the ``target`` structure."""
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=jax.device_get(target))


def load_state_partial(path: str, target):
    """Restore params/batch_stats leaves that exist in both trees; fresh opt state.

    Supports the voxel-only -> full-model curriculum (reference: train.py:34-35
    --voxel_only warm start): a voxel-only checkpoint's param tree is a strict
    subset of the full model's (the refinement stages were never created), so a
    strict structural restore cannot apply. Matching (by path + shape) leaves are
    merged into ``target``; everything else — including optimizer moments, which
    mirror the new param tree — keeps its fresh initialization.
    """
    import numpy as np

    ckpt = ocp.PyTreeCheckpointer()
    raw = ckpt.restore(os.path.abspath(path))

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix] = tree
        return out

    def merge(tgt, src, prefix=()):
        if not isinstance(tgt, dict):
            if prefix in src and np.shape(src[prefix]) == np.shape(tgt):
                return src[prefix]
            return tgt
        return {k: merge(v, src, prefix + (k,)) for k, v in tgt.items()}

    target = jax.device_get(target)
    src_params = flatten(raw.get("params", {}))
    merged_params = merge(target.params, src_params)
    merged_stats = merge(target.batch_stats, flatten(raw.get("batch_stats", {})))
    # count leaves that actually MERGED (path present AND shape matched) — a
    # path-only count reports a full load for an all-shape-mismatched
    # checkpoint (e.g. different --featDim), hiding a run on random init
    tgt_params = flatten(target.params)
    n_loaded = sum(1 for p, v in tgt_params.items()
                   if p in src_params and np.shape(src_params[p]) == np.shape(v))
    n_total = len(tgt_params)
    return target.replace(params=merged_params, batch_stats=merged_stats), (n_loaded, n_total)
