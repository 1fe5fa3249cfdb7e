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
