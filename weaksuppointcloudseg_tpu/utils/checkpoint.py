"""Checkpointing: params + optimizer state + BN stats + step in one file.

The reference uses tf.train.Saver(max_to_keep=2) plus a shelled-out ``cp`` for
the best copy (ShapeNet/ShapeNet_DGCNN_trainer.py:600-644) and does NOT
checkpoint the epoch counter (incomplete resume semantics). Here a checkpoint
is a single ``.npz`` of the flattened train-state pytree (restored against a
template with the same structure), with a keep-N + best-copy manager and
*complete* resume (step and epoch included).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree of arrays (+ scalars) as <path>.npz.

    Leaves are stored positionally (restore requires a template pytree with
    the same structure — which the trainer always has)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"arr_{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (a template pytree)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(like)
    restored = [np.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
    for i, (r, l) in enumerate(zip(restored, flat)):
        if hasattr(l, "shape") and tuple(np.shape(r)) != tuple(np.shape(l)):
            raise ValueError(
                f"checkpoint leaf {i} shape {np.shape(r)} != template {np.shape(l)}"
            )
    return jax.tree_util.tree_unflatten(treedef, restored)


class CheckpointManager:
    """keep-N rolling checkpoints + a best copy (reference policy)."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = directory
        self.max_to_keep = max_to_keep
        self._kept = []
        self.best_metric = -np.inf
        os.makedirs(directory, exist_ok=True)

    def save(self, tree: Any, epoch: int, metric: float) -> str:
        path = os.path.join(self.directory, f"Checkpoint_epoch-{epoch}.npz")
        save_checkpoint(path, tree)
        self._kept.append(path)
        while len(self._kept) > self.max_to_keep:
            old = self._kept.pop(0)
            if os.path.exists(old):
                os.remove(old)
        if metric > self.best_metric:
            self.best_metric = float(metric)
            best = os.path.join(self.directory, "Checkpoint_epoch-best.npz")
            shutil.copyfile(path, best)
        return path

    def best_path(self) -> str:
        return os.path.join(self.directory, "Checkpoint_epoch-best.npz")
