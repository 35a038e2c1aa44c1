"""Checkpointing: params + optimizer state + BN stats + step in one file.

The reference uses tf.train.Saver(max_to_keep=2) plus a shelled-out ``cp`` for
the best copy (ShapeNet/ShapeNet_DGCNN_trainer.py:600-644) and does NOT
checkpoint the epoch counter (incomplete resume semantics). Here a checkpoint
is a single ``.npz`` of the flattened train-state pytree, with a keep-N +
best-copy manager and *complete* resume (step and epoch included).

Format v2: alongside the positional leaves the file stores every leaf's
pytree KEY PATH (``__keypaths__``). Restore verifies the saved paths against
the template's paths leaf-for-leaf, so a pytree-structure change between
save and restore fails loudly instead of silently mispairing same-shaped
leaves (e.g. the many [64]-wide BN scales/biases). Legacy v1 files (no
``__keypaths__``) still restore positionally behind the shape check.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, List, Tuple

import jax
import numpy as np

CHECKPOINT_FORMAT = 2


def _flatten_with_keypaths(tree: Any) -> Tuple[List[str], list, Any]:
    """(key-path strings, leaves, treedef) for a pytree."""
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(p) for p, _ in path_leaves]
    leaves = [l for _, l in path_leaves]
    return paths, leaves, treedef


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree of arrays (+ scalars) as <path>.npz (format v2:
    positional leaves + their key paths for restore-time verification)."""
    paths, flat, _ = _flatten_with_keypaths(tree)
    arrays = {f"arr_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__format__"] = np.asarray(CHECKPOINT_FORMAT)
    arrays["__keypaths__"] = np.asarray(paths)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (a template pytree).

    v2 files verify the saved key paths against the template's; any
    mismatch (renamed / reordered / restructured leaves) raises with the
    first differing path instead of silently pairing leaves positionally.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    tmpl_paths, flat, treedef = _flatten_with_keypaths(like)
    if "__keypaths__" in data.files:
        saved_paths = [str(p) for p in data["__keypaths__"]]
        if saved_paths != tmpl_paths:
            if len(saved_paths) != len(tmpl_paths):
                raise ValueError(
                    f"checkpoint structure mismatch: {len(saved_paths)} saved "
                    f"leaves vs {len(tmpl_paths)} in the template ({path})")
            diffs = [(i, s, t) for i, (s, t)
                     in enumerate(zip(saved_paths, tmpl_paths)) if s != t]
            i, s, t = diffs[0]
            raise ValueError(
                f"checkpoint structure mismatch at leaf {i}: saved path "
                f"{s!r} != template path {t!r} (+{len(diffs) - 1} more; "
                f"file {path})")
    restored = [np.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
    for i, (r, l) in enumerate(zip(restored, flat)):
        if hasattr(l, "shape") and tuple(np.shape(r)) != tuple(np.shape(l)):
            raise ValueError(
                f"checkpoint leaf {i} ({tmpl_paths[i]}) shape {np.shape(r)} "
                f"!= template {np.shape(l)}"
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
