"""Host-side Siamese augmentations.

The reference re-implements augmentation inline in the trainers (the vendored
provider.py is unused):

- ShapeNet (ShapeNet/ShapeNet_DGCNN_trainer.py:261-283): per-sample jitter
  with eps = 2e-3 * per-axis spatial extent, then a random z-mirror.
- S3DIS (S3DIS/S3DIS_DGCNN_trainer.py:261-300): one of 8 dihedral XY
  flips/swaps applied coherently to the raw coords (cols 0, 1) and the
  normalized coords (cols 6, 7; flips map u -> 1 - u).

Both produce the second element of each Siamese pair; before the rampup
epoch the pair is an exact duplicate (quirk Q2).
"""

from __future__ import annotations

import numpy as np


def shapenet_augment(points: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Jitter + random z-mirror for one sample [N, 3]."""
    extent = points.max(axis=0) - points.min(axis=0)
    eps = 2e-3 * extent[None, :]
    out = points + eps * rng.standard_normal(points.shape).astype(points.dtype)
    if rng.integers(0, 2) == 1:
        out = out.copy()
        out[:, 2] = -out[:, 2]
    return out


def s3dis_augment(block: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One of 8 dihedral transforms for one block [N, 9]."""
    out = block.copy()
    choice = int(rng.integers(0, 8))
    swap = choice in (1, 5, 6, 7)
    flip_x = choice in (2, 4, 5, 7)
    flip_y = choice in (3, 4, 6, 7)
    if swap:
        out[:, [0, 1]] = out[:, [1, 0]]
        out[:, [6, 7]] = out[:, [7, 6]]
    if flip_x:
        out[:, 0] = -out[:, 0]
        out[:, 6] = -out[:, 6] + 1
    if flip_y:
        out[:, 1] = -out[:, 1]
        out[:, 7] = -out[:, 7] + 1
    return out


def make_siamese_batch(
    data: np.ndarray,
    rng: np.random.Generator,
    augment_fn=None,
) -> np.ndarray:
    """Interleave [B, ...] -> [2B, ...]: (x_i, augment(x_i)) pairs.

    With ``augment_fn=None`` the pair is an exact duplicate (pre-rampup
    behavior, ShapeNet_DGCNN_trainer.py:284-289).
    """
    out = np.empty((2 * data.shape[0],) + data.shape[1:], dtype=data.dtype)
    out[0::2] = data
    if augment_fn is None:
        out[1::2] = data
    else:
        for i, sample in enumerate(data):
            out[2 * i + 1] = augment_fn(sample, rng)
    return out


def interleave_duplicate(arr: np.ndarray) -> np.ndarray:
    """[B, ...] -> [2B, ...] with each row duplicated (labels/masks)."""
    return np.repeat(arr, 2, axis=0)
