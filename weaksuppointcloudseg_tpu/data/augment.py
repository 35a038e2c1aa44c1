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

Quirk Q11 (discovered tracing S3DIS_DGCNN_trainer.py:261-300): the reference
S3DIS augmentation mutates the batch row *in place* (``data_i[:, 0] = ...``
on a view) AFTER appending that same view as the "original" — so both
elements of every post-rampup pair are the augmented cloud, the pair is
always identical, and the x10 Siamese loss is inert up to dropout noise.
(The ShapeNet path escapes this: ``data_i = data_i + jitter`` rebinds to a
fresh array.) This implementation produces the paper-intended
(original, augmented) pairs for both datasets.
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
    """[B, ...] -> [2B, ...] with each row duplicated (labels/masks).
    Native single-pass copy when the C++ batcher is built."""
    from weaksuppointcloudseg_tpu import native

    return native.interleave_duplicate(np.asarray(arr))


# ---------------------------------------------------------------------------
# Provider-style batch augmentations (Networks/dgcnn/provider.py:20-137 —
# vendored but unused by the reference trainers; provided for completeness
# and for classification training). All vectorized over the batch.
# ---------------------------------------------------------------------------


def shuffle_data(data: np.ndarray, labels: np.ndarray,
                 rng: np.random.Generator):
    """Shuffle data/labels coherently; returns (data, labels, perm)."""
    perm = rng.permutation(len(labels))
    return data[perm], labels[perm], perm


def _rot_y(angles: np.ndarray) -> np.ndarray:
    """[B] angles -> [B, 3, 3] rotation matrices about the y (up) axis."""
    c, s = np.cos(angles), np.sin(angles)
    z, o = np.zeros_like(c), np.ones_like(c)
    return np.stack(
        [np.stack([c, z, s], -1), np.stack([z, o, z], -1),
         np.stack([-s, z, c], -1)], axis=-2)


def rotate_point_cloud(batch: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random y-axis rotation per sample (provider.py:33-52)."""
    angles = rng.uniform(0, 2 * np.pi, batch.shape[0])
    return np.einsum("bnc,bcd->bnd", batch, _rot_y(angles)).astype(batch.dtype)


def rotate_point_cloud_by_angle(batch: np.ndarray, angle: float) -> np.ndarray:
    """Fixed y-axis rotation (provider.py:54-72)."""
    rot = _rot_y(np.full(batch.shape[0], angle))
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(batch.dtype)


def rotate_perturbation_point_cloud(
    batch: np.ndarray, rng: np.random.Generator,
    angle_sigma: float = 0.06, angle_clip: float = 0.18,
) -> np.ndarray:
    """Small random xyz-axis rotations (provider.py:74-97)."""
    out = np.empty_like(batch)
    for i in range(batch.shape[0]):
        a = np.clip(angle_sigma * rng.standard_normal(3), -angle_clip, angle_clip)
        rx = np.array([[1, 0, 0],
                       [0, np.cos(a[0]), -np.sin(a[0])],
                       [0, np.sin(a[0]), np.cos(a[0])]])
        ry = np.array([[np.cos(a[1]), 0, np.sin(a[1])],
                       [0, 1, 0],
                       [-np.sin(a[1]), 0, np.cos(a[1])]])
        rz = np.array([[np.cos(a[2]), -np.sin(a[2]), 0],
                       [np.sin(a[2]), np.cos(a[2]), 0],
                       [0, 0, 1]])
        out[i] = batch[i] @ (rz @ ry @ rx).T
    return out


def jitter_point_cloud(batch: np.ndarray, rng: np.random.Generator,
                       sigma: float = 0.01, clip: float = 0.05) -> np.ndarray:
    """Clipped Gaussian jitter (provider.py:99-110)."""
    noise = np.clip(sigma * rng.standard_normal(batch.shape), -clip, clip)
    return (batch + noise).astype(batch.dtype)


def shift_point_cloud(batch: np.ndarray, rng: np.random.Generator,
                      shift_range: float = 0.1) -> np.ndarray:
    """Per-sample uniform translation (provider.py:112-124)."""
    shifts = rng.uniform(-shift_range, shift_range, (batch.shape[0], 1, 3))
    return (batch + shifts).astype(batch.dtype)


def random_scale_point_cloud(batch: np.ndarray, rng: np.random.Generator,
                             scale_low: float = 0.8,
                             scale_high: float = 1.25) -> np.ndarray:
    """Per-sample uniform scale (provider.py:126-137)."""
    scales = rng.uniform(scale_low, scale_high, (batch.shape[0], 1, 1))
    return (batch * scales).astype(batch.dtype)
