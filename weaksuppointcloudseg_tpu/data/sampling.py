"""Labelled-point sampling indices (the "SampIndex" weak-label budgets).

The reference ships precomputed .mat files
(Dataset/*/Preprocess/SampIndex_m-*.mat, loaded at train_ShapeNet.py:90-96 /
train_S3DIS.py:92-101) but 4 of the 6 files are absent from the tree
(.MISSING_LARGE_BLOBS), so this module provides both a loader for existing
.mat files and a seeded generator:

- m > 0: floor(m * N) labelled points sampled uniformly per training sample
  (ShapeNet m=0.01 file: int array [num_samples, 20], 20 = floor(0.01*2048)).
- m == 0 (S3DIS "1 labelled point per class"): for each block, one random
  point per class present -> ragged list of index arrays.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import numpy as np

IndexList = Union[np.ndarray, List[np.ndarray]]


def generate_sample_index(
    num_samples: int,
    num_points: int,
    m: float,
    seed: int = 0,
) -> np.ndarray:
    """Uniform labelled-point indices: int array [num_samples, floor(m*N)]."""
    assert m > 0
    n_labelled = max(1, int(m * num_points))
    rng = np.random.default_rng(seed)
    out = np.empty((num_samples, n_labelled), dtype=np.int64)
    for i in range(num_samples):
        out[i] = rng.choice(num_points, size=n_labelled, replace=False)
    return out


def generate_one_point_per_class(
    seg_labels: np.ndarray,  # [num_samples, N] int
    seed: int = 0,
) -> List[np.ndarray]:
    """S3DIS m=0 scheme: one random labelled point per class present."""
    rng = np.random.default_rng(seed)
    out = []
    for seg in seg_labels:
        idxs = []
        for c in np.unique(seg):
            cand = np.nonzero(seg == c)[0]
            idxs.append(rng.choice(cand))
        out.append(np.asarray(sorted(idxs), dtype=np.int64))
    return out


def load_sample_index_mat(path: str, m: float) -> IndexList:
    """Load a reference SampIndex_m-*.mat file.

    m > 0: rectangular int array [num_samples, k].
    m == 0: ragged object array (1, num_samples) of per-block index rows
    (train_S3DIS.py:96-99 unpacks tmp['pts_idx_list'][0, b][0]).
    """
    import scipy.io as scio

    tmp = scio.loadmat(path)
    arr = tmp["pts_idx_list"]
    if m == 0:
        return [np.asarray(arr[0, b][0]).reshape(-1) for b in range(arr.shape[1])]
    return np.asarray(arr)


def load_or_generate(
    preprocess_dir: str,
    m: float,
    *,
    num_samples: int,
    num_points: int,
    seg_labels: np.ndarray = None,
    seed: int = 0,
) -> IndexList:
    """Prefer the reference .mat if present; otherwise generate (seeded)."""
    path = os.path.join(preprocess_dir, f"SampIndex_m-{m:.3f}.mat")
    if os.path.exists(path):
        return load_sample_index_mat(path, m)
    if m == 0:
        assert seg_labels is not None, "m=0 generation needs the seg labels"
        return generate_one_point_per_class(seg_labels, seed=seed)
    return generate_sample_index(num_samples, num_points, m, seed=seed)


def save_sample_index_mat(path: str, pts_idx: IndexList) -> None:
    """Export a generated label budget in the reference's .mat layout so
    runs are reproducible against the original tooling (C19 format:
    rectangular int array, or ragged object rows for the m=0 scheme)."""
    import numpy as np
    import scipy.io as scio

    if isinstance(pts_idx, np.ndarray):
        scio.savemat(path, {"pts_idx_list": pts_idx})
    else:
        ragged = np.empty((1, len(pts_idx)), dtype=object)
        for i, row in enumerate(pts_idx):
            ragged[0, i] = np.asarray(row).reshape(1, -1)
        scio.savemat(path, {"pts_idx_list": ragged})


def indices_to_mask(
    pts_idx: IndexList,
    sample_ids: Sequence[int],
    num_points: int,
) -> np.ndarray:
    """Binary [B, N] mask from per-sample labelled indices.

    Mirrors the mask construction at ShapeNet_DGCNN_trainer.py:243-258 /
    S3DIS_DGCNN_trainer.py:245-252.
    """
    from weaksuppointcloudseg_tpu import native

    return native.build_mask(pts_idx, list(sample_ids), num_points)
