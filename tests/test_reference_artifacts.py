"""Parity against the REAL reference artifacts shipped on disk.

The two SampIndex .mat files that exist in the reference tree
(/root/reference/Dataset/*/Preprocess/, loaded by the reference at
train_ShapeNet.py:90-96 and train_S3DIS.py:96-99) are parsed through our
loader and turned into training masks — the label budgets a drop-in user
would feed this framework. Skipped when the reference checkout is absent.
"""

import os

import numpy as np
import pytest

from weaksuppointcloudseg_tpu.data.sampling import (
    indices_to_mask,
    load_sample_index_mat,
)

SHAPENET_MAT = "/root/reference/Dataset/ShapeNet/Preprocess/SampIndex_m-0.010.mat"
S3DIS_MAT = "/root/reference/Dataset/S3DIS/Preprocess/SampIndex_m-0.000.mat"


@pytest.mark.skipif(not os.path.exists(SHAPENET_MAT),
                    reason="reference checkout not present")
def test_shapenet_m001_artifact_parses_and_masks():
    idx = load_sample_index_mat(SHAPENET_MAT, 0.01)
    # 12137 training samples, floor(0.01 * 2048) = 20 labelled points each,
    # 0-based into the 2048-point clouds (SURVEY.md C19).
    assert idx.shape == (12137, 20)
    assert np.issubdtype(idx.dtype, np.integer)
    assert idx.min() >= 0 and idx.max() <= 2047
    # indices are unique within each sample (a point is labelled once)
    assert all(len(np.unique(row)) == len(row) for row in idx[:100])

    mask = indices_to_mask(idx, [0, 1, 12136], 2048)
    assert mask.shape == (3, 2048)
    np.testing.assert_allclose(mask.sum(axis=1), 20.0)
    np.testing.assert_array_equal(np.nonzero(mask[0])[0], np.sort(idx[0]))


@pytest.mark.skipif(not os.path.exists(S3DIS_MAT),
                    reason="reference checkout not present")
def test_s3dis_m0_artifact_parses_ragged_and_masks():
    rows = load_sample_index_mat(S3DIS_MAT, 0.0)
    # ragged object array (1, 23585): one row per training block, 1..9
    # labelled points ("one point per class present", <= 13 classes but the
    # shipped file never exceeds 9 present classes per block); unpacking
    # matches the reference's tmp['pts_idx_list'][0, b][0]
    # (train_S3DIS.py:96-99).
    assert len(rows) == 23585
    lens = np.array([len(r) for r in rows])
    assert lens.min() >= 1 and lens.max() <= 13
    lo = min(int(r.min()) for r in rows)
    hi = max(int(r.max()) for r in rows)
    assert lo >= 0 and hi <= 4095

    mask = indices_to_mask(rows, [0, 5, 23584], 4096)
    assert mask.shape == (3, 4096)
    np.testing.assert_allclose(
        mask.sum(axis=1),
        [len(np.unique(rows[0])), len(np.unique(rows[5])),
         len(np.unique(rows[23584]))])
