"""Native C++ batcher vs numpy fallback — both paths must agree exactly."""

import numpy as np
import pytest

from weaksuppointcloudseg_tpu import native
from weaksuppointcloudseg_tpu.utils.tools import onehot_encode


def test_reports_backend():
    # the build script ran in CI/dev setup; fallback also legal
    assert isinstance(native.HAVE_NATIVE, bool)


def test_onehot_matches(rng):
    labels = rng.integers(0, 13, (4, 96))
    got = native.onehot(labels, 13)
    np.testing.assert_array_equal(got, onehot_encode(labels, 13))
    assert got.dtype == np.float32


def test_onehot_1d(rng):
    labels = rng.integers(0, 16, (7,))
    np.testing.assert_array_equal(
        native.onehot(labels, 16), onehot_encode(labels, 16))


def test_interleave_duplicate(rng):
    x = rng.standard_normal((3, 8, 3)).astype(np.float32)
    got = native.interleave_duplicate(x)
    np.testing.assert_array_equal(got, np.repeat(x, 2, axis=0))
    xi = rng.integers(0, 50, (3, 8)).astype(np.int32)
    np.testing.assert_array_equal(
        native.interleave_duplicate(xi), np.repeat(xi, 2, axis=0))


def test_build_mask(rng):
    pts_idx = [rng.choice(64, 6, replace=False) for _ in range(5)]
    mask = native.build_mask(pts_idx, [0, 3], 64)
    assert mask.shape == (2, 64)
    np.testing.assert_array_equal(np.sort(np.nonzero(mask[0])[0]),
                                  np.sort(pts_idx[0]))
    np.testing.assert_array_equal(np.sort(np.nonzero(mask[1])[0]),
                                  np.sort(pts_idx[3]))


def test_siamese_onehot(rng):
    labels = rng.integers(0, 50, (3, 32))
    got = native.siamese_onehot(labels, 50)
    want = np.repeat(onehot_encode(labels, 50), 2, axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="native lib not built")
def test_native_is_active_after_build():
    assert native.HAVE_NATIVE
