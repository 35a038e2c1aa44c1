"""Dormant smoothness variants (Util/SmoothConstraint.py:9-128,169-219)
and generic Tool.py:297-400 calculators vs numpy ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.losses import smooth_variants as sv
from weaksuppointcloudseg_tpu.propagate import (
    inner_prod,
    pair_dist2,
    pair_weight2,
    laplacian_from_weights,
    laplacian_sym_direct,
    laplacian_xyz_rgb,
)


def _np_sqd(x):
    d = (np.sum(x**2, -1)[:, :, None] - 2 * np.einsum("bnc,bmc->bnm", x, x)
         + np.sum(x**2, -1)[:, None, :])
    return np.maximum(d, 0.0)


def _np_knn(d, k):
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    vals = np.take_along_axis(d, idx, axis=-1)
    return vals, idx


@pytest.fixture
def cloud(rng):
    b, n = 2, 48
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    z = rng.standard_normal((b, n, 7)).astype(np.float32)
    xyzrgb = np.concatenate(
        [x, rng.uniform(0, 1, (b, n, 3)).astype(np.float32)], -1)
    return x, z, xyzrgb


class TestSmoothVariants:
    def test_spatial_smooth_precomputed(self, rng, cloud):
        x, _, _ = cloud
        b, n, _ = x.shape
        k = 4
        idx = rng.integers(0, n, (b, n, k)).astype(np.int32)
        w = rng.uniform(0, 1, (b, n, k)).astype(np.float32)
        got = float(sv.spatial_smooth(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(idx)))
        nbr = np.stack([x[bi][idx[bi]] for bi in range(b)])
        want = np.mean(w * np.sum((x[:, :, None] - nbr) ** 2, -1))
        assert got == pytest.approx(want, rel=1e-5)

    def test_self_contained_intended(self, cloud):
        x, _, _ = cloud
        gamma, k = 0.1, 5
        got = float(sv.spatial_smooth_self_contained(
            jnp.asarray(x), gamma=gamma, k=k))
        d = _np_sqd(x)
        vals, idx = _np_knn(d, k)
        w = np.exp(-vals / gamma)
        nbr = np.stack([x[bi][idx[bi]] for bi in range(x.shape[0])])
        want = np.mean(w * np.sum((x[:, :, None] - nbr) ** 2, -1))
        assert got == pytest.approx(want, rel=1e-4)

    def test_self_contained_compat_scalar_sum(self, cloud):
        """Reproduces the released reduce_sum()-without-axis quirk
        (SmoothConstraint.py:65): loss = sum(W) * sum(diff^2) / (B*N*k)."""
        x, _, _ = cloud
        gamma, k = 0.1, 5
        got = float(sv.spatial_smooth_self_contained(
            jnp.asarray(x), gamma=gamma, k=k, compat_scalar_sum=True))
        b, n, _ = x.shape
        d = _np_sqd(x)
        vals, idx = _np_knn(d, k)
        w = np.exp(-vals / gamma)
        nbr = np.stack([x[bi][idx[bi]] for bi in range(b)])
        want = w.sum() * np.sum((x[:, :, None] - nbr) ** 2) / (b * n * k)
        assert got == pytest.approx(want, rel=1e-4)

    def test_color_smooth_agreement_mask(self, cloud):
        _, z, xyzrgb = cloud
        gamma, k = 0.1, 6
        got = float(sv.spatial_color_smooth_self_contained(
            jnp.asarray(z), jnp.asarray(xyzrgb), gamma=gamma, k=k))
        b = z.shape[0]
        vx, ix = _np_knn(_np_sqd(xyzrgb[..., 0:3]), k)
        vr, ir = _np_knn(_np_sqd(xyzrgb[..., 3:6]), k)
        mask = (ix == ir).astype(np.float32)
        wx, wr = np.exp(-vx / gamma), np.exp(-vr / gamma)

        def term(idx):
            nbr = np.stack([z[bi][idx[bi]] for bi in range(b)])
            return np.sum((z[:, :, None] - nbr) ** 2, -1)

        want = np.mean(mask * (wx * term(ix) + wr * term(ir)))
        assert got == pytest.approx(want, rel=1e-4)
        # self-edges always agree -> the mask keeps at least slot 0
        assert mask[..., 0].min() == 1.0

    def test_unknown_batch_variant(self, cloud):
        _, z, xyzrgb = cloud
        gamma, k = 0.1, 6
        got = float(sv.spatial_color_smooth_unknown_batch(
            jnp.asarray(z), jnp.asarray(xyzrgb), gamma=gamma, k=k))
        vals, idx = _np_knn(_np_sqd(xyzrgb), k)
        w = np.exp(-vals / gamma)
        nbr = np.stack([z[bi][idx[bi]] for bi in range(z.shape[0])])
        want = np.mean(w * np.sum((z[:, :, None] - nbr) ** 2, -1))
        assert got == pytest.approx(want, rel=1e-4)


class TestGenericCalculators:
    def test_inner_prod(self, rng):
        x = rng.standard_normal((2, 10, 4)).astype(np.float32)
        y = rng.standard_normal((2, 12, 4)).astype(np.float32)
        got = np.asarray(inner_prod(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, np.einsum("bnc,bmc->bnm", x, y),
                                   rtol=1e-5)

    def test_pair_dist2_and_weight2(self, rng):
        x = rng.standard_normal((2, 16, 3)).astype(np.float32)
        d = np.asarray(pair_dist2(jnp.asarray(x)))
        np.testing.assert_allclose(d, _np_sqd(x), rtol=1e-4, atol=1e-5)
        assert d.min() >= 0.0
        w = np.asarray(pair_weight2(jnp.asarray(x), 0.5))
        np.testing.assert_allclose(w, np.exp(-_np_sqd(x) / 0.5),
                                   rtol=1e-4, atol=1e-5)

    def test_laplacian_from_weights_eps_semantics(self, rng):
        w = rng.uniform(0.1, 1.0, (1, 8, 8)).astype(np.float32)
        w = (w + w.transpose(0, 2, 1)) / 2
        d = w.sum(-1)
        # generic unnormalized: NO epsilon (Tool.py:355-358)
        lap = np.asarray(laplacian_from_weights(jnp.asarray(w)))
        np.testing.assert_allclose(
            np.diagonal(lap, axis1=1, axis2=2), d - np.diagonal(
                w, axis1=1, axis2=2), rtol=1e-5)
        # rows of the unnormalized Laplacian sum to zero
        np.testing.assert_allclose(lap.sum(-1), 0.0, atol=1e-4)
        # sym: eps on the diagonal + D^-1/2 scaling (Tool.py:370-373)
        lsym = np.asarray(laplacian_from_weights(jnp.asarray(w), sym=True))
        s = 1.0 / np.sqrt(d)
        want = (np.eye(8) * (d + 1e-8)[:, :, None] - w) * \
            s[:, :, None] * s[:, None, :]
        np.testing.assert_allclose(lsym, want, rtol=1e-4, atol=1e-6)

    def test_laplacian_sym_direct_matches_xyzrgb_builder(self, rng):
        """exp(-D*1e3) only == the XYZRGB builder fed a zero color channel
        (exp(-0*1e1) = 1)."""
        x = rng.standard_normal((2, 12, 3)).astype(np.float32) * 0.1
        got = np.asarray(laplacian_sym_direct(jnp.asarray(x)))
        want = np.asarray(laplacian_xyz_rgb(
            jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), sym=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
