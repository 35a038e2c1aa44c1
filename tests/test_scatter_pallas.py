"""Pallas one-hot-matmul scatter-add vs XLA .at[].add (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.ops.scatter_pallas import scatter_add_pallas


@pytest.mark.parametrize("b,n,k,c", [(2, 256, 20, 64), (1, 100, 7, 3)])
def test_matches_xla_scatter(rng, b, n, k, c):
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, n, k, c)), jnp.float32)
    got = np.asarray(scatter_add_pallas(idx, g, n, tile_rows=128,
                                        interpret=True))
    want = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        for p in range(n):
            for j in range(k):
                want[bi, int(idx[bi, p, j])] += np.asarray(g)[bi, p, j]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_duplicate_targets_accumulate(rng):
    idx = jnp.zeros((1, 16, 4), jnp.int32)  # everything scatters to row 0
    g = jnp.ones((1, 16, 4, 8), jnp.float32)
    out = np.asarray(scatter_add_pallas(idx, g, 16, tile_rows=8,
                                        interpret=True))
    np.testing.assert_allclose(out[0, 0], 64.0)
    np.testing.assert_allclose(out[0, 1:], 0.0)


def test_weighted_scatter_matches_xla(rng):
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_add_weighted_pallas,
    )

    b, p, k, c, n = 2, 96, 6, 17, 64
    idx = jnp.asarray(rng.integers(0, n, (b, p, k)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (b, p, k)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((b, p, c)), jnp.float32)
    got = np.asarray(scatter_add_weighted_pallas(
        idx, w, ct, n, tile_rows=32, interpret=True))
    want = jnp.zeros((b, n, c), jnp.float32)
    bidx = jnp.arange(b)[:, None, None]
    want = want.at[bidx, idx].add(w[..., None] * ct[:, :, None, :])
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tiles", [1, 2])
def test_scatter_tiles_per_step(rng, tiles):
    """Multi-point-tile grid steps (tiles_per_step=2, off by default) must
    match the single-tile result for BOTH scatter kernels — the collapsed
    weighted one-hot rewrite changed the per-tile loop bodies."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_add_weighted_pallas,
    )

    b, p, k, c, n = 2, 128, 5, 9, 64
    idx = jnp.asarray(rng.integers(0, n, (b, p, k)), jnp.int32)
    bidx = jnp.arange(b)[:, None, None]

    g4 = jnp.asarray(rng.standard_normal((b, p, k, c)), jnp.float32)
    got = np.asarray(scatter_add_pallas(
        idx, g4, n, tile_rows=32, tiles_per_step=tiles, interpret=True))
    want = jnp.zeros((b, n, c), jnp.float32).at[bidx, idx].add(g4)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)

    w = jnp.asarray(rng.uniform(0, 1, (b, p, k)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((b, p, c)), jnp.float32)
    got_w = np.asarray(scatter_add_weighted_pallas(
        idx, w, ct, n, tile_rows=32, tiles_per_step=tiles, interpret=True))
    want_w = jnp.zeros((b, n, c), jnp.float32).at[bidx, idx].add(
        w[..., None] * ct[:, :, None, :])
    np.testing.assert_allclose(got_w, np.asarray(want_w), rtol=1e-5,
                               atol=1e-5)


def test_weighted_scatter_ragged_rows(rng):
    """Padded rows (p not a tile multiple) must contribute nothing."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_add_weighted_pallas,
    )

    b, p, k, c, n = 1, 37, 3, 5, 40
    idx = jnp.asarray(rng.integers(0, n, (b, p, k)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (b, p, k)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((b, p, c)), jnp.float32)
    got = np.asarray(scatter_add_weighted_pallas(
        idx, w, ct, n, tile_rows=16, interpret=True))
    want = jnp.zeros((b, n, c), jnp.float32)
    bidx = jnp.arange(b)[:, None, None]
    want = want.at[bidx, idx].add(w[..., None] * ct[:, :, None, :])
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_scatter_bn_bwd(rng, mode):
    """Fold-in scatter: dy = first + alpha + beta*y assembled in VMEM,
    dense (s*dz) and sparse (k-max routed q at asel) first terms, vs the
    straight materialize-dy1 math. p=37 exercises ragged row padding."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_bn_bwd_pallas,
    )

    b, p, k, c, n = 2, 37, 5, 8, 40
    idx = jnp.asarray(rng.integers(0, n, (b, p, k)), jnp.int32)
    y = jnp.asarray(rng.standard_normal((b, p, k, c)), jnp.float32)
    sv = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    al = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    if mode == "dense":
        dz = jnp.asarray(rng.standard_normal((b, p, k, c)), jnp.float32)
        got_dv, got_du = scatter_bn_bwd_pallas(
            idx, y, dz, sv, al, be, n, tile_rows=16, interpret=True)
        dy = sv * dz + al + be * y
    else:
        q = jnp.asarray(rng.standard_normal((b, p, c)), jnp.float32)
        asel = jnp.asarray(rng.integers(0, k, (b, p, c)), jnp.int32)
        got_dv, got_du = scatter_bn_bwd_pallas(
            idx, y, (q, asel), sv, al, be, n, tile_rows=16, interpret=True)
        onek = asel[:, :, None, :] == jnp.arange(k)[None, None, :, None]
        dy = onek * q[:, :, None, :] + al + be * y
    np.testing.assert_allclose(got_du, jnp.sum(dy, axis=2), rtol=1e-5,
                               atol=1e-5)
    bidx = jnp.arange(b)[:, None, None]
    want_dv = jnp.zeros((b, n, c)).at[bidx, idx].add(dy)
    np.testing.assert_allclose(got_dv, want_dv, rtol=1e-4, atol=1e-4)
