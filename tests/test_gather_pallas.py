"""Pallas one-hot-matmul forward gather (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.ops.gather_pallas import gather_rows_pallas


@pytest.mark.parametrize("b,n,k,c", [(2, 256, 20, 64), (1, 96, 5, 8)])
def test_matches_take_along_axis(rng, b, n, k, c):
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    got = np.asarray(gather_rows_pallas(f, idx, tile_flat=128, interpret=True)
                     .astype(jnp.float32))
    flat = np.asarray(idx).reshape(b, n * k)
    want = np.take_along_axis(
        np.asarray(f.astype(jnp.float32)), flat[..., None], axis=1
    ).reshape(b, n, k, c)
    np.testing.assert_array_equal(got, want)
