"""Point-axis-sharded label propagation vs the dense single-device solve
(8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.parallel import make_mesh
from weaksuppointcloudseg_tpu.propagate import laplacian_xyz_rgb, label_propagation
from weaksuppointcloudseg_tpu.propagate.sharded import label_propagation_sharded


@pytest.fixture
def problem(rng):
    n, k = 128, 5
    x = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    logits = rng.standard_normal((n, k)).astype(np.float32) * 2
    g = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(rgb), jnp.asarray(g)


def test_matches_dense_unnormalized_solve(problem):
    x, rgb, g = problem
    mesh = make_mesh(8)
    got = np.asarray(label_propagation_sharded(mesh, x, g, rgb, cg_iters=300))
    lap = laplacian_xyz_rgb(x[None], rgb[None], sym=False)
    _, want, _ = label_propagation(lap, g[None])
    np.testing.assert_allclose(got, np.asarray(want)[0], rtol=5e-3, atol=1e-4)


def test_rows_sum_to_one(problem):
    x, rgb, g = problem
    mesh = make_mesh(8)
    out = np.asarray(label_propagation_sharded(mesh, x, g, rgb, cg_iters=100))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-3)
