"""Point-axis-sharded label propagation vs the dense single-device solve
(8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.parallel import make_mesh
from weaksuppointcloudseg_tpu.propagate import (
    laplacian_xyz_rgb,
    label_propagation,
    label_propagation_matfree,
    propagate_batch,
)
from weaksuppointcloudseg_tpu.propagate.sharded import label_propagation_sharded


@pytest.fixture
def problem(rng):
    n, k = 128, 5
    x = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    logits = rng.standard_normal((n, k)).astype(np.float32) * 2
    g = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(rgb), jnp.asarray(g)


def _dense(x, rgb, g, sym):
    lap = laplacian_xyz_rgb(x[None], rgb[None], sym=sym)
    _, want, _ = label_propagation(lap, g[None])
    return np.asarray(want)[0]


def test_matches_dense_unnormalized_solve(problem):
    x, rgb, g = problem
    mesh = make_mesh(8)
    got = np.asarray(label_propagation_sharded(
        mesh, x, g, rgb, cg_iters=300, sym=False))
    np.testing.assert_allclose(got, _dense(x, rgb, g, sym=False),
                               rtol=5e-3, atol=1e-4)


def test_matches_dense_symmetric_solve(problem):
    """sym=True is the reference test-path variant (Util/Tool.py:435-467)."""
    x, rgb, g = problem
    mesh = make_mesh(8)
    got = np.asarray(label_propagation_sharded(
        mesh, x, g, rgb, cg_iters=300, sym=True))
    np.testing.assert_allclose(got, _dense(x, rgb, g, sym=True),
                               rtol=5e-3, atol=1e-4)


def test_batched_sharded(rng):
    b, n, k = 3, 64, 4
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.3)
    rgb = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    logits = rng.standard_normal((b, n, k)).astype(np.float32)
    g = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    mesh = make_mesh(8)
    got = np.asarray(label_propagation_sharded(
        mesh, x, g, rgb, cg_iters=300, sym=True))
    lap = laplacian_xyz_rgb(x, rgb, sym=True)
    _, want, _ = label_propagation(lap, g)
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-3, atol=1e-4)


def test_rows_sum_to_one(problem):
    x, rgb, g = problem
    mesh = make_mesh(8)
    out = np.asarray(label_propagation_sharded(mesh, x, g, rgb, cg_iters=100))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-3)


def test_matfree_matches_dense(problem):
    """cg_matfree never builds [B, N, N]; result must match the dense
    symmetric solve."""
    x, rgb, g = problem
    got = np.asarray(label_propagation_matfree(
        x[None], g[None], rgb[None], cg_iters=300, row_tile=48))
    np.testing.assert_allclose(got[0], _dense(x, rgb, g, sym=True),
                               rtol=5e-3, atol=1e-4)


def test_propagate_batch_solver_dispatch(problem):
    """Every LabelPropConfig.solver value reaches a working solver and they
    agree with each other."""
    x, rgb, g = problem
    outs = {}
    for solver in ("solve", "cg", "cg_matfree", "sharded"):
        outs[solver] = np.asarray(propagate_batch(
            x[None], g[None], rgb[None], solver=solver, cg_iters=300))
    for solver in ("cg", "cg_matfree", "sharded"):
        np.testing.assert_allclose(outs[solver], outs["solve"],
                                   rtol=5e-3, atol=1e-4)


def test_sharded_dispatch_handles_indivisible_n(rng):
    """N=100 on an 8-device host: the dispatcher must pick a mesh size
    that divides N (here 5) instead of crashing."""
    n, k = 100, 4
    x = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
    logits = rng.standard_normal((1, n, k)).astype(np.float32) * 2
    g = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    got = np.asarray(propagate_batch(x, g, solver="sharded", cg_iters=300))
    want = np.asarray(propagate_batch(x, g, solver="solve"))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)
