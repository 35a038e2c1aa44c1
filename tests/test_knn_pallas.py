"""Fused Pallas kNN kernel vs the XLA reference path (interpret mode on CPU;
the real-TPU comparison runs in bench/profiling scripts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas
from weaksuppointcloudseg_tpu.ops.neighbors import knn_graph, knn_graph_fused


@pytest.mark.parametrize(
    "b,n,c,k",
    [
        (2, 256, 3, 20),    # ShapeNet xyz graph shape (scaled down)
        (1, 300, 7, 10),    # ragged N (row padding) + odd C (lane padding)
        (2, 512, 64, 20),   # feature-space graphs
        (1, 128, 9, 5),     # S3DIS-style input
    ],
)
def test_matches_xla_topk(rng, b, n, c, k):
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    got = np.asarray(knn_pallas(x, k, interpret=True))
    want = np.asarray(knn_graph(x, k))
    np.testing.assert_array_equal(got, want)


def test_self_is_first_neighbor(rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 3)), jnp.float32)
    idx = np.asarray(knn_pallas(x, 4, interpret=True))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(128))


def test_duplicate_points_tie_break(rng):
    """Exact duplicates must resolve by lowest index, like lax.top_k."""
    x = rng.standard_normal((1, 64, 3)).astype(np.float32)
    x[0, 10] = x[0, 3]
    x[0, 40] = x[0, 3]
    got = np.asarray(knn_pallas(jnp.asarray(x), 5, interpret=True))
    want = np.asarray(knn_graph(jnp.asarray(x), 5))
    np.testing.assert_array_equal(got, want)


def test_fused_dispatcher_cpu_fallback(rng):
    """On CPU the dispatcher must use the XLA path (same result either way)."""
    x = jnp.asarray(rng.standard_normal((2, 96, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(knn_graph_fused(x, 8)), np.asarray(knn_graph(x, 8))
    )


def test_fast_mode_matches_on_separated_points(rng):
    """fast=True packs distance bits with the index; on well-separated
    points (relative gaps >> 2^-11) it matches the exact kernel."""
    x = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    exact = np.asarray(knn_pallas(x, 10, interpret=True))
    fast = np.asarray(knn_pallas(x, 10, interpret=True, fast=True))
    assert (exact == fast).mean() > 0.995
