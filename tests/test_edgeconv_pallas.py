"""Fused kNN+gather kernel (ops/edgeconv_pallas.py) vs the XLA path,
including the custom-VJP scatter backward (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
    knn_gather,
    edge_feature_fused,
)
from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops


@pytest.mark.parametrize(
    "b,n,cg,cf,k",
    [
        (2, 256, 3, 64, 20),
        (1, 300, 7, 3, 10),   # ragged N + tiny feature dim
        (2, 128, 64, 64, 8),  # feature-space graph
    ],
)
def test_forward_matches_xla(rng, b, n, cg, cf, k):
    g = jnp.asarray(rng.standard_normal((b, n, cg)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, cf)), jnp.float32)
    idx, nbr = knn_gather(g, f, k, 256, True)
    want_idx = knn_ops.knn_graph(g, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_nbr = knn_ops.gather_neighbors(f, want_idx)
    np.testing.assert_array_equal(np.asarray(nbr), np.asarray(want_nbr))


def test_edge_feature_and_grad_match(rng):
    b, n, c, k = 2, 192, 8, 6
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    def loss_fused(f):
        return jnp.sum(jnp.sin(edge_feature_fused(g, f, k, interpret=True)))

    def loss_ref(f):
        return jnp.sum(jnp.sin(
            knn_ops.edge_feature(f, knn_ops.knn_graph(g, k))))

    np.testing.assert_allclose(float(loss_fused(f)), float(loss_ref(f)),
                               rtol=1e-6)
    gf = np.asarray(jax.grad(loss_fused)(f))
    gr = np.asarray(jax.grad(loss_ref)(f))
    np.testing.assert_allclose(gf, gr, rtol=1e-5, atol=1e-6)


def test_graph_source_gets_zero_grad(rng):
    """The kNN selection is non-differentiable: dg must be exactly zero
    (the reference's tf.nn.top_k likewise carries no gradient)."""
    b, n, k = 1, 96, 4
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, 5)), jnp.float32)
    dg = jax.grad(lambda g: jnp.sum(knn_gather(g, f, k, 256, True)[1]))(g)
    np.testing.assert_array_equal(np.asarray(dg), 0.0)
