"""Fused kNN+gather kernel (ops/edgeconv_pallas.py) vs the XLA path,
including the custom-VJP scatter backward (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
    knn_gather,
    knn_gather_with_sqdist,
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


def test_with_sqdist_matches_topk(rng):
    """The values output must equal -lax.top_k(-d, k) values (the smooth
    loss weights are exp(-d/gamma), SmoothConstraint.py:154-158); the
    gather cotangent must still scatter back to f."""
    b, n, k = 2, 200, 10
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, 50)), jnp.float32)
    idx, nbr, sqd = knn_gather_with_sqdist(g, f, k, 256, True)
    d = knn_ops.pairwise_sqdist(g)
    want_vals, want_idx = jax.lax.top_k(-d, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(sqd), -np.asarray(want_vals),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(nbr), np.asarray(knn_ops.gather_neighbors(f, want_idx)))

    def loss(f):
        _, nbr, sqd = knn_gather_with_sqdist(g, f, k, 256, True)
        return jnp.sum(jnp.exp(-sqd / 0.1)[..., None] * jnp.square(nbr))

    def loss_ref(f):
        vals, i = jax.lax.top_k(-knn_ops.pairwise_sqdist(g), k)
        w = jnp.exp(vals / 0.1)
        return jnp.sum(w[..., None] * jnp.square(knn_ops.gather_neighbors(f, i)))

    np.testing.assert_allclose(float(loss(f)), float(loss_ref(f)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(f)), np.asarray(jax.grad(loss_ref)(f)),
        rtol=1e-4, atol=1e-5)


def test_fast_variant_selects_near_identical_neighbors(rng):
    """Packed-min selection: indices may reorder only at near-ties; gathered
    rows must always be f[idx] for the indices it reports."""
    b, n, k = 2, 256, 8
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, 16)), jnp.float32)
    idx, nbr = knn_gather(g, f, k, 256, True, True)
    np.testing.assert_array_equal(
        np.asarray(nbr), np.asarray(knn_ops.gather_neighbors(f, idx)))
    exact = np.asarray(knn_ops.knn_graph(g, k))
    agree = (np.asarray(idx) == exact).mean()
    assert agree > 0.97, f"fast selection diverged too much: {agree}"


def test_graph_source_gets_zero_grad(rng):
    """The kNN selection is non-differentiable: dg must be exactly zero
    (the reference's tf.nn.top_k likewise carries no gradient)."""
    b, n, k = 1, 96, 4
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, 5)), jnp.float32)
    dg = jax.grad(lambda g: jnp.sum(knn_gather(g, f, k, 256, True)[1]))(g)
    np.testing.assert_array_equal(np.asarray(dg), 0.0)
