"""Unit tests for the EdgeConv hot-loop ops against numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weaksuppointcloudseg_tpu.ops import (
    pairwise_sqdist,
    knn,
    gather_neighbors,
    edge_feature,
    knn_graph,
    learning_rate_schedule,
    bn_decay_schedule,
)
from weaksuppointcloudseg_tpu.configs import ScheduleConfig


def np_pairwise_sqdist(x):
    diff = x[:, :, None, :] - x[:, None, :, :]
    return np.sum(diff**2, axis=-1)


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.normal(size=(3, 17, 5)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x)))
    want = np_pairwise_sqdist(x)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_nearest_first(rng):
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), k=5))
    d = np_pairwise_sqdist(x)
    for b in range(2):
        for n in range(32):
            want = np.argsort(d[b, n], kind="stable")[:5]
            got_d = np.sort(d[b, n][idx[b, n]])
            want_d = np.sort(d[b, n][want])
            np.testing.assert_allclose(got_d, want_d, atol=1e-5)
    # self point is always the nearest
    assert np.all(idx[:, :, 0] == np.arange(32)[None, :])


def test_gather_neighbors_hand_case():
    x = jnp.asarray(np.arange(2 * 4 * 3).reshape(2, 4, 3).astype(np.float32))
    idx = jnp.asarray(np.array([[[1, 2], [0, 0], [3, 1], [2, 2]],
                                [[0, 3], [1, 1], [2, 0], [3, 3]]]))
    out = np.asarray(gather_neighbors(x, idx))
    for b in range(2):
        for n in range(4):
            for j in range(2):
                np.testing.assert_array_equal(out[b, n, j], np.asarray(x)[b, idx[b, n, j]])


def test_edge_feature_semantics(rng):
    x = rng.normal(size=(2, 8, 4)).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), k=3))
    ef = np.asarray(edge_feature(jnp.asarray(x), jnp.asarray(idx)))
    assert ef.shape == (2, 8, 3, 8)
    # first half = central point, second half = neighbor - central
    np.testing.assert_allclose(ef[:, :, :, :4], np.repeat(x[:, :, None, :], 3, axis=2), atol=1e-6)
    for b in range(2):
        for n in range(8):
            for j in range(3):
                np.testing.assert_allclose(
                    ef[b, n, j, 4:], x[b, idx[b, n, j]] - x[b, n], atol=1e-6
                )


def test_knn_degenerate_duplicate_points():
    # duplicated points: distances tie at 0; top_k must still return k indices
    x = jnp.zeros((1, 16, 3))
    idx = knn_graph(x, k=4)
    assert idx.shape == (1, 16, 4)
    assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 16)


def test_lr_schedule_staircase():
    cfg = ScheduleConfig(base_learning_rate=1e-3, lr_decay_step=100,
                         lr_decay_rate=0.5, lr_floor=1e-5)
    bs = 10
    # step*bs < 100 -> base lr
    assert np.isclose(float(learning_rate_schedule(5, bs, cfg)), 1e-3)
    # step*bs in [100, 200) -> halved
    assert np.isclose(float(learning_rate_schedule(10, bs, cfg)), 5e-4)
    assert np.isclose(float(learning_rate_schedule(19, bs, cfg)), 5e-4)
    # floor
    assert np.isclose(float(learning_rate_schedule(10**6, bs, cfg)), 1e-5)


def test_bn_decay_schedule():
    cfg = ScheduleConfig(bn_init_decay=0.5, bn_decay_decay_rate=0.5,
                         bn_decay_decay_step=200, bn_decay_clip=0.99)
    bs = 10
    assert np.isclose(float(bn_decay_schedule(0, bs, cfg)), 0.5)
    assert np.isclose(float(bn_decay_schedule(20, bs, cfg)), 0.75)
    assert np.isclose(float(bn_decay_schedule(10**6, bs, cfg)), 0.99)


def test_ops_jit_and_grad():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 3)).astype(np.float32))

    @jax.jit
    def f(x):
        idx = knn_graph(x, 8)
        return jnp.sum(edge_feature(x, idx) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))
