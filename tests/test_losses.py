"""Loss-function unit tests against numpy closed forms and hand cases."""

import jax
import jax.numpy as jnp
import numpy as np

from weaksuppointcloudseg_tpu.losses import (
    masked_softmax_ce,
    siamese_consistency,
    mil_inexact,
    smooth_knn_laplacian,
    total_weaksup_loss,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_masked_ce_matches_numpy(rng):
    B, N, K = 3, 16, 5
    logits = rng.normal(size=(B, N, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(B, N))
    onehot = np.eye(K, dtype=np.float32)[labels]
    mask = (rng.random((B, N)) < 0.3).astype(np.float32)
    mask[0, 0] = 1.0  # ensure nonzero
    p = _softmax(logits)
    ce = -np.log(np.take_along_axis(p, labels[..., None], axis=-1)[..., 0])
    want = np.sum(mask * ce) / np.sum(mask)
    got = float(masked_softmax_ce(jnp.asarray(logits), jnp.asarray(onehot), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_ce_zero_mask_is_finite():
    logits = jnp.zeros((2, 4, 3))
    onehot = jnp.zeros((2, 4, 3))
    mask = jnp.zeros((2, 4))
    assert np.isfinite(float(masked_softmax_ce(logits, onehot, mask)))


def test_siamese_zero_for_identical_pairs(rng):
    p = rng.random((4, 8, 5)).astype(np.float32)
    prob = np.repeat(p, 2, axis=0)  # interleaved identical pairs
    assert float(siamese_consistency(jnp.asarray(prob))) == 0.0


def test_siamese_matches_numpy(rng):
    prob = rng.random((6, 8, 5)).astype(np.float32)
    want = np.mean(np.sum((prob[0::2] - prob[1::2]) ** 2, axis=-1))
    got = float(siamese_consistency(jnp.asarray(prob)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mil_matches_numpy(rng):
    B, N, K = 3, 16, 7
    logits = rng.normal(size=(B, N, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(B, N))
    onehot = np.eye(K, dtype=np.float32)[labels]
    z = onehot.max(axis=1)
    x = logits.max(axis=1)
    want = np.mean(np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x))))
    got = float(mil_inexact(jnp.asarray(logits), jnp.asarray(onehot)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def np_smooth_loss(prob, x, gamma=0.1, k=10, d=None):
    B, N, K = prob.shape
    if d is None:
        diff = x[:, :, None, :] - x[:, None, :, :]
        d = np.maximum(np.sum(diff**2, axis=-1), 0.0)
    acc = 0.0
    for b in range(B):
        for n in range(N):
            order = np.argsort(d[b, n], kind="stable")[:k]
            w = np.exp(-d[b, n][order] / gamma)
            diff2 = np.mean((prob[b, n][None, :] - prob[b][order]) ** 2, axis=-1)
            acc += np.sum(w * diff2)
    return acc / (B * N * k)


def test_smooth_loss_matches_numpy(rng):
    B, N, K = 2, 24, 5
    prob = _softmax(rng.normal(size=(B, N, K)).astype(np.float32))
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    # Use the op's own (gram-based) distance so fp tie-ordering in the top-k
    # matches; the numpy loop then independently checks weights/gather/mean.
    from weaksuppointcloudseg_tpu.ops import pairwise_sqdist

    d = np.maximum(np.asarray(pairwise_sqdist(jnp.asarray(x))), 0.0)
    want = np_smooth_loss(prob, x, gamma=0.1, k=6, d=d)
    got = float(smooth_knn_laplacian(jnp.asarray(prob), jnp.asarray(x), gamma=0.1, k=6))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_smooth_loss_zero_for_constant_prob(rng):
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    prob = np.ones((2, 16, 4), dtype=np.float32) / 4
    got = float(smooth_knn_laplacian(jnp.asarray(prob), jnp.asarray(x), k=5))
    assert got == 0.0


def test_smooth_loss_channel_slice(rng):
    # S3DIS passes xyzrgb cols 0:6 of a 9-channel input
    x9 = rng.normal(size=(2, 16, 9)).astype(np.float32)
    prob = _softmax(rng.normal(size=(2, 16, 4)).astype(np.float32))
    a = float(smooth_knn_laplacian(jnp.asarray(prob), jnp.asarray(x9), k=5, channels=(0, 6)))
    b = float(smooth_knn_laplacian(jnp.asarray(prob), jnp.asarray(x9[..., :6]), k=5))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_total_loss_gate(rng):
    B, N, K = 4, 16, 5
    logits = jnp.asarray(rng.normal(size=(B, N, K)).astype(np.float32))
    labels = rng.integers(0, K, size=(B, N))
    onehot = jnp.asarray(np.eye(K, dtype=np.float32)[labels])
    mask = jnp.ones((B, N))
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    t0, comps0 = total_weaksup_loss(logits, onehot, mask, x, gate=jnp.asarray(0.0))
    t1, comps1 = total_weaksup_loss(logits, onehot, mask, x, gate=jnp.asarray(1.0))
    np.testing.assert_allclose(float(t0), float(comps0["seg"]), rtol=1e-6)
    want = float(comps1["seg"] + comps1["siamese"] + comps1["inexact"] + comps1["smooth"])
    np.testing.assert_allclose(float(t1), want, rtol=1e-6)


def test_losses_differentiable(rng):
    B, N, K = 4, 16, 5
    logits = jnp.asarray(rng.normal(size=(B, N, K)).astype(np.float32))
    labels = rng.integers(0, K, size=(B, N))
    onehot = jnp.asarray(np.eye(K, dtype=np.float32)[labels])
    mask = jnp.ones((B, N))
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def f(lg):
        t, _ = total_weaksup_loss(lg, onehot, mask, x, gate=jnp.asarray(1.0))
        return t

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_smooth_loss_aggregate_identity(rng):
    """The fused-path identity sum_j w_j|P_n - P_j|^2 =
    s0|P_n|^2 - 2 P_n . s1 + s2 (losses/weaksup.py fused_bf16 branch),
    evaluated here in f32 through the interpret-mode kernel so only f32
    reassociation separates it from the direct formulation."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_weighted_gather,
    )

    B, N, K, k, gamma = 2, 48, 7, 6, 0.1
    prob = jnp.asarray(_softmax(rng.normal(size=(B, N, K)).astype(np.float32)))
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    want = float(smooth_knn_laplacian(prob, x, gamma=gamma, k=k))

    q = jnp.sum(jnp.square(prob), axis=-1)
    f = jnp.concatenate([prob, q[..., None]], axis=-1)  # f32: exact
    _, s, w = knn_weighted_gather(x, f, k, gamma, 256, True)
    s0 = jnp.sum(w, axis=-1)
    per_point = (s0 * q - 2.0 * jnp.sum(prob * s[..., :K], axis=-1)
                 + s[..., K])
    got = float(jnp.mean(per_point) / (k * K))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)
