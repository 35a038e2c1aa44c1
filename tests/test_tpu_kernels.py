"""On-device (real TPU) kernel-equivalence suite.

The CPU suite exercises every Pallas kernel in interpret mode; this module
locks the SAME equivalences on the actual hardware — compiled Mosaic
kernels vs XLA references on the chip. Auto-skips unless the session runs
on a TPU backend:

    WSPC_TPU_TESTS=1 PYTHONPATH=.:/root/.axon_site \
        python -m pytest tests/test_tpu_kernels.py -q
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU kernel tests (set WSPC_TPU_TESTS=1 under a TPU backend)",
)

B, N, K, C = 4, 1024, 20, 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {
        "x3": jax.device_put(
            rng.standard_normal((B, N, 3)).astype(np.float32)),
        "fb16": jax.device_put(
            rng.standard_normal((B, N, C)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "idx": jax.device_put(
            rng.integers(0, N, (B, N, K)).astype(np.int32)),
        "ct": jax.device_put(
            rng.standard_normal((B, N, K, C)).astype(np.float32)),
    }


def test_knn_exact_bit_identical_on_device(data):
    from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    for x in (data["x3"], data["fb16"]):
        got = np.asarray(knn_pallas(x, K))
        want = np.asarray(knn_ops.knn(knn_ops.pairwise_sqdist(x), K))
        np.testing.assert_array_equal(got, want)


def test_knn_fast_agreement_on_device(data):
    from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    got = np.asarray(knn_pallas(data["x3"], K, fast=True))
    want = np.asarray(knn_ops.knn(knn_ops.pairwise_sqdist(data["x3"]), K))
    agree = (got == want).mean()
    assert agree > 0.97, f"packed-min selection diverged: {agree:.4f}"


def test_knn_values_match_topk_on_device(data):
    from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    _, sqd = knn_pallas(data["x3"], K, with_values=True)
    want_vals, _ = jax.lax.top_k(-knn_ops.pairwise_sqdist(data["x3"]), K)
    np.testing.assert_allclose(np.asarray(sqd), -np.asarray(want_vals),
                               rtol=1e-5, atol=1e-5)


def test_gather_bf16_bit_exact_on_device(data):
    from weaksuppointcloudseg_tpu.ops.gather_pallas import gather_rows_pallas

    f, idx = data["fb16"], data["idx"]
    got = np.asarray(gather_rows_pallas(f, idx).astype(jnp.float32))
    want = np.asarray(jnp.take_along_axis(
        f, idx.reshape(B, N * K)[..., None], axis=1
    ).reshape(B, N, K, C).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_scatter_matches_xla_on_device(data):
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import scatter_add_pallas

    idx, ct = data["idx"], data["ct"]
    got = np.asarray(scatter_add_pallas(idx, ct, N))
    bidx = jnp.arange(B)[:, None, None]
    want = np.asarray(
        jnp.zeros((B, N, C), jnp.float32).at[bidx, idx].add(ct))
    # MXU operand rounding + matmul-order summation: ~2e-3 relative
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-3 * scale)


def test_fused_knn_gather_bit_identical_on_device(data):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_gather, knn_gather_with_sqdist)
    from weaksuppointcloudseg_tpu.ops.gather_pallas import gather_rows_pallas
    from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas

    f = data["fb16"]
    idx, nbr = knn_gather(data["x3"], f, K)
    want_idx = knn_pallas(data["x3"], K)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_nbr = gather_rows_pallas(f, idx)
    np.testing.assert_array_equal(
        np.asarray(nbr.astype(jnp.float32)),
        np.asarray(want_nbr.astype(jnp.float32)))

    idx2, nbr2, sqd = knn_gather_with_sqdist(data["x3"], f, K)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(want_idx))
    _, want_sqd = knn_pallas(data["x3"], K, with_values=True)
    np.testing.assert_allclose(np.asarray(sqd), np.asarray(want_sqd),
                               rtol=1e-6, atol=1e-6)


def test_fused_fast_gathers_its_own_indices_on_device(data):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_gather
    from weaksuppointcloudseg_tpu.ops.gather_pallas import gather_rows_pallas

    f = data["fb16"]
    idx, nbr = knn_gather(data["x3"], f, K, 256, False, True)
    want = gather_rows_pallas(f, idx)
    np.testing.assert_array_equal(
        np.asarray(nbr.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)))


def test_full_train_step_on_device():
    """Compiled flagship Full-style train step (all Pallas kernels, bf16 +
    fast selection) executes on the chip with finite loss/metrics."""
    import dataclasses
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_train_step
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = configs.shapenet_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_points=512,
                                  compute_dtype="bfloat16", knn_fast=True),
        train=dataclasses.replace(cfg.train, batch_size=4, style="Full"),
    )
    rng = np.random.default_rng(0)
    n, b, k = 512, 8, cfg.model.num_classes
    seg = rng.integers(0, k, (b, n))
    batch = jax.device_put({
        "data": rng.standard_normal((b, n, 3)).astype(np.float32),
        "seg": seg.astype(np.int32),
        "seg_onehot": onehot_encode(seg, k),
        "mask": (rng.uniform(size=(b, n)) < 0.1).astype(np.float32),
        "cat_onehot": onehot_encode(
            rng.integers(0, cfg.model.num_categories, (b,)),
            cfg.model.num_categories),
        "valid": np.ones((b,), np.float32),
    })
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    state, metrics = step(state, batch, np.float32(1.0), jax.random.PRNGKey(1))
    state, metrics = step(state, batch, np.float32(1.0), jax.random.PRNGKey(2))
    for name in ("total", "seg", "siamese", "inexact", "smooth", "acc"):
        v = float(metrics[name])
        assert np.isfinite(v), f"{name} non-finite: {v}"
    assert int(state.step) == 2


def test_ragged_n_fused_kernels_on_device():
    """Non-tile-multiple N exercises the column-padding semantics of the
    compiled kernels (padded columns pushed to +inf / no-match)."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_gather
    from weaksuppointcloudseg_tpu.ops.knn_pallas import knn_pallas
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    rng = np.random.default_rng(1)
    n = 1000  # pads to 1024
    g = jax.device_put(rng.standard_normal((2, n, 3)).astype(np.float32))
    f = jax.device_put(
        rng.standard_normal((2, n, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    want_idx = np.asarray(knn_ops.knn(knn_ops.pairwise_sqdist(g), 12))
    assert want_idx.max() < n
    np.testing.assert_array_equal(np.asarray(knn_pallas(g, 12)), want_idx)
    idx, nbr = knn_gather(g, f, 12)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_array_equal(
        np.asarray(nbr.astype(jnp.float32)),
        np.asarray(knn_ops.gather_neighbors(f, idx).astype(jnp.float32)))


def test_scatter_s3dis_shape_compiles_on_device():
    """Regression guard: the N=4096 scatter (S3DIS flagship backward) once
    exceeded Mosaic's default scoped-vmem budget with the f32 output
    block — it must compile and match XLA."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import scatter_add_pallas

    rng = np.random.default_rng(2)
    b, n, k, c = 2, 4096, 20, 64
    idx = jax.device_put(rng.integers(0, n, (b, n, k)).astype(np.int32))
    ct = jax.device_put(
        rng.standard_normal((b, n, k, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    got = np.asarray(scatter_add_pallas(idx, ct, n).astype(jnp.float32))
    bidx = jnp.arange(b)[:, None, None]
    want = np.asarray(jnp.zeros((b, n, c), jnp.float32).at[bidx, idx].add(
        ct.astype(jnp.float32)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-3 * scale)


def test_weighted_gather_aggregates_on_device(data):
    """Compiled knn_weighted_gather vs separate exact kNN + gather-then-
    weight on the chip; also the weighted-scatter VJP vs XLA scatter."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_weighted_gather,
    )
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    k, gamma = 10, 0.1
    x = data["x3"]
    f = data["fb16"]
    idx, s, w = jax.jit(
        lambda x, f: knn_weighted_gather(x, f, k, gamma)
    )(x, f)
    d = knn_ops.pairwise_sqdist(x)
    neg_vals, want_idx = jax.lax.top_k(-d, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_w = np.asarray(jnp.exp(jnp.minimum(neg_vals, 0.0) / gamma))
    np.testing.assert_allclose(np.asarray(w), want_w, rtol=1e-3, atol=1e-5)
    want_s = np.asarray(jnp.sum(
        jnp.asarray(want_w)[..., None]
        * knn_ops.gather_neighbors(f, want_idx).astype(jnp.float32), axis=2))
    scale = np.abs(want_s).max()
    np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-3 * scale)

    def loss(f):
        _, s, _ = knn_weighted_gather(x, f, k, gamma)
        return jnp.sum(jnp.square(s))

    got_df = np.asarray(jax.jit(jax.grad(loss))(f).astype(jnp.float32))
    ds = np.asarray(2.0 * jnp.asarray(want_s))
    bidx = jnp.arange(B)[:, None, None]
    want_df = np.asarray(
        jnp.zeros((B, N, C), jnp.float32).at[bidx, want_idx].add(
            jnp.asarray(want_w)[..., None] * jnp.asarray(ds)[:, :, None, :]))
    scale = np.abs(want_df).max()
    np.testing.assert_allclose(got_df, want_df, atol=2e-2 * scale)


def test_smooth_loss_fused_matches_direct_on_device(data):
    """fused_bf16 aggregate path vs the direct f32 formulation: value and
    logits-gradient agree to bf16-rounding tolerance."""
    from weaksuppointcloudseg_tpu.losses.weaksup import smooth_knn_laplacian

    rng = np.random.default_rng(3)
    x = data["x3"]
    logits = jax.device_put(
        rng.standard_normal((B, N, 13)).astype(np.float32))

    def loss(logits, fused):
        prob = jax.nn.softmax(logits, axis=-1)
        return smooth_knn_laplacian(prob, x, gamma=0.1, k=10,
                                    fused_bf16=fused)

    v_direct, g_direct = jax.jit(
        jax.value_and_grad(lambda l: loss(l, False)))(logits)
    v_fused, g_fused = jax.jit(
        jax.value_and_grad(lambda l: loss(l, True)))(logits)
    np.testing.assert_allclose(float(v_fused), float(v_direct), rtol=2e-2)
    gd = np.asarray(g_direct)
    gf = np.asarray(g_fused)
    scale = np.abs(gd).max()
    np.testing.assert_allclose(gf, gd, atol=3e-2 * scale)


def test_knn_edge_gather_on_device(data):
    """Compiled knn_edge_gather vs exact kNN + gather + add on the chip:
    identical indices, bit-level y (bf16 gather is exact, the +u add is the
    only rounding), moment sums to f32-reduction tolerance."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_edge_gather
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    k = 20
    x = data["x3"]
    v = data["fb16"]
    rng = np.random.default_rng(5)
    u = jax.device_put(
        rng.standard_normal((B, N, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx, y, mom = jax.jit(
        lambda x, v, u: knn_edge_gather(x, v, u, k))(x, v, u)
    want_idx = knn_ops.knn_graph(x, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_y = (knn_ops.gather_neighbors(v, want_idx).astype(jnp.float32)
              + u.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
    got_y = np.asarray(y.astype(jnp.float32))
    np.testing.assert_array_equal(got_y, np.asarray(want_y.astype(jnp.float32)))
    want_sum = np.asarray(jnp.sum(want_y.astype(jnp.float32), axis=(0, 1, 2)))
    scale = np.abs(want_sum).max() + 1.0
    np.testing.assert_allclose(np.asarray(mom[0]), want_sum,
                               atol=2e-3 * scale)


def test_model_fused_path_matches_straight_on_device():
    """Full ShapeNet model forward (training mode): fused kNN+conv path vs
    the straight gather+concat+conv path, both bf16 + exact selection.
    Differences are bf16 reassociation only."""
    import dataclasses
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.models.dgcnn import (
        init_dgcnn_seg, apply_dgcnn_seg)
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg0 = configs.shapenet_config().model
    cfg0 = dataclasses.replace(cfg0, compute_dtype="bfloat16", num_points=512)
    rng = np.random.default_rng(11)
    x = jax.device_put(rng.standard_normal((2, 512, 3)).astype(np.float32))
    cat = jax.device_put(
        onehot_encode(rng.integers(0, cfg0.num_categories, (2,)),
                      cfg0.num_categories))
    params, state = init_dgcnn_seg(jax.random.PRNGKey(0), cfg0)

    outs = {}
    for fused in (True, False):
        cfg = dataclasses.replace(cfg0, use_fused_knn=fused)
        logits, _ = jax.jit(
            lambda p, s, x, c: apply_dgcnn_seg(
                p, s, x, c, cfg=cfg, training=True, bn_decay=0.9,
                rng=jax.random.PRNGKey(3)),
        )(params, state, x, cat)
        outs[fused] = np.asarray(logits)
    # Near-tie kNN index flips (the two paths round distances differently
    # in bf16) change a small fraction of points discretely — same class
    # of difference as the documented fast-mode behavior. Require the bulk
    # of logits to agree tightly and the flipped fraction to stay small.
    scale = np.abs(outs[False]).max()
    close = np.abs(outs[True] - outs[False]) <= 5e-2 * scale
    assert close.mean() > 0.98, f"only {close.mean():.4f} of logits agree"
