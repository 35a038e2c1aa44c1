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


def test_scatter_odd_n_tile_alignment_on_device():
    """Regression: at N=3000 (the ShapeNet test shape — n_pad=3072) the
    VMEM-budget row-tile clamp produced tm=341, not a multiple of 8, and
    Pallas refused to lower the block shape. Both scatters must compile
    at a non-128-multiple N and match XLA."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_add_pallas,
        scatter_add_weighted_pallas,
    )

    rng = np.random.default_rng(3)
    b, n, k, c = 2, 3000, 10, 56
    idx = jax.device_put(rng.integers(0, n, (b, n, k)).astype(np.int32))
    bidx = jnp.arange(b)[:, None, None]

    ct4 = jax.device_put(
        rng.standard_normal((b, n, k, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    got = np.asarray(scatter_add_pallas(idx, ct4, n).astype(jnp.float32))
    want = np.asarray(jnp.zeros((b, n, c), jnp.float32).at[bidx, idx].add(
        ct4.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())

    w = jax.device_put(rng.uniform(0.1, 1.0, (b, n, k)).astype(np.float32))
    ct = jax.device_put(rng.standard_normal((b, n, c)).astype(np.float32))
    got_w = np.asarray(scatter_add_weighted_pallas(idx, w, ct, n))
    want_w = np.asarray(jnp.zeros((b, n, c), jnp.float32).at[bidx, idx].add(
        w[..., None] * ct[:, :, None, :]))
    np.testing.assert_allclose(got_w, want_w, atol=5e-3 * np.abs(want_w).max())

    # the forward gather had the same unaligned clamp (tile_flat=682)
    from weaksuppointcloudseg_tpu.ops.gather_pallas import gather_rows_pallas

    fsrc = jax.device_put(
        rng.standard_normal((b, n, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    got_g = np.asarray(gather_rows_pallas(fsrc, idx), np.float32)
    want_g = np.asarray(fsrc, np.float32)[
        np.arange(b)[:, None, None], np.asarray(idx)]
    np.testing.assert_allclose(got_g, want_g, atol=0)  # 0/1 one-hot: exact


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
        # the straight bf16 arm's FORWARD values are correct (only its
        # gradients miscompile) — override the hard error to compare logits
        cfg = dataclasses.replace(cfg0, use_fused_knn=fused,
                                  allow_known_bad_bf16=not fused)
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


def test_model_fused_eval_matches_straight_on_device():
    """Eval forward (population BN stats): the fused inference path — now
    the conv_zmax/conv_znmax eval-only kernels (BN folded in, single
    extremum) — vs the straight XLA path, same weights. Negative-gamma
    channels and random population stats exercise the min-extremum fold."""
    import dataclasses
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.models.dgcnn import (
        init_dgcnn_seg, apply_dgcnn_seg)
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg0 = configs.shapenet_config().model
    cfg0 = dataclasses.replace(cfg0, compute_dtype="bfloat16", num_points=512)
    rng = np.random.default_rng(13)
    x = jax.device_put(rng.standard_normal((2, 512, 3)).astype(np.float32))
    cat = jax.device_put(
        onehot_encode(rng.integers(0, cfg0.num_categories, (2,)),
                      cfg0.num_categories))
    params, state = init_dgcnn_seg(jax.random.PRNGKey(0), cfg0)
    # flip a third of every gamma negative + randomize population stats so
    # sign(s) varies per channel
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (
            p * np.where(np.arange(p.shape[-1]) % 3 == 0, -1.0, 1.0)
            if path[-1].key == "gamma" else p),
        params)
    state = jax.tree_util.tree_map_with_path(
        lambda path, s: (
            jnp.asarray(rng.uniform(0.5, 2.0, s.shape), s.dtype)
            if path[-1].key == "var"
            else jnp.asarray(rng.standard_normal(s.shape) * 0.1, s.dtype)),
        state)

    outs = {}
    for fused in (True, False):
        cfg = dataclasses.replace(cfg0, use_fused_knn=fused)
        logits, _ = jax.jit(
            lambda p, s, x, c: apply_dgcnn_seg(
                p, s, x, c, cfg=cfg, training=False, bn_decay=None,
                rng=jax.random.PRNGKey(3)),
        )(params, state, x, cat)
        outs[fused] = np.asarray(logits)
    scale = np.abs(outs[False]).max()
    close = np.abs(outs[True] - outs[False]) <= 5e-2 * scale
    assert close.mean() > 0.98, f"only {close.mean():.4f} of logits agree"


def test_conv_minmax_on_device(data):
    """Compiled minmax kernel == XLA conv + k-extrema (bf16 bit-exact)."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_minmax_pallas,
    )

    rng = np.random.default_rng(5)
    h1 = jax.device_put(
        rng.standard_normal((B, 256, K, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2 = jax.device_put(
        (rng.standard_normal((C, C)) * 0.2).astype(np.float32)
    ).astype(jnp.bfloat16)
    b2 = jax.device_put(rng.standard_normal((C,)).astype(np.float32))
    ymax, amax, ymin, amin, mom = conv_minmax_pallas(h1, w2, b2)
    y = jnp.einsum("bnki,io->bnko", h1, w2,
                   preferred_element_type=jnp.float32) + b2
    y = y.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(ymax),
                                  np.asarray(jnp.max(y, axis=2)))
    np.testing.assert_array_equal(np.asarray(ymin),
                                  np.asarray(jnp.min(y, axis=2)))
    np.testing.assert_array_equal(np.asarray(amax),
                                  np.asarray(jnp.argmax(y, axis=2)))
    y32 = y.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mom),
        np.asarray(jnp.stack([jnp.sum(y32, axis=(0, 1, 2)),
                              jnp.sum(jnp.square(y32), axis=(0, 1, 2))])),
        rtol=1e-4)


def test_scatter_bn_bwd_on_device(data):
    """Fold-in scatter (dense + sparse modes) vs materialized dy math."""
    from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
        scatter_bn_bwd_pallas,
    )

    rng = np.random.default_rng(6)
    P = 256
    idx = jax.device_put(rng.integers(0, N, (B, P, K)).astype(np.int32))
    y = jax.device_put(
        rng.standard_normal((B, P, K, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sv = jax.device_put(rng.standard_normal((C,)).astype(np.float32))
    al = jax.device_put((rng.standard_normal((C,)) * .1).astype(np.float32))
    be = jax.device_put((rng.standard_normal((C,)) * .1).astype(np.float32))
    bidx = jnp.arange(B)[:, None, None]

    dz = jax.device_put(
        rng.standard_normal((B, P, K, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dv, du = scatter_bn_bwd_pallas(idx, y, dz, sv, al, be, N)
    dy = (sv * dz.astype(jnp.float32) + al + be * y.astype(jnp.float32))
    # du accumulates the f32 dy; dv's matmul rounds dy to bf16 operands
    # first — the same rounding the materialize-then-scatter path applies
    np.testing.assert_allclose(np.asarray(du),
                               np.asarray(jnp.sum(dy, axis=2)),
                               rtol=2e-2, atol=2e-2)
    dyb = dy.astype(jnp.bfloat16).astype(jnp.float32)
    want = jnp.zeros((B, N, C)).at[bidx, idx].add(dyb)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    q = jax.device_put(rng.standard_normal((B, P, C)).astype(np.float32))
    asel = jax.device_put(rng.integers(0, K, (B, P, C)).astype(np.int32))
    dv, du = scatter_bn_bwd_pallas(idx, y, (q, asel), sv, al, be, N)
    onek = asel[:, :, None, :] == jnp.arange(K)[None, None, :, None]
    dy = onek * q[:, :, None, :] + al + be * y.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(du),
                               np.asarray(jnp.sum(dy, axis=2)),
                               rtol=2e-2, atol=2e-2)
    dyb = dy.astype(jnp.bfloat16).astype(jnp.float32)
    want = jnp.zeros((B, N, C)).at[bidx, idx].add(dyb)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_stage_grads_match_straight_on_device():
    """Merged-stage custom VJP vs autodiff of the straight path on the
    chip (bf16): gradients of all stage params within bf16 tolerance."""
    from weaksuppointcloudseg_tpu.models import layers
    from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops

    rng = np.random.default_rng(9)
    b, n, k, c, c2 = 2, 256, 8, 16, 32
    f = jax.device_put(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # f32 graph coords: both paths must select the SAME neighbors, else
    # discrete index flips (not kernel error) dominate the gradient diff
    g = jax.device_put(rng.standard_normal((b, n, 3)).astype(np.float32))

    def mk(ci, co, seed):
        r = np.random.default_rng(seed)
        gam = r.standard_normal((co,)) * 0.3 + 1.0
        gam = np.where(np.arange(co) % 3 == 0, -gam, gam)
        return {
            "w": jax.device_put(
                (r.standard_normal((ci, co)) * 0.3).astype(np.float32)),
            "b": jax.device_put(
                (r.standard_normal((co,)) * 0.1).astype(np.float32)),
            "gamma": jax.device_put(gam.astype(np.float32)),
            "beta": jax.device_put(
                (r.standard_normal((co,)) * 0.1).astype(np.float32)),
        }

    p1, p2 = mk(2 * c, c2, 1), mk(c2, c2, 2)
    st = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    R = jax.device_put(rng.standard_normal((b, n, c2)).astype(np.float32))
    kw = dict(training=True, bn_decay=0.9)

    def fused(p1, p2, f):
        out, _, _ = layers.apply_edge_conv_stage_fused(
            p1, st, p2, st, f, g, k, **kw)
        return jnp.sum(out.astype(jnp.float32) * R)

    g_host, R_host = np.asarray(g), np.asarray(R)

    def straight(p1, p2, f):
        # pure-jnp reference (no backend-dispatched custom VJPs: the
        # gather/scatter helpers pick Pallas kernels by default_backend(),
        # which stays "axon" even when lowering for the host CPU)
        idx = knn_ops.knn(knn_ops.pairwise_sqdist(jnp.asarray(g_host)), k)
        nbr = jax.vmap(lambda fb, ib: fb[ib])(f, idx)
        h1, _ = layers.apply_edge_conv(p1, st, f, nbr, **kw)
        y, _ = layers.apply_conv(p2, st, h1, **kw)
        return jnp.sum(jnp.max(y, axis=2).astype(jnp.float32)
                       * jnp.asarray(R_host))

    v_f, g_f = jax.jit(jax.value_and_grad(fused, argnums=(0, 1)))(p1, p2, f)
    # Reference grads on the HOST CPU backend: the straight bf16
    # conv+BN+k-max composition MISCOMPILES on this TPU backend (its
    # compiled gradients are identically zero — see docs/kernels.md
    # "bf16 conv+BN+reduce-max(axis=2) zero-gradient miscompile"); the
    # CPU lowering is correct and serves as the golden.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        put = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), cpu), t)
        v_u, g_u = jax.jit(jax.value_and_grad(straight, argnums=(0, 1)))(
            put(p1), put(p2), put(f))
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=2e-2)
    # Elementwise bf16 noise compounds differently through the on-chip
    # scatter sums than through the exact CPU lowering; the meaningful
    # check is that each parameter's gradient VECTOR agrees in direction
    # and magnitude. (The b gradients are ~0 by BN shift-invariance.)
    for gi, (gf, gu) in enumerate(zip(g_f, g_u)):
        for name in ("w", "gamma", "beta"):
            a = np.asarray(gf[name], np.float64).ravel()
            bb = np.asarray(gu[name], np.float64).ravel()
            cos = float(a @ bb / (np.linalg.norm(a) * np.linalg.norm(bb)
                                  + 1e-12))
            ratio = float(np.linalg.norm(a)
                          / (np.linalg.norm(bb) + 1e-12))
            assert cos > 0.98, f"p{gi+1}.{name}: cos={cos:.4f}"
            assert 0.8 < ratio < 1.25, \
                f"p{gi+1}.{name}: norm ratio={ratio:.3f}"


def test_conv_kmax_bwd_on_device(data):
    """Compiled one-pass stage backward (Gram accumulators + dz1 + BN1
    reduces, BN-fold mode) vs the einsum math, on the chip."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_kmax_bwd_pallas,
    )

    rng = np.random.default_rng(7)
    P, C2 = 256, C
    y1 = jax.device_put(
        rng.standard_normal((B, P, K, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q = jax.device_put(rng.standard_normal((B, P, C2)).astype(np.float32))
    asel = jax.device_put(rng.integers(0, K, (B, P, C2)).astype(np.int32))
    w2t = jax.device_put(
        (rng.standard_normal((C2, C)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    m = jax.device_put(
        (rng.standard_normal((C, C)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    row0 = jax.device_put(
        (rng.standard_normal((C,)) * 0.1).astype(np.float32))
    sc = jax.device_put(rng.standard_normal((C,)).astype(np.float32))
    sh = jax.device_put((rng.standard_normal((C,)) * .2).astype(np.float32))
    mean = jax.device_put(
        (rng.standard_normal((C,)) * .1).astype(np.float32))
    inv = jax.device_put(
        rng.uniform(0.5, 1.5, (C,)).astype(np.float32))

    dz1, tsp, g, s1, ab = conv_kmax_bwd_pallas(
        y1, q, asel, w2t, m, row0, sc, sh, mean, inv)

    y32 = y1.astype(jnp.float32)
    h = jax.nn.relu(y32 * sc + sh).astype(jnp.bfloat16)
    onek = asel[:, :, None, :] == jnp.arange(K)[None, None, :, None]
    Dq = (onek * q[:, :, None, :]).astype(jnp.bfloat16)
    ref_tsp = jnp.einsum("bnji,bnjc->ic", h, Dq,
                         preferred_element_type=jnp.float32)
    ref_g = jnp.einsum("bnji,bnjl->il", h, h,
                       preferred_element_type=jnp.float32)
    ref_s1 = jnp.sum(h.astype(jnp.float32), axis=(0, 1, 2))
    dh = (jnp.einsum("bnjc,ci->bnji", Dq, w2t,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bnji,il->bnjl", h, m,
                       preferred_element_type=jnp.float32) + row0)
    ref_dz1 = jnp.where(h.astype(jnp.float32) > 0, dh, 0.0)
    ref_a1 = jnp.sum(ref_dz1, axis=(0, 1, 2))
    xhat = (y32 - mean) * inv
    ref_a2 = jnp.sum(ref_dz1 * xhat, axis=(0, 1, 2))

    def close(a, b, tol):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=tol)

    close(tsp, ref_tsp, 5e-3)
    close(g, ref_g, 5e-3)
    close(s1, ref_s1, 5e-3)
    close(ab[0], ref_a1, 5e-3)
    close(ab[1], ref_a2, 5e-3)
    close(dz1, ref_dz1.astype(jnp.bfloat16), 5e-2)


def test_conv_nmax_on_device(data):
    """Compiled N-max kernels: cross-tile extrema/arg merge and the
    recompute-y backward on real Mosaic."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_nmax_bwd_pallas,
        conv_nmax_pallas,
    )

    rng = np.random.default_rng(8)
    C1, C2 = 192, 256
    h = jax.device_put(
        rng.standard_normal((B, N, C1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jax.device_put(
        (rng.standard_normal((C1, C2)) * 0.1).astype(np.float32))
    bias = jax.device_put(
        (rng.standard_normal((C2,)) * 0.1).astype(np.float32))
    ymax, amax, ymin, amin, mom = conv_nmax_pallas(
        h, w.astype(jnp.bfloat16), bias)
    y = jnp.einsum("bni,io->bno", h, w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + bias
    y = y.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ymax),
                               np.asarray(jnp.max(y, axis=1)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ymin),
                               np.asarray(jnp.min(y, axis=1)), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(amax),
                                  np.asarray(jnp.argmax(y, axis=1)))
    np.testing.assert_allclose(
        np.asarray(mom),
        np.asarray(jnp.stack([jnp.sum(y, axis=(0, 1)),
                              jnp.sum(jnp.square(y), axis=(0, 1))])),
        rtol=5e-3, atol=1.0)

    q = jax.device_put(rng.standard_normal((B, C2)).astype(np.float32))
    al = jax.device_put((rng.standard_normal((C2,)) * .1).astype(np.float32))
    be = jax.device_put((rng.standard_normal((C2,)) * .1).astype(np.float32))
    dh, dw, db = conv_nmax_bwd_pallas(
        h, q, amax, w.astype(jnp.bfloat16), bias, al, be)
    onen = amax[:, None, :] == jnp.arange(N)[None, :, None]
    dy = onen * q[:, None, :] + al + be * y
    dyc = dy.astype(jnp.bfloat16)

    def close(a, bb, tol):
        a, bb = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        scale = max(np.abs(bb).max(), 1e-3)
        np.testing.assert_allclose(a / scale, bb / scale, atol=tol)

    close(dh, jnp.einsum("bno,io->bni", dyc, w.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32), 2e-2)
    close(dw, jnp.einsum("bni,bno->io", h, dyc,
                         preferred_element_type=jnp.float32), 2e-2)
    close(db, jnp.sum(dy, axis=(0, 1)), 2e-2)


from weaksuppointcloudseg_tpu.utils.synth_convergence import (  # noqa: E402
    shapenet_train_and_eval_miou as _train_and_eval_miou,
)


def test_fast_config_convergence_matches_parity_on_device():
    """Seeded regression for the recommended fast config's ACCURACY claim:
    bf16 + fused kernels + packed-min selection must converge to the same
    val mIoU band as the f32 parity path on the learnable synthetic set.
    Catches a future kernel change that silently degrades training.

    Runs the round-5 reconditioned recipe (docs/kernels.md round 5):
    pinned verified-learnable draw (data_seed=0, so the comparison
    measures kernel effects, not dataset difficulty), 96-shape val set.
    Tolerance calibrated from the round-5 decoupled 5-seed A/B
    (scripts/convergence_ab.py, /tmp/ab_r5b.json): fast 0.688 +- 0.036,
    parity 0.695 +- 0.034, every seed converged, so a single
    fast-vs-parity pair has sd sqrt(.036^2+.034^2) ~= 0.050 and
    0.11 ~= |mean diff 0.007| + 2 sd (was 0.18 under the round-4
    coupled recipe whose hard draws half-converged every config).
    A broken kernel lands at chance mIoU ~0.2, a ~0.5 drop."""
    miou_fast = _train_and_eval_miou("bfloat16", True, data_seed=0)
    miou_parity = _train_and_eval_miou("float32", False, data_seed=0)
    # both must actually learn (chance mIoU on 3 parts ~ 0.2), and the
    # fast config must be within the measured run-to-run band of parity
    assert miou_parity > 0.5, f"parity path failed to learn: {miou_parity}"
    assert miou_fast > 0.5, f"fast path failed to learn: {miou_fast}"
    assert miou_fast > miou_parity - 0.11, (
        f"fast config degraded: {miou_fast:.3f} vs parity "
        f"{miou_parity:.3f}")



def test_s3dis_fast_config_convergence_on_device(tmp_path):
    """Seeded accuracy regression for the S3DIS flagship fast config
    (bf16 + fused kernels + packed-min selection, Full style, the second
    dataset's recommended production config): the trainer must converge
    on the learnable synthetic block set (data/s3dis.py::write_synthetic,
    z-correlated labels). Round-4 A/B over seeds 0-4: mean 0.517 val
    mIoU, sd 0.029, min 0.484 (docs/kernels.md "Round 4"); the 0.35 bar
    sits ~5 sd below the mean yet far above chance (~1/13)."""
    from weaksuppointcloudseg_tpu.utils.synth_convergence import (
        s3dis_train_and_eval_miou,
    )

    miou, acc = s3dis_train_and_eval_miou(
        "bfloat16", True, seed=0, epochs=24, data_dir=str(tmp_path / "s3c"))
    assert miou > 0.35, f"S3DIS fast config failed to converge: mIoU {miou}"
    assert acc > 0.5, f"S3DIS fast config low val acc: {acc}"


def test_cls_fused_path_on_device():
    """bf16 classifier fused path: logits match the f32 straight path and
    gradients are NONZERO for the first stage's weights (the straight bf16
    composition miscompiles those to zero — docs/kernels.md)."""
    from weaksuppointcloudseg_tpu.models.dgcnn_cls import (
        ClsConfig,
        apply_dgcnn_cls,
        classification_loss,
        init_dgcnn_cls,
    )

    rng = np.random.default_rng(0)
    cfg = ClsConfig(num_classes=8, edge_channels=(32, 32), fc_channels=(64,),
                    global_channels=128, knn_fast=True)
    params, state = init_dgcnn_cls(jax.random.PRNGKey(0), cfg)
    # the transform net's output layer is zero-init (identity transform),
    # which makes every upstream transform-net gradient legitimately zero;
    # perturb it so a nonzero-grad assertion is meaningful
    params["transform_net"]["transform_out"]["w"] = (
        0.01 * jax.random.normal(jax.random.PRNGKey(1), (256, 9)))
    x32 = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, (2,)), jnp.int32)

    logits_f32, _ = apply_dgcnn_cls(params, state, x32, cfg=cfg,
                                    training=False, bn_decay=None)
    logits_b16, _ = apply_dgcnn_cls(params, state, x32.astype(jnp.bfloat16),
                                    cfg=cfg, training=False, bn_decay=None)
    np.testing.assert_allclose(
        np.asarray(logits_b16, np.float32), np.asarray(logits_f32), atol=0.15)

    def loss_fn(p):
        lg, _ = apply_dgcnn_cls(p, state, x32.astype(jnp.bfloat16), cfg=cfg,
                                training=True, bn_decay=0.9,
                                rng=jax.random.PRNGKey(2))
        return classification_loss(lg.astype(jnp.float32), labels)

    grads = jax.jit(jax.grad(loss_fn))(params)
    g1 = np.asarray(grads["dgcnn1"]["w"], np.float32)
    gt = np.asarray(grads["transform_net"]["tconv1"]["w"], np.float32)
    assert np.abs(g1).max() > 0, "first-stage grads are zero (miscompile?)"
    assert np.abs(gt).max() > 0, "transform-net grads are zero (miscompile?)"


def test_smooth_f32_grad_no_worker_crash():
    """Regression for a backend fault: the f32 (non-fused) smooth loss's
    gradient at EXACTLY B=16, N=1024, K=12 crashed the TPU worker when its
    neighbor gather backward ran through the Pallas one-hot scatter in the
    same module as the knn_pallas custom call (B=8 / K=50 / N=2048 were all
    fine — an axon miscompile). The loss now gathers via take_along_axis
    so XLA owns the gather/scatter pair; this pins the crashing shape."""
    from weaksuppointcloudseg_tpu.losses import weaksup

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((16, 1024, 12)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 1024, 3)), jnp.float32)
    g = jax.jit(jax.grad(lambda l: weaksup.smooth_knn_laplacian(
        jax.nn.softmax(l, -1), x, gamma=0.1, k=10, fused_bf16=False)))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_smooth_graph_reuse_matches_standalone_on_device(monkeypatch):
    """The Full-style step's smoothness loss computed from the REUSED
    transform-stage kNN graph (models/dgcnn.py want_smooth_graph ->
    losses/weaksup.py graph=...) matches the standalone
    knn_weighted_gather path within bf16 rounding of the coordinates
    (the stage builds distances on bf16-cast xyz; the standalone kernel
    on f32), and every other loss component is bit-identical."""
    import dataclasses
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train import steps as steps_mod
    from weaksuppointcloudseg_tpu.train.steps import make_train_step
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = configs.shapenet_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_points=512,
                                  compute_dtype="bfloat16", knn_fast=True),
        train=dataclasses.replace(cfg.train, batch_size=4, style="Full"),
    )
    assert steps_mod._smooth_graph_reusable(cfg)
    rng = np.random.default_rng(3)
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

    def run(reuse):
        if not reuse:
            monkeypatch.setattr(steps_mod, "_smooth_graph_reusable",
                                lambda c: False)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg)
        state, m1 = step(state, batch, np.float32(1.0),
                         jax.random.PRNGKey(1))
        state, m2 = step(state, batch, np.float32(1.0),
                         jax.random.PRNGKey(2))
        monkeypatch.undo()
        return ({k_: float(v) for k_, v in m1.items()},
                {k_: float(v) for k_, v in m2.items()})

    r1, r2 = run(True)
    b1, b2 = run(False)
    # step 1: identical params -> every non-smooth component bit-equal
    for name in ("seg", "siamese", "inexact", "acc"):
        assert r1[name] == b1[name], (name, r1[name], b1[name])
    np.testing.assert_allclose(r1["smooth"], b1["smooth"], rtol=2e-2)
    # step 2 params differ only through the tiny smooth-grad delta
    np.testing.assert_allclose(r2["total"], b2["total"], rtol=1e-3)


def test_knn_edge_pre_matches_selecting_on_device(data):
    """Compiled static-graph kernel (_knn_edge_pre_impl) fed the selecting
    kernel's own indices: y / moments / minmax bit-identical on the chip
    (the one-hot rebuild and the selection's winner masks drive the same
    MXU gathers). Microbench at the flagship shape (B=64, N=2048, k=20,
    C=64 bf16): 9.4 ms vs 11.9 selecting — the ~2.5 ms/stage the
    static-graph mode removes (docs/kernels.md round 3)."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_impl,
        _knn_edge_pre_impl,
    )

    k = 20
    g = data["fb16"]
    rng = np.random.default_rng(7)
    v = jax.device_put(
        rng.standard_normal((B, N, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    u = jax.device_put(
        rng.standard_normal((B, N, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    outs = _knn_edge_impl(g, v, u, k, 256, False, True, with_minmax=True)
    idx, y, mom = outs[0], outs[1], outs[2]
    pre = _knn_edge_pre_impl(idx, v, u, k, 256, False, with_minmax=True)
    np.testing.assert_array_equal(
        np.asarray(pre[0].astype(jnp.float32)),
        np.asarray(y.astype(jnp.float32)))
    np.testing.assert_allclose(np.asarray(pre[1]), np.asarray(mom),
                               rtol=1e-6)
    for got, want in zip(pre[2:], outs[3:7]):
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)))


def test_static_graph_convergence_on_device():
    """Seeded accuracy evidence for the opt-in static-graph turbo mode
    (ModelConfig.static_graph): bf16 + fast + static graph must LEARN on
    the learnable synthetic set (round-5 reconditioned recipe: pinned
    data_seed=0 draw, 96-shape val). Round-5 decoupled A/B over seeds
    0-4 (docs/kernels.md round 5): static 0.703 +- 0.071, static-fast
    difference +0.015 +- 0.044 — statistically indistinguishable on
    synthetic. It stays opt-in anyway: dynamic feature-space graphs are
    the reference's semantics (DGCNN's defining design, and its
    real-data ablation favors them), which a synthetic A/B cannot
    arbitrate. Step time 96.7 -> 89.3 ms on the v5e flagship."""
    miou = _train_and_eval_miou("bfloat16", True, static_graph=True,
                                data_seed=0)
    assert miou > 0.5, f"static-graph config failed to learn: {miou}"


def test_eval_prepadded_n_valid_matches_unpadded_on_device():
    """The eval pad-once fast path (make_eval_step pads N=unaligned ->
    512-multiple, forwards with n_valid) must match the fused eval
    forward at the original N.

    Tolerance, not bit-exact, and only because of the XLA seg head: a
    standalone replica of the full kernel sequence (every fused stage +
    znmax, all with n_valid) IS bit-identical across the two shapes on
    device — the n_valid column mask exactly reproduces the kernels'
    internal padding (that bit-exactness is pinned by the CPU interpret
    tests in test_edgeconv_pallas.py / test_conv_kmax_pallas.py). But
    the model's bf16 XLA head reruns the same per-point math with
    different roundings per compilation: two jits of the SAME unpadded
    graph already differ by ~6e-4 on axon, and the padded-shape
    compilation lands ~2e-3 away (~0.6% of logit scale) — measured
    round 4, docs/kernels.md. A real masking bug (a padded row winning a
    max, a neighbor leaking) moves logits at O(scale), far above this
    band."""
    import dataclasses
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.models.dgcnn import (
        init_dgcnn_seg, apply_dgcnn_seg)
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = dataclasses.replace(
        configs.shapenet_config().model, compute_dtype="bfloat16",
        num_points=520)
    rng = np.random.default_rng(7)
    n = 520
    x = jax.device_put(rng.standard_normal((2, n, 3)).astype(np.float32))
    cat = jax.device_put(
        onehot_encode(rng.integers(0, cfg.num_categories, (2,)),
                      cfg.num_categories))
    params, state = init_dgcnn_seg(jax.random.PRNGKey(0), cfg)

    def fwd(xx, n_valid=None):
        logits, _ = jax.jit(
            lambda p, s, xx: apply_dgcnn_seg(
                p, s, xx, cat, cfg=cfg, training=False, bn_decay=None,
                rng=jax.random.PRNGKey(3), n_valid=n_valid),
        )(params, state, xx)
        return np.asarray(logits)

    base = fwd(x)
    n_pad = -(-n // 512) * 512
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    padded = fwd(xp, n_valid=n)[:, :n]
    scale = float(np.abs(base).max())
    maxdiff = float(np.abs(base - padded).max())
    assert maxdiff <= 0.02 * scale, (
        f"pad-once eval diverged beyond recompilation noise: "
        f"maxdiff={maxdiff} at logit scale {scale}")
    agree = float((base.argmax(-1) == padded.argmax(-1)).mean())
    assert agree >= 0.98, f"argmax agreement {agree} < 0.98"


def test_lp_affinity_precision_on_device():
    """The label-propagation affinity Gram must run at f32 accuracy on
    device (round-5 precision bug): with JAX's DEFAULT TPU matmul
    precision (bf16 inputs) the d^2 error is ~1e-2 absolute, which
    exp(-1e3 d^2) amplifies to relative errors up to 3.2e2 on the
    significant affinity entries — the device W was noise. Pins
    pairwise_sqdist's Precision.HIGHEST (and the matfree/sharded sqd
    variants) against an f64 numpy oracle, scalar fetches only."""
    from weaksuppointcloudseg_tpu.propagate.laplacian import (
        product_kernel_weights,
    )

    rng = np.random.default_rng(0)
    # per-scale bounds: f32 itself rounds the exp argument by
    # ~eps_f32 * bandwidth * |x|^2 (measured 4.8e-4 at unit scale,
    # 3.0e-2 at 8 m — the reference's f32 GPU build has the same); the
    # BUG being pinned was 1.5e2/3.2e2.
    for scale, bound in ((1.0, 5e-3), (8.0, 1e-1)):
        xyz = (rng.uniform(0, 1, (1, 512, 3)) * scale).astype(np.float32)
        rgb = rng.uniform(0, 1, (1, 512, 3)).astype(np.float32)

        def sqd64(a):
            a64 = a.astype(np.float64)
            s = (a64 ** 2).sum(-1)
            return np.maximum(
                s[:, :, None] - 2 * np.einsum("bnc,bmc->bnm", a64, a64)
                + s[:, None, :], 0)

        w_ref = np.exp(-(sqd64(xyz) * 1e3 + sqd64(rgb) * 1e1)).astype(
            np.float32)
        w_dev = product_kernel_weights(jax.device_put(xyz),
                                       jax.device_put(rgb))

        @jax.jit
        def relerr_sig(w_dev, w_ref):
            err = jnp.abs(w_dev - w_ref)
            big = w_ref > 1e-3
            return jnp.max(jnp.where(big, err / jnp.maximum(w_ref, 1e-9),
                                     0.0))

        rel = float(relerr_sig(w_dev, jax.device_put(w_ref)))
        assert rel < bound, (
            f"significant-affinity rel error {rel:.2e} at coord scale "
            f"{scale} — the Gram is not running at f32 accuracy")


def test_matfree_matches_dense_affinity_on_device():
    """The matfree tile path (folded 6-channel Gram, transposed apply)
    must produce the same propagation as the dense factored path ON THE
    CHIP at a realistic coordinate scale."""
    from weaksuppointcloudseg_tpu.propagate.label_prop import (
        propagate_batch,
    )

    rng = np.random.default_rng(1)
    xyz = (rng.uniform(0, 4, (1, 1024, 3))).astype(np.float32)
    rgb = rng.uniform(0, 1, (1, 1024, 3)).astype(np.float32)
    logits = rng.standard_normal((1, 1024, 13)).astype(np.float32) * 4.0
    g = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    dense = propagate_batch(jax.device_put(xyz), jax.device_put(g),
                            jax.device_put(rgb), solver="cg")
    mf = propagate_batch(jax.device_put(xyz), jax.device_put(g),
                         jax.device_put(rgb), solver="cg_matfree")

    @jax.jit
    def stats(a, b):
        # the two paths build W with different (equally valid) f32
        # roundings — matfree centers the features before the Gram — so
        # y differs by ~1e-3 pointwise; argmax must agree wherever the
        # dense top-2 margin exceeds that noise floor (measured: the only
        # flips are ties with margin ~6.5e-4; see docs/kernels.md round 5)
        srt = jnp.sort(a, axis=-1)
        decided = (srt[..., -1] - srt[..., -2]) > 5e-3
        flips = (jnp.argmax(a, -1) != jnp.argmax(b, -1)) & decided
        return jnp.max(jnp.abs(a - b)), jnp.sum(flips)

    maxdiff, flips = stats(dense, mf)
    assert int(flips) == 0, int(flips)
    assert float(maxdiff) < 5e-3, float(maxdiff)
