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


def test_weighted_gather_matches_reference(rng):
    """knn_weighted_gather == exp(-topk_d/gamma)-weighted sum of gathered
    rows; w == the weights; gradient == the unfused formulation's
    (f32 end-to-end in interpret mode, so only f32 reassociation differs)."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_weighted_gather,
    )

    b, n, cf, k, gamma = 2, 200, 17, 10, 0.1
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((b, n, cf)), jnp.float32)

    idx, s, w = knn_weighted_gather(g, f0, k, gamma, 256, True)
    d = knn_ops.pairwise_sqdist(g)
    neg_vals, want_idx = jax.lax.top_k(-d, k)
    want_w = jnp.exp(-jnp.maximum(-neg_vals, 0.0) / gamma)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    # exp amplifies the distance-decomposition fp residue by 1/gamma
    np.testing.assert_allclose(np.asarray(w), np.asarray(want_w), rtol=1e-4)
    want_s = jnp.sum(
        want_w[..., None] * knn_ops.gather_neighbors(f0, want_idx), axis=2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-4)

    def loss(f):
        _, s, w = knn_weighted_gather(g, f, k, gamma, 256, True)
        return jnp.sum(jnp.sin(s)) + 0.5 * jnp.sum(jnp.square(s))

    def loss_ref(f):
        s = jnp.sum(
            want_w[..., None] * knn_ops.gather_neighbors(f, want_idx), axis=2)
        return jnp.sum(jnp.sin(s)) + 0.5 * jnp.sum(jnp.square(s))

    np.testing.assert_allclose(float(loss(f0)), float(loss_ref(f0)),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(f0)), np.asarray(jax.grad(loss_ref)(f0)),
        rtol=1e-4, atol=1e-4)


def test_weighted_gather_self_is_unit_weight(rng):
    """Each point's nearest neighbor is itself (d=0 -> w=exp(0)=1), matching
    the reference's self-included kNN (Util/SmoothConstraint.py:140-158)."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_weighted_gather,
    )

    b, n = 1, 64
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    idx, _, w = knn_weighted_gather(g, g, 4, 0.1, 256, True)
    np.testing.assert_array_equal(np.asarray(idx[..., 0]),
                                  np.arange(n)[None].repeat(b, 0))
    # self-distance carries ~1e-6 fp residue (reference exp(-D/gamma) too)
    np.testing.assert_allclose(np.asarray(w[..., 0]), 1.0, atol=1e-4)


def test_knn_edge_gather_matches_composition(rng):
    """knn_edge_gather == gather(v, knn(g)) + u (f32 interpret mode: only
    reassociation differs); moments == sums of y; gradient == the
    composition's."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_edge_gather

    b, n, co, k = 2, 200, 17, 8
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    u0 = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)

    idx, y, mom = knn_edge_gather(g, v0, u0, k, 256, True)
    want_idx = knn_ops.knn_graph(g, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_y = knn_ops.gather_neighbors(v0, want_idx) + u0[:, :, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mom[0]),
                               np.asarray(jnp.sum(want_y, axis=(0, 1, 2))),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mom[1]),
        np.asarray(jnp.sum(jnp.square(want_y), axis=(0, 1, 2))),
        rtol=1e-4, atol=1e-4)

    def loss(v, u):
        _, y, mom = knn_edge_gather(g, v, u, k, 256, True)
        return (jnp.sum(jnp.sin(y)) + jnp.sum(mom[0] * 0.5)
                + jnp.sum(jnp.sqrt(mom[1] + 1.0)))

    def loss_ref(v, u):
        y = knn_ops.gather_neighbors(v, want_idx) + u[:, :, None, :]
        return (jnp.sum(jnp.sin(y)) + jnp.sum(jnp.sum(y, (0, 1, 2)) * 0.5)
                + jnp.sum(jnp.sqrt(jnp.sum(jnp.square(y), (0, 1, 2)) + 1.0)))

    np.testing.assert_allclose(float(loss(v0, u0)), float(loss_ref(v0, u0)),
                               rtol=1e-5)
    gv, gu = jax.grad(loss, (0, 1))(v0, u0)
    rv, ru = jax.grad(loss_ref, (0, 1))(v0, u0)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(ru),
                               rtol=1e-4, atol=1e-5)


def test_knn_edge_gather_ragged_rows_moments(rng):
    """N not a tile multiple: padded rows must not contaminate moments."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_edge_gather

    b, n, co, k = 1, 37, 5, 4
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    idx, y, mom = knn_edge_gather(g, v, u, k, 16, True)
    want_idx = knn_ops.knn_graph(g, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_y = knn_ops.gather_neighbors(v, want_idx) + u[:, :, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mom[0]),
                               np.asarray(jnp.sum(want_y, (0, 1, 2))),
                               rtol=1e-4, atol=1e-4)


def test_fused_edge_conv_layer_matches_straight(rng):
    """apply_edge_conv_knn_fused == apply_edge_conv(gather) in f32
    interpret mode: outputs, BN state update, and parameter grads."""
    from weaksuppointcloudseg_tpu.models import layers

    b, n, c, co, k = 2, 96, 6, 10, 5
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    params, state = layers.init_conv(jax.random.PRNGKey(0), 2 * c, co)

    def fused(params):
        h, st = layers.apply_edge_conv_knn_fused(
            params, state, f, g, k, training=True, bn_decay=0.9,
            interpret=True)
        return h, st

    def straight(params):
        nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
        return layers.apply_edge_conv(params, state, f, nbr,
                                      training=True, bn_decay=0.9)

    hf, stf = fused(params)
    hs, sts = straight(params)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hs),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stf["mean"]),
                               np.asarray(sts["mean"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stf["var"]),
                               np.asarray(sts["var"]), rtol=1e-3, atol=1e-6)

    gf = jax.grad(lambda p: jnp.sum(jnp.square(fused(p)[0])))(params)
    gs = jax.grad(lambda p: jnp.sum(jnp.square(straight(p)[0])))(params)
    # db is analytically ~0 (BN absorbs the bias): both sides are fp noise
    # there, so judge atol against the overall gradient scale
    gscale = max(float(np.abs(np.asarray(gs[key])).max()) for key in gs)
    for key in gf:
        np.testing.assert_allclose(
            np.asarray(gf[key]), np.asarray(gs[key]), rtol=1e-3,
            atol=1e-3 * gscale, err_msg=f"grad mismatch for {key}")

    # input-feature gradient through the hand-written VJP
    dff = jax.grad(lambda f_: jnp.sum(jnp.square(layers.apply_edge_conv_knn_fused(
        params, state, f_, g, k, training=True, bn_decay=0.9,
        interpret=True)[0])))(f)
    dfs = jax.grad(lambda f_: jnp.sum(jnp.square(layers.apply_edge_conv(
        params, state, f_,
        knn_ops.gather_neighbors(f_, knn_ops.knn_graph(g, k)),
        training=True, bn_decay=0.9)[0])))(f)
    np.testing.assert_allclose(np.asarray(dff), np.asarray(dfs),
                               rtol=1e-3, atol=1e-4)


def test_knockout_free_fast_selection_identical(monkeypatch, rng):
    """The knockout-free fast selection (masked min over the unchanged
    packed tile — valid because packed values are strictly unique) must
    produce bit-identical outputs to the knockout formulation."""
    import weaksuppointcloudseg_tpu.ops.edgeconv_pallas as ep

    B, N, K, CG, CO = 2, 192, 8, 16, 24
    g = jnp.asarray(rng.standard_normal((B, N, CG)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, CO)), jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((B, N, CO)), jnp.bfloat16)

    base = ep._knn_edge_impl(g, v, u, K, 64, True, True, with_minmax=True)
    monkeypatch.setattr(ep, "KNOCKOUT_FREE_FAST", True)
    ep._knn_edge_impl.clear_cache()
    try:
        new = ep._knn_edge_impl(g, v, u, K, 64, True, True, with_minmax=True)
        for i, (a, b) in enumerate(zip(base, new)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"output {i}")
    finally:
        ep._knn_edge_impl.clear_cache()


def test_knockout_free_fast_knn_identical(monkeypatch, rng):
    import weaksuppointcloudseg_tpu.ops.knn_pallas as kp

    x = jnp.asarray(rng.standard_normal((2, 200, 3)), jnp.float32)
    base = kp.knn_pallas(x, 8, fast=True, interpret=True, with_values=True)
    monkeypatch.setattr(kp, "KNOCKOUT_FREE_FAST", True)
    kp.knn_pallas.clear_cache()
    try:
        new = kp.knn_pallas(x, 8, fast=True, interpret=True,
                            with_values=True)
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(new[1]))
    finally:
        kp.knn_pallas.clear_cache()


def test_weighted_gather_pre_matches_reference(rng):
    """weighted_gather_pre (gather-only half of knn_weighted_gather, from a
    precomputed graph) == weighted sum of gathered rows, value + VJP."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        weighted_gather_pre,
    )

    b, n, cf, k, gamma = 2, 200, 17, 10, 0.1
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((b, n, cf)), jnp.float32)
    d = knn_ops.pairwise_sqdist(g)
    neg_vals, idx = jax.lax.top_k(-d, k)
    w = jnp.exp(-jnp.maximum(-neg_vals, 0.0) / gamma)

    s = weighted_gather_pre(idx, w, f0, 256, True)
    want_s = jnp.sum(
        w[..., None] * knn_ops.gather_neighbors(f0, idx), axis=2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        s = weighted_gather_pre(idx, w, f, 256, True)
        return jnp.sum(jnp.sin(s)) + 0.5 * jnp.sum(jnp.square(s))

    def loss_ref(f):
        s = jnp.sum(
            w[..., None] * knn_ops.gather_neighbors(f, idx), axis=2)
        return jnp.sum(jnp.sin(s)) + 0.5 * jnp.sum(jnp.square(s))

    np.testing.assert_allclose(float(loss(f0)), float(loss_ref(f0)),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(f0)), np.asarray(jax.grad(loss_ref)(f0)),
        rtol=1e-4, atol=1e-4)


def test_weighted_gather_pre_equals_fused_on_same_graph(rng):
    """Feeding knn_weighted_gather's own (idx, w) into weighted_gather_pre
    reproduces its aggregate exactly — the graph-reuse path of the
    smoothness loss (losses/weaksup.py graph=...) is the same computation
    with the selection skipped."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        knn_weighted_gather,
        weighted_gather_pre,
    )

    b, n, cf, k, gamma = 2, 160, 9, 8, 0.1
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, cf)), jnp.float32)
    idx, s_fused, w = knn_weighted_gather(g, f, k, gamma, 256, True)
    s_pre = weighted_gather_pre(idx, w, f, 256, True)
    np.testing.assert_allclose(np.asarray(s_pre), np.asarray(s_fused),
                               rtol=1e-6, atol=1e-6)


def test_knn_edge_pre_matches_selecting(rng):
    """knn_edge_gather_pre fed the selecting kernel's own indices
    reproduces y / moments / minmax bit-for-bit (incl. pad rows at a
    non-tile-multiple N), and its VJP matches the take_along_axis
    composition — the static-graph mode's reused-stage kernel."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_impl,
        _knn_edge_pre_impl,
        knn_edge_gather_pre,
    )

    b, n, k, cg, co = 2, 96, 5, 8, 16
    g = jnp.asarray(rng.standard_normal((b, n, cg)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)

    idx, y, mom = _knn_edge_impl(g, v, u, k, 32, True, False)
    y2, mom2 = _knn_edge_pre_impl(idx, v, u, k, 32, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(mom), np.asarray(mom2), rtol=1e-6)

    outs = _knn_edge_impl(g, v, u, k, 32, True, False, with_minmax=True)
    pre = _knn_edge_pre_impl(outs[0], v, u, k, 32, True, with_minmax=True)
    for got, want in zip(pre[2:], outs[3:7]):  # ymax, amax, ymin, amin
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    w = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)

    def loss_pre(v, u):
        yy, mm = knn_edge_gather_pre(idx, v, u, k, 32, True)
        return jnp.sum(yy * w) + jnp.sum(mm)

    def loss_ref(v, u):
        bidx = jnp.arange(b)[:, None, None]
        yy = v[bidx, idx] + u[:, :, None, :]
        mm = jnp.stack([jnp.sum(yy, (0, 1, 2)), jnp.sum(yy ** 2, (0, 1, 2))])
        return jnp.sum(yy * w) + jnp.sum(mm)

    np.testing.assert_allclose(
        float(loss_pre(v, u)), float(loss_ref(v, u)), rtol=1e-5)
    gv, gu = jax.grad(loss_pre, (0, 1))(v, u)
    gv_r, gu_r = jax.grad(loss_ref, (0, 1))(v, u)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_r),
                               rtol=1e-4, atol=1e-4)


def test_knn_edge_n_valid_prepadded_matches_unpadded(rng):
    """Pre-padded inputs + n_valid (the eval pad-once fast path,
    docs/kernels.md round 4) reproduce the unpadded call bit-for-bit on
    the real rows: the kernel's column mask must treat explicit padding
    exactly like its own internal padding."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    b, n, k, cg, co = 2, 90, 5, 8, 16
    n_pad = 128  # the internal pad target at row_tile=32 x tiles 2
    g = jnp.asarray(rng.standard_normal((b, n, cg)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
    up = jnp.pad(u, ((0, 0), (0, n_pad - n), (0, 0)))

    for fast in (False, True):
        idx, y, _ = _knn_edge_impl(g, v, u, k, 32, True, fast)
        idx_p, y_p, _ = _knn_edge_impl(gp, vp, up, k, 32, True, fast,
                                       n_valid=n)
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.asarray(idx_p)[:, :n])
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(y_p)[:, :n])

    outs = _knn_edge_impl(g, v, u, k, 32, True, True, with_minmax=True,
                          with_values=True)
    outs_p = _knn_edge_impl(gp, vp, up, k, 32, True, True, with_minmax=True,
                            with_values=True, n_valid=n)
    for got, want in zip(outs_p[3:7], outs[3:7]):  # ymax, amax, ymin, amin
        np.testing.assert_array_equal(np.asarray(got)[:, :n],
                                      np.asarray(want))
    np.testing.assert_array_equal(np.asarray(outs_p[-1])[:, :n],
                                  np.asarray(outs[-1]))


def test_auto_row_tile_thresholds():
    """Shape-tuned tile selection (docs/kernels.md round-4 sweeps): 256 at
    the ShapeNet train width, 128 once the candidate width reaches the
    eval/S3DIS regime. layers.py routes every selection-kernel call
    through this (models/layers.py::_auto_rt)."""
    from weaksuppointcloudseg_tpu.models.layers import _auto_rt
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import auto_row_tile

    assert auto_row_tile(64) == 256
    assert auto_row_tile(2048) == 256
    assert auto_row_tile(3000) == 128
    assert auto_row_tile(3072) == 128
    assert auto_row_tile(4096) == 128
    assert _auto_rt(2048) == 256 and _auto_rt(4096) == 128


def test_knn_edge_row_tile_invariance_interpret():
    """rt=128 and rt=256 must produce identical selections/outputs — the
    auto_row_tile switch may only change performance, never results."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    rng = np.random.default_rng(7)
    b, n, cg, co, k = 2, 96, 8, 16, 5
    g = jnp.asarray(rng.standard_normal((b, n, cg)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, n, co)), jnp.float32)
    for fast in (False, True):
        ref = _knn_edge_impl(g, v, u, k, 256, True, fast, with_minmax=True)
        got = _knn_edge_impl(g, v, u, k, 128, True, fast, with_minmax=True)
        for a, bb in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_eval_pad_multiple_covers_selection_step():
    """The eval pad-once fast path (train/steps.py::make_eval_logits_fn)
    pads N to a multiple of eval_pad_multiple() so no fused kernel
    re-pads internally. That holds iff the selection kernels' row step at
    the padded width — row_tile * tiles_per_step = 2 * auto_row_tile(n) —
    divides the pad multiple, in BOTH auto_row_tile regimes."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        auto_row_tile, eval_pad_multiple)

    mult = eval_pad_multiple()
    assert mult % 8 == 0  # sublane alignment
    for n in (256, 2048, 2560, 3000, 3072, 4096, 131072):
        n_aligned = -(-n // mult) * mult
        step = 2 * auto_row_tile(n_aligned)
        assert mult % step == 0, (n, n_aligned, step, mult)
