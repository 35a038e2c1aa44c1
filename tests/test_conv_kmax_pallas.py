"""Fused conv+BN+relu+k-max minmax kernels (ops/conv_kmax_pallas.py) and
the stage-level custom VJP (models/layers.py) vs the straight XLA path,
interpret mode on CPU. Reference semantics: tf_util.py:115-173 conv2d ->
batch_norm_dist_template -> relu -> reduce_max over k
(DGCNN_ShapeNet.py:32-62)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.models import layers
from weaksuppointcloudseg_tpu.ops import neighbors as knn_ops
from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
    conv_kmax_bwd_pallas,
    conv_minmax_pallas,
)


def _mk_params(c_in, c_out, seed, neg_gamma=True):
    r = np.random.default_rng(seed)
    gamma = r.standard_normal((c_out,)) * 0.3 + 1.0
    if neg_gamma:
        # negative-scale channels exercise the min-extremum path
        gamma = np.where(np.arange(c_out) % 3 == 0, -gamma, gamma)
    return {
        "w": jnp.asarray(r.standard_normal((c_in, c_out)) * 0.3, jnp.float32),
        "b": jnp.asarray(r.standard_normal((c_out,)) * 0.1, jnp.float32),
        "gamma": jnp.asarray(gamma, jnp.float32),
        "beta": jnp.asarray(r.standard_normal((c_out,)) * 0.1, jnp.float32),
    }


@pytest.mark.parametrize(
    "b,n,k,c1,c2,dt",
    [
        (2, 40, 5, 12, 10, jnp.float32),
        (2, 64, 20, 64, 64, jnp.bfloat16),
        (1, 33, 4, 3, 8, jnp.float32),   # ragged N + channel padding
    ],
)
def test_minmax_forward_matches_reference(rng, b, n, k, c1, c2, dt):
    h1 = jnp.asarray(rng.standard_normal((b, n, k, c1)), dt)
    w2 = jnp.asarray(rng.standard_normal((c1, c2)) * 0.2, dt)
    b2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    ymax, amax, ymin, amin, mom = conv_minmax_pallas(
        h1, w2, b2, row_tile=16, interpret=True)
    y = jnp.einsum("bnki,io->bnko", h1, w2,
                   preferred_element_type=jnp.float32) + b2
    y = y.astype(dt)
    if dt == jnp.bfloat16:
        # bf16 rounding absorbs matmul reassociation: bit-exact
        assert jnp.array_equal(ymax, jnp.max(y, axis=2))
        assert jnp.array_equal(ymin, jnp.min(y, axis=2))
        assert jnp.array_equal(amax, jnp.argmax(y, axis=2))
        assert jnp.array_equal(amin, jnp.argmin(y, axis=2))
    else:
        np.testing.assert_allclose(ymax, jnp.max(y, axis=2), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ymin, jnp.min(y, axis=2), rtol=1e-5, atol=1e-6)
    y32 = y.astype(jnp.float32)
    np.testing.assert_allclose(
        mom,
        jnp.stack([jnp.sum(y32, axis=(0, 1, 2)),
                   jnp.sum(jnp.square(y32), axis=(0, 1, 2))]),
        rtol=2e-5)


def test_minmax_forward_bn_fold(rng):
    b, n, k, c1, c2 = 2, 40, 6, 12, 10
    y1 = jnp.asarray(rng.standard_normal((b, n, k, c1)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c1, c2)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c1,)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((c1,)) * 0.2, jnp.float32)
    ymax, _, ymin, _, _ = conv_minmax_pallas(
        y1, w2, b2, scale, shift, row_tile=16, interpret=True)
    h1 = jax.nn.relu(y1 * scale + shift)
    y = jnp.einsum("bnki,io->bnko", h1, w2,
                   preferred_element_type=jnp.float32) + b2
    np.testing.assert_allclose(ymax, jnp.max(y, axis=2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ymin, jnp.min(y, axis=2), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("b,n,k,c1,c2", [(2, 40, 5, 12, 10),
                                         (2, 70, 20, 64, 64)])
def test_bwd_kernel_matches_einsum_math(rng, b, n, k, c1, c2):
    h = jnp.asarray(rng.standard_normal((b, n, k, c1)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, n, c2)), jnp.float32)
    asel = jnp.asarray(rng.integers(0, k, (b, n, c2)), jnp.int32)
    w2t = jnp.asarray(rng.standard_normal((c2, c1)) * 0.3, jnp.float32)
    m = jnp.asarray(rng.standard_normal((c1, c1)) * 0.2, jnp.float32)
    row0 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    dh, tsp, g, s1, ab = conv_kmax_bwd_pallas(
        h, q, asel, w2t, m, row0, row_tile=16, interpret=True)
    onek = asel[:, :, None, :] == jnp.arange(k)[None, None, :, None]
    Dq = onek * q[:, :, None, :]
    np.testing.assert_allclose(tsp, jnp.einsum("bnji,bnjc->ic", h, Dq),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g, jnp.einsum("bnji,bnjl->il", h, h),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(s1, jnp.sum(h, axis=(0, 1, 2)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        dh,
        jnp.einsum("bnjc,ci->bnji", Dq, w2t)
        + jnp.einsum("bnji,il->bnjl", h, m) + row0,
        rtol=1e-5, atol=1e-5)
    assert not np.any(np.asarray(ab))  # no BN1 fold: reduces unused


def test_layer_grads_match_unfused(rng):
    b, n, k, c1, c2 = 2, 40, 6, 12, 10
    h = jnp.asarray(rng.standard_normal((b, n, k, c1)), jnp.float32)
    params = _mk_params(c1, c2, 21)
    state = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    R = jnp.asarray(rng.standard_normal((b, n, c2)), jnp.float32)
    kw = dict(training=True, bn_decay=0.9)

    def fused(params, h):
        out, _ = layers.apply_conv_bn_relu_kmax(
            params, state, h, interpret=True, **kw)
        return jnp.sum(out * R)

    def unfused(params, h):
        y, _ = layers.apply_conv(params, state, h, **kw)
        return jnp.sum(jnp.max(y, axis=2) * R)

    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(params, h)
    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1))(params, h)
    np.testing.assert_allclose(v_f, v_u, rtol=1e-5)
    for name in ("w", "b", "gamma", "beta"):
        np.testing.assert_allclose(g_f[0][name], g_u[0][name], rtol=2e-4,
                                   atol=2e-5, err_msg=name)
    np.testing.assert_allclose(g_f[1], g_u[1], rtol=2e-4, atol=2e-5)


def test_whole_stage_matches_unfused(rng):
    """apply_edge_conv_stage_fused == knn -> gather -> conv1 block ->
    conv2 block -> k-max, values AND all 9 gradients AND BN states."""
    b, n, k, c, c2 = 2, 48, 6, 12, 10
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    p1 = _mk_params(2 * c, c2, 11)
    p2 = _mk_params(c2, c2, 12)
    st = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    R = jnp.asarray(rng.standard_normal((b, n, c2)), jnp.float32)
    kw = dict(training=True, bn_decay=0.9)

    def fused(p1, p2, f):
        out, _, _ = layers.apply_edge_conv_stage_fused(
            p1, st, p2, st, f, g, k, interpret=True, **kw)
        return jnp.sum(out * R)

    def unfused(p1, p2, f):
        nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
        h1, _ = layers.apply_edge_conv(p1, st, f, nbr, **kw)
        y, _ = layers.apply_conv(p2, st, h1, **kw)
        return jnp.sum(jnp.max(y, axis=2) * R)

    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(p1, p2, f)
    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1, 2))(p1, p2, f)
    np.testing.assert_allclose(v_f, v_u, rtol=1e-5)
    for gi, (gf, gu) in enumerate(zip(g_f[:2], g_u[:2])):
        for name in ("w", "b", "gamma", "beta"):
            np.testing.assert_allclose(gf[name], gu[name], rtol=5e-4,
                                       atol=5e-5, err_msg=f"p{gi+1}.{name}")
    np.testing.assert_allclose(g_f[2], g_u[2], rtol=5e-4, atol=5e-5)

    out_f, ns1, ns2 = layers.apply_edge_conv_stage_fused(
        p1, st, p2, st, f, g, k, interpret=True, **kw)
    nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
    h1, us1 = layers.apply_edge_conv(p1, st, f, nbr, **kw)
    y, us2 = layers.apply_conv(p2, st, h1, **kw)
    np.testing.assert_allclose(out_f, jnp.max(y, axis=2), rtol=1e-5,
                               atol=1e-6)
    for ns, us in ((ns1, us1), (ns2, us2)):
        np.testing.assert_allclose(ns["mean"], us["mean"], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(ns["var"], us["var"], rtol=1e-5,
                                   atol=1e-6)


def test_whole_stage_eval_matches_unfused(rng):
    b, n, k, c, c2 = 2, 48, 6, 12, 10
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    p1 = _mk_params(2 * c, c2, 31)
    p2 = _mk_params(c2, c2, 32)
    st1 = {"mean": jnp.asarray(rng.standard_normal((c2,)) * 0.1,
                               jnp.float32),
           "var": jnp.asarray(rng.uniform(0.5, 2.0, (c2,)), jnp.float32)}
    st2 = {"mean": jnp.asarray(rng.standard_normal((c2,)) * 0.1,
                               jnp.float32),
           "var": jnp.asarray(rng.uniform(0.5, 2.0, (c2,)), jnp.float32)}
    kw = dict(training=False, bn_decay=None)
    out_f, _, _ = layers.apply_edge_conv_stage_fused(
        p1, st1, p2, st2, f, g, k, interpret=True, **kw)
    nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
    h1, _ = layers.apply_edge_conv(p1, st1, f, nbr, **kw)
    y, _ = layers.apply_conv(p2, st2, h1, **kw)
    np.testing.assert_allclose(out_f, jnp.max(y, axis=2), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize(
    "b,n,k,c1,c2,dt,fold",
    [
        (2, 40, 5, 12, 10, jnp.float32, False),
        (2, 64, 20, 64, 64, jnp.bfloat16, True),
        (1, 33, 4, 3, 8, jnp.float32, True),   # ragged N + channel padding
    ],
)
def test_zmax_matches_minmax_composition(rng, b, n, k, c1, c2, dt, fold):
    """conv_zmax (eval-only: BN2 folded in, one extremum) must be
    VALUE-IDENTICAL to conv_minmax + _minmax_select + z/relu — the
    monotone-affine argument, including negative and zero s2 channels."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_zmax_pallas,
    )

    h1 = jnp.asarray(rng.standard_normal((b, n, k, c1)), dt)
    w2 = jnp.asarray(rng.standard_normal((c1, c2)) * 0.2, dt)
    b2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    s2 = rng.standard_normal((c2,)).astype(np.float32)
    s2[::3] = -s2[::3]
    s2[1] = 0.0  # zero-scale channel: both extrema give z = t2
    s2 = jnp.asarray(s2)
    t2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    if fold:
        sc1 = jnp.asarray(rng.standard_normal((c1,)) * 0.5 + 1.0,
                          jnp.float32)
        sh1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    else:
        sc1 = sh1 = None

    got = conv_zmax_pallas(h1, w2, b2, s2, t2, sc1, sh1, row_tile=16,
                           interpret=True)
    ymax, amax, ymin, amin, _ = conv_minmax_pallas(
        h1, w2, b2, sc1, sh1, row_tile=16, interpret=True)
    ysel, _ = layers._minmax_select(ymax, amax, ymin, amin, s2)
    want = jax.nn.relu(ysel.astype(jnp.float32) * s2 + t2).astype(dt)
    if dt == jnp.bfloat16:
        assert jnp.array_equal(got, want)  # bf16 rounding absorbs the ulp
    else:
        # s2*y + t2 contracts to an FMA inside the kernel but not in the
        # eager composition: agreement to 1 f32 ulp
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=2e-6)


def test_znmax_matches_nmax_composition(rng):
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_nmax_pallas,
        conv_znmax_pallas,
    )

    b, n, c1, c2 = 2, 60, 12, 16
    h = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((c1, c2)) * 0.2, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    s = rng.standard_normal((c2,)).astype(np.float32)
    s[::2] = -s[::2]
    s = jnp.asarray(s)
    t = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)

    got = conv_znmax_pallas(h, w, bias, s, t, row_tile=16, interpret=True)
    ymax, amax, ymin, amin, _ = conv_nmax_pallas(h, w, bias, row_tile=16,
                                                 interpret=True)
    ysel, _ = layers._minmax_select(ymax, amax, ymin, amin, s)
    want = jax.nn.relu(ysel * s + t)
    # FMA contraction inside the kernel: 1-ulp f32 agreement
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-7, atol=2e-6)


def test_stage1_matches_unfused(rng):
    """apply_edge_conv_stage1_fused (kNN kernel emits the k-extrema) ==
    knn -> gather -> conv1 block -> k-max: values, grads, states, eval."""
    b, n, k, c, c2 = 2, 48, 6, 10, 12
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    p1 = _mk_params(2 * c, c2, 41)
    st = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    R = jnp.asarray(rng.standard_normal((b, n, c2)), jnp.float32)
    kw = dict(training=True, bn_decay=0.9)

    def fused(p1, f):
        out, _ = layers.apply_edge_conv_stage1_fused(
            p1, st, f, g, k, interpret=True, **kw)
        return jnp.sum(out * R)

    def unfused(p1, f):
        nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
        h1, _ = layers.apply_edge_conv(p1, st, f, nbr, **kw)
        return jnp.sum(jnp.max(h1, axis=2) * R)

    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(p1, f)
    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1))(p1, f)
    np.testing.assert_allclose(v_f, v_u, rtol=1e-5)
    for name in ("w", "b", "gamma", "beta"):
        np.testing.assert_allclose(g_f[0][name], g_u[0][name], rtol=5e-4,
                                   atol=5e-5, err_msg=name)
    np.testing.assert_allclose(g_f[1], g_u[1], rtol=5e-4, atol=5e-5)

    out_f, ns = layers.apply_edge_conv_stage1_fused(
        p1, st, f, g, k, interpret=True, **kw)
    nbr = knn_ops.gather_neighbors(f, knn_ops.knn_graph(g, k))
    h1, us = layers.apply_edge_conv(p1, st, f, nbr, **kw)
    np.testing.assert_allclose(out_f, jnp.max(h1, axis=2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ns["mean"], us["mean"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ns["var"], us["var"], rtol=1e-5, atol=1e-6)

    out_e, _ = layers.apply_edge_conv_stage1_fused(
        p1, st, f, g, k, interpret=True, training=False, bn_decay=None)
    h1e, _ = layers.apply_edge_conv(p1, st, f, nbr, training=False,
                                    bn_decay=None)
    np.testing.assert_allclose(out_e, jnp.max(h1e, axis=2), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("b,n,c1,c2", [(2, 60, 12, 16), (2, 64, 24, 40)])
def test_nmax_forward_matches_reference(rng, b, n, c1, c2):
    """conv_nmax_pallas (max over the POINT axis, cross-tile arg merge)
    vs straight conv + extrema; n=60 exercises row padding poisons."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_nmax_pallas,
    )

    h = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c1, c2)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    ymax, amax, ymin, amin, mom = conv_nmax_pallas(
        h, w, bias, row_tile=16, interpret=True)
    y = jnp.einsum("bni,io->bno", h, w,
                   preferred_element_type=jnp.float32) + bias
    np.testing.assert_allclose(ymax, jnp.max(y, axis=1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ymin, jnp.min(y, axis=1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(amax, jnp.argmax(y, axis=1))
    np.testing.assert_array_equal(amin, jnp.argmin(y, axis=1))
    np.testing.assert_allclose(
        mom, jnp.stack([jnp.sum(y, axis=(0, 1)),
                        jnp.sum(jnp.square(y), axis=(0, 1))]),
        rtol=2e-5, atol=1e-5)


def test_nmax_bwd_kernel_matches_reference(rng):
    """conv_nmax_bwd_pallas (y recomputed in-kernel, routed + affine dy)
    vs the materialized-dy math, incl. padded-row db masking."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_nmax_bwd_pallas,
    )

    b, n, c1, c2 = 2, 60, 12, 16
    h = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c1, c2)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, c2)), jnp.float32)
    asel = jnp.asarray(rng.integers(0, n, (b, c2)), jnp.int32)
    al = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((c2,)) * 0.1, jnp.float32)
    dh, dw, db = conv_nmax_bwd_pallas(h, q, asel, w, bias, al, be,
                                      row_tile=16, interpret=True)
    y = jnp.einsum("bni,io->bno", h, w,
                   preferred_element_type=jnp.float32) + bias
    onen = asel[:, None, :] == jnp.arange(n)[None, :, None]
    dy = onen * q[:, None, :] + al + be * y
    np.testing.assert_allclose(dh, jnp.einsum("bno,io->bni", dy, w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw, jnp.einsum("bni,bno->io", h, dy),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(db, jnp.sum(dy, axis=(0, 1)), rtol=1e-3,
                               atol=1e-4)


def test_nmax_layer_grads_match_unfused(rng):
    """apply_conv_bn_relu_nmax == apply_conv + max over N: value, all
    four parameter gradients, dh, BN states, and eval."""
    b, n, c1, c2 = 2, 60, 12, 16
    h = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    params = _mk_params(c1, c2, 51)
    st = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    R = jnp.asarray(rng.standard_normal((b, c2)), jnp.float32)
    kw = dict(training=True, bn_decay=0.9)

    def fused(params, h):
        out, _ = layers.apply_conv_bn_relu_nmax(
            params, st, h, interpret=True, **kw)
        return jnp.sum(out * R)

    def unfused(params, h):
        y, _ = layers.apply_conv(params, st, h, **kw)
        return jnp.sum(jnp.max(y, axis=1) * R)

    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(params, h)
    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1))(params, h)
    np.testing.assert_allclose(v_f, v_u, rtol=1e-5)
    for name in ("w", "b", "gamma", "beta"):
        np.testing.assert_allclose(g_f[0][name], g_u[0][name], rtol=5e-4,
                                   atol=5e-5, err_msg=name)
    np.testing.assert_allclose(g_f[1], g_u[1], rtol=5e-4, atol=5e-5)

    _, ns = layers.apply_conv_bn_relu_nmax(params, st, h, interpret=True,
                                           **kw)
    y, us = layers.apply_conv(params, st, h, **kw)
    np.testing.assert_allclose(ns["mean"], us["mean"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ns["var"], us["var"], rtol=1e-5, atol=1e-6)
    oe, _ = layers.apply_conv_bn_relu_nmax(
        params, st, h, interpret=True, training=False, bn_decay=None)
    ye, _ = layers.apply_conv(params, st, h, training=False, bn_decay=None)
    np.testing.assert_allclose(oe, jnp.max(ye, axis=1), rtol=1e-5,
                               atol=1e-6)


def test_whole_stage_want_graph(rng):
    """want_graph: the stage's extra (idx, sqd) outputs equal the
    reference kNN graph (nearest-first order, self included) + squared
    distances, while output / gradients / BN states are unchanged vs the
    plain stage call. The k-nearest PREFIX property the smoothness-loss
    reuse depends on (losses/weaksup.py graph=...) is asserted directly:
    idx[:, :, :k'] for k' < k is exactly knn_graph(g, k')."""
    b, n, k, c, c2 = 2, 48, 6, 12, 10
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    p1, p2 = _mk_params(2 * c, c2, 11), _mk_params(c2, c2, 12)
    st = {"mean": jnp.zeros((c2,)), "var": jnp.ones((c2,))}
    kw = dict(training=True, bn_decay=0.9, interpret=True)
    R = jnp.asarray(rng.standard_normal((b, n, c2)), jnp.float32)

    out, ns1, ns2, (idx, sqd) = layers.apply_edge_conv_stage_fused(
        p1, st, p2, st, f, g, k, want_graph=True, **kw)
    out0, ns10, ns20 = layers.apply_edge_conv_stage_fused(
        p1, st, p2, st, f, g, k, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out0))
    np.testing.assert_allclose(ns1["mean"], ns10["mean"], rtol=1e-6)
    np.testing.assert_allclose(ns2["var"], ns20["var"], rtol=1e-6)

    want_idx = knn_ops.knn_graph(g, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    for kp in (1, 3):
        np.testing.assert_array_equal(
            np.asarray(idx[:, :, :kp]),
            np.asarray(knn_ops.knn_graph(g, kp)))
    d = knn_ops.pairwise_sqdist(g)
    want_sqd = -jax.lax.top_k(-d, k)[0]
    np.testing.assert_allclose(np.asarray(sqd), np.asarray(want_sqd),
                               rtol=1e-4, atol=1e-5)

    def loss(p1, p2, f, want):
        o = layers.apply_edge_conv_stage_fused(
            p1, st, p2, st, f, g, k, want_graph=want, **kw)
        return jnp.sum(o[0] * R)

    gw = jax.grad(loss, argnums=(0, 1, 2))(p1, p2, f, True)
    g0 = jax.grad(loss, argnums=(0, 1, 2))(p1, p2, f, False)
    for a, b_ in zip(jax.tree_util.tree_leaves(gw),
                     jax.tree_util.tree_leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_znmax_n_valid_masks_padded_rows(rng):
    """conv_znmax with pre-padded rows + n_valid: huge padded-row values
    must not win the global N-max (the eval pad-once fast path)."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_znmax_pallas,
    )

    b, n, c1, c2 = 2, 70, 8, 16
    h = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c1, c2)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    t2 = jnp.asarray(rng.standard_normal((c2,)), jnp.float32)
    out = conv_znmax_pallas(h, w, bb, s2, t2, interpret=True)
    hp = jnp.concatenate(
        [h, jnp.full((b, 58, c1), 1e9, jnp.float32)], axis=1)
    out_p = conv_znmax_pallas(hp, w, bb, s2, t2, interpret=True, n_valid=n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_p))
