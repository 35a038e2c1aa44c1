"""Fused Gaussian-affinity matvec kernel (interpret mode on CPU).

The kernel is the TPU path of label_propagation_matfree's W-apply
(propagate/label_prop.py) — the room-scale LP mode. Oracle: f64 numpy
exp(-clamped pdist2) @ u.
"""

import numpy as np
import pytest

from weaksuppointcloudseg_tpu.ops.affinity_pallas import (
    affinity_matvec_pallas,
)


def oracle(feat, u):
    f64 = feat.astype(np.float64)
    sq = (f64 ** 2).sum(-1)
    d = np.maximum(
        sq[:, :, None] - 2 * np.einsum("bnc,bmc->bnm", f64, f64)
        + sq[:, None, :], 0)
    return np.einsum("bnm,bmk->bnk", np.exp(-d), u.astype(np.float64))


@pytest.mark.parametrize("b,n,f,k,rt,ct", [
    (1, 640, 6, 14, 128, 256),   # room-LP shape family (pad 640 -> 768)
    (2, 300, 3, 5, 128, 128),    # unaligned N, xyz-only, tiny K
    (1, 256, 6, 50, 128, 128),   # ShapeNet-width K
])
def test_matches_f64_oracle(rng, b, n, f, k, rt, ct):
    feat = rng.uniform(0, 2, (b, n, f)).astype(np.float32)
    u = rng.standard_normal((b, n, k)).astype(np.float32)
    got = np.asarray(affinity_matvec_pallas(
        feat, u, row_tile=rt, col_tile=ct, interpret=True))
    want = oracle(feat, u)
    rel = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert rel < 1e-5, rel


def test_padding_is_innocuous(rng):
    """Padded rows/cols must neither receive nor donate mass: the result
    at N and at a tile-aligned N must agree exactly on the real rows."""
    feat = rng.uniform(0, 2, (1, 200, 6)).astype(np.float32)
    u = rng.standard_normal((1, 200, 7)).astype(np.float32)
    got = np.asarray(affinity_matvec_pallas(
        feat, u, row_tile=128, col_tile=128, interpret=True))
    assert got.shape == (1, 200, 7)
    want = oracle(feat, u)
    rel = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    assert rel < 1e-5, rel


def test_matfree_lp_uses_kernel_semantics(rng):
    """label_propagation_matfree (XLA path on CPU) must equal the kernel's
    math: one propagation through each, same result."""
    from weaksuppointcloudseg_tpu.propagate.label_prop import (
        label_propagation_matfree, propagate_batch,
    )

    xyz = rng.uniform(0, 1, (1, 96, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(0, 1, (1, 96, 3)).astype(np.float32)
    logits = rng.standard_normal((1, 96, 5)).astype(np.float32) * 2
    g = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    mf = np.asarray(label_propagation_matfree(xyz, g.astype(np.float32), rgb))
    dense = np.asarray(propagate_batch(xyz, g.astype(np.float32), rgb,
                                       solver="solve"))
    np.testing.assert_allclose(mf, dense, rtol=1e-2, atol=1e-3)


def test_skip_cutoff_is_exact_on_clustered_scene(rng):
    """Tile skipping drops only blocks where EVERY affinity is
    <= exp(-cutoff): on a morton-sorted clustered scene the skip-on and
    skip-off results must agree to fp noise."""
    import jax.numpy as jnp

    from weaksuppointcloudseg_tpu.ops.affinity_pallas import morton_order

    # 4 far-apart clusters of exactly one 128-tile each -> after the
    # morton sort the mask should approach the identity
    centers = rng.uniform(0, 40, (4, 3))
    pts = (np.repeat(centers, 128, 0)
           + rng.standard_normal((512, 3)) * 0.3).astype(np.float32)[None]
    order = np.asarray(morton_order(jnp.asarray(pts)))[0]
    pts = pts[:, order]
    feat = np.concatenate([pts, rng.uniform(0, 1, pts.shape)],
                          -1).astype(np.float32)
    u = rng.standard_normal((1, 512, 9)).astype(np.float32)
    full = np.asarray(affinity_matvec_pallas(
        feat, u, row_tile=128, col_tile=128, skip_cutoff=None,
        interpret=True))
    skip = np.asarray(affinity_matvec_pallas(
        feat, u, row_tile=128, col_tile=128, skip_cutoff=30.0,
        interpret=True))
    rel = np.abs(full - skip).max() / max(1.0, np.abs(full).max())
    assert rel < 1e-6, rel
    # and the mask actually skips something on this scene (pad to the
    # tile multiple the way affinity_matvec_pallas does internally)
    from weaksuppointcloudseg_tpu.ops.affinity_pallas import _skip_mask
    m = np.asarray(_skip_mask(jnp.asarray(feat), 128, 128, 30.0))
    assert m.mean() < 0.5, f"too few blocks skipped ({m.mean()=})"


def test_morton_order_is_permutation_and_local(rng):
    import jax.numpy as jnp

    from weaksuppointcloudseg_tpu.ops.affinity_pallas import morton_order

    pts = rng.uniform(0, 8, (2, 512, 3)).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    for b in range(2):
        assert sorted(order[b].tolist()) == list(range(512))
        # locality: mean distance between sort-adjacent points far below
        # the mean distance of random pairs
        srt = pts[b][order[b]]
        adj = np.linalg.norm(np.diff(srt, axis=0), axis=1).mean()
        rnd = np.linalg.norm(
            pts[b][rng.permutation(512)] - pts[b], axis=1).mean()
        assert adj < rnd * 0.4, (adj, rnd)


def test_transposed_io_matches_straight_kernel(rng):
    """affinity_matvec_pallas_t (the CG-native transposed-IO variant —
    propagate/label_prop.py runs the whole fused CG in [B, K, N] space)
    must equal the straight kernel modulo the two transposes, with and
    without tile skipping."""
    import jax.numpy as jnp

    from weaksuppointcloudseg_tpu.ops.affinity_pallas import (
        affinity_matvec_pallas_t,
    )

    feat = rng.uniform(0, 2, (2, 256, 6)).astype(np.float32)
    u = rng.standard_normal((2, 256, 13)).astype(np.float32)
    ref = np.asarray(affinity_matvec_pallas(
        feat, u, row_tile=64, col_tile=64, interpret=True))
    for cutoff in (30.0, None):
        got_t = affinity_matvec_pallas_t(
            jnp.swapaxes(jnp.asarray(feat), 1, 2),
            jnp.swapaxes(jnp.asarray(u), 1, 2),
            row_tile=64, col_tile=64, skip_cutoff=cutoff, interpret=True)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got_t, 1, 2)), ref, rtol=1e-6,
            atol=1e-6 * max(1.0, np.abs(ref).max()))
    # unpadded N is a contract violation, not silent corruption
    with pytest.raises(ValueError, match="multiple"):
        affinity_matvec_pallas_t(
            jnp.zeros((1, 6, 100)), jnp.zeros((1, 3, 100)),
            row_tile=64, col_tile=64, interpret=True)


def test_transposed_pad_lanes_stay_zero(rng):
    """The fused-CG pad contract: far-coordinate pad lanes neither
    receive nor donate mass through the transposed kernel."""
    import jax.numpy as jnp

    from weaksuppointcloudseg_tpu.ops.affinity_pallas import (
        affinity_matvec_pallas_t,
    )

    n, n_pad = 100, 128
    feat = rng.uniform(0, 2, (1, n, 6)).astype(np.float32)
    u = rng.standard_normal((1, n, 5)).astype(np.float32)
    feat_t = np.full((1, 6, n_pad), 1e6, np.float32)
    feat_t[0, :, :n] = feat[0].T
    ut = np.zeros((1, 5, n_pad), np.float32)
    ut[0, :, :n] = u[0].T
    out_t = np.asarray(affinity_matvec_pallas_t(
        jnp.asarray(feat_t), jnp.asarray(ut), row_tile=64, col_tile=64,
        interpret=True))
    want = oracle(feat, u)
    rel = np.abs(out_t[0, :, :n].T - want[0]).max() / max(
        1.0, np.abs(want).max())
    assert rel < 1e-5, rel
    assert np.all(out_t[0, :, n:] == 0.0)
