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
