"""Graph-Laplacian builders for label propagation.

TPU-native rebuild of the reference's placeholder-graph calculators
(Util/Tool.py:400-467, classes ``LaplacianMat_XYZRGB_DirectComp`` /
``LaplacianMatSym_XYZRGB_DirectComp``):

    W    = exp(-D_xyz * 1e3) * exp(-D_rgb * 1e1)       (negative D clamped to 0)
    d    = sum_j W_ij
    L    = diag(d + 1e-8) - W                          (unnormalized)
    Lsym = diag(d^-1/2) (diag(d + 1e-8) - W) diag(d^-1/2)

ShapeNet calls the symmetric variant with (xyz, xyz) — no color
(ShapeNet/ShapeNet_DGCNN_trainer.py:551); S3DIS with (xyz, rgb)
(S3DIS/S3DIS_DGCNN_trainer.py:543).

TPU notes: the two Gram matrices are batched MXU matmuls; the exp / product /
row-sum fuse into their epilogue under XLA. Rather than materializing the
diagonal degree matrices and doing two more N x N matmuls like the reference,
the symmetric normalization is applied as a rank-1 row/column scaling
(outer product of d^-1/2), which is bandwidth-, not compute-, bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weaksuppointcloudseg_tpu.ops.neighbors import pairwise_sqdist


def product_kernel_weights(
    xyz: jax.Array,
    rgb: jax.Array,
    *,
    xyz_bandwidth: float = 1e3,
    rgb_bandwidth: float = 1e1,
) -> jax.Array:
    """Affinity W = exp(-D_xyz * bw_xyz) * exp(-D_rgb * bw_rgb), [B, N, N].

    The reference clamps negative fp error in the squared distances to zero
    before the exp (Util/Tool.py:449,457) — reproduced here.
    """
    d_xyz = jnp.maximum(pairwise_sqdist(xyz), 0.0)
    d_rgb = jnp.maximum(pairwise_sqdist(rgb), 0.0)
    # Single exp of the summed scaled distances (= product of the two exps).
    return jnp.exp(-(d_xyz * xyz_bandwidth + d_rgb * rgb_bandwidth))


@partial(jax.jit, static_argnames=("sym", "xyz_bandwidth", "rgb_bandwidth"))
def laplacian_xyz_rgb(
    xyz: jax.Array,
    rgb: jax.Array,
    *,
    sym: bool = True,
    xyz_bandwidth: float = 1e3,
    rgb_bandwidth: float = 1e1,
    degree_eps: float = 1e-8,
) -> jax.Array:
    """Batched (optionally symmetric-normalized) graph Laplacian [B, N, N].

    Matches Util/Tool.py:435-467 (sym) / :402-433 (unnormalized).
    """
    w = product_kernel_weights(
        xyz, rgb, xyz_bandwidth=xyz_bandwidth, rgb_bandwidth=rgb_bandwidth
    )
    d = jnp.sum(w, axis=-1)  # [B, N]
    lap = -w
    diag = d + degree_eps
    n = w.shape[-1]
    eye = jnp.eye(n, dtype=w.dtype)
    lap = lap + diag[..., None] * eye
    if not sym:
        return lap
    d_negsqrt = jax.lax.rsqrt(jnp.maximum(d, 1e-30))  # [B, N]
    return lap * d_negsqrt[..., :, None] * d_negsqrt[..., None, :]
