"""Probabilistic label propagation (inference-time refinement).

Rebuild of Util/ProbLabelPropagation.py:3-63 (``LabelPropagation_TF``):

    w_i = 1 - H(G_i) / log2(K)                 (entropy confidence, :31-42)
    Y   = beta * (alpha L + beta diag(w) + 1e-5 I)^-1 diag(w) G      (:21-23)
    Y_prob = Y / sum_k Y                                              (:23)

TPU-native differences:
- The explicit ``tf.linalg.inv`` + matmul is replaced by a batched linear
  solve (one LU per sample instead of a full inverse — ~3x fewer FLOPs and
  better conditioned). A matrix-free conjugate-gradient mode avoids the
  O(N^3) factorization when the Laplacian is applied on the fly.
- Everything is batched [B, N, ...] and jittable; the reference solves one
  sample at a time through a feed_dict.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def entropy_confidence(g: jax.Array) -> jax.Array:
    """Per-point confidence w = 1 - H(g)/log2(K).

    Args:
      g: [..., N, K] predicted probabilities.

    Returns:
      [..., N] weights. Matches ProbLabelPropagation.py:31-42 including the
      +1e-5 inside the log (which lets w go slightly negative for near-uniform
      predictions — kept for parity).
    """
    k = g.shape[-1]
    entropy = -jnp.sum(g * jnp.log2(g + 1e-5), axis=-1)
    return 1.0 - entropy / jnp.log2(jnp.asarray(float(k), g.dtype))


@partial(jax.jit, static_argnames=("solver", "cg_iters"))
def label_propagation(
    lap: jax.Array,
    g: jax.Array,
    *,
    alpha: float = 1.0,
    beta: float = 1.0,
    ridge: float = 1e-5,
    solver: str = "solve",
    cg_iters: int = 50,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form label propagation.

    Args:
      lap: [B, N, N] (symmetric-normalized) graph Laplacians.
      g: [B, N, K] predicted probabilities.
      solver: "solve" (batched LU) or "cg" (matrix-free conjugate gradient —
        the system is symmetric and, for w >= 0, positive definite).

    Returns:
      (Y [B, N, K], Y_prob row-normalized, w [B, N]).
    """
    b, n, _ = lap.shape
    w = entropy_confidence(g)  # [B, N]
    rhs = w[..., None] * g  # diag(w) @ G
    eye = jnp.eye(n, dtype=lap.dtype)
    a = alpha * lap + beta * w[..., :, None] * eye + ridge * eye

    if solver == "cg":
        def matvec(v):
            return jnp.einsum("bnm,bmk->bnk", a, v,
                              preferred_element_type=jnp.float32)
        y, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, maxiter=cg_iters)
        y = beta * y
    else:
        y = beta * jnp.linalg.solve(a, rhs)

    denom = jnp.sum(y, axis=-1, keepdims=True)
    y_prob = y / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
    return y, y_prob, w


def propagate_batch(
    xyz: jax.Array,
    g: jax.Array,
    rgb: Optional[jax.Array] = None,
    *,
    alpha: float = 1.0,
    beta: float = 1.0,
    xyz_bandwidth: float = 1e3,
    rgb_bandwidth: float = 1e1,
    ridge: float = 1e-5,
    solver: str = "solve",
    cg_iters: int = 50,
) -> jax.Array:
    """Laplacian build + LP solve in one jitted call. Returns Y_prob [B,N,K].

    ShapeNet passes rgb=None (the reference feeds xyz twice,
    ShapeNet_DGCNN_trainer.py:551); S3DIS passes the RGB channels
    (S3DIS_DGCNN_trainer.py:543).
    """
    from weaksuppointcloudseg_tpu.propagate.laplacian import laplacian_xyz_rgb

    if rgb is None:
        rgb = xyz
    lap = laplacian_xyz_rgb(
        xyz, rgb, sym=True,
        xyz_bandwidth=xyz_bandwidth, rgb_bandwidth=rgb_bandwidth,
    )
    _, y_prob, _ = label_propagation(
        lap, g, alpha=alpha, beta=beta, ridge=ridge,
        solver=solver, cg_iters=cg_iters,
    )
    return y_prob
