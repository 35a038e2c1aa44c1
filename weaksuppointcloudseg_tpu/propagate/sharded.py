"""Point-axis-sharded label propagation (the context-parallel analog).

For very large clouds the dense N x N Laplacian stops fitting one core's
HBM comfort zone (SURVEY.md §5 "long-context" row: a 4096^2 f32 matrix is
64 MB per sample — and the reference's closed-form solve is O(N^3)). This
module shards the *point axis* across the device mesh with ``shard_map``:

- each device holds a row block of the affinity/Laplacian matrix
  [N/D, N] — built locally from a replicated copy of the points;
- the degree vector needs only the local row sums (no collective);
- the LP system is solved matrix-free with conjugate gradient where the
  matvec is row-local and the CG scalars (dot products) reduce with
  ``psum`` over the mesh — the collectives ride ICI.

This trades the O(N^3) factorization for O(iters * N^2 / D) work and O(1)
scalar collectives per iteration, and cuts per-device memory from N^2 to
N^2 / D.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from weaksuppointcloudseg_tpu.propagate.label_prop import entropy_confidence


def _local_laplacian_rows(
    x_rows: jax.Array,  # [n_local, C] this device's points
    x_all: jax.Array,   # [N, C] replicated
    rgb_rows: jax.Array,
    rgb_all: jax.Array,
    *,
    axis: str,
    xyz_bandwidth: float,
    rgb_bandwidth: float,
    degree_eps: float,
) -> jax.Array:
    """Row block of the *unnormalized* Laplacian L = diag(d) - W."""

    def sqd(a, b):
        inner = a @ b.T
        return (jnp.sum(a * a, 1)[:, None] - 2.0 * inner
                + jnp.sum(b * b, 1)[None, :])

    w = jnp.exp(-(jnp.maximum(sqd(x_rows, x_all), 0.0) * xyz_bandwidth
                  + jnp.maximum(sqd(rgb_rows, rgb_all), 0.0) * rgb_bandwidth))
    d = jnp.sum(w, axis=1)  # local row degrees
    n_local = x_rows.shape[0]
    # global row index of each local row, to place the diagonal
    shard = jax.lax.axis_index(axis)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_local, x_all.shape[0]), 1)
    row_global = shard * n_local + jax.lax.broadcasted_iota(
        jnp.int32, (n_local, x_all.shape[0]), 0)
    # L = diag(d + eps) - W, rows only
    return jnp.where(col == row_global, d[:, None] + degree_eps - w, -w)


def label_propagation_sharded(
    mesh: Mesh,
    x: jax.Array,    # [N, C] points (single sample)
    g: jax.Array,    # [N, K] predicted probabilities
    rgb: Optional[jax.Array] = None,
    *,
    alpha: float = 1.0,
    beta: float = 1.0,
    xyz_bandwidth: float = 1e3,
    rgb_bandwidth: float = 1e1,
    ridge: float = 1e-5,
    degree_eps: float = 1e-8,
    cg_iters: int = 50,
) -> jax.Array:
    """Y_prob [N, K] via point-axis-sharded CG. N must divide the mesh size.

    Uses the *unnormalized* Laplacian (Util/Tool.py:402-433 variant): its
    row-sharded matvec needs no global degree exchange. The system
    A = alpha L + beta diag(w) + ridge I is SPD.
    """
    if rgb is None:
        rgb = x
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None), P(axis), P(None), P(axis), P(None)),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve(x_rows, x_all, rgb_rows, rgb_all, g_rows, g_all):
        lap_rows = _local_laplacian_rows(
            x_rows, x_all, rgb_rows, rgb_all, axis=axis,
            xyz_bandwidth=xyz_bandwidth, rgb_bandwidth=rgb_bandwidth,
            degree_eps=degree_eps,
        )  # [n_local, N]
        w_all = entropy_confidence(g_all)  # replicated [N]
        n_local = x_rows.shape[0]
        shard = jax.lax.axis_index(axis)
        rows = shard * n_local + jnp.arange(n_local)
        w_rows = w_all[rows]

        col = jax.lax.broadcasted_iota(jnp.int32, lap_rows.shape, 1)
        row_g = rows[:, None]
        a_rows = alpha * lap_rows + jnp.where(
            col == row_g, beta * w_rows[:, None] + ridge, 0.0
        )  # [n_local, N]

        b_rows = beta * w_rows[:, None] * g_rows  # rhs rows (note: the
        # closed form multiplies by beta outside the inverse AND uses
        # diag(w) G — identical algebra to label_prop.py)

        def matvec(v_rows):
            # v is sharded by rows; the matvec needs all of v
            v_full = jax.lax.all_gather(v_rows, axis, tiled=True)  # [N, K]
            return a_rows @ v_full

        def pdot(u, v):  # global inner product of sharded vectors
            return jax.lax.psum(jnp.sum(u * v), axis)

        # conjugate gradient on the sharded rows
        x0 = jnp.zeros_like(b_rows)
        r0 = b_rows - matvec(x0)
        p0 = r0
        rs0 = pdot(r0, r0)

        def body(_, carry):
            xk, rk, pk, rsk = carry
            ap = matvec(pk)
            alpha_k = rsk / jnp.maximum(pdot(pk, ap), 1e-30)
            xk = xk + alpha_k * pk
            rk = rk - alpha_k * ap
            rs_new = pdot(rk, rk)
            pk = rk + (rs_new / jnp.maximum(rsk, 1e-30)) * pk
            return xk, rk, pk, rs_new

        y_rows, _, _, _ = jax.lax.fori_loop(0, cg_iters, body,
                                            (x0, r0, p0, rs0))
        denom = jnp.sum(y_rows, axis=-1, keepdims=True)
        return y_rows / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)

    return solve(x, x, rgb, rgb, g, g)
