"""Fused kNN + neighbor-gather Pallas kernel (the EdgeConv front half).

Motivation: Mosaic's ``tpu.dynamic_gather`` cannot gather across vector
registers ("Multiple source vregs along gather dimension"), and XLA's batched
``take_along_axis`` costs ~10 ms for a [16, 2048, 20, 64] gather on v5e. But
the kNN selection loop (ops/knn_pallas.py) already produces a one-hot row
mask per neighbor round — and ``one_hot @ F`` IS the gather, as an MXU
matmul over the VMEM-resident feature block. This kernel fuses:

    distance tile (MXU)  ->  k selection rounds (VPU)
                         ->  per-round one-hot @ F gather (MXU)

emitting neighbor features [B, N, k, C] and indices, with the B x N x N
distance matrix never leaving VMEM.

Gradients: selection is non-differentiable; neighbor features are linear in
F, so the custom VJP scatter-adds the cotangent back through the saved
indices with XLA's scatter (cheap — it is the forward gather that XLA does
poorly). The graph-source input ``g`` gets no gradient (matches the
reference: kNN indices come from ``tf.nn.top_k``, which TF does not
differentiate through either).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(g_rows_ref, g_all_ref, f_all_ref, idx_ref, nbr_ref,
            *, k: int, n_valid: int, n_pad: int):
    g_rows = g_rows_ref[0]  # [TM, Cgp]
    g_all = g_all_ref[0]    # [Np, Cgp]
    f_all = f_all_ref[0]    # [Np, Cf]

    d = -2.0 * jax.lax.dot_general(
        g_rows, g_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(jnp.square(g_rows.astype(jnp.float32)), axis=1, keepdims=True)
    d = d + jnp.sum(jnp.square(g_all.astype(jnp.float32)), axis=1)[None, :]

    tm = d.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    if n_valid < n_pad:
        d = jnp.where(col_ids < n_valid, d, jnp.inf)

    idx_cols, nbr_slabs = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == m, col_ids, n_pad), axis=1, keepdims=True)
        onehot = (col_ids == idx).astype(f_all.dtype)  # [TM, Np]
        nbr = jax.lax.dot_general(  # the gather, on the MXU
            onehot, f_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(f_all.dtype)
        idx_cols.append(idx)
        nbr_slabs.append(nbr)
        d = jnp.where(col_ids == idx, jnp.inf, d)

    idx_ref[0] = jnp.concatenate(idx_cols, axis=1)
    nbr_ref[0] = jnp.stack(nbr_slabs, axis=1)  # [TM, k, Cf]


@functools.partial(
    jax.jit, static_argnames=("k", "row_tile", "interpret")
)
def _knn_gather_fwd_impl(
    g: jax.Array, f: jax.Array, k: int, row_tile: int, interpret: bool
) -> Tuple[jax.Array, jax.Array]:
    b, n, cg = g.shape
    cf = f.shape[-1]
    tm = min(row_tile, _round_up(n, 8))
    n_pad = _round_up(n, tm)
    cg_pad = _round_up(cg, LANE)
    if (n_pad, cg_pad) != (n, cg):
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, cg_pad - cg)))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (b, n_pad // tm)
    idx, nbr = pl.pallas_call(
        functools.partial(_kernel, k=k, n_valid=n, n_pad=n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, cg_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cg_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cf), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, k, cf), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, k, cf), f.dtype),
        ),
        interpret=interpret,
    )(g, g, f)
    return idx[:, :n], nbr[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def knn_gather(g, f, k: int, row_tile: int = 256, interpret: bool = False):
    """Fused kNN graph + neighbor-feature gather.

    Args:
      g: [B, N, Cg] coordinates/features the graph is built on (no grad).
      f: [B, N, Cf] features to gather at the k nearest neighbors of each
        point (grad flows via scatter in the VJP).

    Returns:
      (idx int32 [B, N, k], neighbors [B, N, k, Cf]).
    """
    return _knn_gather_fwd_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, row_tile,
        interpret)


def _knn_gather_fwd(g, f, k, row_tile, interpret):
    idx, nbr = _knn_gather_fwd_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, row_tile,
        interpret)
    # zeros_like placeholders carry shape/dtype through the residual pytree
    # (XLA dead-code-eliminates them; only idx is materialized)
    return (idx, nbr), (idx, jnp.zeros_like(g), jnp.zeros_like(f))


def _knn_gather_bwd(k, row_tile, interpret, res, cts):
    idx, g_zeros, f_zeros = res
    _, g_nbr = cts  # cotangent of the neighbor features [B, N, k, Cf]
    b, n, _ = f_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_pallas,
        )

        df = scatter_add_pallas(idx, g_nbr.astype(f_zeros.dtype), n)
    else:
        bidx = jnp.arange(b)[:, None, None]
        df = f_zeros.at[bidx, idx].add(g_nbr.astype(f_zeros.dtype))
    return (g_zeros, df)  # selection is non-differentiable -> zero dg


knn_gather.defvjp(_knn_gather_fwd, _knn_gather_bwd)


def edge_feature_fused(g: jax.Array, f: jax.Array, k: int,
                       interpret: bool = False):
    """EdgeConv edge features concat([f_i, f_j - f_i]) via the fused kernel.

    Drop-in for ``edge_feature(f, knn_graph(g, k))`` on TPU
    (tf_util.py:674-706 semantics).
    """
    _, nbr = knn_gather(g, f, k, 256, interpret)
    central = jnp.broadcast_to(f[:, :, None, :], nbr.shape)
    return jnp.concatenate([central, nbr - central], axis=-1)
