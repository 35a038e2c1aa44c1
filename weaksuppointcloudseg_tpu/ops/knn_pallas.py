"""Fused pairwise-distance + k-nearest-neighbor Pallas TPU kernel.

The reference computes the dense B x N x N distance matrix in HBM and then
runs a generic sort-based top-k over it (tf_util.py:638-671). Under XLA the
same pattern costs ~3 ms (distance, 256 MB HBM write) + ~29 ms (top-k) for
B=16, N=2048 on one v5e core. This kernel fuses both:

- the distance *tile* [ROW_TILE, N] lives only in VMEM (registers/vector
  memory), never in HBM — the N x N matrix is never materialized;
- the distance block is one MXU matmul (-2 X_tile X^T fused with the squared
  norms);
- selection is k rounds of min + lowest-index tie-break over the VMEM tile
  (VPU), exactly matching ``jax.lax.top_k(-d, k)`` semantics (smallest
  distance first, ties -> lowest index — the reference's tf.nn.top_k
  behavior);
- channels are zero-padded to the 128-lane width (zero padding cannot change
  a squared distance), rows to the row tile, and padded columns are pushed to
  +inf so they are never selected.

The kernel returns int32 indices only — kNN selection is not differentiated
anywhere in the pipeline (gradients flow through the subsequent gather,
which stays in XLA; see models/dgcnn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Knockout-free fast selection — see ops/edgeconv_pallas.py for the
# rationale (packed values are strictly unique, so a masked min over the
# UNCHANGED tile replaces the knockout write AND, with no gather mask
# needed here, the winner compare: 1 memory pass/round).
KNOCKOUT_FREE_FAST = False


def _knn_kernel_fast(rows_ref, all_ref, out_ref, val_ref, *, k: int,
                     n_valid: int, n_pad: int, idx_bits: int):
    """Packed-min selection: distance bits and column index share one int32.

    For d >= 0 the IEEE-754 bit pattern is monotone under integer compare,
    so ``(bits(d) & ~mask) | col`` gives min-distance-then-lowest-index in a
    SINGLE min per round (2 VPU passes/round vs 4 for the exact kernel).
    The low ``idx_bits`` mantissa bits of d are sacrificed — neighbors whose
    distances agree to ~2^-(23-idx_bits) relative may swap order vs
    ``lax.top_k``. Selected via ``knn_pallas(..., fast=True)``; part of the
    recommended fast config after the end-to-end accuracy A/B
    (docs/kernels.md), while the parity default stays exact.
    """
    rows = rows_ref[0]
    allp = all_ref[0]
    d = -2.0 * jax.lax.dot_general(
        rows, allp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=1, keepdims=True)
    d = d + jnp.sum(jnp.square(allp.astype(jnp.float32)), axis=1)[None, :]
    d = jnp.maximum(d, 0.0)

    tm = d.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    mask = (1 << idx_bits) - 1
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    packed = (bits & ~mask) | col_ids
    if n_valid < n_pad:
        big = jnp.int32(0x7F000000)
        packed = jnp.where(col_ids < n_valid, packed, big | col_ids)

    idx_cols, val_cols = [], []
    if KNOCKOUT_FREE_FAST:
        # packed values are strictly unique, so the next winner is the min
        # of values strictly greater than the last — masked min over the
        # UNCHANGED packed tile: 1 memory pass/round, no knockout write and
        # (with no gather here) no winner-mask compare at all
        m = None
        for _ in range(k):
            src = packed if m is None else jnp.where(
                packed > m, packed, jnp.int32(0x7F7FFFFF))
            m = jnp.min(src, axis=1, keepdims=True)
            idx_cols.append(m & mask)
            val_cols.append(
                jax.lax.bitcast_convert_type(m & ~mask, jnp.float32))
    else:
        knocked = packed
        for _ in range(k):
            m = jnp.min(knocked, axis=1, keepdims=True)
            idx = m & mask
            idx_cols.append(idx)
            val_cols.append(
                jax.lax.bitcast_convert_type(m & ~mask, jnp.float32))
            knocked = jnp.where(col_ids == idx, jnp.int32(0x7F7FFFFF),
                                knocked)
    out_ref[0] = jnp.concatenate(idx_cols, axis=1)
    val_ref[0] = jnp.concatenate(val_cols, axis=1)


def _knn_kernel(rows_ref, all_ref, out_ref, val_ref, *, k: int, n_valid: int,
                n_pad: int):
    """One (batch, row-tile) grid step.

    rows_ref: [1, TM, Cp] query rows (VMEM)
    all_ref:  [1, Np, Cp] all points of this batch element (VMEM)
    out_ref:  [1, TM, k] int32 neighbor indices, nearest first
    val_ref:  [1, TM, k] f32 squared distances of the selected neighbors
    """
    rows = rows_ref[0]
    allp = all_ref[0]
    # -2 X_q X^T on the MXU, fp32 accumulation.
    d = -2.0 * jax.lax.dot_general(
        rows, allp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=1, keepdims=True)
    d = d + jnp.sum(jnp.square(allp.astype(jnp.float32)), axis=1)[None, :]

    tm = d.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    if n_valid < n_pad:  # mask zero-padded phantom points
        d = jnp.where(col_ids < n_valid, d, jnp.inf)

    # k rounds of (min, lowest-index tie-break, knock out the winner).
    cols, vals = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == m, col_ids, n_pad), axis=1, keepdims=True)
        cols.append(idx)
        vals.append(m)
        d = jnp.where(col_ids == idx, jnp.inf, d)
    out_ref[0] = jnp.concatenate(cols, axis=1)
    val_ref[0] = jnp.concatenate(vals, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "row_tile", "interpret", "with_values", "fast"),
)
def knn_pallas(
    x: jax.Array,
    k: int,
    *,
    row_tile: int = 256,
    interpret: bool = False,
    with_values: bool = False,
    fast: bool = False,
):
    """kNN via the fused Pallas kernel.

    Args:
      x: [B, N, C] points/features (any float dtype; distance accumulates
        fp32).
      k: neighbor count (self included, like tf_util.knn).
      row_tile: query rows per grid step (VMEM tile height).
      interpret: run in the Pallas interpreter (CPU tests).
      with_values: also return the selected squared distances (used by the
        smoothness loss, SmoothConstraint.py:154-158; non-differentiable —
        stop_gradient the input).

    Returns:
      int32 idx [B, N, k] nearest first — identical ordering to
      ``knn(pairwise_sqdist(x), k)`` up to fp associativity; with
      ``with_values`` a (idx, sqdist [B, N, k] f32) tuple.
    """
    b, n, c = x.shape
    tm = min(row_tile, _round_up(n, 8))
    # cap the [tm, N_pad] distance tile at ~4 MB of VMEM for very large N
    tm = max(8, min(tm, _round_up((4 << 20) // (4 * max(n, 1)), 8)))
    n_pad = _round_up(n, tm)
    c_pad = _round_up(c, LANE)
    if (n_pad, c_pad) != (n, c):
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, c_pad - c)))

    if fast:
        idx_bits = max(1, (n_pad - 1).bit_length())
        kernel = functools.partial(
            _knn_kernel_fast, k=k, n_valid=n, n_pad=n_pad, idx_bits=idx_bits)
    else:
        kernel = functools.partial(_knn_kernel, k=k, n_valid=n, n_pad=n_pad)
    grid = (b, n_pad // tm)
    idx, vals = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, c_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, k), jnp.float32),
        ),
        interpret=interpret,
    )(x, x)
    if with_values:
        return idx[:, :n], vals[:, :n]
    return idx[:, :n]
