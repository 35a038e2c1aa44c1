"""Fused Gaussian-affinity matvec: out = exp(-pdist2(feat)) @ u in VMEM.

The matrix-free label-propagation matvec (propagate/label_prop.py::
label_propagation_matfree — the room-scale/32k+ mode replacing the
reference's dense O(N^3) solve, Util/ProbLabelPropagation.py:21-23 +
Util/Tool.py:435-467) is HBM-bound in plain XLA: the [T, N] affinity tile
is a dot operand so XLA materializes it (write + read ~536 MB per row
tile at N=131k), and the Precision.HIGHEST Gram (required — see
ops/neighbors.py::pairwise_sqdist) is a second unfused [T, N]
materialization. Measured ~283 ms per W-apply at N=131072 on v5e, ~95% of
it those two HBM round-trips.

This kernel keeps the whole chain in VMEM: one grid step computes the
f32 Gram of a (row-tile x col-tile) block on the MXU, forms
exp(-clamp(d^2, 0)), and immediately contracts it with the u block —
nothing of O(N^2) ever reaches HBM.

Layout notes (why the shapes look inside-out):
- feat arrives TRANSPOSED [B, F, N]: blocks are [F<=8 sublanes, T lanes],
  so the Gram dot contracts the F sublane axis — full 128-lane
  utilization on both operands.
- the output is TRANSPOSED [B, K, N] and the apply contracts the COLUMN
  tile: contrib = u_j^T [K, TC] x W^T [TC, TR]. With K on the MXU lane
  axis (the straightforward W @ u orientation) the ~14 LP classes pad to
  128 lanes — 8x wasted MXU work; on the sublane axis K pads to 8.
- the output block is indexed by the row tile only and revisited across
  the column-tile grid axis (accumulate; zero at j == 0) — the standard
  Mosaic reduction pattern (cf. ops/scatter_pallas.py).

Padding contract: the caller pads N with points at huge coordinates
(sq ~ 1e12 -> exp underflows to exactly 0) and u with zeros, so padded
rows/cols neither receive nor donate mass — same trick as
S3DISTrainer.room_label_prop's 1 km pad blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(rows_ref, cols_ref, u_ref, out_ref):
    """One (row-tile i, col-tile j) block of out^T += u_j^T @ exp(-d^2)^T.

    rows_ref: [1, F, TR] row feats (transposed, indexed by i)
    cols_ref: [1, F, TC] col feats (same array, indexed by j)
    u_ref:    [1, TC, K] col u block (indexed by j)
    out_ref:  [1, K, TR] out^T row block (indexed by i, revisited over j)
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    rows = rows_ref[0]  # [F, TR] f32
    cols = cols_ref[0]  # [F, TC] f32
    u = u_ref[0]        # [TC, K] f32
    # Gram^T [TC, TR] on the MXU, f32 (precision-critical: bf16 operands
    # put ~1e-2 on d^2 and the exp amplifies it e^(+-10) — the round-5
    # affinity precision bug)
    inner_t = jax.lax.dot_general(
        cols, rows, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TC, TR]
    rsq = jnp.sum(rows * rows, axis=0)[None, :]   # [1, TR]
    csq = jnp.sum(cols * cols, axis=0)[:, None]   # [TC, 1]
    d = jnp.maximum(csq - 2.0 * inner_t + rsq, 0.0)
    w_t = jnp.exp(-d)  # [TC, TR]
    # apply: u^T @ W^T with K on the sublane axis. Also HIGHEST: a DEFAULT
    # (bf16-input) apply puts ~2e-3 relative noise on every matvec, which
    # stalls CG around that level; the dot is K<=16-sublane cheap either way.
    contrib = jax.lax.dot_general(
        u, w_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [K, TR]
    out_ref[0] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("row_tile", "col_tile", "interpret"))
def affinity_matvec_pallas(
    feat: jax.Array,   # [B, N, F] bandwidth-pre-scaled features, f32
    u: jax.Array,      # [B, N, K] f32
    *,
    row_tile: int = 512,
    col_tile: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """out [B, N, K] = exp(-clamped pdist2(feat)) @ u, nothing O(N^2) in HBM.

    N is padded internally to a tile multiple with far-away points
    (affinity exactly 0 after exp underflow) and the result sliced back.
    """
    b, n, f = feat.shape
    k = u.shape[-1]
    tr, tc = row_tile, col_tile
    n_pad = _round_up(n, max(tr, tc) if max(tr, tc) % min(tr, tc) == 0
                      else tr * tc)
    if n_pad != n:
        feat = jnp.pad(feat, ((0, 0), (0, n_pad - n), (0, 0)),
                       constant_values=1e6)
        u = jnp.pad(u, ((0, 0), (0, n_pad - n), (0, 0)))
    feat_t = jnp.swapaxes(feat, 1, 2).astype(jnp.float32)  # [B, F, N]
    u = u.astype(jnp.float32)

    out_t = pl.pallas_call(
        _kernel,
        grid=(b, n_pad // tr, n_pad // tc),
        in_specs=[
            pl.BlockSpec((1, f, tr), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, tc), lambda bi, i, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, k), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tr), lambda bi, i, j: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, n_pad), jnp.float32),
        interpret=interpret,
    )(feat_t, feat_t, u)
    return jnp.swapaxes(out_t, 1, 2)[:, :n]


def supported(backend: str | None = None) -> bool:
    """True when the fused kernel can run (compiled Mosaic on TPU)."""
    be = backend or jax.default_backend()
    return be in ("tpu", "axon")
