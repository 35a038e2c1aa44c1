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

Tile skipping (``skip_cutoff``): a per-(row-tile, col-tile) mask is
precomputed from tile bounding boxes in the F-dim feature space — when
the boxes' minimum squared distance exceeds the cutoff, every affinity in
the block is <= exp(-cutoff) (9e-14 at the default 30.0) and the whole
Gram+exp+apply is skipped via a scalar ``pl.when``. The bound is exact,
so correctness never depends on point ORDER — but skip efficiency does:
callers morton-sort the points first (label_propagation_matfree does) so
spatially-near points share tiles and most tile pairs are far apart,
making the apply near-linear in N for surface-sampled scans.

Padding contract: the caller pads N with points at huge coordinates
(sq ~ 1e12 -> exp underflows to exactly 0) and u with zeros, so padded
rows/cols neither receive nor donate mass — same trick as
S3DISTrainer.room_label_prop's just-outside-the-room pad blocks (the
kernel's own pads can sit at huge coordinates because they are added
AFTER the caller's centering; caller-side pads must stay near the real
cloud — see room_label_prop). Tiles containing pad
points get huge bounding boxes; their blocks against REAL tiles have
d_lb > cutoff and skip, while all-pad tile pairs compute harmless zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(mask_ref, rows_ref, cols_ref, u_ref, out_ref):
    """One (row-tile i, col-tile j) block of out^T += u_j^T @ exp(-d^2)^T.

    mask_ref: [B, n_row_tiles, n_col_tiles] int32, the WHOLE skip mask as
              a scalar-prefetch operand in SMEM (a per-block (1,1,1)
              BlockSpec only lowers when the grid is a single tile —
              Mosaic requires SMEM blocks to equal the array dims);
              0 skips the block (bbox cutoff)
    rows_ref: [1, F, TR] row feats (transposed, indexed by i)
    cols_ref: [1, F, TC] col feats (same array, indexed by j)
    u_ref:    [1, TC, K] col u block (indexed by j)
    out_ref:  [1, K, TR] out^T row block (indexed by i, revisited over j)
    """
    bi, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(mask_ref[bi, i, j] > 0)
    def _():
        rows = rows_ref[0]  # [F, TR] f32
        cols = cols_ref[0]  # [F, TC] f32
        u = u_ref[0]        # [TC, K] f32
        # Gram^T [TC, TR] on the MXU, f32 HIGHEST (precision-critical:
        # bf16 operands put ~1e-2 on d^2 and the exp amplifies it e^(+-10)
        # — the round-5 affinity precision bug; Mosaic honors HIGHEST,
        # measured d^2 err 3.8e-6 vs 7.8e-2 at DEFAULT)
        inner_t = jax.lax.dot_general(
            cols, rows, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TC, TR]
        rsq = jnp.sum(rows * rows, axis=0)[None, :]   # [1, TR]
        csq = jnp.sum(cols * cols, axis=0)[:, None]   # [TC, 1]
        d = jnp.maximum(csq - 2.0 * inner_t + rsq, 0.0)
        w_t = jnp.exp(-d)  # [TC, TR]
        # apply: u^T @ W^T with K on the sublane axis. Also HIGHEST: a
        # DEFAULT (bf16-input) apply puts ~2e-3 relative noise on every
        # matvec, which stalls CG around that level; the dot is K<=16-
        # sublane cheap either way.
        contrib = jax.lax.dot_general(
            u, w_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [K, TR]
        out_ref[0] += contrib


def _tile_bbox(feat: jax.Array, tile: int) -> tuple:
    """Per-tile (min, max) over the point axis: [B, n_tiles, F] each."""
    b, n, f = feat.shape
    r = feat.reshape(b, n // tile, tile, f)
    return jnp.min(r, axis=2), jnp.max(r, axis=2)


def _skip_mask(feat: jax.Array, tr: int, tc: int, cutoff: float) -> jax.Array:
    """int32 [B, n_row_tiles, n_col_tiles]: 1 where the blocks' bbox
    distance lower bound <= cutoff (must be computed), else 0."""
    rmin, rmax = _tile_bbox(feat, tr)
    cmin, cmax = _tile_bbox(feat, tc)
    gap = jnp.maximum(
        rmin[:, :, None] - cmax[:, None, :],
        cmin[:, None, :] - rmax[:, :, None])  # [B, ni, nj, F]
    d_lb = jnp.sum(jnp.square(jnp.maximum(gap, 0.0)), axis=-1)
    return (d_lb <= cutoff).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("row_tile", "col_tile", "skip_cutoff", "interpret"))
def affinity_matvec_pallas(
    feat: jax.Array,   # [B, N, F] bandwidth-pre-scaled features, f32
    u: jax.Array,      # [B, N, K] f32
    *,
    row_tile: int = 512,
    col_tile: int = 1024,
    skip_cutoff: float = 30.0,
    interpret: bool = False,
) -> jax.Array:
    """out [B, N, K] = exp(-clamped pdist2(feat)) @ u, nothing O(N^2) in HBM.

    N is padded internally to a tile multiple with far-away points
    (affinity exactly 0 after exp underflow) and the result sliced back.
    ``skip_cutoff``: tile blocks whose bounding boxes are farther than
    this squared feature distance are skipped entirely (every skipped
    affinity <= exp(-cutoff) = 9e-14 at the default); pass ``None`` to
    compute all blocks.
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
    feat = feat.astype(jnp.float32)
    if skip_cutoff is None:
        mask = jnp.ones((b, n_pad // tr, n_pad // tc), jnp.int32)
    else:
        mask = _skip_mask(feat, tr, tc, float(skip_cutoff))
    feat_t = jnp.swapaxes(feat, 1, 2)  # [B, F, N]
    u = u.astype(jnp.float32)

    out_t = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the mask rides SMEM whole
            grid=(b, n_pad // tr, n_pad // tc),
            in_specs=[
                pl.BlockSpec((1, f, tr), lambda bi, i, j, m: (bi, 0, i)),
                pl.BlockSpec((1, f, tc), lambda bi, i, j, m: (bi, 0, j)),
                pl.BlockSpec((1, tc, k), lambda bi, i, j, m: (bi, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, k, tr), lambda bi, i, j, m: (bi, 0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, n_pad), jnp.float32),
        interpret=interpret,
    )(mask, feat_t, feat_t, u)
    return jnp.swapaxes(out_t, 1, 2)[:, :n]


def _kernel_t(mask_ref, rows_ref, cols_ref, ut_ref, out_ref):
    """Transposed-IO sibling of ``_kernel``: the u operand arrives as
    out^T-layout blocks [1, K, TC] (K on sublanes, TC on lanes) instead
    of [1, TC, K] (K on LANES — 13 of 128 used on every DMA/VREG op).
    Round-5 measurement (docs/kernels.md "room-LP, transposed CG"): the
    straight kernel runs 30 ms/apply when its u operand is the raw loop
    carry but 50 ms when u is any freshly-computed temporary (every CG
    iteration computes u = s*p) — the [N, K] layout is the difference;
    keeping the whole CG in [B, K, N] space removes it."""
    bi, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(mask_ref[bi, i, j] > 0)
    def _():
        rows = rows_ref[0]  # [F, TR] f32
        cols = cols_ref[0]  # [F, TC] f32
        ut = ut_ref[0]      # [K, TC] f32
        inner_t = jax.lax.dot_general(
            cols, rows, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TC, TR]
        rsq = jnp.sum(rows * rows, axis=0)[None, :]
        csq = jnp.sum(cols * cols, axis=0)[:, None]
        w_t = jnp.exp(-jnp.maximum(csq - 2.0 * inner_t + rsq, 0.0))
        contrib = jax.lax.dot_general(
            ut, w_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [K, TR]
        out_ref[0] += contrib


def _skip_mask_t(feat_t: jax.Array, tr: int, tc: int,
                 cutoff: float) -> jax.Array:
    """_skip_mask on transposed features [B, F, N] (bbox over the N axis
    directly — no transpose materialization)."""
    b, f, n = feat_t.shape
    rr = feat_t.reshape(b, f, n // tr, tr)
    cc = feat_t.reshape(b, f, n // tc, tc)
    rmin, rmax = jnp.min(rr, axis=3), jnp.max(rr, axis=3)  # [B, F, ni]
    cmin, cmax = jnp.min(cc, axis=3), jnp.max(cc, axis=3)
    gap = jnp.maximum(rmin[:, :, :, None] - cmax[:, :, None, :],
                      cmin[:, :, None, :] - rmax[:, :, :, None])
    d_lb = jnp.sum(jnp.square(jnp.maximum(gap, 0.0)), axis=1)  # [B, ni, nj]
    return (d_lb <= cutoff).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("row_tile", "col_tile", "skip_cutoff", "interpret"))
def affinity_matvec_pallas_t(
    feat_t: jax.Array,  # [B, F, N] pre-scaled features, TRANSPOSED, f32
    ut: jax.Array,      # [B, K, N] f32, TRANSPOSED
    *,
    row_tile: int = 512,
    col_tile: int = 512,
    skip_cutoff: float = 30.0,
    interpret: bool = False,
) -> jax.Array:
    """out^T [B, K, N] = (exp(-clamped pdist2(feat)) @ u)^T, all IO in the
    kernel's native transposed layout. Semantically identical to
    ``affinity_matvec_pallas`` modulo the two transposes; use this from
    iterative solvers that can keep their state in [B, K, N] space
    (propagate/label_prop.py::label_propagation_matfree does) — it is
    ~1.7x faster per apply inside loops whose u is computed per
    iteration (see _kernel_t docstring). N must already be padded to a
    multiple of both tiles (far-coordinate pad rule as the caller
    contract in the module docstring)."""
    b, f, n = feat_t.shape
    k = ut.shape[1]
    tr, tc = row_tile, col_tile
    if n % tr or n % tc:
        raise ValueError(f"N={n} must be a multiple of both tiles "
                         f"({tr}, {tc}); pre-pad with far-away points")
    feat_t = feat_t.astype(jnp.float32)
    if skip_cutoff is None:
        mask = jnp.ones((b, n // tr, n // tc), jnp.int32)
    else:
        mask = _skip_mask_t(feat_t, tr, tc, float(skip_cutoff))
    return pl.pallas_call(
        _kernel_t,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n // tr, n // tc),
            in_specs=[
                pl.BlockSpec((1, f, tr), lambda bi, i, j, m: (bi, 0, i)),
                pl.BlockSpec((1, f, tc), lambda bi, i, j, m: (bi, 0, j)),
                pl.BlockSpec((1, k, tc), lambda bi, i, j, m: (bi, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, k, tr), lambda bi, i, j, m: (bi, 0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, n), jnp.float32),
        interpret=interpret,
    )(mask, feat_t, feat_t, ut.astype(jnp.float32))


def morton_order(xyz: jax.Array, bits: int = 10) -> jax.Array:
    """Z-order (morton) sort permutation of [B, N, 3] points: [B, N] int32.

    Quantizes each axis to ``bits`` over its per-batch range and
    interleaves the bits. Used to give the skip mask spatial locality —
    the ORDER never affects correctness (the bbox bound is exact), only
    how many tile blocks survive the cutoff.
    """
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    q = ((xyz - lo) / jnp.maximum(hi - lo, 1e-12)
         * (2 ** bits - 1)).astype(jnp.int32)

    def spread(v):  # interleave zeros between bits (10 -> 30)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    key = (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
           | (spread(q[..., 2]) << 2))
    return jnp.argsort(key, axis=1).astype(jnp.int32)


def supported(backend: str | None = None) -> bool:
    """True when the fused kernel can run (compiled Mosaic on TPU)."""
    be = backend or jax.default_backend()
    return be in ("tpu", "axon")
