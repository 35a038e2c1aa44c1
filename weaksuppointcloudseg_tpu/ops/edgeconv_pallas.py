"""Fused kNN + neighbor-gather Pallas kernel (the EdgeConv front half).

The reference's EdgeConv front half is pairwise_distance -> top_k -> gather
(tf_util.py:638-706). Running the kNN selection and the gather as separate
kernels pays twice for the same [rows, N] one-hot information: the
standalone one-hot-matmul gather spends ~10 ms/call just *constructing*
one-hot masks from indices (iota + compare over [B*N*k, N] on the VPU) —
masks the kNN selection loop had already computed as its winner/knock-out
test. This kernel fuses:

    distance tile (MXU) -> k selection rounds (VPU)
                        -> per-round winner-mask @ F gather (MXU)

emitting neighbor features [B, N, k, Cf] and indices, with the B x N x N
distance matrix never leaving VMEM and zero extra mask-construction work.
Measured at the flagship shape (B=64, N=2048, k=20, Cf=64, bf16): separate
exact kNN + Pallas gather 22.9 ms -> fused exact 13.4 ms (bit-identical
outputs); separate fast 21.3 ms -> fused fast 12.1 ms.

Exactness: every gather output element has exactly ONE nonzero product
(0/1 winner mask), so for bf16 features the MXU matmul result is bit-exact.
f32 features would be corrupted by MXU operand rounding — callers
(ops/neighbors.py) dispatch the f32 path to XLA's gather instead.

``fast=True`` uses the packed-min selection of ops/knn_pallas.py (distance
bits and column index share one int32; 1 min/round instead of 2 reduction
passes) at the cost of the low mantissa bits — near-ties may reorder vs
``lax.top_k`` (98.7-99.7% index agreement at the flagship shapes).

``with_values=True`` additionally emits the selected squared distances
(f32) — the smoothness loss consumes exp(-d/gamma) weights
(Util/SmoothConstraint.py:154-158); values carry no gradient.

Gradients: selection is non-differentiable; neighbor features are linear in
F, so the custom VJP scatter-adds the cotangent back through the saved
indices (round-major Pallas scatter on TPU, ops/scatter_pallas.py). The
graph-source input ``g`` gets no gradient (matches the reference: kNN
indices come from ``tf.nn.top_k``, which TF does not differentiate either).
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


def aligned_tile_rows(tile_rows: int, vmem_limit: int) -> int:
    """VMEM-budget row-tile clamp, 8-aligned.

    Pallas requires the second-to-last block dimension to be a multiple
    of 8 (or the full array dim); a raw ``min(tile_rows, budget)`` clamp
    produced tm=341 at N=3000 (round-up padding 3072) and refused to
    lower. Every VMEM-capped kernel tile must round DOWN through this
    helper (floor 8 keeps the tile legal for any budget).
    """
    return max(8, min(tile_rows, vmem_limit) // 8 * 8)


def _collapsed_weight_matmul(wc, rhs, dims):
    """One matmul over a combined weighted one-hot matrix ``wc`` (f32).

    Weighted-SUM aggregations (the smoothness loss's gather and its
    scatter VJP) commute with the round sum: sum_r w_r * (onehot_r @ F)
    == (sum_r w_r * onehot_r) @ F, so ONE matmul replaces k per-round
    one-hot matmuls — k-fold less MXU work. (The EdgeConv stages can't
    use this: their round reduction is a max.) For a bf16 ``rhs`` the
    f32 weights are split into bf16 hi + lo parts (two matmuls, error
    ~2^-16 relative vs the exact-gather-then-f32-weight formulation —
    below the paths' existing bf16 input rounding).
    """
    if rhs.dtype == jnp.bfloat16:
        hi = wc.astype(jnp.bfloat16)
        lo = (wc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(hi, rhs, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
        return out + jax.lax.dot_general(lo, rhs, dimension_numbers=dims,
                                         preferred_element_type=jnp.float32)
    return jax.lax.dot_general(wc.astype(rhs.dtype), rhs,
                               dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _accumulate_weight_onehot(idxs, ws, col_ids):
    """Combined weighted one-hot matrix from (idx, w) columns.

    wc[t, n] = sum_r ws[t, r] * 1[idxs[t, r] == n], f32 [TM, Np]. The
    single input matrix for _collapsed_weight_matmul — shared by the
    gather (_kernel_wagg_pre) and its VJP scatter (_scatter_w_kernel) so
    the two sides can never desynchronize. Padded rows must carry
    idx >= Np or w == 0 (both conventions in use).
    """
    wc = jnp.zeros(col_ids.shape, jnp.float32)
    for r in range(idxs.shape[1]):
        wc = wc + jnp.where(col_ids == idxs[:, r:r + 1],
                            ws[:, r:r + 1], 0.0)
    return wc


def _distance_tile(g_rows, g_all):
    d = -2.0 * jax.lax.dot_general(
        g_rows, g_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(jnp.square(g_rows.astype(jnp.float32)), axis=1,
                    keepdims=True)
    d = d + jnp.sum(jnp.square(g_all.astype(jnp.float32)), axis=1)[None, :]
    return d


# Gather matmuls are issued in chunks of this many rounds: the selection
# passes for rounds c..c+CHUNK run first, then their MXU matmuls
# back-to-back. Standalone microbench 11.9 -> 10.5 ms per call at B=64,
# N=2048, k=20, Cf=64 vs the interleaved per-round structure (identical
# indices) — but a WASH end-to-end (138.2 vs 138.9 ms/step, within
# noise): in the full step Mosaic already overlaps the interleaved
# rounds. Kept because it also hosts the shared _selection_rounds
# dedup; chunk=20 keeps all masks alive and spills scoped VMEM at
# TM=256.
MM_CHUNK = 10


# Knockout-free fast selection: packed values are STRICTLY unique (the
# column index lives in the low bits), so round r+1's winner is simply the
# minimum of the values strictly greater than round r's — a masked
# min-reduce over the UNCHANGED x. This removes the per-round knockout
# write-back (3 memory passes/round -> 2): microbenched before flipping.
KNOCKOUT_FREE_FAST = False


def _selection_rounds(x, col_ids, k, *, fast: bool, idx_bits: int,
                      n_pad: int):
    """Yield k rounds of (idx [TM,1], sel bool [TM,Np], sqdist [TM,1] f32).

    ``fast``: x is the packed int32 (distance bits | column); 1 min/round.
    exact: x is the f32 distance tile; min + lowest-index tie-break —
    ordering identical to jax.lax.top_k(-d, k).
    """
    mask = (1 << idx_bits) - 1
    if fast and KNOCKOUT_FREE_FAST:
        m = None
        for _ in range(k):
            if m is None:
                m = jnp.min(x, axis=1, keepdims=True)
            else:
                m = jnp.min(jnp.where(x > m, x, jnp.int32(0x7F7FFFFF)),
                            axis=1, keepdims=True)
            idx = m & mask
            val = jax.lax.bitcast_convert_type(m & ~mask, jnp.float32)
            yield idx, col_ids == idx, val
        return
    for _ in range(k):
        m = jnp.min(x, axis=1, keepdims=True)
        if fast:
            idx = m & mask
            val = jax.lax.bitcast_convert_type(m & ~mask, jnp.float32)
        else:
            idx = jnp.min(jnp.where(x == m, col_ids, n_pad), axis=1,
                          keepdims=True)
            val = m
        sel = col_ids == idx
        yield idx, sel, val
        x = jnp.where(sel, jnp.int32(0x7F7FFFFF) if fast else jnp.inf, x)


def _pack_distances(d, col_ids, idx_bits, n_valid, n_pad):
    """f32 distances -> packed int32 (bits | column); d must be >= 0."""
    mask = (1 << idx_bits) - 1
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    packed = (bits & ~mask) | col_ids
    if n_valid < n_pad:
        packed = jnp.where(col_ids < n_valid, packed,
                           jnp.int32(0x7F000000) | col_ids)
    return packed


def _kernel_knn_gather(g_rows_ref, g_all_ref, f_all_ref, idx_ref, nbr_ref,
                       val_ref, *, k: int, n_valid: int, n_pad: int,
                       fast: bool, idx_bits: int):
    g_rows = g_rows_ref[0]  # [TM, Cgp]
    g_all = g_all_ref[0]    # [Np, Cgp]
    f_all = f_all_ref[0]    # [Np, Cf]
    tm = g_rows.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    if fast:
        d = jnp.maximum(_distance_tile(g_rows, g_all), 0.0)
        x = _pack_distances(d, col_ids, idx_bits, n_valid, n_pad)
    else:
        x = _distance_tile(g_rows, g_all)
        if n_valid < n_pad:
            x = jnp.where(col_ids < n_valid, x, jnp.inf)

    rounds = _selection_rounds(x, col_ids, k, fast=fast, idx_bits=idx_bits,
                               n_pad=n_pad)
    idx_cols, nbr_slabs, val_cols = [], [], []
    for c0 in range(0, k, MM_CHUNK):
        sels = []
        for _ in range(min(MM_CHUNK, k - c0)):
            idx, sel, val = next(rounds)
            idx_cols.append(idx)
            val_cols.append(val)
            sels.append(sel.astype(f_all.dtype))
        for sel in sels:  # back-to-back MXU gathers (see MM_CHUNK)
            nbr_slabs.append(jax.lax.dot_general(
                sel, f_all,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(f_all.dtype))

    idx_ref[0] = jnp.concatenate(idx_cols, axis=1)
    nbr_ref[0] = jnp.concatenate(nbr_slabs, axis=1)  # [TM, k*Cf]
    if val_ref is not None:
        val_ref[0] = jnp.concatenate(val_cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "row_tile", "interpret", "fast", "with_values"),
)
def _knn_gather_fwd_impl(
    g: jax.Array, f: jax.Array, k: int, row_tile: int, interpret: bool,
    fast: bool = False, with_values: bool = False,
):
    b, n, cg = g.shape
    cf = f.shape[-1]
    # Pad the gathered-feature channel to a sublane multiple — the in-kernel
    # [TM, k*Cf] lane concat of very narrow slabs (Cf=3) upsets Mosaic
    # relayouts otherwise.
    cf_pad = _round_up(cf, 8)
    if cf_pad != cf:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, cf_pad - cf)))
    tm = min(row_tile, _round_up(n, 8))
    # keep the [TM, Np] f32 distance tile around ~4 MB for very large N
    budget = (4 << 20) * max(1, (row_tile + 255) // 256)
    tm = max(8, min(tm, _round_up(budget // (4 * max(n, 1)), 8)))
    n_pad = _round_up(n, tm)
    cg_pad = _round_up(cg, LANE)
    if (n_pad, cg_pad) != (n, cg):
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, cg_pad - cg)))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n), (0, 0)))

    idx_bits = max(1, (n_pad - 1).bit_length())
    kernel = functools.partial(
        _kernel_knn_gather, k=k, n_valid=n, n_pad=n_pad, fast=fast,
        idx_bits=idx_bits)
    if not with_values:
        kernel = functools.partial(kernel, val_ref=None)

    block_in = [
        pl.BlockSpec((1, tm, cg_pad), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, cg_pad), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, cf_pad), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, k * cf_pad), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
        jax.ShapeDtypeStruct((b, n_pad, k * cf_pad), f.dtype),
    ]
    if with_values:
        out_specs.append(
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, n_pad, k), jnp.float32))

    grid = (b, n_pad // tm)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=block_in,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        # headroom past Mosaic's default 16 MB scoped-vmem budget: the
        # distance tile cap above only models the [TM, Np] f32 tile, not
        # the nbr output block / packed copy (a row_tile=512 call at small
        # Cf lands ~36 KB over the default)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20) * max(1, (row_tile + 255) // 256)),
    )(g, g, f)
    idx, nbr = outs[0], outs[1]
    nbr = nbr[:, :n].reshape(b, n, k, cf_pad)
    if cf_pad != cf:
        nbr = nbr[..., :cf]
    if with_values:
        return idx[:, :n], nbr, outs[2][:, :n]
    return idx[:, :n], nbr


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def knn_gather(g, f, k: int, row_tile: int = 256, interpret: bool = False,
               fast: bool = False):
    """Fused kNN graph + neighbor-feature gather.

    Args:
      g: [B, N, Cg] coordinates/features the graph is built on (no grad).
      f: [B, N, Cf] features to gather at the k nearest neighbors of each
        point (grad flows via scatter in the VJP). bf16 recommended — the
        in-kernel gather is bit-exact for bf16 and MXU-rounded for f32.
      fast: packed-min selection (see module docstring).

    Returns:
      (idx int32 [B, N, k], neighbors [B, N, k, Cf]).
    """
    return _knn_gather_fwd_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, row_tile,
        interpret, fast)


def _scatter_back(idx, g_nbr, f_zeros, interpret):
    b, n, _ = f_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_pallas,
        )

        return scatter_add_pallas(idx, g_nbr.astype(f_zeros.dtype), n)
    bidx = jnp.arange(b)[:, None, None]
    return f_zeros.at[bidx, idx].add(g_nbr.astype(f_zeros.dtype))


def _make_vjp(with_values: bool):
    """Shared fwd/bwd pair: the two public entry points differ only in the
    gradient-free sqdist output, so one definition serves both (a fix to
    the residual/scatter logic cannot drift between them)."""

    def fwd(g, f, k, row_tile, interpret, fast):
        out = _knn_gather_fwd_impl(
            jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, row_tile,
            interpret, fast, with_values=with_values)
        # zeros_like placeholders carry shape/dtype through the residual
        # pytree (XLA dead-code-eliminates them; only idx is materialized)
        return out, (out[0], jnp.zeros_like(g), jnp.zeros_like(f))

    def bwd(k, row_tile, interpret, fast, res, cts):
        idx, g_zeros, f_zeros = res
        g_nbr = cts[1]  # cotangent of the neighbor features [B, N, k, Cf]
        df = _scatter_back(idx, g_nbr, f_zeros, interpret)
        return (g_zeros, df)  # selection is non-differentiable -> zero dg

    return fwd, bwd


knn_gather.defvjp(*_make_vjp(with_values=False))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def knn_gather_with_sqdist(g, f, k: int, row_tile: int = 256,
                           interpret: bool = False, fast: bool = False):
    """As ``knn_gather`` but also returns the selected squared distances
    (f32 [B, N, k], gradient-free) — one fused kernel for the smoothness
    loss's weights + neighbor gather (Util/SmoothConstraint.py:140-158)."""
    return _knn_gather_fwd_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, row_tile,
        interpret, fast, with_values=True)


knn_gather_with_sqdist.defvjp(*_make_vjp(with_values=True))


def _kernel_edge(g_rows_ref, g_all_ref, v_all_ref, u_rows_ref, idx_ref,
                 y_ref, mom_ref, ymax_ref, amax_ref, ymin_ref, amin_ref,
                 val_ref, *, k: int, n_valid: int, n_pad: int, fast: bool,
                 idx_bits: int, tiles: int = 1):
    g_all = g_all_ref[0]
    v_all = v_all_ref[0]
    tm = g_rows_ref.shape[1] // tiles
    co = v_all.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    minmax = ymax_ref is not None

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        mom_ref[...] = jnp.zeros_like(mom_ref)

    ysum = jnp.zeros((1, co), jnp.float32)
    ysq = jnp.zeros((1, co), jnp.float32)
    # ``tiles`` row-tiles per grid step: the [TM, Np] distance tile and
    # selection state stay one-sub-tile-sized while the grid (and its
    # per-step overhead) shrinks ``tiles``-fold — see docs/kernels.md
    # round-3 notes.
    for t in range(tiles):
        rs = slice(t * tm, (t + 1) * tm)
        # tiles == 1 must load/store full blocks: a degenerate full-range
        # ref slice triggers a pathologically slow Mosaic lowering on this
        # backend (ops/scatter_pallas.py::_row_view)
        one = tiles == 1
        g_rows = g_rows_ref[0] if one else g_rows_ref[0, rs]
        u32 = (u_rows_ref[0] if one else u_rows_ref[0, rs]).astype(
            jnp.float32)

        if fast:
            d = jnp.maximum(_distance_tile(g_rows, g_all), 0.0)
            x = _pack_distances(d, col_ids, idx_bits, n_valid, n_pad)
        else:
            x = _distance_tile(g_rows, g_all)
            if n_valid < n_pad:
                x = jnp.where(col_ids < n_valid, x, jnp.inf)

        row_valid = None
        if n_valid < n_pad:
            # padded ROWS would contaminate the moment accumulators
            i = pl.program_id(1)
            row_ids = (jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
                       + i * tiles * tm + t * tm)
            row_valid = row_ids < n_valid

        rounds = _selection_rounds(x, col_ids, k, fast=fast,
                                   idx_bits=idx_bits, n_pad=n_pad)
        idx_cols, y_slabs, val_cols = [], [], []
        ymax = ymin = amax = amin = None
        for c0 in range(0, k, MM_CHUNK):
            sels = []
            for _ in range(min(MM_CHUNK, k - c0)):
                idx, sel, val = next(rounds)
                idx_cols.append(idx)
                if val_ref is not None:
                    val_cols.append(val)
                sels.append(sel.astype(v_all.dtype))
            for sel in sels:  # back-to-back MXU gather+conv (see MM_CHUNK)
                gath = jax.lax.dot_general(  # gather of v, exact for bf16 v
                    sel, v_all,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = (gath + u32).astype(v_all.dtype)
                if row_valid is not None:
                    y = jnp.where(row_valid, y, jnp.zeros_like(y))
                y32 = y.astype(jnp.float32)
                ysum = ysum + jnp.sum(y32, axis=0, keepdims=True)
                ysq = ysq + jnp.sum(jnp.square(y32), axis=0, keepdims=True)
                if minmax:
                    # per-channel k-extrema of the rounded y, tracked on the
                    # exact f32 upcast (32-bit masks throughout — see
                    # ops/conv_kmax_pallas.py); first winner keeps ties
                    j = len(y_slabs)
                    if j == 0:
                        ymax = ymin = y32
                        amax = amin = jnp.zeros_like(y32, jnp.int32)
                    else:
                        gt = y32 > ymax
                        lt = y32 < ymin
                        jvec = jnp.full(y32.shape, j, jnp.int32)
                        ymax = jnp.where(gt, y32, ymax)
                        amax = jnp.where(gt, jvec, amax)
                        ymin = jnp.where(lt, y32, ymin)
                        amin = jnp.where(lt, jvec, amin)
                y_slabs.append(y)
        if minmax:
            if one:
                ymax_ref[0] = ymax.astype(v_all.dtype)
                amax_ref[0] = amax
                ymin_ref[0] = ymin.astype(v_all.dtype)
                amin_ref[0] = amin
            else:
                ymax_ref[0, rs] = ymax.astype(v_all.dtype)
                amax_ref[0, rs] = amax
                ymin_ref[0, rs] = ymin.astype(v_all.dtype)
                amin_ref[0, rs] = amin
        if one:
            idx_ref[0] = jnp.concatenate(idx_cols, axis=1)
            y_ref[0] = jnp.concatenate(y_slabs, axis=1)
            if val_ref is not None:
                val_ref[0] = jnp.concatenate(val_cols, axis=1)
        else:
            idx_ref[0, rs] = jnp.concatenate(idx_cols, axis=1)
            y_ref[0, rs] = jnp.concatenate(y_slabs, axis=1)
            if val_ref is not None:
                val_ref[0, rs] = jnp.concatenate(val_cols, axis=1)

    pad = jnp.zeros((6, co), jnp.float32)
    mom_ref[...] += jnp.concatenate([ysum, ysq, pad], axis=0)


def auto_row_tile(n: int) -> int:
    """Measured row-tile optimum for the selection kernels by candidate
    width N (docs/kernels.md round 4 tile sweeps, v5e, bf16+fast):

    - N=2048 (ShapeNet train): 256/2 98.2 ms/step vs 128/2 99.1 — 256 wins.
    - N=3072 (ShapeNet eval, padded test views): 128/2 50.8 ms vs 256/2
      58.3 — the [128, N] distance tile pipelines ~13% better once the
      tile passes ~3k columns.
    - N=4096 (S3DIS train): 128/2 122.6 ms/step vs 256/2 129.3.

    tiles_per_step stays 2 everywhere (never lost a sweep). The impl's
    VMEM-budget clamp still applies on top of this choice.
    """
    return 128 if n >= 2560 else 256


def eval_pad_multiple() -> int:
    """Alignment target for the eval pad-once fast path (train/steps.py).

    The eval step pads N up front to a multiple of this so that NO fused
    kernel re-pads internally (re-padding would bring back the XLA
    pad/slice pairs the fast path exists to remove). It must therefore be
    a common multiple of every kernel's internal row step at the padded
    width: the selection kernels step by row_tile * tiles_per_step =
    2 * auto_row_tile(n) — 512 in the <2560 regime, 256 above it — and
    the conv/scatter kernels tile at <= 512 8-aligned rows (their VMEM
    clamps do not bind at the supported channel widths). 512 covers all
    of them; ``tests/test_edgeconv_pallas.py`` pins the selection-step
    property.
    """
    return 512


@functools.partial(
    jax.jit,
    static_argnames=("k", "row_tile", "interpret", "fast", "with_minmax",
                     "tiles_per_step", "with_values", "n_valid"))
def _knn_edge_impl(g, v, u, k: int, row_tile: int, interpret: bool,
                   fast: bool, with_minmax: bool = False,
                   tiles_per_step: int = 2, with_values: bool = False,
                   n_valid=None):
    # n_valid: with pre-padded inputs (eval pads N once up front), only
    # columns < n_valid are neighbor candidates; rows past it produce
    # garbage outputs the caller discards. Defaults to every input row.
    # tiles_per_step=2 default: halves the grid's per-step overhead while
    # the selection state stays one-sub-tile-sized (microbench at B=64,
    # N=2048, k=20, C=64 bf16: 12.07 -> 11.88 ms with minmax, 14.02 ->
    # 11.48 without; tiles=4 regresses — docs/kernels.md round 3)
    b, n, cg = g.shape
    co = v.shape[-1]
    co_pad = _round_up(co, 8)
    if co_pad != co:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, co_pad - co)))
        u = jnp.pad(u, ((0, 0), (0, 0), (0, co_pad - co)))
    tm = min(row_tile, _round_up(n, 8))
    budget = (4 << 20) * max(1, (row_tile + 255) // 256)
    tm = max(8, min(tm, _round_up(budget // (4 * max(n, 1)), 8)))
    # rows per grid step: `tiles` sub-tiles of tm rows each (the selection
    # state stays [tm, Np]-sized; only block IO doubles)
    tiles = max(1, min(tiles_per_step, max(1, n // tm)))
    tr = tiles * tm
    n_pad = _round_up(n, tr)
    cg_pad = _round_up(cg, LANE)
    if (n_pad, cg_pad) != (n, cg):
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, cg_pad - cg)))
    if n_pad != n:
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, n_pad - n), (0, 0)))

    idx_bits = max(1, (n_pad - 1).bit_length()) if fast else 0
    base = functools.partial(
        _kernel_edge, k=k,
        n_valid=n if n_valid is None else min(n_valid, n), n_pad=n_pad,
        fast=fast, idx_bits=idx_bits, tiles=tiles)
    # pallas passes output refs positionally in out_specs order
    # (idx, y, mom[, minmax x4][, val]); route them to the right params
    if with_minmax and with_values:
        kernel = base
    elif with_minmax:
        kernel = functools.partial(base, val_ref=None)
    elif with_values:
        def kernel(g_r, g_a, v_a, u_r, idx_r, y_r, mom_r, val_r):
            base(g_r, g_a, v_a, u_r, idx_r, y_r, mom_r, None, None, None,
                 None, val_r)
    else:
        kernel = functools.partial(
            base, ymax_ref=None, amax_ref=None, ymin_ref=None,
            amin_ref=None, val_ref=None)
    row_spec = pl.BlockSpec((1, tr, co_pad), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tr, k * co_pad), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, co_pad), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
        jax.ShapeDtypeStruct((b, n_pad, k * co_pad), v.dtype),
        jax.ShapeDtypeStruct((8, co_pad), jnp.float32),
    ]
    if with_minmax:
        out_specs += [row_spec, row_spec, row_spec, row_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b, n_pad, co_pad), v.dtype),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), v.dtype),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), jnp.int32),
        ]
    if with_values:
        out_specs.append(
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, n_pad, k), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tr),
        in_specs=[
            pl.BlockSpec((1, tr, cg_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cg_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, co_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, co_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20) * max(
                1, (row_tile + 255) // 256) * tiles),
    )(g, g, v, u)
    idx, y, mom = outs[0], outs[1], outs[2]
    y = y[:, :n].reshape(b, n, k, co_pad)
    if co_pad != co:
        y = y[..., :co]
    tail = (outs[-1][:, :n],) if with_values else ()
    if with_minmax:
        sl = (slice(None), slice(0, n), slice(0, co))
        return (idx[:, :n], y, mom[:2, :co], outs[3][sl], outs[4][sl],
                outs[5][sl], outs[6][sl]) + tail
    return (idx[:, :n], y, mom[:2, :co]) + tail


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def knn_edge_gather(g, v, u, k: int, row_tile: int = 256,
                    interpret: bool = False, fast: bool = False):
    """Fused kNN + first-EdgeConv-conv: ``y[b,n,j,:] = v[b,idx_j,:] + u[b,n,:]``.

    The first conv of an EdgeConv stage (tf_util.py:115-173 applied to the
    edge features of tf_util.py:674-706) factors as

        conv(concat([f_i, f_j - f_i])) = f_i (W_top - W_bot) + f_j W_bot
                                       = u_i + v_j

    so with the TINY per-point matmuls u = f @ (W_top - W_bot) + bias and
    v = f @ W_bot done in XLA ([B,N,C] tensors), the k-times-larger conv
    over the [B,N,k,2C] edge tensor reduces to adding ``u`` to each kNN
    selection round's gather of ``v`` — one extra [TM, Cout] add per round
    inside the kernel. The edge tensor, the gathered-neighbor tensor, and
    the big conv matmul all disappear from HBM. (The same decomposition
    applied OUTSIDE the kernel measured slower — XLA re-materializes the
    gathered v — docs/kernels.md; inside the kernel the gather is the
    selection round's existing mask matmul.)

    Also emits the channel sums needed by batch norm: ``mom[0] = sum(y)``,
    ``mom[1] = sum(y^2)`` over all (b, n, j) — accumulated in-kernel from
    the bf16-rounded y (identical to what a moments pass over the stored y
    would read), saving the [B,N,k,C] reduce pass.

    Gradients: y is linear in (v, u); sums flow via
    ``dy_eff = dy + dmom[0] + 2 y dmom[1]``, then ``du = sum_j dy_eff``
    and ``dv = scatter_add(idx, dy_eff)`` (round-major Pallas kernel on
    TPU). ``g`` carries no gradient (top-k selection, as in the
    reference's tf.nn.top_k).

    Returns:
      (idx int32 [B,N,k], y [B,N,k,Cout] (v's dtype), mom f32 [2, Cout]).
    """
    return _knn_edge_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, row_tile, interpret, fast)


def _knn_edge_fwd(g, v, u, k, row_tile, interpret, fast):
    out = _knn_edge_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, row_tile, interpret, fast)
    idx, y, _ = out
    return out, (idx, y, jnp.zeros_like(g), jnp.zeros_like(v),
                 jnp.zeros_like(u))


def _knn_edge_bwd(k, row_tile, interpret, fast, res, cts):
    idx, y, g_zeros, v_zeros, u_zeros = res
    dy, dmom = cts[1], cts[2]
    y32 = y.astype(jnp.float32)
    dy_eff = (dy.astype(jnp.float32) + dmom[0]
              + 2.0 * y32 * dmom[1]).astype(y.dtype)
    du = jnp.sum(dy_eff.astype(jnp.float32), axis=2).astype(u_zeros.dtype)
    b, n, _ = v_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_pallas,
        )

        dv = scatter_add_pallas(idx, dy_eff, n).astype(v_zeros.dtype)
    else:
        bidx = jnp.arange(b)[:, None, None]
        dv = v_zeros.at[bidx, idx].add(dy_eff.astype(v_zeros.dtype))
    return (g_zeros, dv, du)


knn_edge_gather.defvjp(_knn_edge_fwd, _knn_edge_bwd)


def _kernel_edge_pre(idx_rows_ref, v_all_ref, u_rows_ref, y_ref, mom_ref,
                     ymax_ref, amax_ref, ymin_ref, amin_ref, *, k: int,
                     n_valid: int, n_pad: int, tiles: int = 1):
    """``_kernel_edge`` with the kNN graph PRECOMPUTED (static-graph mode).

    The distance matmul, the packing pass, and the per-round min-reduce +
    knockout of ``_selection_rounds`` (~3 VPU passes/round over [TM, Np])
    are replaced by ONE broadcast-compare per round rebuilding the one-hot
    mask from ``idx`` — the MXU gather+conv, the in-kernel moments, and
    the optional per-channel k-extrema are identical to the selecting
    kernel, so the outputs match it bit-for-bit given the same indices.
    """
    v_all = v_all_ref[0]
    tm = idx_rows_ref.shape[1] // tiles
    co = v_all.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    minmax = ymax_ref is not None

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        mom_ref[...] = jnp.zeros_like(mom_ref)

    ysum = jnp.zeros((1, co), jnp.float32)
    ysq = jnp.zeros((1, co), jnp.float32)
    for t in range(tiles):
        rs = slice(t * tm, (t + 1) * tm)
        # tiles == 1 must load/store full blocks (degenerate-slice Mosaic
        # pathology — see _kernel_edge / scatter_pallas._row_view)
        one = tiles == 1
        idxs = idx_rows_ref[0] if one else idx_rows_ref[0, rs]  # [tm, k]
        u32 = (u_rows_ref[0] if one else u_rows_ref[0, rs]).astype(
            jnp.float32)

        row_valid = None
        if n_valid < n_pad:
            # padded rows carry idx 0 and would gather real rows: mask
            # their y so the moment accumulators stay clean
            i = pl.program_id(1)
            row_ids = (jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
                       + i * tiles * tm + t * tm)
            row_valid = row_ids < n_valid

        y_slabs = []
        ymax = ymin = amax = amin = None
        for c0 in range(0, k, MM_CHUNK):
            sels = [
                (col_ids == idxs[:, r:r + 1]).astype(v_all.dtype)
                for r in range(c0, min(c0 + MM_CHUNK, k))
            ]
            for sel in sels:  # back-to-back MXU gather+conv (see MM_CHUNK)
                gath = jax.lax.dot_general(
                    sel, v_all,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = (gath + u32).astype(v_all.dtype)
                if row_valid is not None:
                    y = jnp.where(row_valid, y, jnp.zeros_like(y))
                y32 = y.astype(jnp.float32)
                ysum = ysum + jnp.sum(y32, axis=0, keepdims=True)
                ysq = ysq + jnp.sum(jnp.square(y32), axis=0, keepdims=True)
                if minmax:
                    j = len(y_slabs)
                    if j == 0:
                        ymax = ymin = y32
                        amax = amin = jnp.zeros_like(y32, jnp.int32)
                    else:
                        gt = y32 > ymax
                        lt = y32 < ymin
                        jvec = jnp.full(y32.shape, j, jnp.int32)
                        ymax = jnp.where(gt, y32, ymax)
                        amax = jnp.where(gt, jvec, amax)
                        ymin = jnp.where(lt, y32, ymin)
                        amin = jnp.where(lt, jvec, amin)
                y_slabs.append(y)
        if minmax:
            if one:
                ymax_ref[0] = ymax.astype(v_all.dtype)
                amax_ref[0] = amax
                ymin_ref[0] = ymin.astype(v_all.dtype)
                amin_ref[0] = amin
            else:
                ymax_ref[0, rs] = ymax.astype(v_all.dtype)
                amax_ref[0, rs] = amax
                ymin_ref[0, rs] = ymin.astype(v_all.dtype)
                amin_ref[0, rs] = amin
        if one:
            y_ref[0] = jnp.concatenate(y_slabs, axis=1)
        else:
            y_ref[0, rs] = jnp.concatenate(y_slabs, axis=1)

    pad = jnp.zeros((6, co), jnp.float32)
    mom_ref[...] += jnp.concatenate([ysum, ysq, pad], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "row_tile", "interpret", "with_minmax",
                     "tiles_per_step"))
def _knn_edge_pre_impl(idx, v, u, k: int, row_tile: int, interpret: bool,
                       with_minmax: bool = False, tiles_per_step: int = 2):
    b, n, cg_k = idx.shape
    assert cg_k == k
    co = v.shape[-1]
    co_pad = _round_up(co, 8)
    if co_pad != co:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, co_pad - co)))
        u = jnp.pad(u, ((0, 0), (0, 0), (0, co_pad - co)))
    # same VMEM model as _knn_edge_impl: the per-round [tm, Np] sel mask
    # replaces the f32 distance tile (same footprint in f32 terms)
    budget = (4 << 20) * max(1, (row_tile + 255) // 256)
    tm = aligned_tile_rows(min(row_tile, _round_up(n, 8)),
                           budget // (4 * max(n, 1)))
    tiles = max(1, min(tiles_per_step, max(1, n // tm)))
    tr = tiles * tm
    n_pad = _round_up(n, tr)
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, n_pad - n), (0, 0)))

    base = functools.partial(
        _kernel_edge_pre, k=k, n_valid=n, n_pad=n_pad, tiles=tiles)
    if with_minmax:
        kernel = base
    else:
        kernel = functools.partial(
            base, ymax_ref=None, amax_ref=None, ymin_ref=None, amin_ref=None)
    row_spec = pl.BlockSpec((1, tr, co_pad), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, tr, k * co_pad), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, co_pad), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_pad, k * co_pad), v.dtype),
        jax.ShapeDtypeStruct((8, co_pad), jnp.float32),
    ]
    if with_minmax:
        out_specs += [row_spec, row_spec, row_spec, row_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b, n_pad, co_pad), v.dtype),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), v.dtype),
            jax.ShapeDtypeStruct((b, n_pad, co_pad), jnp.int32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tr),
        in_specs=[
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, co_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, co_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20) * max(
                1, (row_tile + 255) // 256) * tiles),
    )(idx, v, u)
    y, mom = outs[0], outs[1]
    y = y[:, :n].reshape(b, n, k, co_pad)
    if co_pad != co:
        y = y[..., :co]
    if with_minmax:
        sl = (slice(None), slice(0, n), slice(0, co))
        return (y, mom[:2, :co], outs[2][sl], outs[3][sl], outs[4][sl],
                outs[5][sl])
    return y, mom[:2, :co]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def knn_edge_gather_pre(idx, v, u, k: int, row_tile: int = 256,
                        interpret: bool = False):
    """``knn_edge_gather`` from a PRECOMPUTED kNN graph (static-graph mode).

    ``y[b,n,j,:] = v[b, idx[b,n,j], :] + u[b,n,:]`` plus the in-kernel BN
    moment sums — the gather+conv half of the fused kNN+first-conv kernel
    with the distance/selection half skipped (one one-hot rebuild compare
    per round instead of ~3 selection passes). Used by the opt-in
    ``ModelConfig.static_graph`` mode, where EdgeConv stages past the
    first reuse the input-coordinate graph instead of recomputing kNN in
    feature space (the reference always recomputes — dynamic graph,
    Networks/dgcnn/utils/tf_util.py:638-706; static graph is a documented
    speed/accuracy trade, NOT reference parity).

    Gradients: identical to knn_edge_gather's (y linear in v, u; idx
    carries none). Returns (y [B,N,k,Co], mom f32 [2, Co]).
    """
    return _knn_edge_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, row_tile, interpret)


def _knn_edge_pre_fwd(idx, v, u, k, row_tile, interpret):
    out = _knn_edge_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, row_tile, interpret)
    y, _ = out
    return out, (idx, y, jnp.zeros_like(v), jnp.zeros_like(u))


def _knn_edge_pre_bwd(k, row_tile, interpret, res, cts):
    idx, y, v_zeros, u_zeros = res
    dy, dmom = cts
    y32 = y.astype(jnp.float32)
    dy_eff = (dy.astype(jnp.float32) + dmom[0]
              + 2.0 * y32 * dmom[1]).astype(y.dtype)
    du = jnp.sum(dy_eff.astype(jnp.float32), axis=2).astype(u_zeros.dtype)
    b, n, _ = v_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_pallas,
        )

        dv = scatter_add_pallas(idx, dy_eff, n).astype(v_zeros.dtype)
    else:
        bidx = jnp.arange(b)[:, None, None]
        dv = v_zeros.at[bidx, idx].add(dy_eff.astype(v_zeros.dtype))
    return (None, dv, du)


knn_edge_gather_pre.defvjp(_knn_edge_pre_fwd, _knn_edge_pre_bwd)


def _kernel_wagg(g_rows_ref, g_all_ref, f_all_ref, idx_ref, s_ref,
                 w_ref, *, k: int, n_valid: int, n_pad: int, fast: bool,
                 idx_bits: int, inv_gamma: float):
    g_rows = g_rows_ref[0]
    g_all = g_all_ref[0]
    f_all = f_all_ref[0]
    tm = g_rows.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    if fast:
        d = jnp.maximum(_distance_tile(g_rows, g_all), 0.0)
        x = _pack_distances(d, col_ids, idx_bits, n_valid, n_pad)
    else:
        x = _distance_tile(g_rows, g_all)
        if n_valid < n_pad:
            x = jnp.where(col_ids < n_valid, x, jnp.inf)

    rounds = _selection_rounds(x, col_ids, k, fast=fast, idx_bits=idx_bits,
                               n_pad=n_pad)
    idx_cols, w_cols = [], []
    # Accumulate ONE combined weighted one-hot matrix over the k selection
    # rounds, then gather with a single (hi/lo-split) matmul — k-fold less
    # MXU work than per-round gathers, and the MXU no longer serializes
    # behind every selection round (_collapsed_weight_matmul).
    wc = jnp.zeros((tm, n_pad), jnp.float32)
    for _ in range(k):
        idx, sel, sqd = next(rounds)
        w = jnp.exp(-jnp.maximum(sqd, 0.0) * inv_gamma)  # [TM, 1] f32
        idx_cols.append(idx)
        w_cols.append(w)
        wc = wc + jnp.where(sel, w, 0.0)
    s_ref[0] = _collapsed_weight_matmul(
        wc, f_all, (((1,), (0,)), ((), ())))

    idx_ref[0] = jnp.concatenate(idx_cols, axis=1)
    w_ref[0] = jnp.concatenate(w_cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "gamma", "row_tile", "interpret", "fast"),
)
def _knn_wgather_impl(
    g: jax.Array, f: jax.Array, k: int, gamma: float, row_tile: int,
    interpret: bool, fast: bool = False,
):
    b, n, cg = g.shape
    cf = f.shape[-1]
    cf_pad = _round_up(cf, 8)
    if cf_pad != cf:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, cf_pad - cf)))
    tm = min(row_tile, _round_up(n, 8))
    budget = (4 << 20) * max(1, (row_tile + 255) // 256)
    tm = max(8, min(tm, _round_up(budget // (4 * max(n, 1)), 8)))
    n_pad = _round_up(n, tm)
    cg_pad = _round_up(cg, LANE)
    if (n_pad, cg_pad) != (n, cg):
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, cg_pad - cg)))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n), (0, 0)))

    idx_bits = max(1, (n_pad - 1).bit_length())
    kernel = functools.partial(
        _kernel_wagg, k=k, n_valid=n, n_pad=n_pad, fast=fast,
        idx_bits=idx_bits, inv_gamma=1.0 / gamma)

    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, cg_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cg_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cf_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cf_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, cf_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, k), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20) * max(1, (row_tile + 255) // 256)),
    )(g, g, f)
    idx, s, w = outs
    return idx[:, :n], s[:, :n, :cf], w[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def knn_weighted_gather(g, f, k: int, gamma: float, row_tile: int = 256,
                        interpret: bool = False, fast: bool = False):
    """Fused kNN + exp-weighted neighbor aggregation.

    Computes, for each point n, over its k nearest neighbors j on ``g``
    (self included, squared distances d):

        s[b, n, :] = sum_j exp(-d_j / gamma) * f[b, idx_j, :]
        w[b, n, j] = exp(-d_j / gamma)

    This is the smoothness loss's whole neighbor side collapsed to ONE
    [B, N, Cf] tensor: the reference's ``exp(-D/gamma)``-weighted kNN
    Laplacian (Util/SmoothConstraint.py:140-158) can be evaluated from
    (s, w, f) without ever materializing the [B, N, k, Cf] neighbor-prob
    tensor — see losses/weaksup.py::smooth_knn_laplacian for the identity
    sum_j w_j (P_n - P_j)^2 = (sum_j w_j)|P_n|^2 - 2 P_n . s1 + s2.

    The selection rounds accumulate ONE combined weighted one-hot matrix
    (sum_r w_r * onehot_r, f32) which gathers via a single hi/lo-split
    bf16 matmul (_collapsed_weight_matmul) — k-fold less MXU work than
    per-round gathers; numerics match the unfused gather-then-weight path
    up to the ~2^-16-relative weight split plus f32 reassociation.

    Gradients: linear in f, so the VJP is the w-weighted scatter
    ``df[b, idx_j, :] += w_j * ds[b, n, :]`` (round-major Pallas kernel on
    TPU) — a [B, N, Cf] cotangent instead of the [B, N, k, Cf] one the
    unfused formulation scatters. ``g`` and ``w`` carry no gradient (kNN
    selection is non-differentiable, and w depends only on g).

    Returns:
      (idx int32 [B, N, k], s f32 [B, N, Cf], w f32 [B, N, k]).
    """
    return _knn_wgather_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, gamma,
        row_tile, interpret, fast)


def _wgather_fwd(g, f, k, gamma, row_tile, interpret, fast):
    out = _knn_wgather_impl(
        jax.lax.stop_gradient(g), jax.lax.stop_gradient(f), k, gamma,
        row_tile, interpret, fast)
    idx, _, w = out
    return out, (idx, w, jnp.zeros_like(g), jnp.zeros_like(f))


def _wgather_bwd(k, gamma, row_tile, interpret, fast, res, cts):
    idx, w, g_zeros, f_zeros = res
    ds = cts[1]  # only s carries a cotangent (idx is int, w is grad-free)
    b, n, _ = f_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_weighted_pallas,
        )

        df = scatter_add_weighted_pallas(idx, w, ds, n).astype(f_zeros.dtype)
    else:
        bidx = jnp.arange(b)[:, None, None]
        contrib = w[..., None] * ds[:, :, None, :]  # [B, N, k, Cf]
        df = f_zeros.at[bidx, idx].add(contrib.astype(f_zeros.dtype))
    return (g_zeros, df)


knn_weighted_gather.defvjp(_wgather_fwd, _wgather_bwd)


def _kernel_wagg_pre(idx_ref, w_ref, f_all_ref, s_ref, *, k: int,
                     n_pad: int):
    idxs = idx_ref[0]   # [TM, k] int32
    ws = w_ref[0]       # [TM, k] f32
    f_all = f_all_ref[0]
    tm = idxs.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    # Combined weighted one-hot + ONE matmul (see _collapsed_weight_matmul)
    # instead of k per-round gathers.
    wc = _accumulate_weight_onehot(idxs, ws, col_ids)
    s_ref[0] = _collapsed_weight_matmul(
        wc, f_all, (((1,), (0,)), ((), ())))


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret"))
def _wgather_pre_impl(idx: jax.Array, w: jax.Array, f: jax.Array,
                      row_tile: int, interpret: bool):
    b, n, k = idx.shape
    cf = f.shape[-1]
    cf_pad = _round_up(cf, 8)
    if cf_pad != cf:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, cf_pad - cf)))
    tm = min(row_tile, _round_up(n, 8))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, n_pad - n), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(_kernel_wagg_pre, k=k, n_pad=n_pad)
    s = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cf_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, cf_pad), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, cf_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20) * max(1, (row_tile + 255) // 256)),
    )(idx, w, f)
    return s[:, :n, :cf]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def weighted_gather_pre(idx, w, f, row_tile: int = 256,
                        interpret: bool = False):
    """Weighted neighbor aggregation from a PRECOMPUTED kNN graph.

    ``s[b, n, :] = sum_j w[b, n, j] * f[b, idx[b, n, j], :]`` — the gather
    half of ``knn_weighted_gather`` with the distance/selection half
    skipped. Used when the graph (idx, squared distances) is already
    available from another kernel over the same coordinates: the ShapeNet
    Full-style smoothness loss reuses the transform branch's kNN (both are
    built on the raw xyz; the smooth k=10 list is the nearest-first prefix
    of the transform's k=20 — identical selection semantics, reference
    Util/SmoothConstraint.py:140-158, though the stage builds distances
    on bf16-cast coordinates so the reused weights differ from a
    standalone f32-coordinate recompute within input rounding, ~4e-3
    relative on the loss).

    Numerics: the k per-round one-hots are accumulated into ONE combined
    weighted one-hot matrix (k compare passes) and gathered with a single
    hi/lo-split bf16 matmul (_collapsed_weight_matmul) — the f32 weights
    ride inside the matmul split to ~2^-16 relative, NOT applied exactly
    after an exact gather. Gradients: linear in f — the VJP is the
    w-weighted Pallas scatter built from the SAME
    _accumulate_weight_onehot matrix; idx/w carry no gradient.
    """
    return _wgather_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(f), row_tile, interpret)


def _wgather_pre_fwd(idx, w, f, row_tile, interpret):
    s = _wgather_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(f), row_tile, interpret)
    return s, (idx, w, jnp.zeros_like(f))


def _wgather_pre_bwd(row_tile, interpret, res, ct):
    idx, w, f_zeros = res
    b, n, _ = f_zeros.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_weighted_pallas,
        )

        df = scatter_add_weighted_pallas(idx, w, ct, n).astype(f_zeros.dtype)
    else:
        bidx = jnp.arange(b)[:, None, None]
        contrib = w[..., None] * ct[:, :, None, :]  # [B, N, k, Cf]
        df = f_zeros.at[bidx, idx].add(contrib.astype(f_zeros.dtype))
    return (None, None, df)


weighted_gather_pre.defvjp(_wgather_pre_fwd, _wgather_pre_bwd)


def edge_feature_fused(g: jax.Array, f: jax.Array, k: int,
                       interpret: bool = False, fast: bool = False):
    """EdgeConv edge features concat([f_i, f_j - f_i]) via the fused kernel.

    Drop-in for ``edge_feature(f, knn_graph(g, k))`` on TPU
    (tf_util.py:674-706 semantics).
    """
    _, nbr = knn_gather(g, f, k, 256, interpret, fast)
    central = jnp.broadcast_to(f[:, :, None, :], nbr.shape)
    return jnp.concatenate([central, nbr - central], axis=-1)
