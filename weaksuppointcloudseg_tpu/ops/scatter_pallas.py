"""Pallas scatter-add: the backward of the neighbor gather, as MXU matmuls.

XLA's scatter-add for the gather cotangent ([B, N, k, C] -> [B, N, C])
costs ~44-50 ms at B=64, N=2048, k=20, C=64 on v5e. Expressing it as
one-hot^T @ G — MXU matmuls with the one-hot built in VMEM — cuts that to
~11 ms.

Layout matters: the kernel is *round-major* — the grid runs over
(batch, point-tile) and the k neighbor slots are unrolled inside the
kernel, one [TM, N] one-hot compare + one MXU matmul per slot,
accumulated into a revisited [N, C] output block. Versus the flat
(point*slot)-row layout this triples the rows per grid step (64 x 4 steps
instead of 64 x 40 at the flagship shape) and was measured 20.7 -> 11.1 ms
— the flat layout's cost was dominated by per-step overhead and one-hot
construction passes, not the matmul.

Numerics: the MXU rounds matmul operands (bf16 and f32 paths measured
equal speed here — the kernel is construction/overhead-bound), and the k
contributions sum in matmul order instead of scatter order (~2e-3
relative). Only the VJP uses this kernel; forward gathers keep an exact
path (ops/neighbors.py, ops/edgeconv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
    _accumulate_weight_onehot,
    _collapsed_weight_matmul,
    aligned_tile_rows,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _row_view(ref, t, tm, tiles):
    """Load sub-tile t's rows of a (1, tiles*tm, ...) block.

    tiles == 1 must use the plain full load: a degenerate full-range slice
    (ref[0, 0:tm]) sends this backend's Mosaic compiler into a
    pathologically slow lowering (>10 min for a kernel that otherwise
    compiles in <1 s — round-3 finding).
    """
    return ref[0] if tiles == 1 else ref[0, t * tm:(t + 1) * tm]


def _scatter_kernel(idx_ref, ct_ref, out_ref, *, n_pad: int, k: int, c: int,
                    op_dtype, tiles: int = 1):
    i = pl.program_id(1)
    tm = idx_ref.shape[1] // tiles
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # accumulate the k slot contributions AND the cross-tile revisits in
    # f32 (the output block is f32 regardless of cotangent dtype) — a
    # high-in-degree point sums hundreds of terms. ``tiles`` point-tiles
    # per grid step share one revisit += (docs/kernels.md round 3).
    acc = jnp.zeros_like(out_ref[0])
    for t in range(tiles):
        idxt = _row_view(idx_ref, t, tm, tiles)  # [TM, k] int32 target rows
        ct = _row_view(ct_ref, t, tm, tiles)     # [TM, k*C], slot-major lanes
        for j in range(k):
            onehot = (col_ids == idxt[:, j:j + 1]).astype(op_dtype)
            contrib = jax.lax.dot_general(
                onehot, ct[:, j * c:(j + 1) * c].astype(op_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + contrib
    out_ref[0] += acc


def _scatter_w_kernel(idx_ref, w_ref, ct_ref, out_ref, *, n_pad: int, k: int,
                      op_dtype, tiles: int = 1):
    """Weighted scatter: out[idx[t, j]] += w[t, j] * ct[t, :].

    The cotangent block is ONE [TM, C] tile shared by all k slots (the
    weighted-aggregate VJP, ops/edgeconv_pallas.py::knn_weighted_gather) —
    k-fold less HBM traffic than the unweighted kernel's [TM, k*C] block.
    """
    i = pl.program_id(1)
    tm = idx_ref.shape[1] // tiles
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    acc = jnp.zeros_like(out_ref[0])
    for t in range(tiles):
        idxt = _row_view(idx_ref, t, tm, tiles)                  # [TM, k]
        wt = _row_view(w_ref, t, tm, tiles)                      # [TM, k] f32
        ct = _row_view(ct_ref, t, tm, tiles)                     # [TM, C]
        # The cotangent tile is SHARED by all k slots, so the round sum
        # commutes with the matmul: out += (sum_j w_j onehot_j)^T @ ct —
        # ONE (hi/lo-split for bf16) matmul instead of k (see
        # edgeconv_pallas._collapsed_weight_matmul for the numerics).
        wc = _accumulate_weight_onehot(idxt, wt, col_ids)
        acc = acc + _collapsed_weight_matmul(
            wc, ct.astype(op_dtype), (((0,), (0,)), ((), ())))
    out_ref[0] += acc


def _scatter_bn_kernel(idx_ref, y_ref, big_ref, a_ref, sv_ref, al_ref,
                       be_ref, dv_ref, du_ref, *, n_pad: int, k: int,
                       c: int, sparse: bool, op_dtype, tiles: int = 1):
    """Scatter with the batch-norm backward folded in: the cotangent

        dy_j = FIRST_j + alpha + beta * y_j

    is assembled in VMEM from the saved pre-BN activations y and
    per-channel constants (the BN backward's dense moment-correction
    terms are affine in y), then scattered (dv) and row-summed (du) —
    the [B, N, k, C] dy tensor never exists in HBM.

    FIRST_j is s * dz_j (``sparse=False``: big = the dense relu-masked
    cotangent dz [TM, k*C]) or q * 1[asel == j] (``sparse=True``: the
    k-max routed [TM, C] gradient; big = q, a_ref = asel).

    ``tiles`` point-tiles are processed per grid step, sharing one
    revisit += on the output block.
    """
    i = pl.program_id(1)
    alpha = al_ref[...]                      # [1, C] f32
    beta = be_ref[...]
    sv = sv_ref[...]
    tm = idx_ref.shape[1] // tiles
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)

    @pl.when(i == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    acc = jnp.zeros_like(dv_ref[0])
    for t in range(tiles):
        idxt = _row_view(idx_ref, t, tm, tiles)                # [TM, k] int32
        y = _row_view(y_ref, t, tm, tiles)                     # [TM, k*C]
        if sparse:
            q32 = _row_view(big_ref, t, tm, tiles).astype(jnp.float32)
            av = _row_view(a_ref, t, tm, tiles)                # [TM, C] int32
        else:
            dz = _row_view(big_ref, t, tm, tiles)              # [TM, k*C]

        du = jnp.zeros((tm, c), jnp.float32)
        for j in range(k):
            yj32 = y[:, j * c:(j + 1) * c].astype(jnp.float32)
            if sparse:
                first = jnp.where(av == j, q32, jnp.zeros_like(q32))
            else:
                first = sv * dz[:, j * c:(j + 1) * c].astype(jnp.float32)
            dyj = first + alpha + beta * yj32
            du = du + dyj
            onehot = (col_ids == idxt[:, j:j + 1]).astype(op_dtype)
            acc = acc + jax.lax.dot_general(
                onehot, dyj.astype(op_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if tiles == 1:
            du_ref[0] = du
        else:
            du_ref[0, t * tm:(t + 1) * tm] = du
    dv_ref[0] += acc


@functools.partial(
    jax.jit,
    static_argnames=("n", "tile_rows", "interpret", "op_dtype",
                     "tiles_per_step"))
def scatter_bn_bwd_pallas(
    idx: jax.Array,      # int32 [B, P, k] target rows
    y: jax.Array,        # [B, P, k, C] saved pre-BN activations
    big,                 # dz [B, P, k, C]  OR  (q [B, P, C] f32, asel int32)
    sv: jax.Array,       # [C] f32 scale on dz (dense mode; ignored sparse)
    alpha: jax.Array,    # [C] f32
    beta: jax.Array,     # [C] f32
    n: int,
    *,
    tile_rows: int = 512,
    interpret: bool = False,
    op_dtype=None,
    tiles_per_step: int = 1,
) -> tuple:
    """(dv [B,n,C] f32, du [B,P,C] f32) for dy = first + alpha + beta*y
    assembled in VMEM — see _scatter_bn_kernel."""
    if op_dtype is None:
        op_dtype = jnp.bfloat16 if y.dtype == jnp.bfloat16 else jnp.float32
    b, p, k = idx.shape
    c = y.shape[-1]
    sparse = isinstance(big, tuple)
    n_pad = _round_up(n, 128)
    tm = aligned_tile_rows(tile_rows, (4 << 20) // (4 * n_pad))
    tiles = max(1, min(tiles_per_step, max(1, p // tm)))
    tr = tiles * tm
    p_pad = _round_up(p, tr)
    y_r = y.reshape(b, p, k * c)
    if sparse:
        q, asel = big
        if p_pad != p:
            q = jnp.pad(q, ((0, 0), (0, p_pad - p), (0, 0)))
            asel = jnp.pad(asel, ((0, 0), (0, p_pad - p), (0, 0)),
                           constant_values=-1)
        big_in, a_in = q, asel
    else:
        big_in = big.reshape(b, p, k * c)
        if p_pad != p:
            big_in = jnp.pad(big_in, ((0, 0), (0, p_pad - p), (0, 0)))
        a_in = jnp.zeros((b, p_pad, 8), jnp.int32)
    if p_pad != p:
        idx = jnp.pad(idx, ((0, 0), (0, p_pad - p), (0, 0)),
                      constant_values=n_pad)
        # alpha lands on padded rows' du (sliced off); dv is safe (no
        # column matches n_pad) but y must not produce NaNs
        y_r = jnp.pad(y_r, ((0, 0), (0, p_pad - p), (0, 0)))
    big_c = big_in.shape[-1]
    a_c = a_in.shape[-1]
    outs = pl.pallas_call(
        functools.partial(
            _scatter_bn_kernel, n_pad=n_pad, k=k, c=c, sparse=sparse,
            op_dtype=op_dtype, tiles=tiles),
        grid=(b, p_pad // tr),
        in_specs=[
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, k * c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, big_c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, a_c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, p_pad, c), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(idx, y_r, big_in, a_in,
      sv.astype(jnp.float32)[None, :], alpha.astype(jnp.float32)[None, :],
      beta.astype(jnp.float32)[None, :])
    dv, du = outs
    return dv[:, :n], du[:, :p]


@functools.partial(
    jax.jit, static_argnames=("n", "tile_rows", "interpret", "op_dtype",
                              "tiles_per_step")
)
def scatter_add_weighted_pallas(
    idx: jax.Array,      # int32 [B, P, k] target rows
    w: jax.Array,        # f32 [B, P, k] per-slot weights
    ct: jax.Array,       # [B, P, C] shared per-point contribution
    n: int,
    *,
    tile_rows: int = 512,
    interpret: bool = False,
    op_dtype=None,
    tiles_per_step: int = 1,
) -> jax.Array:
    """out[b, idx[b, p, j]] += w[b, p, j] * ct[b, p] -> [B, n, C] f32."""
    if op_dtype is None:
        op_dtype = jnp.bfloat16 if ct.dtype == jnp.bfloat16 else jnp.float32
    b, p, k = idx.shape
    c = ct.shape[-1]
    n_pad = _round_up(n, 128)
    tm = aligned_tile_rows(tile_rows, (4 << 20) // (4 * n_pad))
    tiles = max(1, min(tiles_per_step, max(1, p // tm)))
    tr = tiles * tm
    p_pad = _round_up(p, tr)
    if p_pad != p:
        idx = jnp.pad(idx, ((0, 0), (0, p_pad - p), (0, 0)),
                      constant_values=n_pad)
        w = jnp.pad(w, ((0, 0), (0, p_pad - p), (0, 0)))
        ct = jnp.pad(ct, ((0, 0), (0, p_pad - p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _scatter_w_kernel, n_pad=n_pad, k=k, op_dtype=op_dtype,
            tiles=tiles),
        grid=(b, p_pad // tr),
        in_specs=[
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(idx, w, ct)
    return out[:, :n]


@functools.partial(
    jax.jit, static_argnames=("n", "tile_rows", "interpret", "op_dtype",
                              "tiles_per_step")
)
def scatter_add_pallas(
    idx: jax.Array,      # int32 [B, P, k] target rows
    g: jax.Array,        # [B, P, k, C] contributions
    n: int,              # number of output rows
    *,
    tile_rows: int = 512,
    interpret: bool = False,
    op_dtype=None,
    tiles_per_step: int = 1,
) -> jax.Array:
    """out[b, idx[b, p, j]] += g[b, p, j] -> [B, n, C].

    ``op_dtype`` sets the matmul operand precision (accumulation is always
    f32). Default: bf16 cotangents use bf16 operands (no information loss —
    the one-hot is exact and g is already bf16), f32 uses f32.
    """
    if op_dtype is None:
        op_dtype = jnp.bfloat16 if g.dtype == jnp.bfloat16 else jnp.float32
    b, p, k = idx.shape
    c = g.shape[-1]
    n_pad = _round_up(n, 128)
    # [TM, n_pad] int32 iota + transient mask in VMEM; cap at ~4 MB
    tm = aligned_tile_rows(tile_rows, (4 << 20) // (4 * n_pad))
    tiles = max(1, min(tiles_per_step, max(1, p // tm)))
    tr = tiles * tm
    p_pad = _round_up(p, tr)
    idx_r = idx
    g_r = g.reshape(b, p, k * c)
    if p_pad != p:
        # out-of-range targets (n_pad) match no output column -> no-op rows
        idx_r = jnp.pad(idx_r, ((0, 0), (0, p_pad - p), (0, 0)),
                        constant_values=n_pad)
        g_r = jnp.pad(g_r, ((0, 0), (0, p_pad - p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _scatter_kernel, n_pad=n_pad, k=k, c=c, op_dtype=op_dtype,
            tiles=tiles),
        grid=(b, p_pad // tr),
        in_specs=[
            pl.BlockSpec((1, tr, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, k * c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
        # the f32 output block + f32 acc push N=4096 shapes ~0.4 MB past
        # Mosaic's default 16 MB scoped-vmem budget; the chip has headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(idx_r, g_r)
    # one final rounding to the cotangent dtype instead of ~k per-slot ones
    return out[:, :n].astype(g.dtype)
