"""Fused second-EdgeConv-conv + k-max Pallas kernel (minmax emission).

The back half of an EdgeConv stage in the reference is

    conv2d 1x1 (tf_util.py:115-173) -> batch norm -> relu -> max over k
    (DGCNN_ShapeNet.py:32-62: the second 64-wide conv of each stage
    followed by tf.reduce_max over the neighbor axis)

which in a straight implementation materializes the [B, N, k, C] conv
output in HBM (335 MB at the flagship shape), re-reads it for the BN
moments, and reads it twice more for normalize+relu and the k-max.

This kernel exploits two algebraic facts:

1. relu and max commute:  max_j relu(z_j) = relu(max_j z_j).
2. Train/eval batch norm is per-channel AFFINE in the conv output:
   z = s * y + t with s = gamma * rsqrt(var + eps). It is monotone in y
   with direction sign(s), so

       max_j z_j = s * (max_j y_j) + t   if s >= 0
                   s * (min_j y_j) + t   otherwise.

So the kernel computes y = h1 @ W2 + b2 tile-by-tile in VMEM and emits
only the per-channel running MAX and MIN over the k axis (values +
argindices) and the batch moments — five [B, N, C]-or-smaller tensors
instead of one [B, N, k, C] one; the conv output never reaches HBM.
The caller selects max-or-min per channel by the sign of s once the
(global-batch) moments are known, and applies s, t, relu on [B, N, C].

The backward needs no [B, N, k, C] cotangent either: the k-max routes
the output cotangent to ONE j per (b, n, c) (the emitted argindex), and
the BN backward's dense moment-correction terms are affine in y, so the
weight/input gradients reduce to Gram-matrix identities on h1 — see
models/layers.py::_conv_bn_kmax_train.

Numerics: y accumulates in f32 on the MXU and is rounded to the compute
dtype BEFORE the moments and the min/max comparison — identical values
to what the straight path's stored-tensor moments/k-max would read.
Ties in the k-max pick the LOWEST j (first winner); jnp.max's VJP splits
ties evenly instead — gradients may differ on exactly-tied positive
values (rare for continuous activations, possible under bf16 rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import aligned_tile_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_conv_minmax(h_ref, scale_ref, shift_ref, w_ref, b_ref, ymax_ref,
                        amax_ref, ymin_ref, amin_ref, mom_ref, *, k: int,
                        c1: int, n_valid: int, n_pad: int, fold: bool):
    # All 2-D with slot-major k*C lanes: Mosaic relayouts of 3-D
    # middle-axis slices are broken (vector<TMx64xi1> "(4,128)->(8,128)"
    # relayout error); lane-slicing 2-D arrays at C-multiples is the
    # pattern the scatter kernel already uses and compiles clean.
    h = h_ref[0]                      # [TM, k*C1]
    tm = h.shape[0]
    w = w_ref[...]                    # [C1, C2]
    b = b_ref[...]                    # [1, C2] f32
    c2 = w.shape[1]
    scale = scale_ref[...]            # [1, C1] f32 (BN1 fold)
    shift = shift_ref[...]

    row_valid = None
    if n_valid < n_pad:
        i = pl.program_id(1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + i * tm
        row_valid = row_ids < n_valid

    ymax = ymin = amax = amin = None
    ysum = jnp.zeros((1, c2), jnp.float32)
    ysq = jnp.zeros((1, c2), jnp.float32)
    for j in range(k):
        hj = h[:, j * c1:(j + 1) * c1]
        if fold:
            # upstream BN + relu computed in VMEM: hj here is the RAW
            # first-conv output; round to the compute dtype as the
            # straight path's stored activations would be
            hj = jax.nn.relu(
                hj.astype(jnp.float32) * scale + shift).astype(h.dtype)
        yj = jax.lax.dot_general(     # [TM, C2] f32 accumulation
            hj, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        # round to the compute dtype BEFORE moments and min/max: identical
        # to what a moments/k-max pass over the stored conv output reads.
        # The minmax runs on exact f32 UPCASTS of the rounded values: bf16
        # compares make 16-bit masks whose relayout to the 32-bit masks
        # the int32 index-selects need is broken in Mosaic ("{0,0}->{*,*}"
        # i1 relayout error); f32 keeps every mask at bitwidth 32.
        y32 = yj.astype(h.dtype).astype(jnp.float32)
        if row_valid is not None:
            y32 = jnp.where(row_valid, y32, jnp.zeros_like(y32))
        ysum = ysum + jnp.sum(y32, axis=0, keepdims=True)
        ysq = ysq + jnp.sum(jnp.square(y32), axis=0, keepdims=True)
        if j == 0:
            ymax = ymin = y32
            amax = amin = jnp.zeros((tm, c2), jnp.int32)
        else:
            gt = y32 > ymax
            lt = y32 < ymin
            jvec = jnp.full((tm, c2), j, jnp.int32)
            ymax = jnp.where(gt, y32, ymax)
            amax = jnp.where(gt, jvec, amax)
            ymin = jnp.where(lt, y32, ymin)
            amin = jnp.where(lt, jvec, amin)
    ymax = ymax.astype(h.dtype)  # exact: values already rounded
    ymin = ymin.astype(h.dtype)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        mom_ref[...] = jnp.zeros_like(mom_ref)

    ymax_ref[0] = ymax
    amax_ref[0] = amax
    ymin_ref[0] = ymin
    amin_ref[0] = amin
    pad = jnp.zeros((6, c2), jnp.float32)
    mom_ref[...] += jnp.concatenate([ysum, ysq, pad], axis=0)


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret"))
def conv_minmax_pallas(h1, w2, b2, scale1=None, shift1=None, *,
                       row_tile: int = 256, interpret: bool = False):
    """y = act(h1) @ w2 + b2 reduced to per-channel k-extrema + moments.

    act is identity when scale1/shift1 are None, else the upstream
    BN + relu fold act(x) = relu(x * scale1 + shift1) computed in VMEM —
    h1 is then the RAW first-conv output (ops/edgeconv_pallas.py::
    knn_edge_gather's y) and the [B, N, k, C1] relu'd activations never
    exist in HBM.

    Args:
      h1: [B, N, k, C1] activations or raw conv output (bf16 TPU path).
      w2: [C1, C2] conv weight (cast to h1.dtype by the caller).
      b2: [C2] f32 bias.
      scale1, shift1: optional [C1] f32 BN1 affine (gamma*rsqrt(var+eps),
        beta - mean*scale).

    Returns:
      (ymax [B,N,C2] h1.dtype, amax int32 [B,N,C2],
       ymin [B,N,C2], amin int32 [B,N,C2], mom f32 [2, C2])
      with mom[0] = sum(y), mom[1] = sum(y^2) over all (b, n, j) of the
      compute-dtype-rounded conv output.
    """
    b, n, k, c1 = h1.shape
    c2 = w2.shape[1]
    c1p = _round_up(c1, 8)
    # full 128-lane registers for the [TM, C2] minmax tiles: 64-lane bf16
    # compare masks trip a Mosaic i1 relayout ("{0,0} -> {*,*}" error)
    c2p = _round_up(c2, 128)
    fold = scale1 is not None
    if not fold:
        scale1 = jnp.ones((c1,), jnp.float32)
        shift1 = jnp.zeros((c1,), jnp.float32)
    if c1p != c1:
        h1 = jnp.pad(h1, ((0, 0), (0, 0), (0, 0), (0, c1p - c1)))
        w2 = jnp.pad(w2, ((0, c1p - c1), (0, 0)))
        scale1 = jnp.pad(scale1, (0, c1p - c1))
        shift1 = jnp.pad(shift1, (0, c1p - c1))
    if c2p != c2:
        w2 = jnp.pad(w2, ((0, 0), (0, c2p - c2)))
        b2 = jnp.pad(b2, (0, c2p - c2))
    tm = min(row_tile, _round_up(n, 8))
    # [TM, k*C1] input + per-slot [TM, C2] f32 tiles; cap the tile ~6 MB
    budget = 6 << 20
    per_row = k * c1p * h1.dtype.itemsize + c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h1 = jnp.pad(h1, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    h1 = h1.reshape(b, n_pad, k * c1p)  # slot-major lanes (free, row-major)

    kernel = functools.partial(
        _kernel_conv_minmax, k=k, c1=c1p, n_valid=n, n_pad=n_pad, fold=fold)
    row_spec = pl.BlockSpec((1, tm, c2p), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    vec1 = pl.BlockSpec((1, c1p), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, k * c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            vec1,
            vec1,
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec,
                   pl.BlockSpec((8, c2p), lambda bi, i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, c2p), h1.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c2p), jnp.int32),
            jax.ShapeDtypeStruct((b, n_pad, c2p), h1.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c2p), jnp.int32),
            jax.ShapeDtypeStruct((8, c2p), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h1, scale1.astype(jnp.float32)[None, :],
      shift1.astype(jnp.float32)[None, :], w2,
      b2.astype(jnp.float32)[None, :])
    ymax, amax, ymin, amin, mom = outs
    sl = (slice(None), slice(0, n), slice(0, c2))
    return ymax[sl], amax[sl], ymin[sl], amin[sl], mom[:2, :c2]


def _kernel_conv_zmax(h_ref, scale_ref, shift_ref, w_ref, b_ref, s2_ref,
                      t2_ref, out_ref, *, k: int, c1: int, fold: bool):
    """Eval-only variant of _kernel_conv_minmax: BN2 is FOLDED INTO the
    kernel (population stats are known before launch, so z = s2*y + t2 is
    computable per neighbor slot) and the k-max runs directly on z — one
    running maximum, no min tracking, no argindices, no moments, ONE
    [B, N, C2] output instead of four plus moments. Monotonicity makes
    this value-identical to minmax-emission + sign(s2) selection (up to
    FMA contraction of s2*y + t2 — 1 f32 ulp; exact in bf16)."""
    h = h_ref[0]                      # [TM, k*C1]
    w = w_ref[...]                    # [C1, C2]
    b = b_ref[...]                    # [1, C2] f32
    s2 = s2_ref[...]                  # [1, C2] f32 (BN2 affine)
    t2 = t2_ref[...]
    scale = scale_ref[...]            # [1, C1] f32 (BN1 fold)
    shift = shift_ref[...]

    zmax = None
    for j in range(k):
        hj = h[:, j * c1:(j + 1) * c1]
        if fold:
            hj = jax.nn.relu(
                hj.astype(jnp.float32) * scale + shift).astype(h.dtype)
        yj = jax.lax.dot_general(
            hj, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        # round to the compute dtype first (parity with the stored-tensor
        # path), then the monotone-affine BN2 on the f32 upcast
        zj = yj.astype(h.dtype).astype(jnp.float32) * s2 + t2
        zmax = zj if j == 0 else jnp.maximum(zj, zmax)
    out_ref[0] = jax.nn.relu(zmax).astype(h.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_zmax_pallas(h1, w2, b2, s2, t2, scale1=None, shift1=None, *,
                     row_tile: int = 256, interpret: bool = False):
    """Eval forward: relu(max_j (s2 * (act(h1_j) @ w2 + b2) + t2)).

    The inference-path replacement for conv_minmax_pallas + _minmax_select
    + the XLA z/relu pass (models/layers.py eval branches): BN2's
    population affine (s2, t2) is an input, so only one extremum is
    tracked and the only output is the [B, N, C2] stage result.
    Value-identical to the minmax composition (monotone-affine argument,
    module docstring fact 2).

    Args:
      h1: [B, N, k, C1] activations or raw conv output (bf16 TPU path).
      w2: [C1, C2] conv weight (h1.dtype).
      b2: [C2] f32 bias.
      s2, t2: [C2] f32 BN2 population affine.
      scale1, shift1: optional [C1] f32 BN1 fold (see conv_minmax_pallas).

    Returns:
      out [B, N, C2] h1.dtype.
    """
    b, n, k, c1 = h1.shape
    c2 = w2.shape[1]
    c1p = _round_up(c1, 8)
    c2p = _round_up(c2, 128)
    fold = scale1 is not None
    if not fold:
        scale1 = jnp.ones((c1,), jnp.float32)
        shift1 = jnp.zeros((c1,), jnp.float32)
    if c1p != c1:
        h1 = jnp.pad(h1, ((0, 0), (0, 0), (0, 0), (0, c1p - c1)))
        w2 = jnp.pad(w2, ((0, c1p - c1), (0, 0)))
        scale1 = jnp.pad(scale1, (0, c1p - c1))
        shift1 = jnp.pad(shift1, (0, c1p - c1))
    if c2p != c2:
        w2 = jnp.pad(w2, ((0, 0), (0, c2p - c2)))
        b2 = jnp.pad(b2, (0, c2p - c2))
        s2 = jnp.pad(s2, (0, c2p - c2))
        t2 = jnp.pad(t2, (0, c2p - c2))
    tm = min(row_tile, _round_up(n, 8))
    budget = 6 << 20
    per_row = k * c1p * h1.dtype.itemsize + c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h1 = jnp.pad(h1, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    h1 = h1.reshape(b, n_pad, k * c1p)

    kernel = functools.partial(_kernel_conv_zmax, k=k, c1=c1p, fold=fold)
    vec1 = pl.BlockSpec((1, c1p), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)
    vec2 = pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, k * c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            vec1,
            vec1,
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec2,
            vec2,
            vec2,
        ],
        out_specs=pl.BlockSpec((1, tm, c2p), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c2p), h1.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h1, scale1.astype(jnp.float32)[None, :],
      shift1.astype(jnp.float32)[None, :], w2,
      b2.astype(jnp.float32)[None, :], s2.astype(jnp.float32)[None, :],
      t2.astype(jnp.float32)[None, :])
    return out[:, :n, :c2]


def _kernel_conv_znmax(h_ref, w_ref, b_ref, s2_ref, t2_ref, out_ref, *,
                       n_valid: int, n_pad: int):
    """Eval-only conv_nmax: running per-channel max of z = s2*y + t2 over
    the POINT axis (revisited [1, C2] block across row tiles); padded rows
    are poisoned with -inf."""
    i = pl.program_id(1)
    h = h_ref[0]                      # [TM, C1]
    w = w_ref[...]
    b = b_ref[...]
    s2 = s2_ref[...]
    t2 = t2_ref[...]

    y = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b
    z = y.astype(h.dtype).astype(jnp.float32) * s2 + t2
    if n_valid < n_pad:
        tm = h.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) + i * tm
        z = jnp.where(row_ids < n_valid, z, jnp.full_like(z, -jnp.inf))
    tmax = jnp.max(z, axis=0, keepdims=True)  # [1, C2]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.full_like(out_ref, -jnp.inf)

    out_ref[...] = jnp.maximum(out_ref[...], tmax)


@functools.partial(jax.jit,
                   static_argnames=("row_tile", "interpret", "n_valid"))
def conv_znmax_pallas(h, w, b, s2, t2, *, row_tile: int = 512,
                      interpret: bool = False, n_valid=None):
    """Eval forward of the global-aggregation block:
    relu(max_n (s2 * (h @ w + b) + t2)) — the inference replacement for
    conv_nmax_pallas + _minmax_select (population BN folded in, one
    running maximum, no indices/moments).

    ``n_valid``: with pre-padded inputs (the eval step pads N once so no
    per-kernel pad/slice traffic exists — docs/kernels.md round 4), only
    rows < n_valid enter the max; defaults to every input row.

    Returns out f32 [B, C2] (relu applied)."""
    bsz, n, c1 = h.shape
    c2 = w.shape[1]
    c1p = _round_up(c1, 8)
    c2p = _round_up(c2, 128)
    if c1p != c1:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, c1p - c1)))
        w = jnp.pad(w, ((0, c1p - c1), (0, 0)))
    if c2p != c2:
        w = jnp.pad(w, ((0, 0), (0, c2p - c2)))
        b = jnp.pad(b, (0, c2p - c2))
        s2 = jnp.pad(s2, (0, c2p - c2))
        t2 = jnp.pad(t2, (0, c2p - c2))
    tm = min(row_tile, _round_up(n, 8))
    budget = 6 << 20
    per_row = c1p * h.dtype.itemsize + c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h = jnp.pad(h, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(
        _kernel_conv_znmax,
        n_valid=n if n_valid is None else min(n_valid, n), n_pad=n_pad)
    vec2 = pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec2,
            vec2,
            vec2,
        ],
        out_specs=pl.BlockSpec((1, 1, c2p), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c2p), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h, w, b.astype(jnp.float32)[None, :], s2.astype(jnp.float32)[None, :],
      t2.astype(jnp.float32)[None, :])
    return jax.nn.relu(out[:, 0, :c2])


def _kernel_cbk_bwd(h_ref, scale_ref, shift_ref, mean_ref, inv_ref, q_ref,
                    a_ref, wt_ref, m_ref, r0_ref, dh_ref, tsp_ref, gram_ref,
                    s1_ref, *, k: int, c1: int, fold: bool):
    """Backward of the fused conv+BN+relu+k-max block, one pass over h.

    Per neighbor slot j (lane slices of the slot-major [TM, k*C1] tile):

        Dq_j = q * 1[asel == j]                  (the k-max routed grad)
        dh_j = Dq_j @ W2^T + h_j @ M + row0      (dense BN correction)
        T_sp += h_j^T Dq_j ; G += h_j^T h_j ; S1 += sum(h_j)

    The [C1, C2]/[C1, C1] accumulators live in revisited output blocks
    (f32), exactly the scatter kernel's contract-over-rows pattern; the
    caller assembles dW/db from (T_sp, G, S1) and the per-channel BN
    constants (models/layers.py::_cbk_bwd).

    With ``fold`` the input tile is the RAW upstream conv output y1:
    h_j = relu(y1_j * scale + shift) is recomputed in VMEM, the emitted
    big tensor is dz1_j = dh_j * 1[h_j > 0] (the relu-masked BN1-input
    cotangent), and the BN1-backward reduces a1 = Σdz1,
    a2 = Σdz1*(y1-mean)*inv accumulate into s1 rows 1/2 — so the
    upstream BN backward needs no reduce pass of its own.
    """
    h = h_ref[0]                      # [TM, k*C1] (activations or raw y1)
    q32 = q_ref[0].astype(jnp.float32)   # [TM, C2]
    av = a_ref[0]                     # [TM, C2] int32
    wt = wt_ref[...]                  # [C2, C1]
    m = m_ref[...]                    # [C1, C1]
    row0 = r0_ref[...]                # [1, C1] f32
    scale = scale_ref[...]            # [1, C1] f32
    shift = shift_ref[...]
    mean1 = mean_ref[...]
    inv1 = inv_ref[...]
    c2 = q32.shape[1]

    tsp = jnp.zeros((c1, c2), jnp.float32)
    gram = jnp.zeros((c1, c1), jnp.float32)
    s1 = jnp.zeros((1, c1), jnp.float32)
    a1p = jnp.zeros((1, c1), jnp.float32)
    a2p = jnp.zeros((1, c1), jnp.float32)
    out_slabs = []
    contract_rows = (((0,), (0,)), ((), ()))
    for j in range(k):
        yj = h[:, j * c1:(j + 1) * c1]
        if fold:
            yj32 = yj.astype(jnp.float32)
            hj = jax.nn.relu(yj32 * scale + shift).astype(h.dtype)
        else:
            hj = yj
        # int32 compare -> 32-bit mask selecting f32: one mask bitwidth
        # throughout (the bf16/int32 mixed-mask relayout is broken, see
        # _kernel_conv_minmax)
        dqj32 = jnp.where(av == j, q32, jnp.zeros_like(q32))
        dqj = dqj32.astype(h.dtype)
        tsp = tsp + jax.lax.dot_general(
            hj, dqj, dimension_numbers=contract_rows,
            preferred_element_type=jnp.float32)
        gram = gram + jax.lax.dot_general(
            hj, hj, dimension_numbers=contract_rows,
            preferred_element_type=jnp.float32)
        s1 = s1 + jnp.sum(hj.astype(jnp.float32), axis=0, keepdims=True)
        dhj = (jax.lax.dot_general(
                   dqj, wt, dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   hj, m, dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
               + row0)
        if fold:
            # relu mask from the ROUNDED activation (parity with a stored
            # bf16 h); f32 compare keeps the mask at bitwidth 32
            dzj = jnp.where(hj.astype(jnp.float32) > 0.0, dhj,
                            jnp.zeros_like(dhj))
            a1p = a1p + jnp.sum(dzj, axis=0, keepdims=True)
            xhatj = (yj32 - mean1) * inv1
            a2p = a2p + jnp.sum(dzj * xhatj, axis=0, keepdims=True)
            out_slabs.append(dzj.astype(h.dtype))
        else:
            out_slabs.append(dhj.astype(h.dtype))
    dh_ref[0] = jnp.concatenate(out_slabs, axis=1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        tsp_ref[...] = jnp.zeros_like(tsp_ref)
        gram_ref[...] = jnp.zeros_like(gram_ref)
        s1_ref[...] = jnp.zeros_like(s1_ref)

    tsp_ref[...] += tsp
    gram_ref[...] += gram
    s1_ref[...] += jnp.concatenate(
        [s1, a1p, a2p, jnp.zeros((5, c1), jnp.float32)], axis=0)


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret"))
def conv_kmax_bwd_pallas(h1, q, asel, w2t, m, row0, scale1=None,
                         shift1=None, mean1=None, inv1=None, *,
                         row_tile: int = 256, interpret: bool = False):
    """One-pass backward for the minmax block (see _kernel_cbk_bwd).

    Args:
      h1: [B, N, k, C1] saved activations — or the RAW upstream conv
        output when scale1/shift1/mean1/inv1 are given (BN1 fold).
      q: [B, N, C2] f32 k-max-routed gradient (s * dz_sel).
      asel: [B, N, C2] int32 winning slot per channel.
      w2t: [C2, C1] W2 transposed (h1.dtype).
      m: [C1, C1] dense-correction matrix W2 diag(Bv) W2^T (h1.dtype).
      row0: [C1] f32 constant row (A + b*Bv) @ W2^T.
      scale1, shift1, mean1, inv1: optional [C1] f32 BN1 fold constants.

    Returns:
      (dh [B,N,k,C1] h1.dtype, T_sp f32 [C1,C2], G f32 [C1,C1],
       S1 f32 [C1], ab f32 [2, C1]).
      Without the fold dh is the activation cotangent and ab is zeros;
      with it dh is dz1 (relu-masked) and ab = (Σdz1, Σdz1·xhat1) — the
      BN1 backward reduces.
    """
    b, n, k, c1 = h1.shape
    c2 = q.shape[-1]
    # 8-multiples only: every mask here is 32-bit (int32 compare, f32
    # select), so the bf16 half-lane relayout issue doesn't apply, and
    # padding C1 to 128 would double the h/dh HBM traffic
    c1p = _round_up(c1, 8)
    c2p = _round_up(c2, 8)
    fold = scale1 is not None
    if not fold:
        scale1 = jnp.ones((c1,), jnp.float32)
        shift1 = jnp.zeros((c1,), jnp.float32)
        mean1 = jnp.zeros((c1,), jnp.float32)
        inv1 = jnp.ones((c1,), jnp.float32)
    if c1p != c1:
        h1 = jnp.pad(h1, ((0, 0), (0, 0), (0, 0), (0, c1p - c1)))
        w2t = jnp.pad(w2t, ((0, 0), (0, c1p - c1)))
        m = jnp.pad(m, ((0, c1p - c1), (0, c1p - c1)))
        row0 = jnp.pad(row0, (0, c1p - c1))
        scale1 = jnp.pad(scale1, (0, c1p - c1))
        shift1 = jnp.pad(shift1, (0, c1p - c1))
        mean1 = jnp.pad(mean1, (0, c1p - c1))
        inv1 = jnp.pad(inv1, (0, c1p - c1))
    if c2p != c2:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, c2p - c2)))
        asel = jnp.pad(asel, ((0, 0), (0, 0), (0, c2p - c2)),
                       constant_values=-1)  # matches no slot: Dq = 0
        w2t = jnp.pad(w2t, ((0, c2p - c2), (0, 0)))
    tm = min(row_tile, _round_up(n, 8))
    budget = 6 << 20
    per_row = 2 * k * c1p * h1.dtype.itemsize + 2 * c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h1 = jnp.pad(h1, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        asel = jnp.pad(asel, ((0, 0), (0, n_pad - n), (0, 0)),
                       constant_values=-1)
    h1 = h1.reshape(b, n_pad, k * c1p)

    kernel = functools.partial(_kernel_cbk_bwd, k=k, c1=c1p, fold=fold)
    vec1 = pl.BlockSpec((1, c1p), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, k * c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            vec1,
            vec1,
            vec1,
            vec1,
            pl.BlockSpec((1, tm, c2p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c2p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2p, c1p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c1p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec1,
        ],
        out_specs=(
            pl.BlockSpec((1, tm, k * c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c1p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c1p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, k * c1p), h1.dtype),
            jax.ShapeDtypeStruct((c1p, c2p), jnp.float32),
            jax.ShapeDtypeStruct((c1p, c1p), jnp.float32),
            jax.ShapeDtypeStruct((8, c1p), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h1, scale1.astype(jnp.float32)[None, :],
      shift1.astype(jnp.float32)[None, :],
      mean1.astype(jnp.float32)[None, :],
      inv1.astype(jnp.float32)[None, :],
      q, asel, w2t, m, row0.astype(jnp.float32)[None, :])
    dh, tsp, gram, s1 = outs
    dh = dh.reshape(b, n_pad, k, c1p)[:, :n, :, :c1]
    return dh, tsp[:c1, :c2], gram[:c1, :c1], s1[0, :c1], s1[1:3, :c1]


def _kernel_conv_nmax(h_ref, w_ref, b_ref, ymax_ref, amax_ref, ymin_ref,
                      amin_ref, mom_ref, *, n_valid: int, n_pad: int,
                      tm: int):
    """conv + running per-channel N-extrema: the global-aggregation conv's
    max over the POINT axis (DGCNN_ShapeNet.py:80-85 reduce_max over N).
    The reduction axis is the tiled axis, so the extrema/arg blocks are
    per-batch revisited outputs updated across row tiles."""
    i = pl.program_id(1)
    h = h_ref[0]                      # [TM, C1]
    w = w_ref[...]                    # [C1, C2]
    b = b_ref[...]                    # [1, C2] f32

    y = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b
    y32 = y.astype(h.dtype).astype(jnp.float32)  # parity rounding
    row_ids = jax.lax.broadcasted_iota(jnp.int32, y32.shape, 0) + i * tm
    if n_valid < n_pad:
        valid = row_ids < n_valid
        # padded rows: poison the max with -inf/+inf, zero the moments
        neg = jnp.full_like(y32, -jnp.inf)
        pos = jnp.full_like(y32, jnp.inf)
        y_max_in = jnp.where(valid, y32, neg)
        y_min_in = jnp.where(valid, y32, pos)
        y_mom = jnp.where(valid, y32, jnp.zeros_like(y32))
    else:
        y_max_in = y_min_in = y_mom = y32

    ysum = jnp.sum(y_mom, axis=0, keepdims=True)
    ysq = jnp.sum(jnp.square(y_mom), axis=0, keepdims=True)

    # tile-local extrema + their global row indices
    tmax = jnp.max(y_max_in, axis=0, keepdims=True)          # [1, C2]
    tmin = jnp.min(y_min_in, axis=0, keepdims=True)
    targ_max = jnp.min(jnp.where(y_max_in == tmax, row_ids, n_pad),
                       axis=0, keepdims=True)
    targ_min = jnp.min(jnp.where(y_min_in == tmin, row_ids, n_pad),
                       axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        ymax_ref[...] = jnp.full_like(ymax_ref, -jnp.inf)
        ymin_ref[...] = jnp.full_like(ymin_ref, jnp.inf)
        amax_ref[...] = jnp.zeros_like(amax_ref)
        amin_ref[...] = jnp.zeros_like(amin_ref)

    @pl.when((pl.program_id(0) == 0) & (i == 0))
    def _():
        mom_ref[...] = jnp.zeros_like(mom_ref)

    run_max = ymax_ref[...]
    gt = tmax > run_max
    ymax_ref[...] = jnp.where(gt, tmax, run_max)
    amax_ref[...] = jnp.where(gt, targ_max, amax_ref[...])
    run_min = ymin_ref[...]
    lt = tmin < run_min
    ymin_ref[...] = jnp.where(lt, tmin, run_min)
    amin_ref[...] = jnp.where(lt, targ_min, amin_ref[...])
    pad = jnp.zeros((6, ysum.shape[1]), jnp.float32)
    mom_ref[...] += jnp.concatenate([ysum, ysq, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_nmax_pallas(h, w, b, *, row_tile: int = 512,
                     interpret: bool = False):
    """y = h @ w + b reduced to per-channel extrema over the POINT axis.

    Args:
      h: [B, N, C1] point features.
      w: [C1, C2] conv weight (h.dtype).
      b: [C2] f32 bias.

    Returns:
      (ymax f32 [B, C2], amax int32 [B, C2] (global row index),
       ymin f32 [B, C2], amin int32 [B, C2], mom f32 [2, C2]).
    """
    bsz, n, c1 = h.shape
    c2 = w.shape[1]
    c1p = _round_up(c1, 8)
    c2p = _round_up(c2, 128)
    if c1p != c1:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, c1p - c1)))
        w = jnp.pad(w, ((0, c1p - c1), (0, 0)))
    if c2p != c2:
        w = jnp.pad(w, ((0, 0), (0, c2p - c2)))
        b = jnp.pad(b, (0, c2p - c2))
    tm = min(row_tile, _round_up(n, 8))
    budget = 6 << 20
    per_row = c1p * h.dtype.itemsize + c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h = jnp.pad(h, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(
        _kernel_conv_nmax, n_valid=n, n_pad=n_pad, tm=tm)
    bvec = pl.BlockSpec((1, 1, c2p), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(bvec, bvec, bvec, bvec,
                   pl.BlockSpec((8, c2p), lambda bi, i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 1, c2p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c2p), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1, c2p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c2p), jnp.int32),
            jax.ShapeDtypeStruct((8, c2p), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h, w, b.astype(jnp.float32)[None, :])
    ymax, amax, ymin, amin, mom = outs
    sl = (slice(None), 0, slice(0, c2))
    return ymax[sl], amax[sl], ymin[sl], amin[sl], mom[:2, :c2]


def _kernel_nmax_bwd(h_ref, q_ref, a_ref, w_ref, b_ref, wt_ref, al_ref,
                     be_ref, dh_ref, dw_ref, acc_ref, *, n_valid: int,
                     n_pad: int, tm: int):
    """Backward of conv + BN + relu + N-max: y is RECOMPUTED in-kernel
    from the narrow h tile, dy = q·1[row = asel] + alpha + beta*y is
    assembled in VMEM, and dh / dW / db come from direct matmuls — no
    [B, N, C2] tensor ever exists in HBM in either direction."""
    i = pl.program_id(1)
    h = h_ref[0]                      # [TM, C1]
    q = q_ref[...].reshape(1, -1)     # [1, C2] f32 (per batch)
    asel = a_ref[...].reshape(1, -1)  # [1, C2] int32
    w = w_ref[...]
    b = b_ref[...]
    wt = wt_ref[...]                  # [C2, C1]
    alpha = al_ref[...]
    beta = be_ref[...]

    y = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b
    y32 = y.astype(h.dtype).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, y32.shape, 0) + i * tm
    dy = jnp.where(row_ids == asel, q, 0.0) + alpha + beta * y32
    if n_valid < n_pad:
        # zero-padded h rows still get y = bias -> dy = alpha + beta*b:
        # mask them out of db (and dW/dh hygiene)
        dy = jnp.where(row_ids < n_valid, dy, jnp.zeros_like(dy))
    dyc = dy.astype(h.dtype)
    dh_ref[0] = jax.lax.dot_general(
        dyc, wt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)

    @pl.when((pl.program_id(0) == 0) & (i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dw_ref[...] += jax.lax.dot_general(
        h, dyc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db = jnp.sum(dy, axis=0, keepdims=True)
    acc_ref[...] += jnp.concatenate(
        [db, jnp.zeros((7, db.shape[1]), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_nmax_bwd_pallas(h, q, asel, w, b, alpha, beta, *,
                         row_tile: int = 512, interpret: bool = False):
    """(dh [B,N,C1], dW f32 [C1,C2], db f32 [C2]) for the N-max block.

    q/asel: [B, C2] routed gradient and winning row per channel;
    alpha/beta: [C2] BN dense-correction constants (dy = sparse + alpha
    + beta*y)."""
    bsz, n, c1 = h.shape
    c2 = w.shape[1]
    c1p = _round_up(c1, 8)
    c2p = _round_up(c2, 128)
    if c1p != c1:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, c1p - c1)))
        w = jnp.pad(w, ((0, c1p - c1), (0, 0)))
    if c2p != c2:
        w = jnp.pad(w, ((0, 0), (0, c2p - c2)))
        b = jnp.pad(b, (0, c2p - c2))
        q = jnp.pad(q, ((0, 0), (0, c2p - c2)))
        asel = jnp.pad(asel, ((0, 0), (0, c2p - c2)), constant_values=-1)
        alpha = jnp.pad(alpha, (0, c2p - c2))
        beta = jnp.pad(beta, (0, c2p - c2))
    tm = min(row_tile, _round_up(n, 8))
    budget = 6 << 20
    per_row = 2 * c1p * h.dtype.itemsize + c2p * 4
    tm = aligned_tile_rows(tm, budget // max(per_row, 1))
    n_pad = _round_up(n, tm)
    if n_pad != n:
        h = jnp.pad(h, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(_kernel_nmax_bwd, n_valid=n, n_pad=n_pad,
                               tm=tm)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2p), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2p), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2p, c1p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, c1p), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1p, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c2p), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n_pad, c1p), h.dtype),
            jax.ShapeDtypeStruct((c1p, c2p), jnp.float32),
            jax.ShapeDtypeStruct((8, c2p), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(h, q[:, None, :], asel[:, None, :],
      w, b.astype(jnp.float32)[None, :],
      jnp.transpose(w).astype(h.dtype),
      alpha.astype(jnp.float32)[None, :], beta.astype(jnp.float32)[None, :])
    dh, dw, acc = outs
    return dh[:, :n, :c1], dw[:c1, :c2], acc[0, :c2]
