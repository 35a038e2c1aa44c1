"""Pallas forward gather as one-hot MXU matmuls (bf16 path).

XLA's batched take_along_axis costs ~25-31 ms for the EdgeConv gather
([B=64, N=2048, k=20, C=64]); as ``onehot @ F`` per flattened row tile it is
a few ms of MXU time. Exactness: every output element has exactly ONE
nonzero product (0/1 one-hot), so for bf16 feature inputs the result is
bit-exact — no summation rounding can occur. For f32 inputs the MXU's
operand rounding would corrupt values, so the f32 path keeps XLA's gather
(ops/neighbors.py dispatches).
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


def _gather_kernel(idx_ref, f_ref, out_ref, *, n_pad: int):
    idx = idx_ref[0]  # [TMF, 1] int32
    f = f_ref[0]      # [Np, C]
    tmf = idx.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tmf, n_pad), 1)
    onehot = (col_ids == idx).astype(f.dtype)
    out_ref[0] = jax.lax.dot_general(
        onehot, f,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_flat", "interpret"))
def gather_rows_pallas(
    f: jax.Array,     # [B, N, C] source features
    idx: jax.Array,   # int32 [B, N, k] row indices
    *,
    tile_flat: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """out[b, p, j] = f[b, idx[b, p, j]] -> [B, N, k, C]."""
    b, n, c = f.shape
    k = idx.shape[-1]
    nk = n * k
    idx_f = idx.reshape(b, nk, 1)
    n_pad = _round_up(n, 128)
    # cap the [tile_flat, n_pad] one-hot at ~4 MB of VMEM (see scatter);
    # 8-aligned or Pallas refuses to lower (tile_flat=682 at N=3000)
    tile_flat = max(256, aligned_tile_rows(tile_flat,
                                           (4 << 20) // (2 * n_pad)))
    nk_pad = _round_up(nk, tile_flat)
    if nk_pad != nk:
        idx_f = jnp.pad(idx_f, ((0, 0), (0, nk_pad - nk), (0, 0)))
    if n_pad != n:
        f = jnp.pad(f, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_pad=n_pad),
        grid=(b, nk_pad // tile_flat),
        in_specs=[
            pl.BlockSpec((1, tile_flat, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_flat, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nk_pad, c), f.dtype),
        interpret=interpret,
    )(idx_f, f)
    return out[:, :nk].reshape(b, n, k, c)
