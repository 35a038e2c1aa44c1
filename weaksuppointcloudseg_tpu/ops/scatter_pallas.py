"""Pallas scatter-add: the backward of the neighbor gather, as MXU matmuls.

XLA's scatter-add for the gather cotangent ([B, N, k, C] -> [B, N, C])
costs ~50 ms at B=64, N=2048, k=20, C=64 on v5e. Expressing it as
one-hot^T @ G — one MXU matmul per row tile, accumulated into a revisited
output block — runs in ~20 ms. The one-hot matrix lives only in VMEM.

Numerics: the MXU's default f32 path rounds operands to bf16 (rel ~2e-3) and
sums the k contributions in matmul order instead of scatter order. That is
well inside gradient-noise tolerance, so this kernel backs only the VJP;
forward gathers keep XLA's exact path (ops/neighbors.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scatter_kernel(idx_ref, g_ref, out_ref, *, n_pad: int):
    i = pl.program_id(1)
    idx = idx_ref[0]  # [TMF, 1] int32 (flattened point*k rows)
    g = g_ref[0]      # [TMF, C]
    tmf = idx.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tmf, n_pad), 1)
    # f32 operands (explicit bf16 measured no faster and costs one mantissa
    # step of gradient precision); accumulation is f32 either way
    onehot = (col_ids == idx).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        onehot, g.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += contrib.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "tile_flat", "interpret"))
def scatter_add_pallas(
    idx: jax.Array,      # int32 [B, N, k] target rows
    g: jax.Array,        # [B, N, k, C] contributions
    n: int,              # number of output rows
    *,
    tile_flat: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """out[b, idx[b, p, j]] += g[b, p, j] -> [B, n, C]."""
    b, np_, k = idx.shape
    c = g.shape[-1]
    nk = np_ * k
    idx_f = idx.reshape(b, nk, 1)
    g_f = g.reshape(b, nk, c)
    n_pad = _round_up(n, 128)
    # the one-hot tile is [tile_flat, n_pad] f32 in VMEM; cap it at ~4 MB
    # so N=4096 clouds fit the 16 MB scoped-vmem budget
    tile_flat = max(256, min(tile_flat, (4 << 20) // (4 * n_pad)))
    nk_pad = _round_up(nk, tile_flat)
    if nk_pad != nk:
        # pad targets out of range -> padded rows contribute nowhere
        idx_f = jnp.pad(idx_f, ((0, 0), (0, nk_pad - nk), (0, 0)),
                        constant_values=n_pad)
        g_f = jnp.pad(g_f, ((0, 0), (0, nk_pad - nk), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_pad=n_pad),
        grid=(b, nk_pad // tile_flat),
        in_specs=[
            pl.BlockSpec((1, tile_flat, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_flat, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), g.dtype),
        interpret=interpret,
    )(idx_f, g_f)
    return out[:, :n]
