"""Functional NN layers: shared-MLP "1x1 conv", batch norm, dropout, FC.

TPU-native equivalents of the reference layer wrappers
(Networks/dgcnn/utils/tf_util.py):

- ``conv2d`` with a [1,1] kernel (tf_util.py:115-173) is just a matmul over
  the channel axis — implemented as an einsum so XLA tiles it onto the MXU
  and fuses bias/BN/ReLU into the epilogue.
- ``batch_norm_dist_template`` (tf_util.py:502-535): training normalizes with
  the *batch* moments and updates population stats with
  ``pop = pop * decay + batch * (1 - decay)``; eval normalizes with the
  population stats. Here the state is carried functionally (mean/var arrays
  in a state pytree, new state returned) instead of variable assignment.
  Under a data-parallel mesh the moments are computed over the *global*
  batch automatically: the reduction over the sharded batch axis lowers to a
  cross-replica collective under jit (the cross-replica-BN requirement from
  SURVEY.md section 2.3).
- ``dropout`` (tf_util.py:614-635): inverted dropout with keep_prob.

Params and BN stats are fp32; compute may run in bfloat16 (config).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Params = dict
State = dict

BN_EPS = 1e-3


def _auto_rt(n: int) -> int:
    """Shape-tuned selection-kernel row tile (ops/edgeconv_pallas.py::
    auto_row_tile — 256 at the ShapeNet train width, 128 at >=~3k)."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import auto_row_tile

    return auto_row_tile(n)


def _axis_size(axis_name) -> jax.Array:
    """Number of shards along a shard_map axis (1 if axis_name is None)."""
    return jax.lax.psum(1, axis_name)


def _psum_moments(mom, r, axis_name):
    """Cross-replica reduce the in-kernel per-shard moment sums.

    Under a shard_map data-parallel step the Pallas kernels see only the
    local batch shard, so their (Σy, Σy²) outputs are per-shard partials;
    summing them (and scaling the element count) yields the GLOBAL batch
    moments — the cross-replica-BN requirement of SURVEY.md §2.3 for the
    fused path, where the SPMD partitioner cannot see inside pallas_call.
    """
    if axis_name is None:
        return mom, r
    return jax.lax.psum(mom, axis_name), r * _axis_size(axis_name)


def xavier_uniform(key, in_c: int, out_c: int, dtype=jnp.float32) -> jax.Array:
    """Glorot-uniform matching tf.contrib.layers.xavier_initializer for a
    [1,1,in,out] conv kernel (fan_in=in_c, fan_out=out_c)."""
    limit = jnp.sqrt(6.0 / (in_c + out_c))
    return jax.random.uniform(key, (in_c, out_c), dtype, -limit, limit)


def init_conv(key, in_c: int, out_c: int, *, bn: bool = True) -> Tuple[Params, State]:
    """Shared-MLP conv layer params (+ BN population stats if bn)."""
    params = {
        "w": xavier_uniform(key, in_c, out_c),
        "b": jnp.zeros((out_c,), jnp.float32),
    }
    if bn:
        params["beta"] = jnp.zeros((out_c,), jnp.float32)
        params["gamma"] = jnp.ones((out_c,), jnp.float32)
        state = {"mean": jnp.zeros((out_c,), jnp.float32),
                 "var": jnp.ones((out_c,), jnp.float32)}
    else:
        state = {}
    return params, state


def _batch_norm(x, params, state, *, training: bool, decay, eps: float = BN_EPS,
                axis_name=None):
    """Reference-semantics BN over all axes but the last. Returns (y, state).

    ``axis_name``: shard_map data-parallel axis — batch moments become
    cross-replica means (exact for equal shard sizes); autodiff of the
    pmean generates the matching backward collectives."""
    if training:
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        # One-pass moments: E[x] and E[x^2] reduce in the SAME sweep over
        # the (large) activation tensor; the textbook two-pass
        # mean-then-centered-variance forces XLA to re-read it and
        # materialize the f32 centered tensor. Biased variance like
        # tf.nn.moments; f32 accumulation keeps E[x^2]-E[x]^2 cancellation
        # well under the BN epsilon (1e-3) for activation-scale data.
        mean = jnp.mean(x32, axis=axes)
        mean_sq = jnp.mean(jnp.square(x32), axis=axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        new_state = {
            "mean": state["mean"] * decay + mean * (1.0 - decay),
            "var": state["var"] * decay + var * (1.0 - decay),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["gamma"]
    y = (x.astype(jnp.float32) - mean) * inv + params["beta"]
    return y.astype(x.dtype), new_state


def apply_conv(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    training: bool,
    bn_decay=None,
    relu: bool = True,
    bn: bool = True,
    eps: float = BN_EPS,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """conv (channel matmul) + bias [+ BN] [+ ReLU]. x: [..., in_c]."""
    w = params["w"].astype(x.dtype)
    # NOTE: do NOT reshape 4-D activations to 2-D around this einsum — the
    # TPU conv emitters pick batch-in-lanes layouts and the reshape then
    # materializes layout copies (measured 136 -> 188 ms/step end-to-end).
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    y = y + params["b"]
    y = y.astype(x.dtype) if x.dtype != jnp.float32 else y
    if bn:
        y, state = _batch_norm(y, params, state, training=training,
                               decay=bn_decay, eps=eps, axis_name=axis_name)
    if relu:
        y = jax.nn.relu(y)
    return y, state


def apply_conv_bcast(
    params: Params,
    state: State,
    x_bcast: jax.Array,    # [B, Cg] per-sample features (global + category)
    x_point: jax.Array,    # [B, N, Cp] per-point features
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """conv over concat([broadcast_N(x_bcast), x_point]) WITHOUT the concat.

    The reference's first seg-head conv consumes the global feature tiled
    over every point (DGCNN_ShapeNet.py:87-100: tf.tile + concat). Since
    the broadcast rows are constant over N, the matmul splits as

        concat([tile(g), p]) @ W = broadcast_N(g @ W[:Cg]) + p @ W[Cg:]

    so the [B, N, Cg] tile and the [B, N, Cg+Cp] concat never exist in
    HBM — the g-part matmul runs once per sample and the broadcast-add
    fuses into the BN/relu pass. Identical math up to the contraction
    split's f32 reassociation.
    """
    w = params["w"]
    cg = x_bcast.shape[-1]
    wg = w[:cg].astype(x_bcast.dtype)
    wp = w[cg:].astype(x_point.dtype)
    yg = jnp.einsum("bi,io->bo", x_bcast, wg,
                    preferred_element_type=jnp.float32)
    yp = jnp.einsum("bni,io->bno", x_point, wp,
                    preferred_element_type=jnp.float32)
    y = yg[:, None, :] + yp + params["b"]
    y = y.astype(x_point.dtype) if x_point.dtype != jnp.float32 else y
    y, state = _batch_norm(y, params, state, training=training,
                           decay=bn_decay, eps=eps, axis_name=axis_name)
    return jax.nn.relu(y), state


@jax.custom_vjp
def edge_conv_matmul(f, nbr, w, b):
    """First EdgeConv conv: conv2d(concat([f_i, f_j - f_i])) + bias.

    Forward is literally the concat + einsum the straight path uses (XLA
    fuses the concat into the matmul; bit-identical outputs). The custom
    VJP exists for the BACKWARD: the mechanical transpose materializes the
    2C-wide edge-feature cotangent d_ef = dy @ W^T ([B, N, k, 2C] — 672 MB
    at the flagship shape) before splitting it; this one computes the
    exact same linear-map transpose factored as

        d_f   = (sum_k dy) @ (W_top - W_bot)^T          (k-reduce FIRST)
        d_nbr = dy @ W_bot^T                            (C-wide, not 2C)
        dW_top = f^T @ (sum_k dy)
        dW_bot = nbr^T(flat) @ dy - dW_top

    so nothing 2C-wide ever exists. Same math up to fp reassociation.
    """
    ef = jnp.concatenate(
        [jnp.broadcast_to(f[:, :, None, :], nbr.shape), nbr - f[:, :, None, :]],
        axis=-1)
    y = jnp.einsum("...i,io->...o", ef, w.astype(ef.dtype),
                   preferred_element_type=jnp.float32)
    return (y + b).astype(f.dtype) if f.dtype != jnp.float32 else y + b


def _edge_conv_matmul_fwd(f, nbr, w, b):
    return edge_conv_matmul(f, nbr, w, b), (f, nbr, w)


def _edge_conv_matmul_bwd(res, dy):
    f, nbr, w = res
    c = f.shape[-1]
    wc = w.astype(f.dtype)
    w_top, w_bot = wc[:c], wc[c:]
    # k-reduce FIRST, in f32 (20-term sums of bf16 cotangents)
    dy_sum = jnp.sum(dy.astype(jnp.float32), axis=2)  # [B, N, Cout]
    d_f = jnp.einsum("bno,io->bni", dy_sum.astype(dy.dtype), w_top - w_bot,
                     preferred_element_type=jnp.float32).astype(f.dtype)
    d_nbr = jnp.einsum("bnko,io->bnki", dy, w_bot,
                       preferred_element_type=jnp.float32).astype(nbr.dtype)
    dw_top = jnp.einsum("bnc,bno->co", f, dy_sum.astype(f.dtype),
                        preferred_element_type=jnp.float32)
    dw_nbr = jnp.einsum("bnkc,bnko->co", nbr, dy,
                        preferred_element_type=jnp.float32)
    dw = jnp.concatenate([dw_top, dw_nbr - dw_top], axis=0)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2))
    return (d_f, d_nbr, dw.astype(w.dtype), db.astype(w.dtype))


edge_conv_matmul.defvjp(_edge_conv_matmul_fwd, _edge_conv_matmul_bwd)


def apply_edge_conv(
    params: Params,
    state: State,
    f: jax.Array,          # [B, N, C] point features
    nbr: jax.Array,        # [B, N, k, C] gathered neighbor features
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """conv(concat([f_i, f_j - f_i])) + bias + BN + ReLU with the
    d_ef-free backward (see edge_conv_matmul)."""
    y = edge_conv_matmul(f, nbr, params["w"], params["b"])
    y, state = _batch_norm(y, params, state, training=training,
                           decay=bn_decay, eps=eps, axis_name=axis_name)
    return jax.nn.relu(y), state


def _ecf_forward(k, eps, fast, interpret, axis_name, w, b, gamma, beta,
                 f, g_src):
    """Primal math of the fused EdgeConv-conv1 + BN + ReLU block."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    u, v = _uv_factor(w, b, f)
    idx, y, mom = _knn_edge_impl(
        jax.lax.stop_gradient(g_src), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, _auto_rt(v.shape[1]), interpret, fast)
    r = y.shape[0] * y.shape[1] * y.shape[2]
    mom, r = _psum_moments(mom, r, axis_name)
    mean = mom[0] / r
    var = jnp.maximum(mom[1] / r - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    z = (y.astype(jnp.float32) - mean) * (inv * gamma) + beta
    h = jax.nn.relu(z).astype(y.dtype)
    return h, mean, var, idx, y, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _edge_conv_bn_relu_train(k, eps, fast, interpret, axis_name, w, b,
                             gamma, beta, f, g_src):
    """Training-mode fused EdgeConv first conv + batch norm + ReLU with a
    HAND-WRITTEN VJP.

    Autodiff through the (y, moments) pair costs an extra full [B,N,k,C]
    pass: the moment cotangents arrive as per-channel vectors that must be
    broadcast-added onto dy (``dy_eff = dy + dmom0 + 2 y dmom1``, measured
    1.9 ms/stage at the flagship shape). The standard batch-norm backward
    already folds those terms:

        dz = dh * 1[h > 0]
        dy = inv * gamma * (dz - mean(dz) - xhat * mean(dz * xhat))
        dgamma = sum(dz * xhat), dbeta = sum(dz)

    and the conv backward then factors through the u/v decomposition
    (du = sum_k dy, dv = scatter(idx, dy) — round-major Pallas kernel)
    with only [B,N,C]-sized matmuls touching the weights. The
    ``max(var, 0)`` clamp's gradient is treated as identity (the clamp
    only binds in degenerate all-equal-activation cases).

    Returns (h, mean, var); mean/var feed the (undifferentiated) BN state
    update — their cotangents are ignored.
    """
    h, mean, var, _, _, _ = _ecf_forward(
        k, eps, fast, interpret, axis_name, w, b, gamma, beta, f, g_src)
    return h, mean, var


def _ecf_fwd(k, eps, fast, interpret, axis_name, w, b, gamma, beta, f,
             g_src):
    h, mean, var, idx, y, inv = _ecf_forward(
        k, eps, fast, interpret, axis_name, w, b, gamma, beta, f, g_src)
    res = (idx, y, h, mean, inv, w, gamma, f, jnp.zeros_like(g_src))
    return (h, mean, var), res


def _ecf_bwd(k, eps, fast, interpret, axis_name, res, cts):
    idx, y, h, mean, inv, w, gamma, f, g_zeros = res
    dh = cts[0]  # mean/var feed only the state update: zero cotangents
    r = y.shape[0] * y.shape[1] * y.shape[2]

    y32 = y.astype(jnp.float32)
    xhat = (y32 - mean) * inv
    dz = dh.astype(jnp.float32) * (h > 0)
    a1 = jnp.sum(dz, axis=(0, 1, 2))          # = dbeta (local partial)
    a2 = jnp.sum(dz * xhat, axis=(0, 1, 2))   # = dgamma (local partial)
    a1g, a2g, rg = a1, a2, r
    if axis_name is not None:  # global corrections (forward used global BN)
        a1g = jax.lax.psum(a1, axis_name)
        a2g = jax.lax.psum(a2, axis_name)
        rg = r * _axis_size(axis_name)
    dy = ((inv * gamma) * (dz - a1g / rg
                           - xhat * (a2g / rg))).astype(y.dtype)

    du = jnp.sum(dy.astype(jnp.float32), axis=2)  # [B, N, C] f32
    b_, n_, _ = f.shape
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_add_pallas,
        )

        dv = scatter_add_pallas(idx, dy, n_)  # f32 [B, N, C]
    else:
        bidx = jnp.arange(b_)[:, None, None]
        dv = jnp.zeros((b_, n_, dy.shape[-1]), jnp.float32
                       ).at[bidx, idx].add(dy.astype(jnp.float32))

    df, dw, db = _uv_grads(w, f, du, dv)
    return (dw.astype(w.dtype), db.astype(w.dtype), a2, a1, df, g_zeros)


_edge_conv_bn_relu_train.defvjp(_ecf_fwd, _ecf_bwd)


def apply_edge_conv_knn_fused(
    params: Params,
    state: State,
    f: jax.Array,          # [B, N, C] point features (compute dtype, bf16)
    g_src: jax.Array,      # [B, N, Cg] graph source (no grad)
    k: int,
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    fast: bool = False,
    interpret: bool = False,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """EdgeConv front half + first conv + BN + ReLU, with the kNN graph,
    gather AND conv fused into one Pallas kernel (TPU bf16 path).

    conv(concat([f_i, f_j - f_i])) = u_i + v_j with u = f (W_top - W_bot) + b
    and v = f W_bot (tiny [B,N,C] matmuls); the kernel adds u to each
    selection round's gather of v and accumulates the BN batch moments
    in-kernel (ops/edgeconv_pallas.py::knn_edge_gather). The [B,N,k,2C]
    edge tensor and its conv never exist in HBM, and the whole block's
    backward is hand-written (see _edge_conv_bn_relu_train). Same math as
    apply_edge_conv(f, gather(f, knn(g))) up to bf16/f32 reassociation.
    """
    if training:
        h, mean, var = _edge_conv_bn_relu_train(
            k, eps, fast, interpret, axis_name, params["w"], params["b"],
            params["gamma"], params["beta"], f, g_src)
        new_state = {
            "mean": state["mean"] * bn_decay + mean * (1.0 - bn_decay),
            "var": state["var"] * bn_decay + var * (1.0 - bn_decay),
        }
        return h, new_state

    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_edge_gather

    u, v = _uv_factor(params["w"], params["b"], f)
    _, y, _ = knn_edge_gather(g_src, v, u, k, _auto_rt(v.shape[1]), interpret, fast)
    mean, var = state["mean"], state["var"]
    inv = jax.lax.rsqrt(var + eps) * params["gamma"]
    z = (y.astype(jnp.float32) - mean) * inv + params["beta"]
    return jax.nn.relu(z).astype(y.dtype), state


def apply_edge_conv_first(
    params: Params,
    state: State,
    f: jax.Array,          # [B, N, C] point features
    idx: jax.Array,        # int32 [B, N, k] neighbor indices
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """First conv of an EdgeConv stage without materializing edge features.

    conv(concat([f_i, f_j - f_i])) = f_i @ W_top + (f_j - f_i) @ W_bot
                                   = f_i @ (W_top - W_bot) + f_j @ W_bot
    so only the C_out-channel ``v = f @ W_bot`` needs gathering — half the
    bytes of the 2C edge tensor — and the two point-wise matmuls replace the
    k-times-larger edge matmul (~20x fewer MXU FLOPs for C=64, k=20).
    Identical math to conv(edge_feature(...)) up to fp reassociation;
    BN + ReLU then run on the [B, N, k, C_out] pre-activations as before.
    """
    from weaksuppointcloudseg_tpu.ops.neighbors import gather_neighbors

    w = params["w"].astype(f.dtype)  # [2C, C_out]
    c = f.shape[-1]
    w_top, w_bot = w[:c], w[c:]
    u = jnp.einsum("...i,io->...o", f, w_top - w_bot,
                   preferred_element_type=jnp.float32)
    u = (u + params["b"]).astype(f.dtype)  # [B, N, C_out]
    v = jnp.einsum("...i,io->...o", f, w_bot,
                   preferred_element_type=jnp.float32).astype(f.dtype)
    v_nbr = gather_neighbors(v, idx)  # [B, N, k, C_out]
    y = u[:, :, None, :] + v_nbr
    y, state = _batch_norm(y, params, state, training=training,
                           decay=bn_decay, eps=eps, axis_name=axis_name)
    return jax.nn.relu(y), state


def _bn_affine(mean, var, gamma, beta, eps):
    """BN as the per-channel affine z = s*y + t."""
    inv = jax.lax.rsqrt(var + eps)
    s = inv * gamma
    return s, beta - mean * s, inv


def _minmax_select(ymax, amax, ymin, amin, s):
    """Pick the k-extremum that realizes max_j (s*y_j + t) per channel."""
    pos = s >= 0
    ysel = jnp.where(pos, ymax, ymin)
    asel = jnp.where(pos, amax, amin)
    return ysel, asel


def _bn_bwd_from_extrema(dout, ysel, mean, inv, gamma, beta, r,
                         axis_name=None):
    """Shared BN backward evaluated on the max-selected extrema.

    With dz supported on the selected positions only, the BN backward
    dy = s*(dz - a1/r - xhat*(a2/r)) splits into the routed part
    q = s*dz_sel and per-channel affine constants: dy = q·1[selected]
    + A + Bv*y. Returns (q, A, Bv, a1, a2, db) with a1 = dbeta,
    a2 = dgamma, and db = Σdy (the conv-bias cotangent, which BN shift
    invariance makes ~0).
    """
    s = inv * gamma
    ysel32 = ysel.astype(jnp.float32)
    z = ysel32 * s + (beta - mean * s)
    dz = dout * (z > 0)
    xhat = (ysel32 - mean) * inv
    axes = tuple(range(dz.ndim - 1))
    a1 = jnp.sum(dz, axis=axes)
    a2 = jnp.sum(dz * xhat, axis=axes)
    # Under shard_map DP the affine corrections need the GLOBAL reduces /
    # element count (the forward normalized with global moments); the
    # returned a1/a2 (dbeta/dgamma) and db stay LOCAL partials — the
    # step-level gradient psum turns them into the exact global sums
    # (Σ_shards [r_loc*A + Bv*r_loc*mean] = r_glob*A + Bv*Σy_glob).
    a1g, a2g, rg = a1, a2, r
    if axis_name is not None:
        a1g = jax.lax.psum(a1, axis_name)
        a2g = jax.lax.psum(a2, axis_name)
        rg = r * _axis_size(axis_name)
    q = s * dz
    A = (-s * a1g + s * inv * a2g * mean) / rg
    Bv = -s * inv * a2g / rg
    db = jnp.sum(q, axis=axes) + r * A + Bv * (r * mean)
    return q, A, Bv, a1, a2, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _conv_bn_kmax_train(eps, interpret, axis_name, w, b, gamma, beta, h):
    """Training-mode conv + batch norm + ReLU + k-max, fused.

    Forward runs the minmax Pallas kernel (ops/conv_kmax_pallas.py): the
    [B, N, k, C2] conv output y never reaches HBM — only its per-channel
    k-extrema, arg-indices, and batch moments do. Since relu∘max commutes
    and BN is per-channel affine z = s*y + t, the stage output is
    relu(s*ysel + t) with ysel = ymax where s>=0 else ymin.

    The HAND-WRITTEN backward never materializes a [B, N, k, C2] tensor
    either. The k-max routes dout to the single argindex j* per
    (b, n, c), and the BN backward

        dy = s*(dz - a1/r - xhat*(a2/r)),  a1 = Σdz, a2 = Σdz*xhat

    has dz supported on j* only (so a1, a2 reduce over [B, N, C2]
    smalls), while its dense correction terms are AFFINE in y:
    dy = D + A + Bv⊙y with D[b,n,j,c] = q_c·1[j=j*], q = s*dz_sel,
    A, Bv per-channel constants. Substituting y = h@W + b turns the
    weight/input gradients into Gram identities:

        dW = h^T D  +  S1⊗A  +  (G W + S1⊗b)·diag(Bv)
        dh = D W^T  +  h (W diag(Bv) W^T)  +  (A + b⊙Bv) W^T
        db = Σq + r·A + Bv·r·mean,   with S1 = Σh, G = h^T h.

    The only [B, N, k, ·]-sized operations left are the two D-einsums
    (whose mask-product operand XLA fuses into the dot) and the dense dh
    output itself, which the upstream EdgeConv-conv1 backward consumes.
    Ties in the k-max give all gradient to the first winner; jnp.max
    splits ties evenly (measure-zero for continuous data; possible under
    bf16 rounding — accepted, see ops/conv_kmax_pallas.py).

    Returns (out [B,N,C2], mean [C2], var [C2]); mean/var feed the
    (undifferentiated) BN state update.
    """
    out, mean, var, _, _ = _conv_bn_kmax_fwd_math(
        eps, interpret, axis_name, w, b, gamma, beta, h)
    return out, mean, var


def _conv_bn_kmax_fwd_math(eps, interpret, axis_name, w, b, gamma, beta, h):
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_minmax_pallas,
    )

    ymax, amax, ymin, amin, mom = conv_minmax_pallas(
        jax.lax.stop_gradient(h), jax.lax.stop_gradient(w).astype(h.dtype),
        jax.lax.stop_gradient(b), interpret=interpret)
    r = h.shape[0] * h.shape[1] * h.shape[2]
    mom, r = _psum_moments(mom, r, axis_name)
    mean = mom[0] / r
    var = jnp.maximum(mom[1] / r - jnp.square(mean), 0.0)
    s, t, inv = _bn_affine(mean, var, gamma, beta, eps)
    ysel, asel = _minmax_select(ymax, amax, ymin, amin, s)
    z = ysel.astype(jnp.float32) * s + t
    out = jax.nn.relu(z).astype(h.dtype)
    return out, mean, var, (ysel, asel, inv), z


def _cbk_fwd(eps, interpret, axis_name, w, b, gamma, beta, h):
    out, mean, var, (ysel, asel, inv), _ = _conv_bn_kmax_fwd_math(
        eps, interpret, axis_name, w, b, gamma, beta, h)
    res = (h, ysel, asel, mean, inv, w, b, gamma, beta)
    return (out, mean, var), res


def _cbk_bwd(eps, interpret, axis_name, res, cts):
    h, ysel, asel, mean, inv, w, b, gamma, beta = res
    dout = cts[0].astype(jnp.float32)  # mean/var feed only the state update
    b_, n_, k_, _ = h.shape
    r = b_ * n_ * k_
    q, A, Bv, a1, a2, db = _bn_bwd_from_extrema(
        dout, ysel, mean, inv, gamma, beta, r, axis_name)

    w32 = w.astype(jnp.float32)
    M = (w32 * Bv[None, :]) @ w32.T                              # [C1,C1]
    row0 = (A + b * Bv) @ w32.T                                  # [C1]

    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
            conv_kmax_bwd_pallas,
        )

        dh, T_sp, G, S1, _ = conv_kmax_bwd_pallas(
            h, q, asel, w32.T.astype(h.dtype), M.astype(h.dtype), row0)
    else:
        # D[b,n,j,c] = q_c at j = j*, else 0 — a mask product XLA fuses
        # into the dots instead of materializing [B, N, k, C2]
        onek = asel[:, :, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, k_, 1), 2)
        Dq = (onek * q[:, :, None, :]).astype(h.dtype)
        T_sp = jnp.einsum("bnji,bnjc->ic", h, Dq,
                          preferred_element_type=jnp.float32)
        S1 = jnp.sum(h.astype(jnp.float32), axis=(0, 1, 2))      # [C1]
        G = jnp.einsum("bnji,bnjl->il", h, h,
                       preferred_element_type=jnp.float32)       # [C1,C1]
        dh = (jnp.einsum("bnjc,ic->bnji", Dq, w.astype(h.dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bnji,il->bnjl", h, M.astype(h.dtype),
                           preferred_element_type=jnp.float32)
              + row0).astype(h.dtype)

    dW = (T_sp + S1[:, None] * A[None, :]
          + (G @ w32 + S1[:, None] * b[None, :]) * Bv[None, :])
    return (dW.astype(w.dtype), db.astype(b.dtype), a2, a1, dh)


_conv_bn_kmax_train.defvjp(_cbk_fwd, _cbk_bwd)


def _stage_consts(gamma, beta, mom, r, eps):
    """BN affine + selection constants from the in-kernel moments."""
    mean = mom[0] / r
    var = jnp.maximum(mom[1] / r - jnp.square(mean), 0.0)
    s, t, inv = _bn_affine(mean, var, gamma, beta, eps)
    return mean, var, s, t, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _edge_conv_stage_train(k, eps, fast, interpret, axis_name, with_graph,
                           w1, b1, gamma1, beta1, w2, b2, gamma2, beta2, f,
                           g_src):
    """A WHOLE two-conv EdgeConv stage (kNN + conv1 + BN + relu + conv2 +
    BN + relu + k-max) as two Pallas kernels and [B, N, C]-sized glue.

    Forward: knn_edge_gather emits the raw first-conv output y1 + BN1
    moments; conv_minmax_pallas folds BN1+relu in VMEM and emits only the
    second conv's per-channel k-extrema + moments. NO [B, N, k, C] tensor
    except y1 itself ever reaches HBM, and y1 is written once (it is the
    backward's only big residual). Merging the two convs into ONE custom
    VJP is what enables the fold: with separate per-conv VJPs the relu'd
    [B, N, k, C] activations must be materialized at the boundary
    (measured +8 ms/step as separate layers — XLA cannot fuse producers
    into a Pallas operand).

    Backward: conv_kmax_bwd_pallas recomputes h1 from y1 in VMEM and
    emits dz1 (relu-masked BN1-input cotangent), the conv2 Gram
    accumulators, and the BN1 reduces in ONE pass; the only remaining
    [B, N, k, C] XLA work is the elementwise dy1 assembly feeding the
    scatter kernel (du = Σ_j dy1, dv = scatter(idx, dy1) — then the u/v
    factorization maps to df/dw1 exactly as in _edge_conv_bn_relu_train).

    Returns (out [B,N,C2], mean1, var1, mean2, var2); the mean/var
    outputs feed the (undifferentiated) BN state updates. With
    ``with_graph`` the tuple gains (idx [B,N,k] int32, sqd [B,N,k] f32):
    the stage's kNN graph + squared distances, gradient-free — consumed by
    the smoothness loss when its graph coincides with this stage's
    (ShapeNet: the transform branch and the smooth loss both build on raw
    xyz; Util/SmoothConstraint.py:140-158).
    """
    outs, _ = _stage_fwd_math(
        k, eps, fast, interpret, axis_name, with_graph, w1, b1, gamma1,
        beta1, w2, b2, gamma2, beta2, f, g_src)
    return outs


def _stage_tail(eps, interpret, axis_name, gamma1, beta1, w2, b2, gamma2,
                beta2, f, y1, mom1):
    """conv2 + both BNs + k-max from the first conv's (y1, moments):
    the part of a fused two-conv stage downstream of the kNN kernel,
    shared by the selecting and the static-graph (pre) forwards."""
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_minmax_pallas,
    )

    r = y1.shape[0] * y1.shape[1] * y1.shape[2]
    mom1, rg = _psum_moments(mom1, r, axis_name)
    mean1, var1, s1, t1, inv1 = _stage_consts(gamma1, beta1, mom1, rg, eps)
    ymax, amax, ymin, amin, mom2 = conv_minmax_pallas(
        y1, jax.lax.stop_gradient(w2).astype(f.dtype),
        jax.lax.stop_gradient(b2), s1, t1, interpret=interpret)
    mom2, _ = _psum_moments(mom2, r, axis_name)
    mean2, var2, s2, t2, inv2 = _stage_consts(gamma2, beta2, mom2, rg, eps)
    ysel, asel = _minmax_select(ymax, amax, ymin, amin, s2)
    z = ysel.astype(jnp.float32) * s2 + t2
    out = jax.nn.relu(z).astype(f.dtype)
    return (out, mean1, var1, mean2, var2), (ysel, asel, mean1, inv1,
                                             mean2, inv2)


def _stage_fwd_math(k, eps, fast, interpret, axis_name, with_graph, w1, b1,
                    gamma1, beta1, w2, b2, gamma2, beta2, f, g_src):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    u, v = _uv_factor(w1, b1, f)
    knn_out = _knn_edge_impl(
        jax.lax.stop_gradient(g_src), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, _auto_rt(v.shape[1]), interpret, fast,
        with_values=with_graph)
    if with_graph:
        idx, y1, mom1, sqd = knn_out
    else:
        (idx, y1, mom1), sqd = knn_out, None
    outs, (ysel, asel, mean1, inv1, mean2, inv2) = _stage_tail(
        eps, interpret, axis_name, gamma1, beta1, w2, b2, gamma2, beta2,
        f, y1, mom1)
    if with_graph:
        outs = outs + (idx, sqd)
    return outs, (idx, y1, ysel, asel, mean1, inv1, mean2, inv2)


def _stage_fwd(k, eps, fast, interpret, axis_name, with_graph, w1, b1,
               gamma1, beta1, w2, b2, gamma2, beta2, f, g_src):
    outs, (idx, y1, ysel, asel, mean1, inv1, mean2, inv2) = _stage_fwd_math(
        k, eps, fast, interpret, axis_name, with_graph, w1, b1, gamma1,
        beta1, w2, b2, gamma2, beta2, f, g_src)
    res = (idx, y1, ysel, asel, mean1, inv1, mean2, inv2,
           w1, b1, gamma1, beta1, w2, b2, gamma2, beta2, f,
           jnp.zeros_like(g_src))
    return outs, res


def _stage_bwd(k, eps, fast, interpret, axis_name, with_graph, res, cts):
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_kmax_bwd_pallas,
    )

    (idx, y1, ysel, asel, mean1, inv1, mean2, inv2, w1, b1, gamma1, beta1,
     w2, b2, gamma2, beta2, f, g_zeros) = res
    dout = cts[0].astype(jnp.float32)  # mean/var feed only state updates
    b_, n_, k_, _ = y1.shape
    r = b_ * n_ * k_

    # --- conv2 BN backward from [B, N, C2] smalls ---
    q, A, Bv, a1, a2, db2 = _bn_bwd_from_extrema(
        dout, ysel, mean2, inv2, gamma2, beta2, r, axis_name)

    w232 = w2.astype(jnp.float32)
    M = (w232 * Bv[None, :]) @ w232.T
    row0 = (A + b2 * Bv) @ w232.T
    s1 = inv1 * gamma1
    t1 = beta1 - mean1 * s1

    # --- one fused pass over y1: h1 recompute, conv2 grads, BN1 reduces
    dz1, T_sp, G, S1, ab = conv_kmax_bwd_pallas(
        y1, q, asel, w232.T.astype(y1.dtype), M.astype(y1.dtype), row0,
        s1, t1, mean1, inv1, interpret=interpret)
    dW2 = (T_sp + S1[:, None] * A[None, :]
           + (G @ w232 + S1[:, None] * b2[None, :]) * Bv[None, :])
    a1p, a2p = ab[0], ab[1]

    # --- BN1 backward + du + scatter in ONE pass over (y1, dz1):
    # dy1 = s1*dz1 + alpha1 + beta1v*y1 (the moment corrections are
    # affine in y1), assembled in VMEM by the scatter kernel
    a1pg, a2pg, rg = a1p, a2p, r
    if axis_name is not None:  # global BN1 corrections; a1p/a2p stay local
        a1pg = jax.lax.psum(a1p, axis_name)
        a2pg = jax.lax.psum(a2p, axis_name)
        rg = r * _axis_size(axis_name)
    alpha1 = s1 * (-a1pg / rg + (a2pg / rg) * inv1 * mean1)
    beta1v = -s1 * (a2pg / rg) * inv1
    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_bn_bwd_pallas,
        )

        dv, du = scatter_bn_bwd_pallas(
            idx, y1, dz1, s1, alpha1, beta1v, n_)
    else:
        dy1 = (s1 * dz1.astype(jnp.float32) + alpha1
               + beta1v * y1.astype(jnp.float32)).astype(y1.dtype)
        du = jnp.sum(dy1.astype(jnp.float32), axis=2)  # [B, N, C1] f32
        bidx = jnp.arange(b_)[:, None, None]
        dv = jnp.zeros((b_, n_, dy1.shape[-1]), jnp.float32
                       ).at[bidx, idx].add(dy1.astype(jnp.float32))

    df, dw1, db1 = _uv_grads(w1, f, du, dv)
    return (dw1.astype(w1.dtype), db1.astype(b1.dtype), a2p, a1p,
            dW2.astype(w2.dtype), db2.astype(b2.dtype), a2, a1,
            df, g_zeros)


_edge_conv_stage_train.defvjp(_stage_fwd, _stage_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _edge_conv_stage_pre_train(k, eps, interpret, axis_name, w1, b1, gamma1,
                               beta1, w2, b2, gamma2, beta2, f, idx):
    """``_edge_conv_stage_train`` from a PRECOMPUTED kNN graph: the
    static-graph mode's two-conv stage. The kNN kernel is replaced by
    ops/edgeconv_pallas.knn_edge_gather_pre's impl (one-hot rebuild from
    ``idx`` instead of distance+selection); everything downstream —
    conv_minmax_pallas forward, conv_kmax_bwd_pallas / scatter_bn backward
    — is shared with the selecting stage (same ``_stage_tail`` /
    ``_stage_bwd``), so given identical indices the outputs and gradients
    match the selecting stage bit-for-bit."""
    outs, _ = _stage_pre_fwd_math(
        k, eps, interpret, axis_name, w1, b1, gamma1, beta1, w2, b2,
        gamma2, beta2, f, idx)
    return outs


def _stage_pre_fwd_math(k, eps, interpret, axis_name, w1, b1, gamma1, beta1,
                        w2, b2, gamma2, beta2, f, idx):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_pre_impl,
    )

    u, v = _uv_factor(w1, b1, f)
    y1, mom1 = _knn_edge_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, _auto_rt(v.shape[1]), interpret)
    outs, (ysel, asel, mean1, inv1, mean2, inv2) = _stage_tail(
        eps, interpret, axis_name, gamma1, beta1, w2, b2, gamma2, beta2,
        f, y1, mom1)
    return outs, (y1, ysel, asel, mean1, inv1, mean2, inv2)


def _stage_pre_fwd(k, eps, interpret, axis_name, w1, b1, gamma1, beta1, w2,
                   b2, gamma2, beta2, f, idx):
    outs, (y1, ysel, asel, mean1, inv1, mean2, inv2) = _stage_pre_fwd_math(
        k, eps, interpret, axis_name, w1, b1, gamma1, beta1, w2, b2,
        gamma2, beta2, f, idx)
    res = (idx, y1, ysel, asel, mean1, inv1, mean2, inv2,
           w1, b1, gamma1, beta1, w2, b2, gamma2, beta2, f, None)
    return outs, res


def _stage_pre_bwd(k, eps, interpret, axis_name, res, cts):
    grads = _stage_bwd(k, eps, False, interpret, axis_name, False, res, cts)
    # drop the g_src cotangent slot; idx (int graph) carries no gradient
    return grads[:-1] + (None,)


_edge_conv_stage_pre_train.defvjp(_stage_pre_fwd, _stage_pre_bwd)


def apply_edge_conv_stage_fused(
    params1: Params,
    state1: State,
    params2: Params,
    state2: State,
    f: jax.Array,          # [B, N, C] point features (bf16 TPU path)
    g_src: jax.Array,      # [B, N, Cg] graph source (no grad)
    k: int,
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    fast: bool = False,
    interpret: bool = False,
    axis_name=None,
    want_graph: bool = False,
    reuse_idx: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
):
    """Whole fused EdgeConv stage: kNN + conv1+BN+relu + conv2+BN+relu +
    k-max (reference DGCNN_ShapeNet.py:32-62 per stage). Returns
    ([B, N, C2] stage output, new BN state 1, new BN state 2); with
    ``want_graph`` appends the gradient-free (idx [B,N,k], sqd [B,N,k])
    kNN graph for reuse by the smoothness loss (losses/weaksup.py) or by
    later static-graph stages. ``reuse_idx`` (static-graph mode): skip
    this stage's own kNN and gather along the given [B, N, k] graph
    instead (_edge_conv_stage_pre_train). ``n_valid`` (eval only): the
    inputs are pre-padded along N; only rows < n_valid are neighbor
    candidates (the eval step pads once so no per-kernel pad/slice
    traffic exists — docs/kernels.md round 4)."""
    if training:
        assert n_valid is None, "n_valid is an eval-only fast path"
        if reuse_idx is not None:
            assert not want_graph, "a reusing stage has no graph to emit"
            outs = _edge_conv_stage_pre_train(
                k, eps, interpret, axis_name, params1["w"], params1["b"],
                params1["gamma"], params1["beta"], params2["w"],
                params2["b"], params2["gamma"], params2["beta"], f,
                reuse_idx)
        else:
            outs = _edge_conv_stage_train(
                k, eps, fast, interpret, axis_name, want_graph,
                params1["w"], params1["b"], params1["gamma"],
                params1["beta"], params2["w"], params2["b"],
                params2["gamma"], params2["beta"], f, g_src)
        out, mean1, var1, mean2, var2 = outs[:5]
        d = bn_decay
        ns1 = {"mean": state1["mean"] * d + mean1 * (1.0 - d),
               "var": state1["var"] * d + var1 * (1.0 - d)}
        ns2 = {"mean": state2["mean"] * d + mean2 * (1.0 - d),
               "var": state2["var"] * d + var2 * (1.0 - d)}
        if want_graph:
            return out, ns1, ns2, (outs[5], outs[6])
        return out, ns1, ns2

    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_zmax_pallas,
    )
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_impl,
        _knn_edge_pre_impl,
    )

    u, v = _uv_factor(params1["w"], params1["b"], f)
    graph = None
    if reuse_idx is not None:
        assert not want_graph, "a reusing stage has no graph to emit"
        y1, _ = _knn_edge_pre_impl(reuse_idx, v, u, k, _auto_rt(v.shape[1]), interpret)
    elif want_graph:
        # eval static-graph producer: surface (idx, sqd) for later stages
        idx, y1, _, sqd = _knn_edge_impl(
            g_src, v, u, k, _auto_rt(v.shape[1]), interpret, fast, with_values=True,
            n_valid=n_valid)
        graph = (idx, sqd)
    else:
        # no VJP needed at eval: call the impl directly so n_valid threads
        _, y1, _ = _knn_edge_impl(
            g_src, v, u, k, _auto_rt(v.shape[1]), interpret, fast, n_valid=n_valid)
    s1, t1, _ = _bn_affine(state1["mean"], state1["var"], params1["gamma"],
                           params1["beta"], eps)
    s2, t2, _ = _bn_affine(state2["mean"], state2["var"], params2["gamma"],
                           params2["beta"], eps)
    # population BN2 is known before launch: fold it into the kernel and
    # track ONE extremum of z (no indices/moments/min — value-identical
    # to minmax emission + sign(s2) selection)
    out = conv_zmax_pallas(
        y1, params2["w"].astype(f.dtype), params2["b"], s2, t2, s1, t1,
        interpret=interpret)
    if want_graph:
        return out, state1, state2, graph
    return out, state1, state2


def _uv_factor(w1, b1, f):
    """First-conv u/v decomposition (see knn_edge_gather)."""
    c = f.shape[-1]
    w1c = w1.astype(f.dtype)
    w_top, w_bot = w1c[:c], w1c[c:]
    u = jnp.einsum("...i,io->...o", f, w_top - w_bot,
                   preferred_element_type=jnp.float32)
    u = (u + b1).astype(f.dtype)
    v = jnp.einsum("...i,io->...o", f, w_bot,
                   preferred_element_type=jnp.float32).astype(f.dtype)
    return u, v


def _uv_grads(w1, f, du, dv):
    """Map (du, dv) cotangents back through the u/v factorization."""
    c = f.shape[-1]
    w1c = w1.astype(f.dtype)
    w_top, w_bot = w1c[:c], w1c[c:]
    du_c = du.astype(f.dtype)
    dv_c = dv.astype(f.dtype)
    df = (jnp.einsum("bno,io->bni", du_c, w_top - w_bot,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bno,io->bni", dv_c, w_bot,
                       preferred_element_type=jnp.float32)).astype(f.dtype)
    dw_a = jnp.einsum("bnc,bno->co", f, du_c,
                      preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("bnc,bno->co", f, dv_c,
                      preferred_element_type=jnp.float32)
    dw1 = jnp.concatenate([dw_a, dw_b - dw_a], axis=0)
    db1 = jnp.sum(du, axis=(0, 1))
    return df, dw1, db1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _edge_conv_stage1_train(k, eps, fast, interpret, axis_name, w1, b1,
                            gamma1, beta1, f, g_src):
    """Single-conv EdgeConv stage (kNN + conv + BN + relu + k-max) with
    the k-extrema emitted BY the kNN kernel: _knn_edge_impl's minmax
    outputs track the per-channel running max/min of y as each selection
    round's conv output is produced, so the BN+relu+k-max chain never
    re-reads the [B, N, k, C] tensor (the monotone-affine BN argument of
    ops/conv_kmax_pallas.py). The backward's only [B, N, k, C] pass is
    the fold-in scatter (scatter_bn_bwd_pallas sparse mode), reading y1
    once. Reference: third EdgeConv stage, DGCNN_ShapeNet.py:66-78."""
    outs, _ = _stage1_fwd_math(
        k, eps, fast, interpret, axis_name, w1, b1, gamma1, beta1, f, g_src)
    return outs


def _stage1_fwd_math(k, eps, fast, interpret, axis_name, w1, b1, gamma1,
                     beta1, f, g_src):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    u, v = _uv_factor(w1, b1, f)
    idx, y1, mom, ymax, amax, ymin, amin = _knn_edge_impl(
        jax.lax.stop_gradient(g_src), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, _auto_rt(v.shape[1]), interpret, fast,
        with_minmax=True)
    r = y1.shape[0] * y1.shape[1] * y1.shape[2]
    mom, r = _psum_moments(mom, r, axis_name)
    mean, var, s, t, inv = _stage_consts(gamma1, beta1, mom, r, eps)
    ysel, asel = _minmax_select(ymax, amax, ymin, amin, s)
    z = ysel.astype(jnp.float32) * s + t
    out = jax.nn.relu(z).astype(f.dtype)
    return (out, mean, var), (idx, y1, ysel, asel, mean, inv)


def _stage1_fwd(k, eps, fast, interpret, axis_name, w1, b1, gamma1, beta1,
                f, g_src):
    outs, (idx, y1, ysel, asel, mean, inv) = _stage1_fwd_math(
        k, eps, fast, interpret, axis_name, w1, b1, gamma1, beta1, f, g_src)
    res = (idx, y1, ysel, asel, mean, inv, w1, b1, gamma1, beta1, f,
           jnp.zeros_like(g_src))
    return outs, res


def _stage1_bwd(k, eps, fast, interpret, axis_name, res, cts):
    idx, y1, ysel, asel, mean, inv, w1, b1, gamma1, beta1, f, g_zeros = res
    dout = cts[0].astype(jnp.float32)
    b_, n_, k_, _ = y1.shape
    r = b_ * n_ * k_

    q, alpha, beta_v, a1, a2, _ = _bn_bwd_from_extrema(
        dout, ysel, mean, inv, gamma1, beta1, r, axis_name)

    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.scatter_pallas import (
            scatter_bn_bwd_pallas,
        )

        dv, du = scatter_bn_bwd_pallas(
            idx, y1, (q, asel), jnp.zeros_like(alpha), alpha, beta_v, n_)
        # sv (the dz scale) is unused in sparse mode: q already carries it
    else:
        onek = asel[:, :, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, k_, 1), 2)
        dy1 = (onek * q[:, :, None, :] + alpha
               + beta_v * y1.astype(jnp.float32)).astype(y1.dtype)
        du = jnp.sum(dy1.astype(jnp.float32), axis=2)
        bidx = jnp.arange(b_)[:, None, None]
        dv = jnp.zeros((b_, n_, dy1.shape[-1]), jnp.float32
                       ).at[bidx, idx].add(dy1.astype(jnp.float32))

    df, dw1, db1 = _uv_grads(w1, f, du, dv)
    return (dw1.astype(w1.dtype), db1.astype(b1.dtype), a2, a1, df,
            g_zeros)


_edge_conv_stage1_train.defvjp(_stage1_fwd, _stage1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _edge_conv_stage1_pre_train(k, eps, interpret, axis_name, w1, b1,
                                gamma1, beta1, f, idx):
    """``_edge_conv_stage1_train`` from a PRECOMPUTED kNN graph (the
    static-graph mode's single-conv stage): the minmax-emitting kNN kernel
    is replaced by its one-hot-rebuild twin (_knn_edge_pre_impl with
    minmax); the backward is the selecting stage's verbatim."""
    outs, _ = _stage1_pre_fwd_math(
        k, eps, interpret, axis_name, w1, b1, gamma1, beta1, f, idx)
    return outs


def _stage1_pre_fwd_math(k, eps, interpret, axis_name, w1, b1, gamma1,
                         beta1, f, idx):
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_pre_impl,
    )

    u, v = _uv_factor(w1, b1, f)
    y1, mom, ymax, amax, ymin, amin = _knn_edge_pre_impl(
        jax.lax.stop_gradient(idx), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, _auto_rt(v.shape[1]), interpret, with_minmax=True)
    r = y1.shape[0] * y1.shape[1] * y1.shape[2]
    mom, r = _psum_moments(mom, r, axis_name)
    mean, var, s, t, inv = _stage_consts(gamma1, beta1, mom, r, eps)
    ysel, asel = _minmax_select(ymax, amax, ymin, amin, s)
    z = ysel.astype(jnp.float32) * s + t
    out = jax.nn.relu(z).astype(f.dtype)
    return (out, mean, var), (y1, ysel, asel, mean, inv)


def _stage1_pre_fwd(k, eps, interpret, axis_name, w1, b1, gamma1, beta1, f,
                    idx):
    outs, (y1, ysel, asel, mean, inv) = _stage1_pre_fwd_math(
        k, eps, interpret, axis_name, w1, b1, gamma1, beta1, f, idx)
    res = (idx, y1, ysel, asel, mean, inv, w1, b1, gamma1, beta1, f, None)
    return outs, res


def _stage1_pre_bwd(k, eps, interpret, axis_name, res, cts):
    grads = _stage1_bwd(k, eps, False, interpret, axis_name, res, cts)
    # drop the g_src cotangent slot; idx (int graph) carries no gradient
    return grads[:-1] + (None,)


_edge_conv_stage1_pre_train.defvjp(_stage1_pre_fwd, _stage1_pre_bwd)


def apply_edge_conv_stage1_fused(
    params: Params,
    state: State,
    f: jax.Array,          # [B, N, C] point features (bf16 TPU path)
    g_src: jax.Array,      # [B, N, Cg] graph source (no grad)
    k: int,
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    fast: bool = False,
    interpret: bool = False,
    axis_name=None,
    reuse_idx: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
) -> Tuple[jax.Array, State]:
    """Whole single-conv EdgeConv stage incl. k-max (reference
    DGCNN_ShapeNet.py:66-78). Returns ([B, N, C] output, new BN state).
    ``reuse_idx`` (static-graph mode): gather along the given [B, N, k]
    graph instead of computing this stage's own kNN. ``n_valid``: see
    apply_edge_conv_stage_fused (eval pre-padded inputs)."""
    if training:
        assert n_valid is None, "n_valid is an eval-only fast path"
        if reuse_idx is not None:
            out, mean, var = _edge_conv_stage1_pre_train(
                k, eps, interpret, axis_name, params["w"], params["b"],
                params["gamma"], params["beta"], f, reuse_idx)
        else:
            out, mean, var = _edge_conv_stage1_train(
                k, eps, fast, interpret, axis_name, params["w"],
                params["b"], params["gamma"], params["beta"], f, g_src)
        new_state = {
            "mean": state["mean"] * bn_decay + mean * (1.0 - bn_decay),
            "var": state["var"] * bn_decay + var * (1.0 - bn_decay),
        }
        return out, new_state

    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import (
        _knn_edge_impl,
        _knn_edge_pre_impl,
    )

    u, v = _uv_factor(params["w"], params["b"], f)
    if reuse_idx is not None:
        _, _, ymax, amax, ymin, amin = _knn_edge_pre_impl(
            reuse_idx, v, u, k, _auto_rt(v.shape[1]), interpret, with_minmax=True)
    else:
        _, _, _, ymax, amax, ymin, amin = _knn_edge_impl(
            g_src, v, u, k, _auto_rt(v.shape[1]), interpret, fast, with_minmax=True,
            n_valid=n_valid)
    s, t, _ = _bn_affine(state["mean"], state["var"], params["gamma"],
                         params["beta"], eps)
    ysel, _ = _minmax_select(ymax, amax, ymin, amin, s)
    z = ysel.astype(jnp.float32) * s + t
    return jax.nn.relu(z).astype(f.dtype), state


def apply_conv_bn_relu_kmax(
    params: Params,
    state: State,
    h: jax.Array,          # [B, N, k, C1] activations (bf16 TPU path)
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    interpret: bool = False,
    axis_name=None,
) -> Tuple[jax.Array, State]:
    """Second EdgeConv conv + BN + ReLU + max-over-k as one fused block
    (reference: tf_util.py:115-173 conv2d then reduce_max at
    DGCNN_ShapeNet.py:46/62). Returns ([B, N, C2], new BN state)."""
    if training:
        out, mean, var = _conv_bn_kmax_train(
            eps, interpret, axis_name, params["w"], params["b"],
            params["gamma"], params["beta"], h)
        new_state = {
            "mean": state["mean"] * bn_decay + mean * (1.0 - bn_decay),
            "var": state["var"] * bn_decay + var * (1.0 - bn_decay),
        }
        return out, new_state

    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_zmax_pallas,
    )

    s, t, _ = _bn_affine(state["mean"], state["var"], params["gamma"],
                         params["beta"], eps)
    return conv_zmax_pallas(
        h, params["w"].astype(h.dtype), params["b"], s, t,
        interpret=interpret), state


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _conv_bn_nmax_train(eps, interpret, axis_name, w, b, gamma, beta, h):
    """Training-mode global-aggregation conv + BN + relu + max over the
    POINT axis, fused (the DGCNN_ShapeNet.py:80-85 block). Same
    monotone-affine minmax argument as _conv_bn_kmax_train, but since h
    is narrow ([B, N, C1]) the backward RECOMPUTES y = h@W + b in-kernel
    and uses direct matmuls for dW/dh — no Gram identities and no
    [B, N, C2] tensor in HBM in either direction
    (ops/conv_kmax_pallas.py::conv_nmax_*)."""
    out, mean, var, _ = _cbn_fwd_math(
        eps, interpret, axis_name, w, b, gamma, beta, h)
    return out, mean, var


def _cbn_fwd_math(eps, interpret, axis_name, w, b, gamma, beta, h):
    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_nmax_pallas,
    )

    ymax, amax, ymin, amin, mom = conv_nmax_pallas(
        jax.lax.stop_gradient(h), jax.lax.stop_gradient(w).astype(h.dtype),
        jax.lax.stop_gradient(b), interpret=interpret)
    r = h.shape[0] * h.shape[1]
    mom, r = _psum_moments(mom, r, axis_name)
    mean = mom[0] / r
    var = jnp.maximum(mom[1] / r - jnp.square(mean), 0.0)
    s, t, inv = _bn_affine(mean, var, gamma, beta, eps)
    ysel, asel = _minmax_select(ymax, amax, ymin, amin, s)
    z = ysel * s + t
    out = jax.nn.relu(z).astype(h.dtype)
    return out, mean, var, (ysel, asel, inv)


def _cbn_fwd(eps, interpret, axis_name, w, b, gamma, beta, h):
    out, mean, var, (ysel, asel, inv) = _cbn_fwd_math(
        eps, interpret, axis_name, w, b, gamma, beta, h)
    res = (h, ysel, asel, mean, inv, w, b, gamma, beta)
    return (out, mean, var), res


def _cbn_bwd(eps, interpret, axis_name, res, cts):
    h, ysel, asel, mean, inv, w, b, gamma, beta = res
    dout = cts[0].astype(jnp.float32)
    r = h.shape[0] * h.shape[1]

    # db comes from the kernel (numeric Σdy), not the algebraic form
    q, alpha, betav, a1, a2, _ = _bn_bwd_from_extrema(
        dout, ysel, mean, inv, gamma, beta, r, axis_name)

    if not interpret and jax.default_backend() in ("tpu", "axon"):
        from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
            conv_nmax_bwd_pallas,
        )

        dh, dW, db = conv_nmax_bwd_pallas(
            h, q, asel, w.astype(h.dtype), b, alpha, betav)
        dh = dh.astype(h.dtype)
    else:
        y = jnp.einsum("bni,io->bno", h, w.astype(h.dtype),
                       preferred_element_type=jnp.float32) + b
        y = y.astype(h.dtype).astype(jnp.float32)
        onen = asel[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, h.shape[1], 1), 1)
        dy = onen * q[:, None, :] + alpha + betav * y
        dyc = dy.astype(h.dtype)
        dh = jnp.einsum("bno,io->bni", dyc, w.astype(h.dtype),
                        preferred_element_type=jnp.float32).astype(h.dtype)
        dW = jnp.einsum("bni,bno->io", h, dyc,
                        preferred_element_type=jnp.float32)
        db = jnp.sum(dy, axis=(0, 1))
    return (dW.astype(w.dtype), db.astype(b.dtype), a2, a1, dh)


_conv_bn_nmax_train.defvjp(_cbn_fwd, _cbn_bwd)


def apply_conv_bn_relu_nmax(
    params: Params,
    state: State,
    h: jax.Array,          # [B, N, C1] point features (bf16 TPU path)
    *,
    training: bool,
    bn_decay=None,
    eps: float = BN_EPS,
    interpret: bool = False,
    axis_name=None,
    n_valid: Optional[int] = None,
) -> Tuple[jax.Array, State]:
    """Global-aggregation conv + BN + relu + max over N as one fused
    block. Returns ([B, C2] global feature, new BN state). ``n_valid``:
    see apply_edge_conv_stage_fused (eval pre-padded inputs; padded rows
    must not win the N-max)."""
    if training:
        assert n_valid is None, "n_valid is an eval-only fast path"
        out, mean, var = _conv_bn_nmax_train(
            eps, interpret, axis_name, params["w"], params["b"],
            params["gamma"], params["beta"], h)
        new_state = {
            "mean": state["mean"] * bn_decay + mean * (1.0 - bn_decay),
            "var": state["var"] * bn_decay + var * (1.0 - bn_decay),
        }
        return out, new_state

    from weaksuppointcloudseg_tpu.ops.conv_kmax_pallas import (
        conv_znmax_pallas,
    )

    s, t, _ = _bn_affine(state["mean"], state["var"], params["gamma"],
                         params["beta"], eps)
    out = conv_znmax_pallas(
        h, params["w"].astype(h.dtype), params["b"], s, t,
        interpret=interpret, n_valid=n_valid)
    return out.astype(h.dtype), state


def dropout(x: jax.Array, rng, keep_prob: float, *, training: bool) -> jax.Array:
    """Inverted dropout matching tf.nn.dropout(keep_prob)."""
    if not training or keep_prob >= 1.0:
        return x
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)
