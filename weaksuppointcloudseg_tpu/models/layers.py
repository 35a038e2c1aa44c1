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


def _batch_norm(x, params, state, *, training: bool, decay, eps: float = BN_EPS):
    """Reference-semantics BN over all axes but the last. Returns (y, state)."""
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
        y, state = _batch_norm(y, params, state, training=training, decay=bn_decay, eps=eps)
    if relu:
        y = jax.nn.relu(y)
    return y, state


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
) -> Tuple[jax.Array, State]:
    """conv(concat([f_i, f_j - f_i])) + bias + BN + ReLU with the
    d_ef-free backward (see edge_conv_matmul)."""
    y = edge_conv_matmul(f, nbr, params["w"], params["b"])
    y, state = _batch_norm(y, params, state, training=training,
                           decay=bn_decay, eps=eps)
    return jax.nn.relu(y), state


def _ecf_forward(k, eps, fast, interpret, w, b, gamma, beta, f, g_src):
    """Primal math of the fused EdgeConv-conv1 + BN + ReLU block."""
    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import _knn_edge_impl

    c = f.shape[-1]
    wc = w.astype(f.dtype)
    w_top, w_bot = wc[:c], wc[c:]
    u = jnp.einsum("...i,io->...o", f, w_top - w_bot,
                   preferred_element_type=jnp.float32)
    u = (u + b).astype(f.dtype)
    v = jnp.einsum("...i,io->...o", f, w_bot,
                   preferred_element_type=jnp.float32).astype(f.dtype)
    idx, y, mom = _knn_edge_impl(
        jax.lax.stop_gradient(g_src), jax.lax.stop_gradient(v),
        jax.lax.stop_gradient(u), k, 256, interpret, fast)
    r = y.shape[0] * y.shape[1] * y.shape[2]
    mean = mom[0] / r
    var = jnp.maximum(mom[1] / r - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    z = (y.astype(jnp.float32) - mean) * (inv * gamma) + beta
    h = jax.nn.relu(z).astype(y.dtype)
    return h, mean, var, idx, y, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _edge_conv_bn_relu_train(k, eps, fast, interpret, w, b, gamma, beta,
                             f, g_src):
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
        k, eps, fast, interpret, w, b, gamma, beta, f, g_src)
    return h, mean, var


def _ecf_fwd(k, eps, fast, interpret, w, b, gamma, beta, f, g_src):
    h, mean, var, idx, y, inv = _ecf_forward(
        k, eps, fast, interpret, w, b, gamma, beta, f, g_src)
    res = (idx, y, h, mean, inv, w, gamma, f, jnp.zeros_like(g_src))
    return (h, mean, var), res


def _ecf_bwd(k, eps, fast, interpret, res, cts):
    idx, y, h, mean, inv, w, gamma, f, g_zeros = res
    dh = cts[0]  # mean/var feed only the state update: zero cotangents
    r = y.shape[0] * y.shape[1] * y.shape[2]

    y32 = y.astype(jnp.float32)
    xhat = (y32 - mean) * inv
    dz = dh.astype(jnp.float32) * (h > 0)
    a1 = jnp.sum(dz, axis=(0, 1, 2))          # = dbeta
    a2 = jnp.sum(dz * xhat, axis=(0, 1, 2))   # = dgamma
    dy = ((inv * gamma) * (dz - a1 / r - xhat * (a2 / r))).astype(y.dtype)

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

    c = f.shape[-1]
    wc = w.astype(f.dtype)
    w_top, w_bot = wc[:c], wc[c:]
    du_c = du.astype(f.dtype)
    dv_c = dv.astype(f.dtype)
    df = (jnp.einsum("bno,io->bni", du_c, w_top - w_bot,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bno,io->bni", dv_c, w_bot,
                       preferred_element_type=jnp.float32)).astype(f.dtype)
    dw_a = jnp.einsum("bnc,bno->co", f, du_c,
                      preferred_element_type=jnp.float32)  # d(W_top - W_bot)
    dw_b = jnp.einsum("bnc,bno->co", f, dv_c,
                      preferred_element_type=jnp.float32)  # d(W_bot direct)
    dw = jnp.concatenate([dw_a, dw_b - dw_a], axis=0)
    db = jnp.sum(du, axis=(0, 1))
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
            k, eps, fast, interpret, params["w"], params["b"],
            params["gamma"], params["beta"], f, g_src)
        new_state = {
            "mean": state["mean"] * bn_decay + mean * (1.0 - bn_decay),
            "var": state["var"] * bn_decay + var * (1.0 - bn_decay),
        }
        return h, new_state

    from weaksuppointcloudseg_tpu.ops.edgeconv_pallas import knn_edge_gather

    c = f.shape[-1]
    w = params["w"].astype(f.dtype)
    w_top, w_bot = w[:c], w[c:]
    u = jnp.einsum("...i,io->...o", f, w_top - w_bot,
                   preferred_element_type=jnp.float32)
    u = (u + params["b"]).astype(f.dtype)
    v = jnp.einsum("...i,io->...o", f, w_bot,
                   preferred_element_type=jnp.float32).astype(f.dtype)
    _, y, _ = knn_edge_gather(g_src, v, u, k, 256, interpret, fast)
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
                           decay=bn_decay, eps=eps)
    return jax.nn.relu(y), state


def dropout(x: jax.Array, rng, keep_prob: float, *, training: bool) -> jax.Array:
    """Inverted dropout matching tf.nn.dropout(keep_prob)."""
    if not training or keep_prob >= 1.0:
        return x
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)
