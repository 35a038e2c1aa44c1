"""DGCNN (EdgeConv) segmentation network, TPU-first.

One parameterized implementation covering both reference variants:

- ShapeNet part segmentation (ShapeNet/DGCNN_ShapeNet.py:15-113): k=20,
  EdgeConv spatial transform branch, 3 EdgeConv stages (64-64 / 64-64 / 64),
  1024-d global feature, 16-way category-label embedding concatenated, seg
  head 256/256/128/50 with dropout keep 0.6.
- S3DIS semantic segmentation (S3DIS/DGCNN_S3DIS.py:24-104): 9-channel input,
  kNN graph on normalized-XYZ channels 6:9, no transform net / category
  branch, head 512/256/13 with dropout keep 0.7. The reference's S3DIS head
  layers do not receive the scheduled bn_decay (DGCNN_S3DIS.py:95-101) and so
  fall back to a fixed 0.9 (tf_util.py:523) — reproduced via
  ``head_bn_fixed_decay``.

The graph is recomputed per stage in feature space (dynamic graph). All
EdgeConv "1x1 convs" are channel matmuls that XLA tiles onto the MXU; the
distance/top-k/gather ops come from ops/knn.py (Pallas-fused variant
selectable via ``use_fused_knn``). ``ModelConfig.static_graph`` (opt-in,
NOT reference parity) builds the graph once on the input coordinates and
reuses it across stages — the reused stages' kNN selection passes
disappear (ops/edgeconv_pallas.knn_edge_gather_pre).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from weaksuppointcloudseg_tpu.configs import ModelConfig
from weaksuppointcloudseg_tpu.models import layers
from weaksuppointcloudseg_tpu.models.transform_net import (
    init_transform_net,
    apply_transform_net,
)
import weaksuppointcloudseg_tpu.ops.neighbors as knn_ops


def _knn_input(x: jax.Array, cfg: ModelConfig) -> jax.Array:
    if cfg.knn_channels is not None:
        lo, hi = cfg.knn_channels
        return x[..., lo:hi]
    return x


def init_dgcnn_seg(key, cfg: ModelConfig) -> Tuple[dict, dict]:
    """Initialize params + BN state pytrees for the segmentation net."""
    params, state = {}, {}
    n_edge_convs = sum(len(s) for s in cfg.edge_channels)
    n_keys = n_edge_convs + 8
    keys = list(jax.random.split(key, n_keys))

    knn_c = (cfg.knn_channels[1] - cfg.knn_channels[0]) if cfg.knn_channels else cfg.in_channels

    if cfg.use_transform_net:
        params["transform_net"], state["transform_net"] = init_transform_net(
            keys.pop(), in_c=2 * knn_c, K=knn_c
        )

    # EdgeConv stages. Stage 0 consumes edge features of the raw input
    # (2 * in_channels); later stages consume edge features of the previous
    # stage's k-max output.
    conv_i = 1
    in_c = cfg.in_channels
    stage_out = []
    for s_i, widths in enumerate(cfg.edge_channels):
        c = 2 * in_c
        for w in widths:
            name = f"adj_conv{conv_i}"
            params[name], state[name] = layers.init_conv(keys.pop(), c, w, bn=True)
            c = w
            conv_i += 1
        in_c = widths[-1]
        stage_out.append(in_c)

    # Global aggregation conv (adj_conv7 in the reference).
    params["agg_conv"], state["agg_conv"] = layers.init_conv(
        keys.pop(), sum(stage_out), cfg.global_channels, bn=True
    )

    global_c = cfg.global_channels
    if cfg.num_categories > 0:
        params["cat_embed"], state["cat_embed"] = layers.init_conv(
            keys.pop(), cfg.num_categories, cfg.category_embed_channels, bn=True
        )
        global_c += cfg.category_embed_channels

    # Segmentation head.
    c = global_c + sum(stage_out)
    for h_i, w in enumerate(cfg.head_channels):
        name = f"seg_conv{h_i + 1}"
        params[name], state[name] = layers.init_conv(keys.pop(), c, w, bn=True)
        c = w
    params["seg_out"], _ = layers.init_conv(keys.pop(), c, cfg.num_classes, bn=False)
    return params, state


def apply_dgcnn_seg(
    params: dict,
    state: dict,
    x: jax.Array,  # [B, N, in_channels]
    cat_onehot: Optional[jax.Array],  # [B, num_categories] or None
    *,
    cfg: ModelConfig,
    training: bool,
    bn_decay,
    rng: Optional[jax.Array] = None,
    head_bn_fixed_decay: Optional[float] = None,
    axis_name=None,
    want_smooth_graph: bool = False,
    n_valid: Optional[int] = None,
):
    """Forward pass. Returns (logits [B, N, num_classes], new BN state).

    ``n_valid`` (fused bf16 eval only): ``x`` is pre-padded along N to a
    kernel-aligned width; only rows < n_valid are real points. The
    selection kernels exclude padded rows as neighbor candidates and the
    global N-max ignores them; per-point outputs for padded rows are
    garbage the caller slices off. This removes every per-kernel
    XLA pad/slice at unaligned eval shapes (N=3000 -> 3072,
    docs/kernels.md round 4).

    ``axis_name``: shard_map data-parallel axis name. When set, every BN
    (XLA path and fused custom-VJP blocks alike) computes GLOBAL batch
    moments via psum over the axis — the cross-replica-BN requirement of
    SURVEY.md §2.3 for the fused path, where the SPMD partitioner cannot
    see inside pallas_call (train/steps.py builds the shard_map step).

    ``want_smooth_graph`` (fused bf16 training path with a transform net
    only): appends the transform branch's gradient-free kNN graph
    (idx [B, N, k] int32, sqd [B, N, k] f32, built on the raw kNN input
    coordinates) to the return tuple, for reuse by the smoothness loss —
    on ShapeNet both graphs live on raw xyz, so the loss's own kNN pass
    (reference Util/SmoothConstraint.py:140-158 recomputes the full
    distance matrix) is skipped entirely (losses/weaksup.py, graph=...).
    """
    new_state = dict(state)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    # ONE fused-path gate for the transform branch, the EdgeConv stages,
    # and the aggregation conv — they must never split across fused and
    # unfused paths
    fused_tpu = (cfg.use_fused_knn and compute_dtype == jnp.bfloat16
                 and jax.default_backend() in ("tpu", "axon"))
    if (training and compute_dtype == jnp.bfloat16
            and jax.default_backend() in ("tpu", "axon")
            and (not cfg.use_fused_knn
                 or any(len(w) not in (1, 2) for w in cfg.edge_channels))):
        # >=3-conv stages would also route their tail convs through the
        # straight composition even with the fused gate on
        msg = (
            "bfloat16 training would use the straight conv+BN+k-max "
            "composition on a TPU backend, which miscompiles here (its "
            "gradients are identically zero for every parameter upstream "
            "of a k-max — verified against the CPU lowering, see "
            "docs/kernels.md). Use the fused path (use_fused_knn=True "
            "with 1- or 2-conv EdgeConv stages) or float32 compute.")
        if not cfg.allow_known_bad_bf16:
            # silent-zero-gradient training must not be reachable by
            # accident: hard error unless explicitly overridden
            raise ValueError(
                msg + " (Set ModelConfig.allow_known_bad_bf16=True to run "
                "this configuration anyway.)")
        import warnings

        warnings.warn(msg, stacklevel=2)
    kw = dict(training=training, bn_decay=bn_decay, eps=cfg.bn_eps,
              axis_name=axis_name)
    head_kw = dict(kw)
    if head_bn_fixed_decay is not None:
        head_kw["bn_decay"] = head_bn_fixed_decay
    B, N, _ = x.shape

    smooth_graph = None
    if want_smooth_graph:
        assert training and cfg.use_transform_net and fused_tpu, (
            "want_smooth_graph reuses the fused transform stage's kNN "
            "graph — training + use_transform_net + fused bf16/TPU only")
    if n_valid is not None:
        assert (not training and fused_tpu
                and all(len(w) in (1, 2) for w in cfg.edge_channels)), (
            "n_valid (pre-padded points) is an eval-only fast path of "
            "the fused bf16/TPU kernels (1- or 2-conv EdgeConv stages)")

    # static-graph mode (opt-in, NOT reference parity): one kNN graph on
    # the input coordinates, reused by every EdgeConv stage — the
    # selection passes of stages past the producer disappear
    # (docs/kernels.md round 3). ``static_idx`` is that [B, N, k] graph.
    static_idx = None

    # --- Spatial transform branch (ShapeNet only) ---
    if cfg.use_transform_net:
        g = _knn_input(x, cfg)
        # bf16/TPU: tconv1+tconv2+k-max as the merged minmax stage.
        # (Round-2 history: fusing only the FIRST conv here measured
        # 136 -> 148 ms/step — df is dead so the scatter its dW needs was
        # pure added cost. The round-2.6 merged stage amortizes that
        # scatter against the whole conv2+BN+k-max chain, flipping the
        # trade — see apply_transform_net.)
        if fused_tpu:
            want_tgraph = want_smooth_graph or cfg.static_graph
            touts = apply_transform_net(
                params["transform_net"], state["transform_net"], None,
                K=g.shape[-1], training=training, bn_decay=bn_decay,
                bn_eps=cfg.bn_eps,
                fused_graph=g.astype(compute_dtype), k=cfg.k,
                fast=cfg.knn_fast, axis_name=axis_name,
                want_graph=want_tgraph, n_valid=n_valid,
            )
            transform, new_state["transform_net"] = touts[:2]
            if want_smooth_graph:
                smooth_graph = touts[2]
            if cfg.static_graph:
                static_idx = touts[2][0]
        else:
            if cfg.static_graph:
                gc = g.astype(compute_dtype)
                static_idx = (
                    knn_ops.knn_graph_fused(gc, cfg.k, fast=cfg.knn_fast)
                    if cfg.use_fused_knn else knn_ops.knn_graph(gc, cfg.k))
                ef = knn_ops.edge_feature(gc, static_idx)
            else:
                ef = knn_ops.edge_feature_auto(
                    g, g.astype(compute_dtype), cfg.k,
                    use_fused=cfg.use_fused_knn, fast=cfg.knn_fast,
                )
            transform, new_state["transform_net"] = apply_transform_net(
                params["transform_net"], state["transform_net"], ef,
                K=g.shape[-1], training=training, bn_decay=bn_decay,
                bn_eps=cfg.bn_eps, axis_name=axis_name,
            )
        x = jnp.einsum(
            "bnc,bcd->bnd", x, transform.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    # --- EdgeConv stages (dynamic graph recomputed per stage; with
    # ``static_graph`` every stage reuses the one input-coordinate graph) ---
    feat = x.astype(compute_dtype)
    graph_feat = _knn_input(x, cfg).astype(compute_dtype) if not cfg.use_transform_net else feat
    if cfg.static_graph and static_idx is None and (
            not fused_tpu or len(cfg.edge_channels[0]) != 2):
        # no transform branch to produce the graph and no fused stage-0
        # producer (only the two-conv fused stage emits its graph): one
        # standalone kNN on the input coordinates (knn_graph_fused falls
        # back to the XLA path off-TPU itself)
        assert n_valid is None, (
            "n_valid does not thread through the standalone static-graph "
            "kNN producer")
        static_idx = (
            knn_ops.knn_graph_fused(graph_feat, cfg.k, fast=cfg.knn_fast)
            if cfg.use_fused_knn else knn_ops.knn_graph(graph_feat, cfg.k))
    conv_i = 1
    stage_outputs = []
    for s_i, widths in enumerate(cfg.edge_channels):
        src = graph_feat if s_i == 0 else stage_outputs[-1]
        f_in = feat if s_i == 0 else stage_outputs[-1]
        # Decomposition history (docs/kernels.md): the u_i + v_j split
        # applied in plain XLA (layers.apply_edge_conv_first) measured
        # *slower* — XLA re-materializes the gathered v. Applied INSIDE the
        # fused kNN kernel (round 2.5, layers.apply_edge_conv_knn_fused)
        # it wins: the gather of v is the selection round's existing mask
        # matmul, so the edge tensor, neighbor tensor, and the big conv all
        # vanish from HBM, and the BN moments accumulate in-kernel. bf16 +
        # fused configs take that path; the parity path keeps the straight
        # gather + concat + conv (+ the d_ef-free backward of
        # layers.edge_conv_matmul).
        name = f"adj_conv{conv_i}"
        if fused_tpu and len(widths) == 2:
            # whole stage (kNN + both convs + BNs + relus + k-max) as one
            # custom-VJP block over two Pallas kernels: only the raw
            # first-conv output reaches HBM (layers.apply_edge_conv_stage_fused)
            name2 = f"adj_conv{conv_i + 1}"
            # want_graph also emits sqd, unused in static-graph mode — an
            # extra [B, N, k] f32 write, ~0.02 ms/step at the S3DIS
            # flagship shape; not worth an idx-only kernel mode
            produce_graph = cfg.static_graph and static_idx is None
            outs = layers.apply_edge_conv_stage_fused(
                params[name], state[name], params[name2], state[name2],
                f_in, src, cfg.k, fast=cfg.knn_fast,
                want_graph=produce_graph, reuse_idx=static_idx,
                n_valid=n_valid, **kw)
            out, new_state[name], new_state[name2] = outs[:3]
            if produce_graph:
                static_idx = outs[3][0]
            conv_i += 2
            stage_outputs.append(out)
            continue
        if fused_tpu and len(widths) == 1:
            # single-conv stage: the kNN kernel itself emits the k-extrema
            # (layers.apply_edge_conv_stage1_fused)
            out, new_state[name] = layers.apply_edge_conv_stage1_fused(
                params[name], state[name], f_in, src, cfg.k,
                fast=cfg.knn_fast, reuse_idx=static_idx, n_valid=n_valid,
                **kw)
            conv_i += 1
            stage_outputs.append(out)
            continue
        if fused_tpu and static_idx is None:
            h, new_state[name] = layers.apply_edge_conv_knn_fused(
                params[name], state[name], f_in, src, cfg.k,
                fast=cfg.knn_fast, **kw)
        else:
            nbr = (knn_ops.gather_neighbors(f_in, static_idx)
                   if static_idx is not None
                   else knn_ops.neighbor_features_auto(
                       src, f_in, cfg.k, use_fused=cfg.use_fused_knn,
                       fast=cfg.knn_fast))
            h, new_state[name] = layers.apply_edge_conv(
                params[name], state[name], f_in, nbr, **kw)
        conv_i += 1
        for w in widths[1:]:
            name = f"adj_conv{conv_i}"
            h, new_state[name] = layers.apply_conv(params[name], state[name], h, **kw)
            conv_i += 1
        stage_outputs.append(jnp.max(h, axis=2))  # k-max -> [B, N, C]

    # --- Global feature ---
    concat = jnp.concatenate(stage_outputs, axis=-1)  # [B, N, sum(C)]
    if fused_tpu:
        # agg conv + BN + relu + max-over-N fused: the [B, N, 1024]
        # global-feature tensor never reaches HBM
        global_feat, new_state["agg_conv"] = layers.apply_conv_bn_relu_nmax(
            params["agg_conv"], state["agg_conv"], concat, n_valid=n_valid,
            **kw)
    else:
        g, new_state["agg_conv"] = layers.apply_conv(
            params["agg_conv"], state["agg_conv"], concat, **kw
        )
        global_feat = jnp.max(g, axis=1)  # [B, global_channels]

    if cfg.num_categories > 0:
        assert cat_onehot is not None, "model was built with a category branch"
        cat, new_state["cat_embed"] = layers.apply_conv(
            params["cat_embed"], state["cat_embed"],
            cat_onehot.astype(compute_dtype), **kw,
        )
        global_feat = jnp.concatenate([global_feat, cat], axis=-1)

    # --- Segmentation head ---
    # First head conv: the global feature is constant over N, so its
    # matmul runs once per sample and broadcasts — the [B, N, global]
    # tile and the [B, N, global+sum(C)] concat never exist in HBM
    # (layers.apply_conv_bcast; reference tf.tile+concat semantics,
    # DGCNN_ShapeNet.py:87-100).
    if rng is None:
        rng = jax.random.PRNGKey(0)
    h, new_state["seg_conv1"] = layers.apply_conv_bcast(
        params["seg_conv1"], state["seg_conv1"],
        global_feat.astype(compute_dtype), concat, **head_kw)
    keep = cfg.head_keep_prob[0]
    if keep is not None:
        rng, sub = jax.random.split(rng)
        h = layers.dropout(h, sub, keep, training=training)
    for h_i, w in enumerate(cfg.head_channels[1:], start=1):
        name = f"seg_conv{h_i + 1}"
        h, new_state[name] = layers.apply_conv(params[name], state[name], h, **head_kw)
        keep = cfg.head_keep_prob[h_i]
        if keep is not None:
            rng, sub = jax.random.split(rng)
            h = layers.dropout(h, sub, keep, training=training)
    logits, _ = layers.apply_conv(
        params["seg_out"], {}, h, training=training, bn_decay=None, relu=False, bn=False
    )
    if want_smooth_graph:
        return logits.astype(jnp.float32), new_state, smooth_graph
    return logits.astype(jnp.float32), new_state
