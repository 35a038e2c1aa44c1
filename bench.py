"""Training-throughput benchmark for the flagship ShapeNet Full config.

Measures sustained points/sec/chip of the complete Full-style training step
(EdgeConv DGCNN fwd+bwd, masked CE + Siamese + MIL + smooth losses, Adam,
BN-stat updates) at the reference's headline config: 2048 points, k=20,
batch 32 unique samples (= 64 Siamese-interleaved rows), the
`train_script:1-2` setting.

Baseline anchor (documented estimate, see BASELINE.md): the reference TF1
DGCNN pipeline on a V100 sustains roughly 1.8 steps/s at batch 32 x 2048 pts
= ~118k labelled points/s; the north-star target is >=5x that per TPU chip
(BASELINE.json). vs_baseline reported here is measured_points_per_sec /
118_000 — i.e. vs the *V100 reference estimate*, so hitting the north star
means vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import numpy as np

V100_REFERENCE_POINTS_PER_SEC = 118_000.0

# Peak dense-matmul throughput per chip (bf16), by TPU generation.
PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def analytic_step_flops(model, unique_bs: int, *, smooth_dist_c: int = 3) -> float:
    """Algorithmic matmul FLOPs of one Full-style training step.

    Counts the model's *useful* math — EdgeConv 1x1 convs, pairwise-distance
    matmuls, transform net, global/head convs — NOT the one-hot gather/
    scatter matmuls (those are an implementation trick that inflates
    executed FLOPs ~N/k-fold; see docs/kernels.md). Backward counts 2x the
    forward cost for every param-bearing matmul (dW and dX) and 0x for the
    gradient-free distance computations (kNN selection is
    non-differentiable, as in the reference's tf.nn.top_k).
    """
    b = 2 * unique_bs  # Siamese-interleaved rows
    n = model.num_points
    k = model.k
    knn_c = (model.knn_channels[1] - model.knn_channels[0]
             ) if model.knn_channels else model.in_channels

    def conv(positions, c_in, c_out):
        return 2.0 * positions * c_in * c_out

    bn = b * n
    bnk = bn * k
    fwd_nograd = 0.0  # distance matmuls: stop_gradient'd
    fwd_grad = 0.0    # param-path matmuls: backward adds 2x

    # pairwise-distance matmuls (2*B*N^2*C each): transform graph + one per
    # EdgeConv stage (stage 1 on knn_c channels, later stages on the
    # previous stage's width) + the smooth loss's own distance
    graph_cs = [knn_c] if model.use_transform_net else []
    prev_w = None
    for widths in model.edge_channels:
        graph_cs.append(knn_c if prev_w is None else prev_w)
        prev_w = widths[-1]
    graph_cs.append(smooth_dist_c)
    fwd_nograd += sum(2.0 * b * n * n * c for c in graph_cs)

    # transform net (transform_nets.py:10-56): edge convs 2*knn_c->64->128,
    # conv 128->1024, fc 1024->512->256, out 256->K*K
    if model.use_transform_net:
        fwd_grad += conv(bnk, 2 * knn_c, 64) + conv(bnk, 64, 128)
        fwd_grad += conv(bn, 128, 1024)
        fwd_grad += conv(b, 1024, 512) + conv(b, 512, 256)
        fwd_grad += conv(b, 256, knn_c * knn_c)
        fwd_grad += 2.0 * bn * knn_c * knn_c  # x @ T

    # EdgeConv stages
    c_in = model.in_channels
    stage_out = []
    for widths in model.edge_channels:
        c = 2 * c_in
        for w in widths:
            fwd_grad += conv(bnk, c, w)
            c = w
        c_in = widths[-1]
        stage_out.append(c_in)

    # global aggregation + category embed + head
    fwd_grad += conv(bn, sum(stage_out), model.global_channels)
    head_in = model.global_channels + sum(stage_out)
    if model.num_categories > 0:
        fwd_grad += conv(b, model.num_categories, model.category_embed_channels)
        head_in += model.category_embed_channels
    c = head_in
    for w in model.head_channels:
        fwd_grad += conv(bn, c, w)
        c = w
    fwd_grad += conv(bn, c, model.num_classes)

    return fwd_nograd + 3.0 * fwd_grad  # fwd + dW + dX


def main() -> None:
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_train_step
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = configs.shapenet_config()
    unique_bs = 32
    cfg = dataclasses.replace(
        cfg,
        # bf16 compute (params/BN stats/logits stay fp32) + packed-min
        # top-k is the recommended fast config: loss matches f32 to 3
        # decimals; the knn_fast A/B (docs/kernels.md) showed synthetic
        # end-to-end convergence and cross-evaluated mIoU unchanged.
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  knn_fast=True),
        train=dataclasses.replace(cfg.train, batch_size=unique_bs, style="Full"),
    )
    n = cfg.model.num_points
    b = 2 * unique_bs
    k = cfg.model.num_classes

    rng = np.random.default_rng(0)
    seg = rng.integers(0, k, (b, n))
    batch = {
        "data": rng.standard_normal((b, n, 3)).astype(np.float32),
        "seg": seg.astype(np.int32),
        "seg_onehot": onehot_encode(seg, k),
        "mask": (rng.uniform(size=(b, n)) < 0.1).astype(np.float32),
        "cat_onehot": onehot_encode(
            rng.integers(0, cfg.model.num_categories, (b,)), cfg.model.num_categories
        ),
        "valid": np.ones((b,), np.float32),
    }
    batch = jax.device_put(batch)

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    train_step = make_train_step(cfg)
    gate = np.float32(1.0)
    key = jax.random.PRNGKey(1)

    # NOTE: on the axon-tunneled TPU, jax.block_until_ready returns before
    # device execution finishes; a scalar D2H fetch is the only reliable
    # barrier. Keys are pre-generated so the loop is pure dispatch.
    def sync(metrics) -> float:
        return float(metrics["total"])

    steps = 30
    keys = jax.random.split(key, steps + 1)

    # warmup (compile)
    state, metrics = train_step(state, batch, gate, keys[0])
    sync(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, gate, keys[i + 1])
    sync(metrics)
    dt = time.perf_counter() - t0

    points_per_sec = steps * unique_bs * n / dt
    # Analytic-FLOPs MFU: useful model matmul FLOPs (EdgeConv/head convs,
    # distance matmuls, transform net; fwd + bwd) over chip peak. One-hot
    # gather/scatter matmul FLOPs are excluded (implementation detail).
    flops = analytic_step_flops(
        cfg.model, unique_bs, smooth_dist_c=(
            cfg.weaksup.smooth_channels[1] - cfg.weaksup.smooth_channels[0]
            if cfg.weaksup.smooth_channels else 3))
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16_FLOPS.get(gen, PEAK_BF16_FLOPS["v5e"])
    step_s = dt / steps
    print(json.dumps({
        "metric": "shapenet_full_train_throughput",
        "value": round(points_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(points_per_sec / V100_REFERENCE_POINTS_PER_SEC, 3),
        "mfu": round(flops / step_s / peak, 4),
        "step_ms": round(step_s * 1e3, 2),
        "analytic_flops_per_step": round(flops / 1e9, 1),  # GFLOPs
        "chip": gen,
    }))


if __name__ == "__main__":
    main()
