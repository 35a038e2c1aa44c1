"""Driver-captured benchmarks for the framework's headline numbers.

Emits ONE JSON line per metric (`{"metric", "value", "unit", "vs_baseline"}`),
ending with the flagship ShapeNet Full train-step throughput (the last line
is what the driver parses as the round's headline). Metrics:

1. ``lp_dense_lu_3000``      — label-propagation dense LU solve, ms/sample
                               at the ShapeNet test shape (N=3000).
1b. ``lp_cg_factored_3000``  — the DEFAULT LP solver (factored-W CG).
2. ``lp_cg_matfree_3000``    — matrix-free CG LP at the same shape.
3. ``lp_cg_matfree_32768``   — long-context LP: 32k points on one chip, no
                               [N,N] ever materialized.
3b. ``s3dis_eval_forward_throughput`` / ``s3dis_test_e2e_throughput`` —
                               S3DIS inference at the room-block shape
                               (bs=14, N=4096): eval forward (with a
                               same-chip vs_xla_everywhere anchor) and
                               forward + per-block LP.
4. ``s3dis_full_train_throughput``    — S3DIS flagship (bs=14, N=4096,
                               train_script:4-5), points/s/chip.
5. ``shapenet_plain_train_throughput`` — Plain style (seg loss only).
5b. ``shapenet_full_train_throughput_static_graph`` — the opt-in
                               static-graph turbo mode (ModelConfig.
                               static_graph; NOT reference parity).
6. ``shapenet_eval_forward_throughput`` — inference forward at the
                               ShapeNet test shape (bs=32, N=3000).
7. ``shapenet_test_e2e_throughput`` — the full test path: eval forward +
                               dense-W CG label propagation.
8. ``xla_everywhere_baseline`` — the SAME flagship step with every Pallas
                               kernel disabled and f32 compute: the
                               anchor-free denominator.
9. ``shapenet_full_train_throughput`` — the flagship (train_script:1-2,
                               bs=32 x 2048 pts, bf16 + fast selection),
                               with BOTH ratios: ``vs_baseline`` against the
                               documented V100 reference estimate and
                               ``vs_xla_everywhere`` against metric 8
                               measured in the same run on the same chip.

Baseline anchor (documented estimate, BASELINE.md): the reference TF1 DGCNN
pipeline on a V100 sustains ~1.8 steps/s at batch 32 x 2048 pts = ~118k
labelled points/s; the north-star target is >=5x that per TPU chip.
``vs_xla_everywhere`` exists so the perf claim does not hinge on that one
unverifiable constant: it is a pure same-chip measured ratio.

Set BENCH_QUICK=1 to emit only the flagship line (dev iteration).

NOTE: on the axon-tunneled TPU, jax.block_until_ready returns before device
execution finishes; a scalar D2H fetch is the only reliable barrier (all
timing loops here sync that way).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
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


def make_train_batch(model_cfg, unique_bs: int, *, seed: int = 0):
    """Synthetic Siamese-interleaved batch shaped like the real loaders'."""
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    rng = np.random.default_rng(seed)
    b = 2 * unique_bs
    n = model_cfg.num_points
    k = model_cfg.num_classes
    seg = rng.integers(0, k, (b, n))
    batch = {
        "data": rng.standard_normal((b, n, model_cfg.in_channels)).astype(
            np.float32),
        "seg": seg.astype(np.int32),
        "seg_onehot": onehot_encode(seg, k),
        "mask": (rng.uniform(size=(b, n)) < 0.1).astype(np.float32),
        "valid": np.ones((b,), np.float32),
    }
    if model_cfg.num_categories > 0:
        batch["cat_onehot"] = onehot_encode(
            rng.integers(0, model_cfg.num_categories, (b,)),
            model_cfg.num_categories)
    return jax.device_put(batch)


def time_train_step(cfg, *, steps: int = 30, seed: int = 0) -> float:
    """Sustained seconds/step of the jitted train step (scalar-fetch sync)."""
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_train_step

    unique_bs = cfg.train.batch_size
    batch = make_train_batch(cfg.model, unique_bs, seed=seed)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    train_step = make_train_step(cfg)
    gate = np.float32(1.0)
    keys = jax.random.split(
        jax.random.key(1, impl=cfg.train.rng_impl), steps + 1)

    state, metrics = train_step(state, batch, gate, keys[0])  # compile
    float(metrics["total"])  # sync

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, gate, keys[i + 1])
    float(metrics["total"])  # sync
    return (time.perf_counter() - t0) / steps


def time_lp(solver: str, n: int, *, b: int = 1, reps: int = 10,
            seed: int = 0) -> float:
    """ms per propagate_batch call at the ShapeNet test geometry scale
    (pc_normalize'd unit-sphere coords, where CG matches LU to ~1e-3)."""
    from weaksuppointcloudseg_tpu.propagate.label_prop import propagate_batch

    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True).max(1, keepdims=True)
    g = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, n, 50)), jnp.float32), -1)
    xyz, g = jax.device_put((xyz, g))

    y = propagate_batch(xyz, g, solver=solver)  # compile
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = propagate_batch(xyz, g, solver=solver)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / reps * 1e3


def time_room_lp(n_blocks: int, n_per_block: int, *, reps: int = 3,
                 seed: int = 0) -> float:
    """ms for ONE matrix-free label propagation over a whole S3DIS-style
    room (train/loop.py::S3DISTrainer.room_label_prop compute path). The
    reference refines each 1m block independently (its dense O(N^3) solve
    cannot reach room scale); this measures the capability upgrade at a
    realistic room size. Points are sampled on surfaces (floor/ceiling/
    walls/furniture planes) so local densities — and therefore CG's
    data-dependent convergence — resemble real scans."""
    from weaksuppointcloudseg_tpu.propagate.label_prop import propagate_batch

    n = n_blocks * n_per_block
    rng = np.random.default_rng(seed)
    room = np.array([8.0, 8.0, 3.0], np.float32)
    n_surf, n_int = int(n * 0.7), n - int(n * 0.7)
    xy = rng.uniform(0, 1, (n_surf, 2)) * room[:2]
    which = rng.integers(0, 4, n_surf)
    z = np.where(which == 0, 0.0, np.where(which == 1, room[2],
                 rng.uniform(0, room[2], n_surf)))
    x = np.where(which == 2, np.round(xy[:, 0] / 2) * 2, xy[:, 0])
    surf = np.stack([x, xy[:, 1], z], -1)
    interior = rng.uniform(0, 1, (n_int, 3)) * room
    xyz = np.concatenate([surf, interior]).astype(np.float32)[None]
    rgb = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
    logits = rng.standard_normal((1, n, 13)).astype(np.float32) * 3.0
    g = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    xyz, g, rgb = jax.device_put((xyz, g, rgb))

    y = propagate_batch(xyz, g, rgb, solver="cg_matfree")  # compile
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = propagate_batch(xyz, g, rgb, solver="cg_matfree")
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / reps * 1e3


def time_host_assemble(dataset: str, unique_bs: int, n: int,
                       *, epochs: int = 3) -> dict:
    """ms/batch of the host-side work the prefetch thread must hide:
    dataset batch slicing + _assemble (SampIndex mask, Siamese dup +
    augment, one-hot encoding) + _put, via the REAL trainer path
    (train/loop.py::_run_train_epoch's transform) on synthetic data at the
    flagship shape. Returns {"ms": ..., "ms_numpy": ...} — the second
    value with the native C++ batcher disabled (numpy fallback)."""
    import tempfile

    from weaksuppointcloudseg_tpu import configs, native
    from weaksuppointcloudseg_tpu.data import sampling

    tmp = tempfile.mkdtemp(prefix=f"bench_host_{dataset}_")
    if dataset == "shapenet":
        from weaksuppointcloudseg_tpu.data import shapenet
        from weaksuppointcloudseg_tpu.train.loop import ShapeNetTrainer

        shapenet.write_synthetic(tmp, num_points=n,
                                 train_samples=unique_bs * 2,
                                 val_samples=2, test_samples=2)
        ds = shapenet.ShapeNetDataset(tmp)
        pts_idx = sampling.generate_sample_index(
            ds.num_samples("train"), n, 0.1)
        cfg = flagship_config(unique_bs)
        tr = ShapeNetTrainer(cfg, ds, pts_idx, seed=0)
        batches = lambda: ds.batches("train", unique_bs, shuffle=True,
                                     drop_last=True, rng=tr.np_rng)
    else:
        from weaksuppointcloudseg_tpu.data import s3dis
        from weaksuppointcloudseg_tpu.train.loop import S3DISTrainer

        s3dis.write_synthetic(tmp, num_rooms_per_area=4, blocks_per_room=8,
                              num_points=n, areas=(1, 5))
        ds = s3dis.S3DISDataset(tmp)
        cfg = configs.s3dis_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=unique_bs,
                                           style="Full"))
        pts_idx = sampling.generate_sample_index(
            len(ds.room_filelist), n, 0.1)
        tr = S3DISTrainer(cfg, ds, pts_idx, test_area=5, seed=0)
        batches = lambda: ds.batches(tr.train_idx, unique_bs, shuffle=True,
                                     drop_last=True, rng=tr.np_rng)

    def assemble(b):
        batch = tr._assemble(b, siamese=True, augment_pairs=True,
                             full_mask=False)
        return tr._put(batch, pairs=True)

    out = {}
    for key in ("ms", "ms_numpy"):
        saved = native._lib
        if key == "ms_numpy":
            native._lib = None
        try:
            list(map(assemble, batches()))  # warmup (page cache, JIT-free)
            t0, cnt = time.perf_counter(), 0
            for _ in range(epochs):
                for b in batches():
                    assemble(b)
                    cnt += 1
            out[key] = (time.perf_counter() - t0) / cnt * 1e3
        finally:
            native._lib = saved
    out["native_lib"] = native.HAVE_NATIVE
    return out


def emit(metric: str, value: float, unit: str, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(vs_baseline, 3)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def flagship_config(unique_bs: int = 32):
    from weaksuppointcloudseg_tpu import configs

    cfg = configs.shapenet_config()
    return dataclasses.replace(
        cfg,
        # bf16 compute (params/BN stats/logits stay fp32) + packed-min
        # top-k is the recommended fast config: loss matches f32 to 3
        # decimals; the knn_fast A/B (docs/kernels.md) showed synthetic
        # end-to-end convergence and cross-evaluated mIoU unchanged.
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  knn_fast=True),
        train=dataclasses.replace(cfg.train, batch_size=unique_bs,
                                  style="Full"),
    )


def main() -> None:
    from weaksuppointcloudseg_tpu import configs

    quick = bool(os.environ.get("BENCH_QUICK"))
    unique_bs = 32
    cfg = flagship_config(unique_bs)
    n = cfg.model.num_points

    # Flagship first (so secondary-metric failures can never cost the
    # headline), printed last.
    step_s = time_train_step(cfg)
    points_per_sec = unique_bs * n / step_s

    xla_ratio = None
    if not quick:
        # --- label propagation (inference refinement) ---
        for solver, lp_n, name in (
                ("solve", 3000, "lp_dense_lu_3000"),
                ("cg", 3000, "lp_cg_factored_3000"),
                ("cg_matfree", 3000, "lp_cg_matfree_3000"),
                ("cg_matfree", 32768, "lp_cg_matfree_32768")):
            try:
                extra_lp = {}
                if solver == "cg_matfree":
                    # near-uniform softmax(randn) input: CG's documented
                    # worst case (~25 iters vs <=10 trained-like;
                    # docs/kernels.md round 5). Round-4 values for these
                    # metrics predate the affinity-precision fix — they
                    # solved on a noise W at DEFAULT matmul precision —
                    # so r4 -> r5 deltas here are not like-for-like.
                    extra_lp["note"] = ("worst-case near-uniform input; "
                                        "pre-r5 values used a noise W "
                                        "(affinity precision bug)")
                emit(name, time_lp(solver, lp_n), "ms/sample",
                     n_points=lp_n, solver=solver, **extra_lp)
            except Exception:
                traceback.print_exc(file=sys.stderr)

        # --- whole-room S3DIS LP (long-context showcase: one matfree CG
        # over all ~32 blocks x 4096 points of a room; the reference's
        # per-block dense solver cannot reach this scale) ---
        try:
            emit("s3dis_room_lp_131072", time_room_lp(32, 4096), "ms/room",
                 n_points=131072, solver="cg_matfree",
                 note="one label propagation across a whole room")
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- S3DIS flagship (train_script:4-5: bs=14, N=4096) ---
        s3_step = None
        try:
            s3 = configs.s3dis_config()
            s3 = dataclasses.replace(
                s3,
                model=dataclasses.replace(s3.model, compute_dtype="bfloat16",
                                          knn_fast=True),
                train=dataclasses.replace(s3.train, batch_size=14,
                                          style="Full"),
            )
            s3_step = time_train_step(s3, steps=20)
            emit("s3dis_full_train_throughput",
                 14 * s3.model.num_points / s3_step, "points/sec/chip",
                 step_ms=round(s3_step * 1e3, 2), chip_batch=14,
                 n_points=s3.model.num_points)
            s3_sg = dataclasses.replace(
                s3, model=dataclasses.replace(s3.model, static_graph=True))
            s3_sg_step = time_train_step(s3_sg, steps=20)
            emit("s3dis_full_train_throughput_static_graph",
                 14 * s3.model.num_points / s3_sg_step, "points/sec/chip",
                 step_ms=round(s3_sg_step * 1e3, 2),
                 note="opt-in speed/accuracy trade (ModelConfig.static_graph)")
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- host batch assembly (VERDICT r3 #6: prove the host pipeline
        # cannot become the bottleneck — prefetch(depth=2) hides assembly
        # iff ms/batch < device ms/step) ---
        try:
            ha = time_host_assemble("shapenet", unique_bs, n)
            extra1 = {}
            if step_s is not None:  # gate like the S3DIS variant (ADVICE r4)
                extra1["pct_of_train_step"] = round(
                    100 * ha["ms"] / (step_s * 1e3), 1)
            emit("host_assemble_shapenet", ha["ms"], "ms/batch",
                 ms_numpy_fallback=round(ha["ms_numpy"], 2),
                 native_lib=ha["native_lib"], **extra1)
            ha3 = time_host_assemble("s3dis", 14, 4096)
            extra3 = {}
            if s3_step is not None:
                extra3["pct_of_train_step"] = round(
                    100 * ha3["ms"] / (s3_step * 1e3), 1)
            emit("host_assemble_s3dis", ha3["ms"], "ms/batch",
                 ms_numpy_fallback=round(ha3["ms_numpy"], 2),
                 native_lib=ha3["native_lib"], **extra3)
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- ShapeNet Plain style (seg loss only, no Siamese duplication) ---
        try:
            plain = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, style="Plain"))
            plain_step = time_train_step(plain, steps=20)
            emit("shapenet_plain_train_throughput",
                 unique_bs * n / plain_step, "points/sec/chip",
                 step_ms=round(plain_step * 1e3, 2))
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- static-graph turbo mode (opt-in, NOT reference parity: the
        # input-coordinate kNN graph is reused by every EdgeConv stage
        # instead of per-stage feature-space recomputation; synthetic
        # convergence sits at the lower edge of the dynamic-graph
        # run-to-run band — docs/kernels.md round 3) ---
        try:
            sg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, static_graph=True))
            sg_step = time_train_step(sg, steps=20)
            emit("shapenet_full_train_throughput_static_graph",
                 unique_bs * n / sg_step, "points/sec/chip",
                 step_ms=round(sg_step * 1e3, 2),
                 note="opt-in speed/accuracy trade (ModelConfig.static_graph)")
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- inference: eval forward at the ShapeNet test shape, and the
        # end-to-end test path (forward + matrix-free-CG label prop) ---
        try:
            from weaksuppointcloudseg_tpu.propagate.label_prop import (
                propagate_batch,
            )
            from weaksuppointcloudseg_tpu.train.state import (
                create_train_state,
            )
            from weaksuppointcloudseg_tpu.train.steps import make_eval_step

            inf_bs, inf_n = 32, 3000
            inf_cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, num_points=inf_n))
            istate = create_train_state(jax.random.PRNGKey(0), inf_cfg)
            ev = make_eval_step(inf_cfg)
            rng_np = np.random.default_rng(0)
            from weaksuppointcloudseg_tpu.utils.tools import onehot_encode
            seg = rng_np.integers(0, cfg.model.num_classes, (inf_bs, inf_n))
            # pc_normalize'd geometry (like time_lp): raw gaussian coords
            # make exp(-1e3 d) affinities ~0 and CG converges trivially,
            # understating the real LP cost
            xyz = rng_np.standard_normal((inf_bs, inf_n, 3)).astype(
                np.float32)
            xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True).max(
                1, keepdims=True)
            vb = jax.device_put({
                "data": xyz,
                "seg_onehot": onehot_encode(seg, cfg.model.num_classes),
                "mask": np.ones((inf_bs, inf_n), np.float32),
                "cat_onehot": onehot_encode(
                    rng_np.integers(0, cfg.model.num_categories, (inf_bs,)),
                    cfg.model.num_categories),
            })
            prob, _ = ev(istate, vb)
            float(jnp.sum(prob))  # compile+sync
            t0 = time.perf_counter()
            for _ in range(10):
                prob, _ = ev(istate, vb)
            float(jnp.sum(prob))
            fwd_s = (time.perf_counter() - t0) / 10
            emit("shapenet_eval_forward_throughput",
                 inf_bs * inf_n / fwd_s, "points/sec/chip",
                 step_ms=round(fwd_s * 1e3, 2), chip_batch=inf_bs,
                 n_points=inf_n)

            # factored-W CG: the default LP mode (configs.LabelPropConfig).
            # CG's iteration count is entropy-dependent: the tol-1e-5 early
            # exit fires at ~12 iterations for trained-confidence inputs
            # but the UNTRAINED model's near-uniform softmax zeroes the
            # entropy confidences (w~0 -> near-singular system -> full
            # 50-iteration cap: 52.9 vs 21.1 ms measured, docs/kernels.md
            # round 5). Real inference always runs LP on a trained
            # checkpoint, so mix fixed sharp logits into the forward output
            # (keeping the device-side data dependency ev -> LP intact) to
            # time the representative regime.
            sharp = jnp.asarray(rng_np.standard_normal(
                (inf_bs, inf_n, cfg.model.num_classes)) * 5.0, jnp.float32)
            @jax.jit
            def trained_like(p, sharp=sharp):
                return jax.nn.softmax(jnp.log(p + 1e-9) + sharp, axis=-1)
            prob_t = trained_like(prob)
            lp = propagate_batch(vb["data"], prob_t, solver="cg")
            float(jnp.sum(lp))
            t0 = time.perf_counter()
            for _ in range(10):
                prob, _ = ev(istate, vb)
                prob_t = trained_like(prob)
                lp = propagate_batch(vb["data"], prob_t, solver="cg")
            float(jnp.sum(lp))
            e2e_s = (time.perf_counter() - t0) / 10
            emit("shapenet_test_e2e_throughput",
                 inf_bs * inf_n / e2e_s, "points/sec/chip",
                 step_ms=round(e2e_s * 1e3, 2), solver="cg",
                 note="eval forward + label propagation (trained-entropy "
                      "LP input; near-uniform worst case adds ~31 ms)")
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- S3DIS inference (VERDICT r4 missing #2): eval forward at the
        # room-block shape (bs=14, N=4096 — the reference's test loop,
        # S3DIS_DGCNN_trainer.py:499-584) and the end-to-end test path
        # (block forward + per-block label propagation). N=4096 is
        # kernel-aligned, so the eval pad-once path is a structural no-op
        # (n_aligned == n) and the conv_zmax eval kernels engage directly.
        # Anchored the same way as ShapeNet: vs_xla_everywhere is the
        # same-chip ratio against the no-Pallas f32 eval forward. ---
        try:
            from weaksuppointcloudseg_tpu.propagate.label_prop import (
                propagate_batch,
            )
            from weaksuppointcloudseg_tpu.train.state import (
                create_train_state,
            )
            from weaksuppointcloudseg_tpu.train.steps import make_eval_step

            s3_bs, s3_n = 14, 4096
            s3i = configs.s3dis_config()
            s3i = dataclasses.replace(
                s3i,
                model=dataclasses.replace(s3i.model,
                                          compute_dtype="bfloat16",
                                          knn_fast=True),
                train=dataclasses.replace(s3i.train, batch_size=s3_bs,
                                          style="Full"),
            )
            s3i_state = create_train_state(jax.random.PRNGKey(0), s3i)
            s3i_ev = make_eval_step(s3i)
            rng_np = np.random.default_rng(0)
            from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

            # surface-sampled 1m blocks (floor/wall planes) so LP affinity
            # neighborhoods — and CG's data-dependent convergence — look
            # like real scans rather than uniform-volume noise
            n_surf = int(s3_n * 0.7)
            xy = rng_np.uniform(0, 1, (s3_bs, n_surf, 2)).astype(np.float32)
            which = rng_np.integers(0, 4, (s3_bs, n_surf))
            z = np.where(which == 0, 0.0,
                         np.where(which == 1, 3.0,
                                  rng_np.uniform(0, 3.0, (s3_bs, n_surf))))
            x0 = np.where(which == 2, np.round(xy[..., 0]), xy[..., 0])
            surf = np.stack([x0, xy[..., 1], z], -1)
            interior = rng_np.uniform(0, 1, (s3_bs, s3_n - n_surf, 3)) * \
                np.array([1.0, 1.0, 3.0])
            s3_xyz = np.concatenate([surf, interior], 1).astype(np.float32)
            s3_rgb = rng_np.uniform(0, 1, (s3_bs, s3_n, 3)).astype(np.float32)
            s3_feat = np.concatenate(
                [s3_xyz - s3_xyz.mean(1, keepdims=True), s3_rgb,
                 s3_xyz / np.array([1.0, 1.0, 3.0], np.float32)], -1)
            s3_seg = rng_np.integers(0, s3i.model.num_classes, (s3_bs, s3_n))
            s3_vb = jax.device_put({
                "data": s3_feat.astype(np.float32),
                "seg_onehot": onehot_encode(s3_seg, s3i.model.num_classes),
                "mask": np.ones((s3_bs, s3_n), np.float32),
            })
            prob, _ = s3i_ev(s3i_state, s3_vb)
            float(jnp.sum(prob))
            t0 = time.perf_counter()
            for _ in range(10):
                prob, _ = s3i_ev(s3i_state, s3_vb)
            float(jnp.sum(prob))
            s3_fwd_s = (time.perf_counter() - t0) / 10

            # same-chip anchor: no-Pallas f32 eval forward
            s3_xla = dataclasses.replace(
                s3i, model=dataclasses.replace(
                    s3i.model, compute_dtype="float32",
                    use_fused_knn=False, knn_fast=False))
            s3_xla_ev = make_eval_step(s3_xla)
            prob_x, _ = s3_xla_ev(s3i_state, s3_vb)
            float(jnp.sum(prob_x))
            t0 = time.perf_counter()
            for _ in range(4):
                prob_x, _ = s3_xla_ev(s3i_state, s3_vb)
            float(jnp.sum(prob_x))
            s3_fwd_xla_s = (time.perf_counter() - t0) / 4
            emit("s3dis_eval_forward_throughput",
                 s3_bs * s3_n / s3_fwd_s, "points/sec/chip",
                 step_ms=round(s3_fwd_s * 1e3, 2), chip_batch=s3_bs,
                 n_points=s3_n,
                 vs_xla_everywhere=round(s3_fwd_xla_s / s3_fwd_s, 2))

            # end-to-end: forward + per-block LP (trained-entropy input,
            # device data dependency preserved — see the ShapeNet note)
            sharp3 = jnp.asarray(rng_np.standard_normal(
                (s3_bs, s3_n, s3i.model.num_classes)) * 5.0, jnp.float32)
            @jax.jit
            def trained_like3(p, sharp=sharp3):
                return jax.nn.softmax(jnp.log(p + 1e-9) + sharp, axis=-1)
            d_xyz = jax.device_put(s3_xyz)
            d_rgb = jax.device_put(s3_rgb)
            prob_t = trained_like3(prob)
            lp3 = propagate_batch(d_xyz, prob_t, d_rgb, solver="cg")
            float(jnp.sum(lp3))
            t0 = time.perf_counter()
            for _ in range(10):
                prob, _ = s3i_ev(s3i_state, s3_vb)
                prob_t = trained_like3(prob)
                lp3 = propagate_batch(d_xyz, prob_t, d_rgb, solver="cg")
            float(jnp.sum(lp3))
            s3_e2e_s = (time.perf_counter() - t0) / 10
            emit("s3dis_test_e2e_throughput",
                 s3_bs * s3_n / s3_e2e_s, "points/sec/chip",
                 step_ms=round(s3_e2e_s * 1e3, 2), solver="cg",
                 note="block eval forward + per-block label propagation "
                      "(reference test semantics)")
        except Exception:
            traceback.print_exc(file=sys.stderr)

        # --- anchor-free denominator: same step, no Pallas, f32 ---
        try:
            xla_cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, compute_dtype="float32", use_fused_knn=False,
                    knn_fast=False))
            xla_step = time_train_step(xla_cfg, steps=8)
            emit("xla_everywhere_baseline", xla_step * 1e3, "ms/step",
                 points_per_sec=round(unique_bs * n / xla_step, 1))
            xla_ratio = xla_step / step_s
        except Exception:
            traceback.print_exc(file=sys.stderr)

    # Analytic-FLOPs MFU: useful model matmul FLOPs (EdgeConv/head convs,
    # distance matmuls, transform net; fwd + bwd) over chip peak. One-hot
    # gather/scatter matmul FLOPs are excluded (implementation detail).
    flops = analytic_step_flops(
        cfg.model, unique_bs, smooth_dist_c=(
            cfg.weaksup.smooth_channels[1] - cfg.weaksup.smooth_channels[0]
            if cfg.weaksup.smooth_channels else 3))
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16_FLOPS.get(gen, PEAK_BF16_FLOPS["v5e"])
    extra = {}
    if xla_ratio is not None:
        # measured same-chip speedup over the no-Pallas f32 step — the
        # anchor-free companion to vs_baseline's V100 estimate
        extra["vs_xla_everywhere"] = round(xla_ratio, 2)
    emit("shapenet_full_train_throughput", points_per_sec, "points/sec/chip",
         vs_baseline=points_per_sec / V100_REFERENCE_POINTS_PER_SEC,
         mfu=round(flops / step_s / peak, 4),
         step_ms=round(step_s * 1e3, 2),
         analytic_flops_per_step=round(flops / 1e9, 1),  # GFLOPs
         chip=gen, **extra)


if __name__ == "__main__":
    main()
