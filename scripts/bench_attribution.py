"""Per-kernel device-time attribution for the flagship training step.

This is the committed form of the /tmp step-timing harness behind every
number in docs/kernels.md ("Device attribution at ~110 ms ..."): it runs
the jitted Full-style ShapeNet train step under ``jax.profiler``, parses
the device trace, and prints ms/step per kernel bucket. Methodology
(CLAUDE.md "Environment gotchas"):

- keys are pre-split so the timed loop is pure dispatch;
- the only reliable execution barrier on the axon tunnel is a scalar D2H
  fetch (``float(metrics["total"])``) — ``block_until_ready`` returns
  early;
- device kernel timings live in the trace's "XLA Ops" track (pid 3 /
  tid 3 on axon; auto-detected here as the pid/tid pair holding the
  Pallas/fusion op events).

Usage (on the TPU chip):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attribution.py
    ... --dataset s3dis          # S3DIS flagship instead
    ... --steps 10 --keep-trace  # keep the raw trace dir for xprof

Also parses traces captured by the train CLIs' ``--profile DIR`` flag:

    python scripts/bench_attribution.py --parse-only DIR --steps <steps/epoch>
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Kernel buckets, most-specific first (first match wins). Names are XLA op
# names from the device trace; Pallas kernels carry their kernel-function
# name inside the custom-call.
BUCKETS = (
    ("knn_edge", re.compile(r"knn_edge|knn_gather|knn_pallas|knn_kernel")),
    ("smooth", re.compile(r"weighted|wgather|smooth")),
    ("scatter_bn", re.compile(r"scatter")),
    ("minmax_fwd", re.compile(r"conv_minmax|minmax")),
    ("cbk_bwd", re.compile(r"cbk|conv_kmax_bwd|kmax_bwd")),
    ("zmax", re.compile(r"conv_zmax|zmax")),  # eval-only folded-BN k-max
    ("nmax", re.compile(r"nmax")),
    ("copy", re.compile(r"^copy|copy\.\d|copy-start|copy-done")),
    ("conv_fusion", re.compile(r"convolution|conv_general|dot")),
    ("fusion_other", re.compile(r"fusion|reduce|transpose|select|broadcast")),
)


def _trace_events(trace_dir: str):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def attribute(trace_dir: str, steps: int, *, top: int = 25):
    """Parse a device trace -> (bucket ms/step dict, top-op list)."""
    events = _trace_events(trace_dir)
    # find the device "XLA Ops" track from the metadata events: the pid
    # whose process_name is a /device:* entry and the tid named "XLA Ops"
    # (pid 3 / tid 3 on axon). Fall back to the busiest track if the
    # metadata is absent.
    device_pids, ops_tids = set(), set()
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name" and name.startswith("/device:"):
            device_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name" and name == "XLA Ops":
            ops_tids.add((e.get("pid"), e.get("tid")))
    device_track = next(
        (t for t in sorted(ops_tids, key=str) if t[0] in device_pids), None)
    if device_track is None:
        track_dur = collections.Counter()
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                track_dur[(e.get("pid"), e.get("tid"))] += e["dur"]
        if not track_dur:
            raise SystemExit("trace has no complete events")
        device_track, _ = track_dur.most_common(1)[0]

    per_op = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and (e.get("pid"), e.get("tid")) == device_track):
            per_op[e.get("name", "?")] += e["dur"]

    buckets = collections.Counter()
    for name, dur in per_op.items():
        for bucket, pat in BUCKETS:
            if pat.search(name):
                buckets[bucket] += dur
                break
        else:
            buckets["other"] += dur
    ms = 1e-3 / steps  # trace durations are in microseconds
    bucket_ms = {k: v * ms for k, v in buckets.most_common()}
    top_ops = [(n, d * ms) for n, d in per_op.most_common(top)]
    return bucket_ms, top_ops, device_track


def _flagship_cfg(dataset: str, static_graph: bool):
    import bench  # repo-root helpers (config + synthetic batch)
    from weaksuppointcloudseg_tpu import configs

    if dataset == "s3dis":
        cfg = configs.s3dis_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                      knn_fast=True),
            train=dataclasses.replace(cfg.train, batch_size=14, style="Full"),
        )
    else:
        cfg = bench.flagship_config()
    if static_graph:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, static_graph=True))
    return cfg


def run_and_trace(dataset: str, steps: int, trace_dir: str,
                  static_graph: bool = False) -> float:
    """Run the flagship train step under the profiler; returns wall s/step."""
    import jax
    import numpy as np

    import bench  # repo-root helpers (config + synthetic batch)
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_train_step

    cfg = _flagship_cfg(dataset, static_graph)
    batch = bench.make_train_batch(cfg.model, cfg.train.batch_size)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    train_step = make_train_step(cfg)
    gate = np.float32(1.0)
    keys = jax.random.split(
        jax.random.key(1, impl=cfg.train.rng_impl), steps + 1)

    state, metrics = train_step(state, batch, gate, keys[0])  # compile
    float(metrics["total"])  # sync (scalar fetch — see module docstring)

    if trace_dir is not None:  # None: timing-only (tile_sweep.py)
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, gate, keys[i + 1])
    float(metrics["total"])
    dt = time.perf_counter() - t0
    if trace_dir is not None:
        jax.profiler.stop_trace()
    return dt / steps


def run_and_trace_eval(dataset: str, steps: int, trace_dir: str,
                       static_graph: bool = False) -> float:
    """Profile the eval forward (make_eval_step) at the TEST shape:
    ShapeNet bs=32 / N=3000 (the resampled test view size,
    ShapeNet_DGCNN_trainer.py:511-596), S3DIS bs=14 / N=4096."""
    import jax
    import numpy as np

    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_eval_step
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = _flagship_cfg(dataset, static_graph)
    if dataset == "shapenet":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, num_points=3000),
            train=dataclasses.replace(cfg.train, batch_size=32))
    bs, n = cfg.train.batch_size, cfg.model.num_points
    rng = np.random.default_rng(0)
    seg = rng.integers(0, cfg.model.num_classes, (bs, n))
    xyz = rng.standard_normal((bs, n, cfg.model.in_channels)).astype(
        np.float32)
    batch = {
        "data": xyz,
        "seg_onehot": onehot_encode(seg, cfg.model.num_classes),
        "mask": np.ones((bs, n), np.float32),
    }
    if cfg.model.num_categories > 0:
        batch["cat_onehot"] = onehot_encode(
            rng.integers(0, cfg.model.num_categories, (bs,)),
            cfg.model.num_categories)
    batch = jax.device_put(batch)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg)

    prob, _ = ev(state, batch)  # compile
    float(jax.numpy.sum(prob))

    if trace_dir is not None:  # None: timing-only (tile_sweep.py)
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        prob, _ = ev(state, batch)
    float(jax.numpy.sum(prob))
    dt = time.perf_counter() - t0
    if trace_dir is not None:
        jax.profiler.stop_trace()
    return dt / steps


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", choices=["shapenet", "s3dis"],
                   default="shapenet")
    p.add_argument("--mode", choices=["train", "eval"], default="train",
                   help="train: flagship train step; eval: make_eval_step "
                        "at the test shape (ShapeNet bs=32/N=3000)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=25,
                   help="how many individual ops to list")
    p.add_argument("--keep-trace", action="store_true")
    p.add_argument("--static-graph", action="store_true",
                   help="attribute the opt-in static-graph turbo config")
    p.add_argument("--parse-only", metavar="DIR", default=None,
                   help="skip running; parse an existing trace dir "
                        "(e.g. from a train CLI's --profile). --steps must "
                        "be the number of steps the trace covers")
    args = p.parse_args()

    if args.parse_only:
        trace_dir, wall = args.parse_only, None
    else:
        trace_dir = tempfile.mkdtemp(prefix="wspc_attr_")
        runner = run_and_trace_eval if args.mode == "eval" else run_and_trace
        wall = runner(args.dataset, args.steps, trace_dir,
                      static_graph=args.static_graph)
        print(f"wall: {wall * 1e3:.1f} ms/step over {args.steps} steps")

    bucket_ms, top_ops, track = attribute(trace_dir, args.steps, top=args.top)
    total = sum(bucket_ms.values())
    print(f"device track pid/tid: {track}; device total: {total:.1f} ms/step")
    print("\n== bucket attribution (ms/step) ==")
    for k, v in bucket_ms.items():
        print(f"  {k:<16} {v:8.2f}  ({100 * v / total:4.1f}%)")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, d in top_ops:
        print(f"  {d:8.3f}  {name[:100]}")

    if not args.parse_only and not args.keep_trace:
        shutil.rmtree(trace_dir, ignore_errors=True)
    elif not args.parse_only:
        print(f"\ntrace kept at {trace_dir}")


if __name__ == "__main__":
    main()
