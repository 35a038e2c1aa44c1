"""Sweep the selection kernel's (row_tile, tiles_per_step) at a flagship
shape and time the Full-style train step (VERDICT r3 #1: the round-3
operating point — row_tile=256, tiles_per_step=2 — was tuned at the
ShapeNet shape B=64/N=2048 only; S3DIS runs at N=4096/bs=14).

Each case runs in a SUBPROCESS (shape_sweep.py pattern) so a Mosaic
lowering fault fails only that case.

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/tile_sweep.py --dataset s3dis
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = [(rt, tps) for rt in (128, 256, 512) for tps in (1, 2, 4)]


def run_one(dataset: str, row_tile: int, tiles_per_step: int,
            steps: int, mode: str = "train") -> float:
    sys.path.insert(0, REPO)
    import bench
    from weaksuppointcloudseg_tpu.ops import edgeconv_pallas as ep

    orig = ep._knn_edge_impl

    @functools.wraps(orig)
    def patched(g, v, u, k, _rt, interpret, fast=False, **kw):
        kw["tiles_per_step"] = tiles_per_step
        return orig(g, v, u, k, row_tile, interpret, fast, **kw)

    ep._knn_edge_impl = patched

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if mode == "eval":
        # eval forward (make_eval_step) at the TEST shape — the round-4
        # eval attribution is 94.8% _knn_edge_impl, so the eval-shape
        # tile optimum can differ from the train-shape one
        from bench_attribution import run_and_trace_eval

        s = run_and_trace_eval(dataset, steps, None)
    else:
        from bench_attribution import _flagship_cfg

        cfg = _flagship_cfg(dataset, False)
        s = bench.time_train_step(cfg, steps=steps)
    print(f"RESULT rt={row_tile} tps={tiles_per_step} "
          f"ms={s * 1e3:.2f}", flush=True)
    return s * 1e3


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", choices=["shapenet", "s3dis"],
                   default="s3dis")
    p.add_argument("--mode", choices=["train", "eval"], default="train",
                   help="train: Full-style train step; eval: "
                        "make_eval_step at the test shape")
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--out", default="/tmp/tile_sweep.json")
    p.add_argument("--one", nargs=2, type=int,
                   metavar=("ROW_TILE", "TILES_PER_STEP"),
                   help="internal: run one case in-process")
    args = p.parse_args()

    if args.one:
        run_one(args.dataset, args.one[0], args.one[1], args.steps,
                args.mode)
        return

    results = {}
    for rt, tps in GRID:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--dataset", args.dataset, "--steps", str(args.steps),
               "--mode", args.mode,
               "--one", str(rt), str(tps)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=900, env=dict(os.environ))
        except subprocess.TimeoutExpired:
            print(f"FAIL rt={rt} tps={tps}: timeout", flush=True)
            results[f"{rt}/{tps}"] = None
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if r.returncode == 0 and line:
            ms = float(line[0].rsplit("=", 1)[1])
            results[f"{rt}/{tps}"] = ms
            print(line[0], flush=True)
        else:
            results[f"{rt}/{tps}"] = None
            print(f"FAIL rt={rt} tps={tps}: rc={r.returncode}\n"
                  f"{(r.stderr or '')[-400:]}", flush=True)

    print("\n== ms/step by row_tile/tiles_per_step ==")
    for key, ms in sorted(results.items(),
                          key=lambda kv: kv[1] if kv[1] else 1e9):
        print(f"  {key:<10} {ms if ms else 'FAIL'}")
    with open(args.out, "w") as f:
        json.dump({"dataset": args.dataset, "mode": args.mode,
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
