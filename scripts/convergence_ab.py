"""Multi-seed convergence A/B for the accuracy-affecting config choices.

Puts statistical footing under two decisions that round 3 made from
n=2 seeds (VERDICT round 3, weak #3):

- fast (bf16 + fused kernels + packed-min selection) vs parity
  (f32, pure-XLA-compatible selection) — the regression tolerance in
  tests/test_tpu_kernels.py::test_fast_config_convergence_matches_parity
  _on_device is calibrated from the spread measured here;
- static-graph turbo (ModelConfig.static_graph) vs the default dynamic
  feature-space graphs — decides whether static_graph stays opt-in.

Each run executes in a SUBPROCESS (shape_sweep.py pattern) so a backend
fault fails only that run. Results go to stdout as a table and to
--out as JSON. Budget: 5 configs x 5 seeds at 24 epochs ~= 45-70 min on
a v5e chip.

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/convergence_ab.py --seeds 5 --out /tmp/ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (family, compute_dtype, knn_fast, static_graph)
CONFIGS = {
    "shapenet_fast": ("shapenet", "bfloat16", True, False),
    "shapenet_parity": ("shapenet", "float32", False, False),
    "shapenet_static": ("shapenet", "bfloat16", True, True),
    "s3dis_fast": ("s3dis", "bfloat16", True, False),
    "s3dis_static": ("s3dis", "bfloat16", True, True),
}


def run_one(name: str, seed: int, epochs: int,
            data_seed: int | None = 0, eval_tail: int = 1) -> float:
    family, dtype, fast, static = CONFIGS[name]
    sys.path.insert(0, REPO)
    from weaksuppointcloudseg_tpu.utils import synth_convergence as sc

    if family == "shapenet":
        # data_seed pinned (default 0, a verified-learnable draw): config
        # A/Bs vary only training stochasticity, so the paired differences
        # measure kernel effects, not dataset difficulty (the round-4
        # coupled-seed band was dominated by seeds 3-4 drawing sets where
        # every config half-converged; docs/kernels.md round 5). Pass
        # --data-seed -1 to reproduce the coupled legacy behavior.
        miou = sc.shapenet_train_and_eval_miou(
            dtype, fast, seed=seed, epochs=epochs, static_graph=static,
            data_seed=data_seed, eval_tail=eval_tail)
    else:
        # the S3DIS recipe always used a fixed synthetic set (seed=0 in
        # write_synthetic) — already decoupled, hence its 7x tighter band
        miou, _acc = sc.s3dis_train_and_eval_miou(
            dtype, fast, seed=seed, epochs=epochs, static_graph=static)
    print(f"RESULT {name} seed={seed} miou={miou:.4f}", flush=True)
    return miou


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--configs", nargs="*", default=list(CONFIGS),
                   choices=list(CONFIGS))
    p.add_argument("--out", default="/tmp/convergence_ab.json")
    p.add_argument("--data-seed", type=int, default=0,
                   help="ShapeNet dataset draw (-1: couple to the training "
                        "seed, the pre-round-5 behavior)")
    p.add_argument("--eval-tail", type=int, default=1,
                   help="average ShapeNet val mIoU over the final K "
                        "epochs (K>1 kills final-checkpoint plateau "
                        "jitter; requires a pinned --data-seed)")
    p.add_argument("--one", nargs=2, metavar=("CONFIG", "SEED"),
                   help="internal: run a single case in-process")
    args = p.parse_args()
    data_seed = None if args.data_seed < 0 else args.data_seed

    if args.one:
        run_one(args.one[0], int(args.one[1]), args.epochs, data_seed,
                args.eval_tail)
        return

    results: dict = {c: {} for c in args.configs}
    for name in args.configs:
        for seed in range(args.seeds):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--epochs", str(args.epochs),
                   "--data-seed", str(args.data_seed),
                   "--eval-tail", str(args.eval_tail),
                   "--one", name, str(seed)]
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=1800, env=dict(os.environ))
            except subprocess.TimeoutExpired:
                print(f"FAIL {name} seed={seed}: timeout", flush=True)
                results[name][seed] = None
                continue
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("RESULT")]
            if r.returncode == 0 and line:
                miou = float(line[0].rsplit("=", 1)[1])
                results[name][seed] = miou
                print(line[0], flush=True)
            else:
                results[name][seed] = None
                print(f"FAIL {name} seed={seed}: rc={r.returncode}\n"
                      f"{(r.stderr or '')[-600:]}", flush=True)

    print("\n== summary (val mIoU over seeds) ==")
    summary = {}
    for name, per_seed in results.items():
        vals = [v for v in per_seed.values() if v is not None]
        if not vals:
            print(f"  {name:<18} ALL FAILED")
            continue
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
        summary[name] = {"mean": mean, "sd": sd, "min": min(vals),
                         "max": max(vals), "n": len(vals),
                         "per_seed": per_seed}
        print(f"  {name:<18} mean {mean:.3f}  sd {sd:.3f}  "
              f"min {min(vals):.3f}  max {max(vals):.3f}  n={len(vals)}")
    with open(args.out, "w") as f:
        json.dump({"epochs": args.epochs, "summary": summary}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
