"""One-command reproduction of the reference's headline benchmark table.

The framework's accuracy-parity claim (reference mIoU at 10% labels,
arXiv:2004.04091) cannot be *run* in an egress-free environment — this
script is the committed runbook that produces the BASELINE.md table the
moment the datasets exist on disk (docs/reproduce.md):

    python scripts/reproduce.py --dataset both --data-root ./Dataset

runs the EXACT reference configs (/root/reference/train_script:1-5):

    train_shapenet -m 0.1 -sty Full -bs 32 --Epoch 201
    train_s3dis    -m 0.1 -sty Full -bs 14 --Epoch 201 -ta 5

then the matching test CLIs with label propagation, checks the produced
Summary.txt format against the committed golden sample (docs/golden/), and
writes a BASELINE.md-style results table.

``--smoke`` swaps in generated synthetic datasets + tiny epochs so the whole
pipeline is CI-able end-to-end without real data (what tests and the round
evidence use).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "docs", "golden")


def _newest_result_dir(dataset: str) -> str:
    root = os.path.join(os.getcwd(), "Results", dataset)
    dirs = [os.path.join(root, d) for d in os.listdir(root)]
    return max(dirs, key=os.path.getmtime)


def _stamp(result_dir: str) -> str:
    # <Net>_sty-<Style>_m-<m>_<datetime> -> the trailing datetime stamp
    return "_".join(os.path.basename(result_dir).split("_")[-2:])


def _line_signature(line: str) -> str:
    """Replace every number with '#' — the format skeleton of a line."""
    sig = re.sub(r"-?\d+(?:\.\d+)?(?:e[+-]?\d+)?", "#", line.strip())
    return re.sub(r"#(?:,#)+", "#", sig)  # thousands separators


def check_summary_format(summary_path: str, golden_path: str) -> None:
    """Every golden line skeleton must appear in the produced Summary.txt
    (format parity with the reference-era Summary layout)."""
    got = {_line_signature(ln) for ln in open(summary_path) if ln.strip()}
    missing = []
    for ln in open(golden_path):
        if ln.strip() and not ln.startswith("#"):
            sig = _line_signature(ln)
            if sig not in got:
                missing.append(sig)
    if missing:
        raise SystemExit(
            f"Summary.txt format drifted from {golden_path}; missing line "
            f"skeletons:\n  " + "\n  ".join(missing))
    print(f"Summary format OK vs {os.path.basename(golden_path)}")


def _capture(fn, argv):
    buf = io.StringIO()

    class Tee(io.StringIO):
        def write(self, s):
            sys.__stdout__.write(s)
            return buf.write(s)

    with contextlib.redirect_stdout(Tee()):
        fn(argv)
    return buf.getvalue()


def _parse_metrics(pattern: str, out: str) -> "re.Match":
    """re.search that fails loudly: the test CLIs' printed metric line is
    this script's interface, and a silent None would crash with an opaque
    AttributeError AFTER the (up to 201-epoch) training run finished."""
    mm = re.search(pattern, out)
    if mm is None:
        raise RuntimeError(
            "could not parse the test CLI output (expected %r); output "
            "was:\n%s" % (pattern, out[-2000:]))
    return mm


def run_shapenet(args, m=None) -> dict:
    from weaksuppointcloudseg_tpu.cli import test_shapenet, train_shapenet

    data = os.path.join(args.data_root, "ShapeNet")
    if args.smoke:
        from weaksuppointcloudseg_tpu.data import shapenet
        if not os.path.isdir(os.path.join(data, "hdf5_data")):
            shapenet.write_synthetic(data, train_samples=8, val_samples=4,
                                     test_samples=3, num_points=64, seed=0)
    epochs = args.smoke_epochs if args.smoke else 201
    bs = 2 if args.smoke else 32
    if m is None:
        m = 0.5 if args.smoke else args.m
    train_shapenet.main([
        "-m", str(m), "-sty", "Full", "-bs", str(bs),
        "--Epoch", str(epochs), "--ExpRslt", "1", "--DataPath", data])
    rdir = _newest_result_dir("ShapeNet")
    check_summary_format(
        os.path.join(rdir, "Summary", "Summary.txt"),
        os.path.join(GOLDEN_DIR, "Summary_ShapeNet_golden.txt"))
    out = _capture(test_shapenet.main, [
        "-dt", _stamp(rdir), "-style", "Full", "--DataPath", data]
        + (["--num_points", "96"] if args.smoke else []))
    mm = _parse_metrics(r"perdata mIoU ([\d.]+)%\s+pershape mIoU "
                        r"([\d.]+)%\s+acc ([\d.]+)%", out)
    return {"dataset": "ShapeNet", "config": f"m={m} Full bs={bs} ep={epochs}",
            "perdata_miou": mm.group(1), "pershape_miou": mm.group(2),
            "acc": mm.group(3), "result_dir": rdir}


def run_s3dis(args, m=None) -> dict:
    from weaksuppointcloudseg_tpu.cli import test_s3dis, train_s3dis

    base = os.path.join(args.data_root, "S3DIS")
    data = os.path.join(base, "indoor3d_sem_seg_hdf5_data")
    if args.smoke:
        from weaksuppointcloudseg_tpu.data import s3dis
        if not os.path.isdir(data):
            s3dis.write_synthetic(data, num_points=64, seed=0)
    epochs = args.smoke_epochs if args.smoke else 201
    bs = 2 if args.smoke else 14
    if m is None:
        m = 0.5 if args.smoke else args.m
    train_s3dis.main([
        "-m", str(m), "-sty", "Full", "-bs", str(bs),
        "--Epoch", str(epochs), "-ta", "5", "--ExpRslt", "1",
        "--DataPath", data])
    rdir = _newest_result_dir("S3DIS")
    check_summary_format(
        os.path.join(rdir, "Summary", "Summary.txt"),
        os.path.join(GOLDEN_DIR, "Summary_S3DIS_golden.txt"))
    # synthetic datasets keep meta/ + rooms/ next to the h5 shards; real
    # S3DIS has them in the dataset base dir (prepare scripts' layout)
    rooms = data if args.smoke else base
    out = _capture(test_s3dis.main, [
        "-dt", _stamp(rdir), "-style", "Full", "-ta", "5",
        "--DataPath", data, "--RoomsPath", rooms])
    mm = _parse_metrics(r"mIoU ([\d.]+)%\s+acc ([\d.]+)%", out)
    return {"dataset": "S3DIS (Area 5)",
            "config": f"m={m} Full bs={bs} ep={epochs} ta=5",
            "miou": mm.group(1), "acc": mm.group(2), "result_dir": rdir}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", choices=["shapenet", "s3dis", "both"],
                   default="both")
    p.add_argument("--data-root", default="./Dataset")
    p.add_argument("--m", type=float, default=0.1,
                   help="label fraction (reference headline: 0.1)")
    p.add_argument("--m-grid", action="store_true",
                   help="run the paper's full label-budget grid instead of "
                        "a single --m: ShapeNet m in {0.01, 0.05, 0.1, 1.0} "
                        "(train_ShapeNet.py:32-33), S3DIS m in {0 (one "
                        "labelled point per class — the paper's 1pt "
                        "setting), 0.1} — one train+test run per cell")
    p.add_argument("--smoke", action="store_true",
                   help="synthetic data + tiny epochs (CI smoke)")
    p.add_argument("--smoke-epochs", type=int, default=3)
    p.add_argument("--out", default="reproduction_results.md")
    args = p.parse_args(argv)

    shapenet_grid = [0.01, 0.05, 0.1, 1.0] if args.m_grid else [None]
    s3dis_grid = [0.0, 0.1] if args.m_grid else [None]
    rows = []
    if args.dataset in ("shapenet", "both"):
        for m in shapenet_grid:
            rows.append(run_shapenet(args, m))
    if args.dataset in ("s3dis", "both"):
        for m in s3dis_grid:
            rows.append(run_s3dis(args, m))

    with open(args.out, "w") as f:
        f.write("# Reproduction results\n\n"
                "Fill-in for the BASELINE.md table — compare against "
                "arXiv:2004.04091 Tab. 2/3 (ShapeNet) and Tab. 4 (S3DIS).\n\n"
                "| dataset | config | metric | value |\n|---|---|---|---|\n")
        for r in rows:
            if "pershape_miou" in r:
                f.write(f"| {r['dataset']} | {r['config']} | per-shape mIoU "
                        f"| {r['pershape_miou']}% |\n")
                f.write(f"| {r['dataset']} | {r['config']} | per-data mIoU "
                        f"| {r['perdata_miou']}% |\n")
            else:
                f.write(f"| {r['dataset']} | {r['config']} | mIoU (13-cls) "
                        f"| {r['miou']}% |\n")
            f.write(f"| {r['dataset']} | {r['config']} | overall acc "
                    f"| {r['acc']}% |\n")
    print(f"wrote {args.out}")
    for r in rows:
        print(" ", r)


if __name__ == "__main__":
    main()
