"""Random-label-budget baseline evaluation.

The reference ships ``RandomSamp/test_DGCNN.py`` as a random-sampling
baseline, but it is broken/stale — it imports ``ShapeNet_DGCNN_util`` and
``Evaluation.ShapeNetEval`` which do not exist in the tree (SURVEY.md §2.2).
This working equivalent evaluates the labelled-point *budget itself*: it
propagates the m-fraction ground-truth labels to every point by nearest
labelled neighbor (the "no network, nearest-label" baseline) and reports
ShapeNet-style mIoU, which lower-bounds what any trained model must beat.

    python -m weaksuppointcloudseg_tpu.cli.random_baseline -m 0.1 \
        --DataPath ./Dataset/ShapeNet
"""

from __future__ import annotations

import numpy as np

from weaksuppointcloudseg_tpu.cli import common
from weaksuppointcloudseg_tpu.data import sampling
from weaksuppointcloudseg_tpu.data import shapenet as shapenet_data
from weaksuppointcloudseg_tpu.metrics.iou import eval_iou


def nearest_label_propagate(points: np.ndarray, labelled_idx: np.ndarray,
                            seg: np.ndarray) -> np.ndarray:
    """Assign every point the label of its nearest labelled point."""
    anchors = points[labelled_idx]  # [M, 3]
    d = ((points[:, None, :] - anchors[None, :, :]) ** 2).sum(-1)  # [N, M]
    return seg[labelled_idx][np.argmin(d, axis=1)]


def main(argv=None) -> None:
    p = common.base_parser("ShapeNet", train=False)
    p.add_argument("--split", type=str, default="val")
    args = p.parse_args(argv)
    data_path = args.DataPath or "./Dataset/ShapeNet"

    ds = shapenet_data.ShapeNetDataset(data_path)
    data, label, seg = ds.split(args.split)
    n = data.shape[1]
    rng = np.random.default_rng(args.seed)
    m = max(args.m, 1.0 / n)
    idx = sampling.generate_sample_index(len(data), n, m, seed=args.seed)

    ious, accs = [], []
    for i in range(len(data)):
        pred = nearest_label_propagate(data[i], idx[i], seg[i])
        oids = ds.meta.iou_oids(int(label[i]))
        ious.append(eval_iou(pred, seg[i], oids))
        accs.append(float((pred == seg[i]).mean()))
    print(
        f"nearest-label baseline (m={args.m}, {args.split}): "
        f"mIoU {100 * np.mean(ious):.2f}%  acc {100 * np.mean(accs):.2f}%"
    )


if __name__ == "__main__":
    main()
