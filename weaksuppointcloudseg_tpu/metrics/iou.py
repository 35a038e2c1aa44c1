"""Evaluation metrics.

- ``eval_iou``: ShapeNet per-shape IoU averaged over the shape's own part ids
  with the empty-union => IoU 1 rule (Util/Evaluation.py:13-36).
- ``batch_iou``: batched per-class IoU (Util/Tool.py:142-169), vectorized.
- ``ConfusionAccumulator``: S3DIS global TP/positives/GT accumulation for
  13-class mIoU (S3DIS/S3DIS_DGCNN_trainer.py:412-481, 552-564).
- ``category_biased_argmax``: the reference restricts each shape's argmax to
  its category's part ids by adding +1 to those probabilities
  (ShapeNet_DGCNN_trainer.py:199-201).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def eval_iou(pred: np.ndarray, seg_gt: np.ndarray, iou_oids: Sequence[int]) -> float:
    """Per-shape IoU averaged over the given part ids; empty union counts 1."""
    pred = np.asarray(pred)
    seg_gt = np.asarray(seg_gt)
    total_iou = 0.0
    for oid in iou_oids:
        n_pred = np.sum(pred == oid)
        n_gt = np.sum(seg_gt == oid)
        n_intersect = np.sum((seg_gt == oid) & (pred == seg_gt))
        n_union = n_pred + n_gt - n_intersect
        if n_union == 0:
            total_iou += 1.0
        else:
            total_iou += n_intersect / n_union
    return total_iou / len(iou_oids)


def batch_iou(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class IoU for a batch. pred/gt: [B, N] int. Returns [B, K].

    Matches Util/Tool.py:142-169 (adds 1e-6 to the union).
    """
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    B = gt.shape[0]
    iou = np.zeros((B, num_classes), dtype=np.float64)
    for k in range(num_classes):
        p = pred == k
        g = gt == k
        intersect = np.sum(p & g, axis=1)
        union = np.sum(p, axis=1) + np.sum(g, axis=1) - intersect
        iou[:, k] = intersect / (union + 1e-6)
    return iou


def category_biased_argmax(prob: np.ndarray, iou_oids: Sequence[int]) -> np.ndarray:
    """argmax over classes after boosting the shape's own part ids by +1."""
    biased = np.array(prob, copy=True)
    biased[..., list(iou_oids)] += 1.0
    return np.argmax(biased, axis=-1)


class ConfusionAccumulator:
    """Running per-class TP / positives / GT counts (S3DIS-style mIoU)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.true_positive = np.zeros(num_classes, dtype=np.float64)
        self.positive = np.zeros(num_classes, dtype=np.float64)
        self.gt = np.zeros(num_classes, dtype=np.float64)
        self.total_correct = 0.0
        self.total_seen = 0.0

    def update(self, pred: np.ndarray, gt: np.ndarray) -> None:
        pred = np.asarray(pred).reshape(-1)
        gt = np.asarray(gt).reshape(-1)
        self.total_correct += float(np.sum(pred == gt))
        self.total_seen += float(pred.size)
        self.positive += np.bincount(pred, minlength=self.num_classes)[: self.num_classes]
        self.gt += np.bincount(gt, minlength=self.num_classes)[: self.num_classes]
        correct = pred[pred == gt]
        self.true_positive += np.bincount(correct, minlength=self.num_classes)[: self.num_classes]

    @property
    def iou(self) -> np.ndarray:
        # 1e-5 denominator epsilon matches S3DIS_DGCNN_trainer.py:480-481.
        return self.true_positive / (self.gt + self.positive - self.true_positive + 1e-5)

    @property
    def miou(self) -> float:
        return float(np.mean(self.iou))

    @property
    def accuracy(self) -> float:
        return self.total_correct / max(self.total_seen, 1.0)
