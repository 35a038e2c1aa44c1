"""Metric tests, incl. the empty-union=1 rule (Util/Evaluation.py:27-29)."""

import numpy as np

from weaksuppointcloudseg_tpu.metrics import (
    eval_iou,
    batch_iou,
    ConfusionAccumulator,
    category_biased_argmax,
)


def test_eval_iou_perfect():
    pred = np.array([0, 0, 1, 1, 2])
    assert eval_iou(pred, pred, [0, 1, 2]) == 1.0


def test_eval_iou_empty_union_counts_one():
    pred = np.array([0, 0, 0, 0])
    gt = np.array([0, 0, 0, 0])
    # part id 1 absent from both -> IoU 1 by convention
    assert eval_iou(pred, gt, [0, 1]) == 1.0


def test_eval_iou_hand_case():
    pred = np.array([0, 0, 1, 1])
    gt = np.array([0, 1, 1, 1])
    # class 0: pred 2, gt 1, inter 1, union 2 -> 0.5
    # class 1: pred 2, gt 3, inter 2, union 3 -> 2/3
    want = (0.5 + 2 / 3) / 2
    np.testing.assert_allclose(eval_iou(pred, gt, [0, 1]), want)


def test_batch_iou_matches_loops(rng):
    B, N, K = 3, 50, 4
    pred = rng.integers(0, K, size=(B, N))
    gt = rng.integers(0, K, size=(B, N))
    got = batch_iou(pred, gt, K)
    for b in range(B):
        for k in range(K):
            inter = np.sum((pred[b] == k) & (gt[b] == k))
            union = np.sum(pred[b] == k) + np.sum(gt[b] == k) - inter
            np.testing.assert_allclose(got[b, k], inter / (union + 1e-6))


def test_confusion_accumulator(rng):
    acc = ConfusionAccumulator(3)
    pred = np.array([0, 1, 2, 2, 1])
    gt = np.array([0, 1, 1, 2, 0])
    acc.update(pred, gt)
    np.testing.assert_array_equal(acc.positive, [1, 2, 2])
    np.testing.assert_array_equal(acc.gt, [2, 2, 1])
    np.testing.assert_array_equal(acc.true_positive, [1, 1, 1])
    assert acc.accuracy == 3 / 5
    want_iou = np.array([1 / 2, 1 / 3, 1 / 2])
    np.testing.assert_allclose(acc.iou, want_iou, atol=1e-4)


def test_category_biased_argmax():
    prob = np.array([[0.6, 0.3, 0.1], [0.1, 0.2, 0.7]])
    # restrict to oids {1, 2}: +1 boost makes class outside the set lose
    pred = category_biased_argmax(prob, [1, 2])
    np.testing.assert_array_equal(pred, [1, 2])
    # original prob array untouched
    np.testing.assert_allclose(prob[0], [0.6, 0.3, 0.1])
