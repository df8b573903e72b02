"""Detection mAP: IoU golden values + matching behavior."""

import numpy as np
import pytest

from deepviewagg_tpu.metrics.detection import (
    average_precision, box_iou_3d, mean_average_precision,
)


def test_box_iou_golden():
    a = np.array([[0, 0, 0, 2, 2, 2]], np.float32)      # unit cube *2
    b = np.array([[0, 0, 0, 2, 2, 2], [1, 0, 0, 2, 2, 2],
                  [10, 0, 0, 2, 2, 2]], np.float32)
    iou = box_iou_3d(a, b)[0]
    assert abs(iou[0] - 1.0) < 1e-6
    # half-overlap along x: inter 1*2*2=4, union 16-4=12 -> 1/3
    assert abs(iou[1] - 1 / 3) < 1e-6
    assert iou[2] == 0.0


def test_average_precision_perfect_and_misses():
    gt = np.array([[0, 0, 0, 1, 1, 1], [5, 0, 0, 1, 1, 1]], np.float32)
    perfect = average_precision(gt, np.array([0.9, 0.8]), gt, 0.5)
    assert perfect > 0.99
    # one correct, one false positive with higher score
    preds = np.array([[20, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1]], np.float32)
    ap = average_precision(preds, np.array([0.9, 0.8]), gt, 0.5)
    assert 0.2 < ap < 0.6
    assert average_precision(np.zeros((0, 6)), np.zeros(0), gt) == 0.0


def test_mean_average_precision_pools_scenes():
    gt = [{"boxes": np.array([[0, 0, 0, 1, 1, 1]], np.float32),
           "classes": np.array([0])},
          {"boxes": np.array([[2, 0, 0, 1, 1, 1]], np.float32),
           "classes": np.array([1])}]
    preds = [{"boxes": gt[0]["boxes"], "scores": np.array([0.9]),
              "classes": np.array([0])},
             {"boxes": gt[1]["boxes"], "scores": np.array([0.8]),
              "classes": np.array([1])}]
    m = mean_average_precision(preds, gt, num_classes=2)
    assert m["mAP"] > 0.99 and m["AP_0"] > 0.99 and m["AP_1"] > 0.99


def test_duplicate_detection_is_fp():
    """Protocol check: a second, lower-score prediction overlapping an
    already-matched GT is a false positive, even if another untaken GT has
    some overlap (VoteNet/PASCAL matching by raw-IoU argmax)."""
    from deepviewagg_tpu.metrics.detection import average_precision

    gt = np.array([[0, 0, 0, 2, 2, 2],
                   [1.6, 0, 0, 2, 2, 2]], np.float32)
    preds = np.array([
        [0, 0, 0, 2, 2, 2],          # exact match of GT0 (score 0.9)
        [0.2, 0, 0, 2, 2, 2],        # duplicate of GT0 (raw argmax = GT0,
                                     # taken -> FP, despite overlapping GT1)
    ], np.float32)
    scores = np.array([0.9, 0.8])
    ap = average_precision(preds, scores, gt, iou_thresh=0.25)
    # one TP of two GTs, one FP: 11-point AP = (recall<=0.5)*max_prec(1.0)
    assert ap == pytest.approx(6 / 11, abs=1e-6)
