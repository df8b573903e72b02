"""Metrics parity: run the reference's ConfusionMatrix next to ours.

Loads /root/reference/torch_points3d/metrics/confusion_matrix.py directly
(pure numpy/torch, no shims needed) and asserts streaming accumulation,
overall accuracy, mean class accuracy, per-class IoU + missing-class mask,
and mIoU (incl. the missing_as_one variant) agree on random prediction
streams with absent classes.
"""

import numpy as np
import pytest

from deepviewagg_tpu.metrics.confusion import ConfusionMatrix

from reference_shims import load_reference_module


@pytest.fixture(scope="module")
def refcm_mod():
    return load_reference_module(
        "torch_points3d/metrics/confusion_matrix.py", "ref_confusion"
    )


@pytest.mark.parametrize("seed,classes,absent", [(0, 6, ()), (1, 6, (2, 4)),
                                                 (2, 13, (0,))])
def test_confusion_matrix_parity(refcm_mod, seed, classes, absent):
    rng = np.random.default_rng(seed)
    ref = refcm_mod.ConfusionMatrix(classes)
    ours = ConfusionMatrix(classes)
    keep = np.setdiff1d(np.arange(classes), np.asarray(absent, int))
    for _ in range(5):                      # streaming, several batches
        n = int(rng.integers(50, 400))
        gt = rng.choice(keep, n)
        pred = rng.choice(keep, n)
        ref.count_predicted_batch(gt, pred)
        ours.add(pred, gt)

    np.testing.assert_array_equal(ours.m, ref.get_confusion_matrix())
    assert ours.overall_accuracy() == pytest.approx(
        ref.get_overall_accuracy(), abs=1e-12)
    assert ours.mean_class_accuracy() == pytest.approx(
        ref.get_mean_class_accuracy(), abs=1e-12)
    iou_ref, mask_ref = ref.get_intersection_union_per_class()
    iou_ours, mask_ours = ours.per_class_iou()
    np.testing.assert_array_equal(mask_ours, mask_ref)
    # the reference adds 1e-8 smoothing to each IoU (confusion_matrix.py:54)
    np.testing.assert_allclose(iou_ours[mask_ours], iou_ref[mask_ref],
                               atol=2e-8)
    assert ours.miou() == pytest.approx(
        ref.get_average_intersection_union(), abs=1e-6)


def test_miou_missing_as_one_parity(refcm_mod):
    """The missing_as_one variant (used by the reference's val trackers when
    a fold lacks classes) averages absent classes as IoU=1."""
    rng = np.random.default_rng(3)
    classes = 8
    ref = refcm_mod.ConfusionMatrix(classes)
    ours = ConfusionMatrix(classes)
    gt = rng.integers(0, 4, 300)            # classes 4..7 absent
    pred = rng.integers(0, 4, 300)
    ref.count_predicted_batch(gt, pred)
    ours.add(pred, gt)

    iou, present = ours.per_class_iou()
    n_miss = int((~present).sum())
    got = (iou[present].sum() + n_miss) / classes
    assert got == pytest.approx(
        ref.get_average_intersection_union(missing_as_one=True), abs=1e-6)


def test_empty_matrix_matches_reference_zero(refcm_mod):
    """All-zero matrix -> 0 metrics (the reference raises on an EMPTY
    update batch — np.max of empty at confusion_matrix.py:22 — so the
    zero case enters via create_from_matrix)."""
    ours = ConfusionMatrix(5)
    assert ours.miou() == 0.0 and ours.overall_accuracy() == 0.0
    ref = refcm_mod.ConfusionMatrix.create_from_matrix(
        np.zeros((5, 5), np.int64))
    assert ref.get_average_intersection_union() == 0
