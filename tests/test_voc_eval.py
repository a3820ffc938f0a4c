"""mAP harness tests with analytically-known AP values (SURVEY.md E3)."""

import numpy as np

from dnn_inference_engine_tpu.eval.voc import voc_eval, voc_map


def _det(boxes, scores, classes):
    return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "scores": np.asarray(scores, np.float32),
            "classes": np.asarray(classes, np.int32)}


def _gt(boxes, classes):
    return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32)}


def test_perfect_detection_ap1():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    det = [_det([[10, 10, 50, 50]], [0.9], [0])]
    assert voc_eval(det, gt, cls=0) == 1.0


def test_miss_gives_zero():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    det = [_det([[200, 200, 240, 240]], [0.9], [0])]  # IoU 0
    assert voc_eval(det, gt, cls=0) == 0.0


def test_half_recall():
    gt = [_gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 0])]
    det = [_det([[10, 10, 50, 50]], [0.9], [0])]
    # recall 0.5 at precision 1 -> continuous AP = 0.5
    assert abs(voc_eval(det, gt, cls=0) - 0.5) < 1e-9


def test_duplicate_detection_is_fp():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    det = [_det([[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.8], [0, 0])]
    # first matches (tp), second is a duplicate (fp): AP stays 1.0
    # (precision drop happens after full recall)
    assert voc_eval(det, gt, cls=0) == 1.0


def test_ranking_matters():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    # high-scored fp before the tp: precision at recall 1 is 0.5
    det = [_det([[200, 200, 240, 240], [10, 10, 50, 50]], [0.9, 0.8], [0, 0])]
    assert abs(voc_eval(det, gt, cls=0) - 0.5) < 1e-9


def test_map_averages_present_classes():
    gt = [_gt([[10, 10, 50, 50], [100, 100, 140, 140]], [0, 1])]
    det = [_det([[10, 10, 50, 50]], [0.9], [0])]  # class 0 perfect, class 1 miss
    m, aps = voc_map(det, gt, num_classes=3)
    assert aps[0] == 1.0 and aps[1] == 0.0
    assert abs(m - 0.5) < 1e-9  # class 2 absent from GT: excluded


def test_07_metric():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    det = [_det([[10, 10, 50, 50]], [0.9], [0])]
    assert abs(voc_eval(det, gt, cls=0, use_07_metric=True) - 1.0) < 1e-9
