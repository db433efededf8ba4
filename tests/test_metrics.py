import numpy as np
import pytest

from text_guided_face_recognition_tpu.utils import metrics as M


def test_roc_curve_matches_sklearn(rng):
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    y_true = rng.integers(0, 2, size=500)
    y_score = rng.normal(size=500) + y_true * 1.5
    fpr_ref, tpr_ref, _ = sklearn_metrics.roc_curve(y_true, y_score, drop_intermediate=False)
    fpr, tpr, _ = M.roc_curve(y_true, y_score)
    np.testing.assert_allclose(fpr, fpr_ref, atol=1e-12)
    np.testing.assert_allclose(tpr, tpr_ref, atol=1e-12)
    assert M.auc(fpr, tpr) == pytest.approx(sklearn_metrics.auc(fpr_ref, tpr_ref))


def test_roc_metrics_perfect_separation():
    y_true = [0] * 50 + [1] * 50
    y_score = [0.1] * 50 + [0.9] * 50
    m = M.roc_metrics(y_score, y_true)
    assert m["auc"] == pytest.approx(1.0)
    assert m["eer"] == pytest.approx(0.0)
    assert m["tpr@fpr=1e-3"] == pytest.approx(100.0)
    assert m["score"] == pytest.approx(300.0)


def test_cal_accuracy_matches_reference_scan(rng):
    # brute-force port of utils/modules.py:18-32 as oracle
    y_score = rng.normal(size=200)
    y_true = rng.integers(0, 2, size=200)

    best_acc = 0.0
    for th in y_score:
        acc = np.mean(((y_score >= th) == y_true).astype(int))
        best_acc = max(best_acc, acc)

    acc, th = M.cal_accuracy(y_score, y_true)
    assert acc == pytest.approx(best_acc)


def test_identification_acc_layout():
    # 4 subjects x 5 pairs; genuine (max) score at column == subject index,
    # matching the reference protocol (utils/modules.py:84-88)
    n_sub, per = 4, 5
    scores = np.full((n_sub, per), 0.1)
    for i in range(n_sub):
        scores[i, i] = 0.9
    acc = M.calculate_identification_acc(scores.ravel().tolist(), test_sub=n_sub)
    assert acc == pytest.approx(100.0)

    scores[2, 2] = 0.0  # break one subject
    acc = M.calculate_identification_acc(scores.ravel().tolist(), test_sub=n_sub)
    assert acc == pytest.approx(75.0)
