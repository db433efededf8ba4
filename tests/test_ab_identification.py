"""Identification-protocol A/B vs the reference's own numpy implementation.

Runs /root/reference's `calculate_identification_acc` (utils/modules.py:76-88)
and ours (utils/metrics.py) on SHARED synthetic score vectors for both pair
widths the shipped lists use (1 genuine + 199 / 299 imposters per subject:
data/face2text/scripts/test_list_identification.py:5-6), parsing the
reference's printed accuracy — it returns None — and asserting bit-identical
results. Also wires both sides' `is_roc` .npy ROC dumps through
tools/parity_check.load_dump to close the VERDICT-r2 "missing #3/#5" items.

Note on semantics (preserved, not fixed): the reference scores
`argmax(row) == subject_index` with y_true = arange(total_sub) even though
the prep script places the genuine pair at COLUMN 0 of every row; our port
reproduces the computation exactly (behavioral parity is the contract;
the quirk is catalogued in docs/DEVIATIONS.md).
"""

import contextlib
import io
import os
import re
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from text_guided_face_recognition_tpu.utils import metrics as M


def _ref_modules():
    ref_root = os.environ.get("TGFR_REF_ROOT", "/root/reference")
    if not os.path.isdir(ref_root):
        pytest.skip("reference repo not available")
    from ab_reference import import_reference
    return import_reference(2).modules


@pytest.mark.parametrize("imposters", [199, 299])
def test_identification_acc_matches_reference(tmp_path, imposters):
    ref_modules = _ref_modules()
    rng = np.random.default_rng(imposters)
    total_sub = 60
    pair_each = imposters + 1
    # realistic mix: some rows where the genuine (col 0) wins, some where the
    # reference's arange-truth coincidentally matches, some neither
    scores = rng.normal(0, 1, total_sub * pair_each)
    for i in range(0, total_sub, 3):
        scores[i * pair_each + (i % pair_each)] = 10.0  # argmax == i rows

    args_r = types.SimpleNamespace(checkpoints_path=str(tmp_path / "ref"),
                                   test_sub=total_sub)
    os.makedirs(args_r.checkpoints_path, exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_modules.calculate_identification_acc(list(scores), args_r)
    m = re.search(r"identification accuracy \(%\)\s+([0-9.]+)", buf.getvalue())
    assert m, buf.getvalue()
    ref_acc = float(m.group(1))

    ours_dir = str(tmp_path / "ours")
    args_o = types.SimpleNamespace(checkpoints_path=ours_dir,
                                   test_sub=total_sub)
    our_acc = M.calculate_identification_acc(list(scores), args_o)
    assert our_acc == pytest.approx(ref_acc, abs=1e-9)

    # both sides dumped the identical score vector ('ident_file')
    a = np.load(os.path.join(args_r.checkpoints_path, "ident_file"))
    b = np.load(os.path.join(ours_dir, "ident_file"))
    np.testing.assert_array_equal(a.astype(np.float64), b.astype(np.float64))


def test_roc_npy_dumps_flow_through_parity_check(tmp_path, monkeypatch):
    """calculate_scores(is_roc=True) on both sides -> tools/parity_check
    loads both dumps and the metric deltas are zero on identical scores."""
    ref_modules = _ref_modules()
    from parity_check import load_dump

    rng = np.random.default_rng(0)
    n = 400
    y_true = (rng.random(n) < 0.5).astype(int)
    y_score = rng.normal(0, 1, n) + y_true * 1.5

    monkeypatch.chdir(tmp_path)  # the reference writes './<roc_file>.npy'
    args_r = types.SimpleNamespace(is_roc=True, roc_file="ref_roc")
    with contextlib.redirect_stdout(io.StringIO()):
        ref_modules.calculate_scores(list(y_score), list(y_true), args_r)

    args_o = types.SimpleNamespace(is_roc=True, roc_file="our_roc",
                                   is_ident=False)
    with contextlib.redirect_stdout(io.StringIO()):
        M.calculate_scores(list(y_score), list(y_true), args_o)

    yt_a, ys_a = load_dump(str(tmp_path / "ref_roc.npy"))
    yt_b, ys_b = load_dump(str(tmp_path / "our_roc.npy"))
    np.testing.assert_array_equal(yt_a, yt_b)
    np.testing.assert_allclose(ys_a, ys_b, atol=0)

    from text_guided_face_recognition_tpu.utils.metrics import roc_metrics
    ma = roc_metrics(ys_a, yt_a)
    mb = roc_metrics(ys_b, yt_b)
    for k in ma:
        assert ma[k] == pytest.approx(mb[k], abs=1e-12), k
