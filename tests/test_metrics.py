"""Metrics validated against sklearn/torchmetrics-equivalent oracles
and against the reference AUPRO algorithm semantics."""

import numpy as np
import pytest

from ssad_tpu.evaluation import metrics as M


@pytest.fixture(scope="module")
def binary_problem(rng):
    scores = np.concatenate([rng.normal(0.3, 0.2, 300), rng.normal(0.7, 0.2, 200)])
    labels = np.concatenate([np.zeros(300), np.ones(200)])
    return labels, scores


class TestRoc:
    def test_auroc_matches_sklearn(self, binary_problem):
        from sklearn.metrics import roc_auc_score

        labels, scores = binary_problem
        assert M.auroc(labels, scores) == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-9
        )

    def test_curve_matches_sklearn_auc(self, binary_problem):
        from sklearn.metrics import auc as sk_auc, roc_curve as sk_roc

        labels, scores = binary_problem
        fpr, tpr, _ = M.roc_curve(labels, scores)
        sk_fpr, sk_tpr, _ = sk_roc(labels, scores)
        assert M.auc(fpr, tpr) == pytest.approx(sk_auc(sk_fpr, sk_tpr), abs=1e-9)

    def test_perfect_and_random(self):
        assert M.auroc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
        assert M.auroc([0, 1, 0, 1], [0.5, 0.5, 0.5, 0.5]) == pytest.approx(0.5)


class TestF1:
    def test_matches_sklearn(self, binary_problem):
        from sklearn.metrics import f1_score as sk_f1

        labels, scores = binary_problem
        thr = 0.5
        assert M.f1_score(labels, scores, thr) == pytest.approx(
            sk_f1(labels, scores > thr), abs=1e-9
        )

    def test_optimal_threshold_beats_fixed(self, binary_problem):
        labels, scores = binary_problem
        thr = M.optimal_f1_threshold(labels, scores)
        # the returned threshold composes with the strict `>` every
        # consumer applies — no epsilon nudging needed
        f_best = M.f1_score(labels, scores, thr)
        for t in (0.1, 0.3, 0.5, 0.9):
            assert f_best >= M.f1_score(labels, scores, t) - 1e-6

    def test_optimal_threshold_includes_boundary_sample(self):
        """Scores [0.9+, 0.8+, 0.1-]: the sweep's best F1 is 1.0 at
        t=0.8 counting `>= t`; with strict `>` binarization the
        returned threshold must still include the 0.8 sample."""
        labels = np.array([1, 1, 0])
        scores = np.array([0.9, 0.8, 0.1])
        thr = M.optimal_f1_threshold(labels, scores)
        assert M.f1_score(labels, scores, thr) == 1.0

    def test_optimal_threshold_boundary_with_float32_scores(self):
        """float32 scores (the real pipeline's dtype): under NumPy 2's
        weak scalar promotion `f32_array > python_float` casts the
        threshold to f32 — which rounds the nextafter-below-boundary
        value back ONTO the boundary score and drops the boundary
        sample.  f1_score/iou_score must compare in f64 so the sweep's
        selected optimum is actually achieved."""
        labels = np.array([1, 1, 0])
        scores = np.array([0.9, 0.8, 0.1], np.float32)
        thr = M.optimal_f1_threshold(labels, scores)
        assert M.f1_score(labels, scores, thr) == 1.0
        # iou at that threshold counts the boundary sample too
        assert M.iou_score(labels, scores, thr) == 1.0

    def test_pr_curve_matches_sklearn(self, binary_problem):
        from sklearn.metrics import precision_recall_curve as sk_pr

        labels, scores = binary_problem
        p, r, t = M.precision_recall_curve(labels, scores)
        sp, sr, st = sk_pr(labels, scores)
        np.testing.assert_allclose(t, st, atol=1e-12)
        np.testing.assert_allclose(p, sp, atol=1e-12)
        np.testing.assert_allclose(r, sr, atol=1e-12)


class TestIoU:
    def test_macro_two_class(self):
        labels = np.array([0, 0, 1, 1, 1, 0])
        scores = np.array([0.1, 0.9, 0.8, 0.7, 0.2, 0.3])
        # pred = [F,T,T,T,F,F]; class1: inter 2, union 4 → .5
        # class0: inter 2 (idx 0,5), union 4 → .5 → macro .5
        assert M.iou_score(labels, scores, 0.5) == pytest.approx(0.5)

    def test_perfect(self):
        labels = np.array([0, 1, 1, 0])
        scores = np.array([0.0, 1.0, 1.0, 0.0])
        assert M.iou_score(labels, scores, 0.5) == 1.0


class TestAupro:
    def test_perfect_detector(self):
        # scores == ground truth → PRO jumps to 1 at FPR 0
        gt = np.zeros((2, 16, 16))
        gt[0, 2:6, 2:6] = 1
        gt[1, 8:12, 8:12] = 1
        maps = gt + 0.0
        fprs, pros = M.compute_pro(maps, gt)
        assert M.compute_aupro(fprs, pros, 0.3) == pytest.approx(1.0, abs=1e-6)

    def test_random_scores_low(self, rng):
        gt = np.zeros((4, 32, 32))
        gt[:, 10:20, 10:20] = 1
        maps = rng.random((4, 32, 32))
        score = M.aupro(maps, gt, 0.3)
        assert 0.05 < score < 0.45  # near-chance

    def test_multi_region_weighting(self):
        # one tiny + one huge region; detector finds only the tiny one.
        gt = np.zeros((1, 32, 32))
        gt[0, 0:2, 0:2] = 1  # 4 px
        gt[0, 8:28, 8:28] = 1  # 400 px
        maps = np.zeros((1, 32, 32))
        maps[0, 0:2, 0:2] = 1.0
        fprs, pros = M.compute_pro(maps, gt)
        # at FPR 0 we already cover 100% of region A, 0% of B → PRO 0.5
        idx = np.searchsorted(fprs, 0.0, side="right") - 1  # last zero-FPR point
        assert pros[idx] == pytest.approx(0.5, abs=1e-6)

    def test_trapezoid_bounded_interpolates(self):
        x = np.array([0.0, 1.0])
        y = np.array([0.0, 1.0])
        # integral of y=x up to 0.3 = 0.045
        assert M.trapezoid_bounded(x, y, 0.3) == pytest.approx(0.045)
        assert M.compute_aupro(x, y, 0.3) == pytest.approx(0.15)

    def test_matches_reference_shape_invariants(self):
        gt = np.zeros((2, 8, 8))
        gt[0, 1:3, 1:3] = 1
        maps = np.random.default_rng(0).random((2, 8, 8))
        fprs, pros = M.compute_pro(maps, gt)
        assert fprs[0] == 0.0 and fprs[-1] == 1.0
        assert pros[0] == 0.0 and pros[-1] == 1.0
        assert np.all(np.diff(fprs) >= 0)


class TestExport:
    def test_dataframe_roundtrip(self, tmp_path):
        df = M.scores_dataframe({"auroc": [0.9, 0.8]}, index=["bottle", "cable"])
        for mode, name in (("csv", "t.csv"), ("markdown", "t.md"), ("latex", "t.tex")):
            out = M.export_dataframe(df, tmp_path, name, mode)
            assert (tmp_path / name).exists()
        content = (tmp_path / "t.md").read_text()
        assert "bottle" in content and "0.9" in content


class TestPrecisionRecallTies:
    def test_matches_sklearn_with_heavy_ties(self):
        from sklearn.metrics import precision_recall_curve as sk_prc

        from ssad_tpu.evaluation import metrics as M

        rng = np.random.default_rng(0)
        for trial in range(25):
            n = int(rng.integers(5, 200))
            y = rng.integers(0, 2, n)
            if y.sum() == 0:
                y[0] = 1
            s = np.round(rng.random(n), 1)  # quantized → heavy ties
            p, r, t = M.precision_recall_curve(y, s)
            sp, sr, st = sk_prc(y, s)
            np.testing.assert_allclose(np.sort(t), np.sort(st))
            np.testing.assert_allclose(p, sp, atol=1e-12)
            np.testing.assert_allclose(r, sr, atol=1e-12)
