"""On-device fused pixel metrics vs the host oracles.

`metrics_device.pixel_metrics` computes ROC AUC, the optimal-F1
threshold, F1, IoU and the MVTec-official AUPRO in one jitted program;
every value here is checked against `evaluation/metrics.py`, which is
itself oracle-tested against sklearn/torchmetrics semantics."""

import numpy as np
import pytest

from ssad_tpu.evaluation import metrics as M
from ssad_tpu.evaluation import metrics_device as MD


def _blob_gts(rng, n, h, w, defect_frac=0.6):
    """Random multi-blob GT masks; some images entirely good."""
    gts = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        if rng.random() > defect_frac:
            continue
        for _ in range(rng.integers(1, 4)):
            cy, cx = rng.integers(4, h - 4), rng.integers(4, w - 4)
            r = int(rng.integers(2, 6))
            yy, xx = np.ogrid[:h, :w]
            gts[i][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    if not gts.any():  # ensure at least one region
        gts[0, 2:6, 2:6] = 1
    return gts


def _correlated_maps(rng, gts, noise=0.25):
    """Scores correlated with GT so the metrics are non-degenerate."""
    base = gts.astype(np.float32) * 0.8
    return base + rng.normal(0.3, noise, gts.shape).astype(np.float32)


def _host_reference(maps, gts, fpr_limit=0.3):
    labels = gts.ravel() > 0
    scores = np.nan_to_num(maps.ravel())
    fpr, tpr, _ = M.roc_curve(labels, scores)
    auroc = M.auc(fpr, tpr)
    thr = M.optimal_f1_threshold(labels, scores)
    f1 = M.f1_score(labels, scores, thr)
    iou = M.iou_score(gts.ravel(), scores, thr)
    fprs, pros = M.compute_pro(maps, gts)
    aupro = M.compute_aupro(fprs, pros, fpr_limit)
    return auroc, thr, f1, iou, aupro


class TestPixelMetricsDevice:
    @pytest.fixture(scope="class")
    def problem(self, rng):
        gts = _blob_gts(rng, n=6, h=64, w=64)
        maps = _correlated_maps(rng, gts)
        return maps, gts

    def test_matches_host_oracles(self, problem):
        maps, gts = problem
        auroc, thr, f1, iou, aupro = _host_reference(maps, gts)
        got = MD.pixel_metrics(maps, gts)
        assert got.auroc == pytest.approx(auroc, abs=2e-4)
        assert got.f1 == pytest.approx(f1, abs=2e-4)
        assert got.iou == pytest.approx(iou, abs=2e-4)
        assert got.aupro == pytest.approx(aupro, abs=3e-4)
        # the threshold must reproduce the selected F1 optimum under the
        # strict-> binarization (bit equality with the f64 host sweep is
        # not required — only the achieved F1 is)
        assert M.f1_score(gts.ravel() > 0, np.nan_to_num(maps.ravel()),
                          got.threshold) == pytest.approx(f1, abs=2e-4)

    def test_heavy_ties(self, rng):
        """Quantized scores: long equal-score runs exercise the
        run-end/backfill tie handling (the oracle keeps last-of-run
        points; intra-run points must contribute zero area)."""
        gts = _blob_gts(rng, n=4, h=48, w=48)
        maps = np.round(_correlated_maps(rng, gts) * 8) / 8  # ~16 levels
        auroc, thr, f1, iou, aupro = _host_reference(maps, gts)
        got = MD.pixel_metrics(maps, gts)
        assert got.auroc == pytest.approx(auroc, abs=2e-4)
        assert got.aupro == pytest.approx(aupro, abs=3e-4)
        assert got.f1 == pytest.approx(f1, abs=2e-4)
        assert got.iou == pytest.approx(iou, abs=2e-4)

    def test_without_pro(self, problem):
        maps, gts = problem
        got = MD.pixel_metrics(maps, gts, with_pro=False)
        assert got.aupro is None and got.pro is None
        auroc, *_ = _host_reference(maps, gts)
        assert got.auroc == pytest.approx(auroc, abs=2e-4)

    def test_reference_layout_b1hw(self, problem):
        maps, gts = problem
        got4 = MD.pixel_metrics(maps[:, None], gts)
        got3 = MD.pixel_metrics(maps, gts)
        assert got4.auroc == pytest.approx(got3.auroc, abs=1e-6)

    def test_curves_are_plottable_and_monotone(self, problem):
        maps, gts = problem
        got = MD.pixel_metrics(maps, gts)
        for x, y in (got.roc, got.pro):
            assert x[0] == 0.0 and x[-1] == 1.0
            assert np.all(np.diff(x) >= -1e-7)
            assert np.all(np.diff(y) >= -1e-7)
            assert np.all((y >= 0) & (y <= 1 + 1e-6))
        # downsampled ROC integrates close to the exact AUC
        assert np.trapezoid(got.roc[1], got.roc[0]) == pytest.approx(
            got.auroc, abs=5e-3
        )

    def test_requires_both_classes(self, rng):
        maps = rng.random((2, 8, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            MD.pixel_metrics(maps, np.zeros((2, 8, 8)))
        with pytest.raises(ValueError):
            MD.pixel_metrics(maps, np.ones((2, 8, 8)))

    def test_fpr_limit_boundary_interpolation(self, problem):
        """A non-default limit lands mid-segment: the device integral
        must interpolate the crossing point exactly like the oracle."""
        maps, gts = problem
        fprs, pros = M.compute_pro(maps, gts)
        for limit in (0.05, 0.17, 0.5):
            want = M.compute_aupro(fprs, pros, limit)
            got = MD.pixel_metrics(maps, gts, fpr_limit=limit)
            assert got.aupro == pytest.approx(want, abs=3e-4), limit


class TestProChanges:
    def test_matches_oracle_bookkeeping(self, rng):
        """pro_changes' vectorized bincount pass must equal the oracle's
        per-region loop (reference metrics.py:59-107)."""
        gts = _blob_gts(rng, n=3, h=32, w=32)
        pro, num_regions = MD.pro_changes(gts)
        want = np.zeros(gts.shape, np.float64)
        n_want = 0
        for i, gt in enumerate(gts):
            labeled, n = M._connected_components(gt > 0)
            n_want += n
            for k in range(1, n + 1):
                region = labeled == k
                want[i][region] = 1.0 / region.sum()
        assert num_regions == n_want
        np.testing.assert_allclose(pro, want, atol=1e-7)

    def test_no_regions(self):
        pro, n = MD.pro_changes(np.zeros((2, 8, 8)))
        assert n == 0 and not pro.any()
