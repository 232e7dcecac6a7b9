"""Parity-harness tests: synthetic dataset generation + report shapes."""

import numpy as np
import pytest

from ssad_tpu import parity


class TestSyntheticDataset:
    def test_layout_and_loadability(self, tmp_path):
        root = parity.generate_parity_dataset(
            tmp_path / "ds", imsize=64, n_train=4, n_test_good=2, n_test_defect=2,
        )
        from ssad_tpu.data import mvtec

        for subject in parity.SYNTHETIC_SUBJECTS:
            assert (root / subject / "train" / "good").exists()
            assert (root / subject / "ground_truth" / "defect").exists()
            data = mvtec.prepare_pretext_data(root, subject, imsize=(64, 64))
            assert data.train_images.shape[1:] == (64, 64, 3)
            test = mvtec.prepare_mvtec_test_data(root, subject, imsize=(64, 64))
            assert test.images.shape[0] == 4
            # defective test images carry non-empty GT masks
            assert test.ground_truths.sum() > 0
            assert set(np.unique(test.labels)) == {0, 1}

    def test_non_fixed_subject_gets_per_image_masks(self, tmp_path):
        root = parity.generate_parity_dataset(
            tmp_path / "ds2", subjects=("hazelnut",), imsize=64, n_train=4,
            n_test_good=1, n_test_defect=1,
        )
        from ssad_tpu.data import mvtec

        data = mvtec.prepare_pretext_data(root, "hazelnut", imsize=(64, 64))
        assert data.train_masks is not None
        assert data.train_masks.shape[0] == data.train_images.shape[0]
        # masks found the off-center disc: nontrivial coverage
        cov = data.train_masks.mean(axis=(1, 2))
        assert (cov > 0.05).all() and (cov < 0.95).all()

    def test_determinism(self, tmp_path):
        a = parity.generate_parity_dataset(
            tmp_path / "a", subjects=("carpet",), imsize=32, n_train=2,
            n_test_good=1, n_test_defect=1, seed=3,
        )
        b = parity.generate_parity_dataset(
            tmp_path / "b", subjects=("carpet",), imsize=32, n_train=2,
            n_test_good=1, n_test_defect=1, seed=3,
        )
        from PIL import Image

        ia = np.asarray(Image.open(a / "carpet" / "train" / "good" / "000.png"))
        ib = np.asarray(Image.open(b / "carpet" / "train" / "good" / "000.png"))
        np.testing.assert_array_equal(ia, ib)


class TestSummaryMerge:
    """merge_summaries: per-subject merge within a mode (ADVICE r4)."""

    def test_subject_subset_rerun_keeps_siblings(self):
        prior = {
            "image": {
                "image_auroc": 0.90,
                "reference": {"image_auroc": 0.9401},
                "per_subject": {
                    "bottle": {"image_auroc": 0.95},
                    "carpet": {"image_auroc": 0.85},
                },
            }
        }
        fresh = {
            "image": {
                "image_auroc": 0.99,
                "reference": {"image_auroc": 0.9401},
                "per_subject": {"bottle": {"image_auroc": 0.99}},
            }
        }
        merged = parity.merge_summaries(prior, fresh)
        rows = merged["image"]["per_subject"]
        assert rows["bottle"]["image_auroc"] == 0.99  # fresh wins
        assert rows["carpet"]["image_auroc"] == 0.85  # sibling kept
        # mode mean recomputed over the MERGED rows, not the subset
        assert merged["image"]["image_auroc"] == pytest.approx((0.99 + 0.85) / 2)

    def test_other_mode_kept_verbatim(self):
        prior = {"patch": {"pixel_auroc": 0.92, "per_subject": {"x": {"pixel_auroc": 0.92}}}}
        fresh = {"image": {"image_auroc": 0.95, "per_subject": {"x": {"image_auroc": 0.95}}}}
        merged = parity.merge_summaries(prior, fresh)
        assert merged["patch"] == prior["patch"]
        assert merged["image"]["image_auroc"] == 0.95

    def test_fresh_not_mutated(self):
        prior = {"image": {"image_auroc": 0.9, "per_subject": {"a": {"image_auroc": 0.9}}}}
        fresh = {"image": {"image_auroc": 0.5, "per_subject": {"b": {"image_auroc": 0.5}}}}
        parity.merge_summaries(prior, fresh)
        assert set(fresh["image"]["per_subject"]) == {"b"}


class TestArtificialReport:
    def test_per_class_report(self):
        from ssad_tpu.constants import ModelOutputs
        from ssad_tpu.evaluation.evaluator import evaluate_artificial

        rng = np.random.default_rng(0)
        n = 64
        y = rng.integers(0, 4, n)
        logits = rng.normal(0, 1, (n, 4)).astype(np.float32)
        logits[np.arange(n), y] += 3.0  # mostly correct
        out = ModelOutputs(y_true_multiclass=y, raw_predictions=logits)
        scores = evaluate_artificial(out)
        assert scores.per_class is not None and len(scores.per_class) == 4
        for name, (p, r, f1, support) in scores.per_class.items():
            assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
        assert sum(v[3] for v in scores.per_class.values()) == n
        report = scores.classification_report()
        assert "precision" in report and "good" in report and "scar" in report
