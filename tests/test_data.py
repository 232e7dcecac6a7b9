"""Tests for data/mvtec.py host-side loading and preparation."""

import numpy as np
import pytest

from ssad_tpu.data import mvtec


class TestPretextData:
    def test_prepare(self, fake_mvtec):
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        # 6 train images, 20% val → 2 val (ceil), 4 train
        assert data.train_images.shape == (4, 64, 64, 3)
        assert data.val_images.shape == (2, 64, 64, 3)
        assert data.cut_pool.shape[0] == 2  # bottle + carpet
        assert data.fixed_mask.shape == (64, 64)
        assert data.fixed_count > 0
        assert data.train_masks is None  # bottle is fixed-pose
        assert 0.0 <= data.train_images.min() and data.train_images.max() <= 1.0

    def test_texture_mask_all_ones(self, fake_mvtec):
        data = mvtec.prepare_pretext_data(fake_mvtec, "carpet", imsize=(64, 64))
        assert data.fixed_mask.all()
        assert data.fixed_count == 64 * 64

    def test_split_deterministic(self, fake_mvtec):
        a = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(32, 32), seed=3)
        b = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(32, 32), seed=3)
        np.testing.assert_array_equal(a.train_images, b.train_images)

    def test_missing_subject_raises(self, fake_mvtec):
        with pytest.raises(FileNotFoundError):
            mvtec.prepare_pretext_data(fake_mvtec, "zipper", imsize=(32, 32))


class TestMVTecTestData:
    def test_prepare(self, fake_mvtec):
        data = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        assert data.images.shape == (4, 64, 64, 3)
        assert data.ground_truths.shape == (4, 64, 64)
        # broken sorts before good → labels [1, 1, 0, 0]
        np.testing.assert_array_equal(data.labels, [1, 1, 0, 0])
        # GT masks align with the planted defect
        assert data.ground_truths[0][22, 30] == 1.0
        assert data.ground_truths[0][0, 0] == 0.0
        assert data.ground_truths[2].sum() == 0.0
