"""Tests for constants, config, filesystem discovery and converters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu import config, constants
from ssad_tpu.utils import convert, filesystem


class TestConstants:
    def test_taxonomy_disjoint_and_complete(self):
        assert set(constants.TEXTURES) & set(constants.OBJECTS) == set()
        assert len(constants.ALL_CATEGORIES) == 15
        assert set(constants.NON_FIXED_OBJECTS) <= set(constants.OBJECTS)

    def test_model_outputs_concat(self):
        a = constants.ModelOutputs(embeddings=jnp.ones((2, 4)), y_hat=jnp.zeros((2,)))
        b = constants.ModelOutputs(embeddings=jnp.zeros((3, 4)), y_hat=jnp.ones((3,)))
        c = constants.ModelOutputs.concat([a, b])
        assert c.embeddings.shape == (5, 4)
        assert c.y_hat.shape == (5,)
        assert c.anomaly_maps is None

    def test_model_outputs_is_pytree(self):
        a = constants.ModelOutputs(embeddings=jnp.ones((2, 4)))
        leaves = jax.tree_util.tree_leaves(a)
        assert len(leaves) == 1


class TestConfig:
    def test_roundtrip_json(self):
        cfg = config.TrainConfig(
            data=config.DataConfig(subject="carpet", batch_size=32),
            optim=config.OptimConfig(projection_epochs=1),
        )
        restored = config.TrainConfig.from_json(cfg.to_json())
        assert restored.data.subject == "carpet"
        assert restored.data.batch_size == 32
        assert restored.optim.projection_epochs == 1
        assert restored.aug.patch_aspect_ratio == ((0.3, 0.5), (1.0, 3.3))

    def test_eval_upsample_tracks_imsize(self):
        """upsample_size=None tracks imsize: the GT masks load at
        imsize, so the anomaly maps must land on the same grid (a fixed
        256 default crashed `cli evaluate --patch-level --imsize 64`)."""
        assert config.EvalConfig().upsample_size == 256
        assert config.EvalConfig(imsize=(64, 64)).upsample_size == 64
        assert config.EvalConfig(imsize=(64, 64), upsample_size=128).upsample_size == 128

    def test_reference_defaults(self):
        cfg = config.TrainConfig()
        # tools.py:213-214 two-phase schedule
        assert (cfg.optim.projection_epochs, cfg.optim.projection_lr) == (10, 0.03)
        assert (cfg.optim.fine_tune_epochs, cfg.optim.fine_tune_lr) == (30, 0.005)
        # datasets.py:36-42 CPP ratios
        assert cfg.aug.patch_area_ratio == (0.03, 0.07)
        assert cfg.aug.scar_area_ratio == (0.003, 0.007)


class TestFilesystem:
    def test_discovery(self, fake_mvtec):
        cats = filesystem.list_categories(fake_mvtec)
        assert cats == ["bottle", "carpet"]
        train = filesystem.train_good_images(fake_mvtec / "bottle")
        assert len(train) == 6
        assert train == sorted(train)
        test = filesystem.test_images(fake_mvtec / "bottle")
        assert len(test) == 4  # 2 good + 2 broken; 'broken' sorts first
        assert "broken" in test[0]

    def test_ground_truth_path(self, fake_mvtec):
        test = filesystem.test_images(fake_mvtec / "bottle")
        broken = [t for t in test if "broken" in t]
        good = [t for t in test if "good" in t]
        gt = filesystem.ground_truth_path(broken[0])
        assert gt is not None and gt.endswith("_mask.png")
        import os

        assert os.path.exists(gt)
        assert filesystem.ground_truth_path(good[0]) is None

    def test_duplicate_to_length(self):
        files = ["a", "b", "c"]
        out = filesystem.duplicate_to_length(files, 10)
        assert len(out) == 12  # whole-list concat, like the reference
        assert out[:3] == files and out[3:6] == files
        assert filesystem.duplicate_to_length([], 10) == []


class TestConvert:
    def test_gt2label(self):
        gts = jnp.stack([jnp.zeros((8, 8)), jnp.ones((8, 8))])
        np.testing.assert_array_equal(convert.gt2label(gts), [0, 1])
        np.testing.assert_array_equal(convert.gt2label(gts, -1, 4), [-1, 4])

    def test_multiclass2binary(self):
        np.testing.assert_array_equal(
            convert.multiclass2binary(jnp.array([0, 1, 2, 3, 0])), [0, 1, 1, 1, 0]
        )

    def test_heatmap2mask(self):
        hm = jnp.array([[0.1, 0.8], [0.7, 0.71]])
        np.testing.assert_array_equal(
            convert.heatmap2mask(hm), [[False, True], [False, True]]
        )

    def test_minmax(self):
        x = convert.minmax_normalize(jnp.array([2.0, 4.0, 6.0]))
        np.testing.assert_allclose(x, [0.0, 0.5, 1.0])


class TestNormalizeInInterval:
    def test_rescale(self):
        import numpy as np

        out = convert.normalize_in_interval(np.array([1.0, 2.0, 3.0]), 0, 10)
        np.testing.assert_array_equal(out, [0, 5, 10])

    def test_constant_input(self):
        import numpy as np

        out = convert.normalize_in_interval(np.array([4.0, 4.0]), 0, 10)
        assert np.isfinite(out).all()
