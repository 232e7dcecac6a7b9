"""Tests for auxiliary subsystems: profiling, error analysis, gradcam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu.constants import ModelOutputs
from ssad_tpu.evaluation.error_analysis import ErrorAnalyzer
from ssad_tpu.utils import profiling


class TestProfiling:
    def test_step_timer(self):
        t = profiling.StepTimer(items_per_step=8)
        for _ in range(5):
            t.start()
            x = jnp.ones((16, 16)) * 2
            t.stop(sync=x)
        s = t.summary()
        assert s["steps"] == 5
        assert s["mean_ms"] > 0
        assert s["items_per_sec"] > 0

    def test_trace_writes(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            jnp.ones((8, 8)).sum().block_until_ready()
        assert any(tmp_path.rglob("*"))

    def test_memory_stats_no_crash(self):
        stats = profiling.device_memory_stats()
        assert isinstance(stats, dict)


class TestErrorAnalyzer:
    def _outputs(self):
        logits = np.array(
            [[5.0, 0, 0, 0], [0, 5.0, 0, 0], [5.0, 0, 0, 0], [0, 0, 5.0, 0]],
            np.float32,
        )
        # true binary: [0, 0, 1, 1] → sample 1 (pred defect, true good)
        # and sample 2 (pred good, true defect) are wrong
        return ModelOutputs(
            raw_predictions=jnp.asarray(logits),
            y_true_binary=jnp.asarray([0, 0, 1, 1]),
            original_data=jnp.zeros((4, 16, 16, 3)),
        )

    def test_wrong_indices(self):
        ea = ErrorAnalyzer(self._outputs())
        np.testing.assert_array_equal(ea.wrong_indices, [1, 2])

    def test_analyze_renders(self, tmp_path):
        ea = ErrorAnalyzer(self._outputs())
        out = ea.analyze(num_images=2, output_path=str(tmp_path / "err.png"))
        assert out is not None and (tmp_path / "err.png").exists()

    def test_no_errors_returns_none(self, tmp_path):
        o = self._outputs()
        o.y_true_binary = jnp.asarray([0, 1, 0, 1])
        assert ErrorAnalyzer(o).analyze(output_path=str(tmp_path / "x.png")) is None


class TestGradCam:
    def test_maps_shape_and_range(self):
        from ssad_tpu.config import ModelConfig
        from ssad_tpu.models.gradcam import compute_gradcam, gradcam_or_zero
        from ssad_tpu.models.peranet import build_model, init_model

        model = build_model(ModelConfig(compute_dtype="float32"))
        params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
        x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
        maps = compute_gradcam(model, params, stats, x)
        assert maps.shape == (2, 64, 64)
        m = np.asarray(maps)
        assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6

        zeroed = gradcam_or_zero(model, params, stats, x, jnp.asarray([0, 1]))
        assert np.allclose(np.asarray(zeroed[0]), 0.0)
