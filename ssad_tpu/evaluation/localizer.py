"""Qualitative localization driver: per-image anomaly-map panels.

Re-design of reference src/localizer.py (:55-208): for sampled test
images produce original / anomaly-map / heatmap / GT / predicted-mask /
segmentation panels.

* image-level: Grad-CAM of the predicted class, zero map when the model
  predicts 'good' (localizer.py:133-140);
* patch-level: sliding-window k-NN scores → blur(k=3) → bilinear
  upsample → clamp [0,1] (localizer.py:141-159), detector fitted on a
  few train images' patch embeddings (localizer.py:55-90);
* `localize_single_image` is the one-shot API (localizer.py:189-208).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ssad_tpu.config import EvalConfig
from ssad_tpu.data import mvtec
from ssad_tpu.evaluation import inference as inf
from ssad_tpu.models.detector import AnomalyDetector
from ssad_tpu.ops import image as im
from ssad_tpu.utils import convert


@dataclasses.dataclass
class Localizer:
    engine: inf.InferenceEngine
    cfg: EvalConfig
    detector: Optional[AnomalyDetector] = None
    _gradcam: Optional[object] = None  # lazily-built jitted Grad-CAM fn

    def setup(self, data: mvtec.PretextData, n_train_images: int = 3, seed: int = 0):
        """Fit the patch-mode detector on a few train images' patch
        embeddings (localizer.py:55-90)."""
        if self.cfg.patch_localization:
            normality = inf.normality_embeddings(
                self.engine, None, data, batch_size=2,
                patch_localization=True,
                patch_dim=self.cfg.patch_dim, stride=self.cfg.stride,
                min_bank_rows=10**9, max_images=n_train_images, seed=seed,
            )
            self.detector = AnomalyDetector(k=self.cfg.knn_k).fit(
                normality, jax.random.key(seed)
            )
        return self

    def anomaly_map(self, image_raw: np.ndarray) -> np.ndarray:
        """(H, W) anomaly map in [0, 1] for one un-normalized image."""
        h, w = image_raw.shape[:2]
        x = im.normalize_imagenet(jnp.asarray(image_raw))[None]
        if self.cfg.patch_localization:
            assert self.detector is not None, "call setup() first"
            smap = self.engine.score_patch_maps(
                x, self.detector.bank, dim=self.cfg.patch_dim,
                stride=self.cfg.stride, k=self.cfg.knn_k,
            )
            smap = im.gaussian_blur(smap[..., None], ksize=3)[..., 0]  # localizer.py:151
            smap = jax.vmap(lambda m: im.resize_bilinear(m, (h, w)))(smap)
            return np.clip(np.asarray(smap[0]), 0.0, 1.0)
        logits, _ = self.engine.predict_batch(x)
        y_hat = convert.prediction_class(logits)
        if self._gradcam is None:
            from ssad_tpu.models.gradcam import make_gradcam_fn

            self._gradcam = make_gradcam_fn(
                self.engine.model, self.engine.params, self.engine.batch_stats
            )
        maps = self._gradcam(x, y_hat)
        return np.asarray(maps[0])

    def localize(
        self,
        test_data: mvtec.MVTecTestData,
        outputs_dir: str,
        num_images: int = 5,
        seed: int = 0,
        threshold: Optional[float] = None,
    ) -> Sequence[str]:
        """Render panels for sampled test images (localizer.py:125-186).

        threshold: predicted-mask cutoff; defaults to the detector's
        calibrated threshold (patch mode) or 0.7 (image mode,
        converters.py:33 heatmap2mask default).
        """
        from ssad_tpu.evaluation import visualization as vis

        rng = np.random.default_rng(seed)
        n = test_data.images.shape[0]
        picks = rng.choice(n, size=min(num_images, n), replace=False)
        if threshold is None:
            threshold = (
                self.detector.threshold
                if (self.cfg.patch_localization and self.detector is not None)
                else 0.7
            )
        paths = []
        for i in picks:
            image = test_data.images[i]
            amap = self.anomaly_map(image)
            pred_mask = amap > threshold
            gt = test_data.ground_truths[i]
            name = Path(test_data.filenames[i]).stem
            defect = Path(test_data.filenames[i]).parent.name
            paths.append(
                vis.localization_panel(
                    image, amap, gt, pred_mask, outputs_dir,
                    f"{test_data.subject}_{defect}_{name}_panel.png",
                )
            )
        return paths

    def localize_single_image(self, image_raw: np.ndarray, threshold: Optional[float] = None):
        """(anomaly_map, predicted_mask) for one image
        (localizer.py:189-208)."""
        amap = self.anomaly_map(np.asarray(image_raw))
        if threshold is None:
            threshold = (
                self.detector.threshold
                if (self.cfg.patch_localization and self.detector is not None)
                else 0.7
            )
        return amap, amap > threshold
