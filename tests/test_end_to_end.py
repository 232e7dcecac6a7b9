"""Full-stack integration: train → checkpoint → evaluate → localize,
on the fake MVTec tree, via the library API and the CLI."""

import json
from pathlib import Path

import numpy as np
import pytest

from ssad_tpu import config
from ssad_tpu.data import mvtec
from ssad_tpu.evaluation import inference as inf
from ssad_tpu.evaluation.evaluator import evaluate_category
from ssad_tpu.evaluation.localizer import Localizer
from ssad_tpu.train import checkpoint as ckpt_mod
from ssad_tpu.train.trainer import train_category


@pytest.fixture(scope="module")
def trained_checkpoint(fake_mvtec, tmp_path_factory):
    out = tmp_path_factory.mktemp("models")
    cfg = config.TrainConfig(
        data=config.DataConfig(
            dataset_dir=str(fake_mvtec), subject="bottle", imsize=(64, 64),
            batch_size=8, min_dataset_length=16,
        ),
        model=config.ModelConfig(compute_dtype="float32", memory_bank_size=128),
        optim=config.OptimConfig(projection_epochs=1, fine_tune_epochs=2,
                                 checkpoint_every_n_epochs=1),
        outputs_dir=str(out),
    )
    result = train_category(cfg, verbose=False)
    path = ckpt_mod.save_checkpoint(
        out / "bottle", result.params, result.batch_stats, result.bank, cfg
    )
    return Path(path), cfg


@pytest.mark.slow
class TestEvaluatePipeline:
    def test_image_level(self, fake_mvtec, trained_checkpoint, tmp_path):
        path, cfg = trained_checkpoint
        engine, bank, cfg2 = inf.load_engine(str(path))
        assert cfg2.data.subject == "bottle"
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(imsize=(64, 64), batch_size=8, upsample_size=64)
        r = evaluate_category(
            engine, bank, data, test, ecfg, "bottle",
            outputs_dir=str(tmp_path), with_artificial=True,
        )
        assert r.image_auroc is not None and 0.0 <= r.image_auroc <= 1.0
        assert r.image_f1 is not None
        assert r.artificial is not None and 0.0 <= r.artificial.accuracy <= 1.0
        assert (tmp_path / "bottle_image_roc.png").exists()
        assert (tmp_path / "bottle_tsne.png").exists()
        # image-mode pixel metrics on Grad-CAM maps (reference committed
        # image_level pixel_roc/pro artifacts; hookup restored)
        assert r.gradcam_pixel_auroc is not None
        assert 0.0 <= r.gradcam_pixel_auroc <= 1.0
        assert np.isfinite(r.gradcam_aupro)
        assert (tmp_path / "bottle_pixel_roc.png").exists()
        assert (tmp_path / "bottle_pro.png").exists()

    def test_patch_level(self, fake_mvtec, trained_checkpoint, tmp_path):
        path, cfg = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(
            patch_localization=True, patch_dim=16, stride=16,
            imsize=(64, 64), batch_size=8, upsample_size=64,
        )
        r = evaluate_category(
            engine, bank, data, test, ecfg, "bottle", outputs_dir=str(tmp_path),
            n_normality_images=2,
        )
        assert r.pixel_auroc is not None and 0.0 <= r.pixel_auroc <= 1.0
        assert r.iou is not None and r.aupro is not None
        assert (tmp_path / "bottle_pro.png").exists()

    def test_image_level_mahalanobis(self, fake_mvtec, trained_checkpoint, tmp_path):
        """--scorer mahalanobis end-to-end: the parametric Gaussian
        detector is selectable through EvalConfig and produces a full
        image-level result."""
        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(
            imsize=(64, 64), batch_size=8, upsample_size=64, scorer="mahalanobis"
        )
        r = evaluate_category(
            engine, bank, data, test, ecfg, "bottle", with_artificial=False
        )
        assert r.image_auroc is not None and 0.0 <= r.image_auroc <= 1.0
        assert np.isfinite(r.image_f1)

    def test_patch_level_mahalanobis(self, fake_mvtec, trained_checkpoint, tmp_path):
        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(
            patch_localization=True, patch_dim=16, stride=16,
            imsize=(64, 64), batch_size=8, upsample_size=64,
            scorer="mahalanobis",
        )
        r = evaluate_category(
            engine, bank, data, test, ecfg, "bottle", n_normality_images=2
        )
        assert r.pixel_auroc is not None and 0.0 <= r.pixel_auroc <= 1.0
        assert np.isfinite(r.aupro) and np.isfinite(r.iou)

    def test_patch_level_with_coreset_normality(self, fake_mvtec,
                                                trained_checkpoint):
        """EvalConfig.coreset distills the re-embedded patch normality
        by k-center greedy before the detector fit; the evaluation
        still produces finite metrics end-to-end."""
        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(
            patch_localization=True, patch_dim=16, stride=16,
            imsize=(64, 64), batch_size=8, upsample_size=64,
            n_normality_images=2, coreset=12,
        )
        r = evaluate_category(engine, bank, data, test, ecfg, "bottle")
        assert r.pixel_auroc is not None and 0.0 <= r.pixel_auroc <= 1.0
        assert np.isfinite(r.aupro) and np.isfinite(r.iou)

    def test_patch_level_data_parallel_matches(self, fake_mvtec,
                                               trained_checkpoint, tmp_path):
        """EvalConfig.data_shards shards scoring over 4 virtual devices
        through the duck-typed ShardedEngine; the category result must
        match the single-device run (no collectives in the program)."""
        from ssad_tpu.parallel.infer_parallel import maybe_shard_engine

        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        ecfg = config.EvalConfig(
            patch_localization=True, patch_dim=16, stride=16,
            imsize=(64, 64), batch_size=8, upsample_size=64,
        )
        r1 = evaluate_category(
            engine, bank, data, test, ecfg, "bottle", n_normality_images=2
        )
        rn = evaluate_category(
            maybe_shard_engine(engine, 4), bank, data, test, ecfg, "bottle",
            n_normality_images=2,
        )
        # tolerance: the checkpoint computes in bf16, and XLA's fusion
        # rounding differs between the local-shard and global-batch
        # compilations — exact DP-vs-single equality is pinned by the
        # float32 unit tests (test_infer_parallel.py); metric-level
        # agreement is what matters here
        assert rn.pixel_auroc == pytest.approx(r1.pixel_auroc, abs=1e-3)
        assert rn.aupro == pytest.approx(r1.aupro, abs=1e-3)
        assert rn.iou == pytest.approx(r1.iou, abs=1e-3)

    def test_patch_level_device_metrics_match_host(self, fake_mvtec,
                                                   trained_checkpoint, tmp_path):
        """EvalConfig.device_metrics=True routes pixel AUROC / IoU /
        AUPRO through the fused on-device sort program; the category
        result must match the host oracles on the same maps."""
        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        base = dict(patch_localization=True, patch_dim=16, stride=16,
                    imsize=(64, 64), batch_size=8, upsample_size=64)
        r_host = evaluate_category(
            engine, bank, data, test,
            config.EvalConfig(device_metrics=False, **base), "bottle",
            n_normality_images=2,
        )
        r_dev = evaluate_category(
            engine, bank, data, test,
            config.EvalConfig(device_metrics=True, **base), "bottle",
            n_normality_images=2, outputs_dir=str(tmp_path),
        )
        assert r_dev.pixel_auroc == pytest.approx(r_host.pixel_auroc, abs=5e-4)
        assert r_dev.iou == pytest.approx(r_host.iou, abs=5e-4)
        assert r_dev.aupro == pytest.approx(r_host.aupro, abs=5e-4)
        # the downsampled device curves still feed the plot artifacts
        assert (tmp_path / "bottle_pixel_roc.png").exists()
        assert (tmp_path / "bottle_pro.png").exists()

    def test_category_parallel_sweep_matches_sequential(self, fake_mvtec,
                                                        trained_checkpoint,
                                                        tmp_path):
        """EvalConfig.category_shards=2 evaluates two categories
        concurrently, one per virtual device; results and artifacts must
        match the sequential sweep (replica parallelism, no
        collectives)."""
        import shutil

        from ssad_tpu.evaluation.evaluator import evaluate_categories

        path, _ = trained_checkpoint
        models = tmp_path / "models"
        for s in ("bottle", "carpet"):
            shutil.copytree(path, models / s / "best_model")
        base = dict(patch_localization=True, patch_dim=16, stride=16,
                    imsize=(64, 64), batch_size=8)
        r_seq = evaluate_categories(
            str(fake_mvtec), str(models), ["bottle", "carpet"],
            config.EvalConfig(**base), str(tmp_path / "seq"),
        )
        r_par = evaluate_categories(
            str(fake_mvtec), str(models), ["bottle", "carpet"],
            config.EvalConfig(category_shards=2, **base), str(tmp_path / "par"),
        )
        for s in ("bottle", "carpet"):
            assert r_par[s].pixel_auroc == pytest.approx(r_seq[s].pixel_auroc, abs=1e-6)
            assert r_par[s].aupro == pytest.approx(r_seq[s].aupro, abs=1e-6)
            assert r_par[s].iou == pytest.approx(r_seq[s].iou, abs=1e-6)
            assert (tmp_path / "par" / s / f"{s}_pro.png").exists()
        assert (tmp_path / "par" / "tables" / "markdown" / "patch_all_scores.md").exists()

    def test_category_and_data_shards_exclusive(self, fake_mvtec, tmp_path):
        from ssad_tpu.evaluation.evaluator import evaluate_categories

        with pytest.raises(ValueError, match="mutually exclusive"):
            evaluate_categories(
                str(fake_mvtec), str(tmp_path), ["bottle"],
                config.EvalConfig(category_shards=2, data_shards=2,
                                  imsize=(64, 64)),
                str(tmp_path / "x"),
            )

    def test_localizer_both_modes(self, fake_mvtec, trained_checkpoint, tmp_path):
        path, _ = trained_checkpoint
        engine, bank, _ = inf.load_engine(str(path))
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        test = mvtec.prepare_mvtec_test_data(fake_mvtec, "bottle", imsize=(64, 64))
        for patch in (False, True):
            ecfg = config.EvalConfig(
                patch_localization=patch, patch_dim=16, stride=16,
                imsize=(64, 64), upsample_size=64,
            )
            loc = Localizer(engine, ecfg).setup(data, n_train_images=2)
            paths = loc.localize(test, str(tmp_path / f"loc_{patch}"), num_images=2)
            assert len(paths) == 2
            for p in paths:
                assert Path(p).exists()
            amap, mask = loc.localize_single_image(test.images[0])
            assert amap.shape == (64, 64)
            assert mask.dtype == bool


@pytest.mark.slow
class TestCli:
    def test_train_qa_evaluate(self, fake_mvtec, tmp_path):
        from ssad_tpu.cli import main

        out = tmp_path / "out"
        rc = main([
            "train", "--dataset-dir", str(fake_mvtec), "--outputs-dir", str(out),
            "--subject", "carpet", "--imsize", "64", "--batch-size", "8",
            "--projection-epochs", "1", "--fine-tune-epochs", "1", "--quiet",
        ])
        assert rc == 0
        assert (out / "carpet" / "best_model").exists()

        rc = main([
            "qa", "--dataset-dir", str(fake_mvtec), "--outputs-dir", str(out),
            "--subject", "carpet", "--imsize", "64",
        ])
        assert rc == 0
        assert (out / "carpet" / "dataset_analysis" / "carpet_augmentations.png").exists()

        rc = main([
            "evaluate", "--dataset-dir", str(fake_mvtec), "--models-dir", str(out),
            "--outputs-dir", str(out / "eval"), "--subjects", "carpet",
            "--imsize", "64", "--batch-size", "8",
        ])
        assert rc == 0
        table = out / "eval" / "tables" / "markdown" / "image_all_scores.md"
        assert table.exists()
        assert "carpet" in table.read_text()
