"""CLI surface tests: parser wiring + infer/profile smoke (no training —
an untrained checkpoint is enough to exercise the full code paths)."""

import json

import jax
import numpy as np
import pytest

from ssad_tpu.cli import build_parser, main


class TestParser:
    def test_all_subcommands_parse(self):
        p = build_parser()
        base = ["--dataset-dir", "d"]
        for argv in (
            ["train", *base, "--subject", "bottle", "--data-shards", "2"],
            ["sweep", *base, "--subjects", "bottle,carpet",
             "--resume-dir", "r"],
            ["train-multi", *base, "--subjects", "all", "--stack", "4"],
            ["evaluate", *base, "--models-dir", "m", "--data-shards", "4"],
            ["infer", *base, "--models-dir", "m", "--subject", "bottle",
             "--artificial", "--data-shards", "2"],
            ["localize", *base, "--models-dir", "m", "--subject", "bottle"],
            ["qa", *base, "--subject", "bottle"],
            ["profile", *base, "--subject", "bottle", "--profile-dir", "t"],
            ["parity", "--modes", "image", "--backbone", "wide_resnet50_2"],
            # serving subcommands (registered from serving/cli.py —
            # guards the register() wiring after the module split)
            ["export", "--models-dir", "m", "--subject", "bottle",
             "--mode", "patch", *base, "--coreset", "100", "--knn-k", "1"],
            ["serve", "--artifact", "a.ssadexp", "--devices", "2",
             "--frontend", "native"],
            ["serve-bench", "--artifact", "a.ssadexp", "--rate", "25"],
            ["score", "--artifact", "a.ssadexp", "img_dir"],
            ["evaluate-artifact", "--artifact", "a.ssadexp", *base],
            ["doctor"],
        ):
            args = p.parse_args(argv)
            assert callable(args.fn), argv

    def test_unknown_backbone_rejected(self):
        p = build_parser()
        with pytest.raises(SystemExit):
            p.parse_args(["train", "--dataset-dir", "d", "--subject", "b",
                          "--backbone", "resnet999"])


@pytest.fixture(scope="module")
def untrained_checkpoint(fake_mvtec, tmp_path_factory):
    """An untrained-but-valid checkpoint for 64px inference."""
    from ssad_tpu.config import DataConfig, ModelConfig, TrainConfig
    from ssad_tpu.models.peranet import build_model, init_model
    from ssad_tpu.train import checkpoint as ckpt

    models_dir = tmp_path_factory.mktemp("models")
    cfg = TrainConfig(
        data=DataConfig(imsize=(64, 64)),
        model=ModelConfig(compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    ckpt.save_checkpoint(models_dir / "bottle", params, stats, None, cfg)
    return models_dir


class TestInferCommand:
    def test_image_mode(self, fake_mvtec, untrained_checkpoint, tmp_path, capsys):
        rc = main([
            "infer", "--dataset-dir", str(fake_mvtec),
            "--models-dir", str(untrained_checkpoint),
            "--outputs-dir", str(tmp_path), "--subject", "bottle",
            "--imsize", "64", "--batch-size", "4",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "image" and summary["n"] == 4
        payload = np.load(summary["outputs"])
        assert payload["anomaly"].shape == (4,)
        assert set(np.unique(payload["y_true"])) <= {0, 1}

    def test_patch_mode(self, fake_mvtec, untrained_checkpoint, tmp_path, capsys):
        rc = main([
            "infer", "--dataset-dir", str(fake_mvtec),
            "--models-dir", str(untrained_checkpoint),
            "--outputs-dir", str(tmp_path), "--subject", "bottle",
            "--imsize", "64", "--patch-level", "--patch-dim", "32",
            "--stride", "16",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "patch"
        payload = np.load(summary["outputs"])
        # upsampled (N, 64, 64) anomaly maps
        assert payload["anomaly"].shape == (4, 64, 64)


class TestTrainMultiCheckpointConfig:
    def test_per_category_subject_stamped(self, fake_mvtec, tmp_path, monkeypatch):
        """train-multi builds ONE config from subjects[0] but must save
        each category's checkpoint with its OWN subject: export bakes
        meta['subject'] for /score/<name> routing and the aug policy
        branches on the fixed/non-fixed taxonomy."""
        from types import SimpleNamespace

        import ssad_tpu.evaluation.visualization as vis
        import ssad_tpu.parallel.category_parallel as cp
        import ssad_tpu.train.checkpoint as ckpt
        from pathlib import Path

        def fake_fit(cfg, subjects, datas, mesh, **kw):
            return {
                s: SimpleNamespace(
                    params={}, batch_stats={}, bank=None, best_params=None,
                    best_batch_stats=None, history={},
                )
                for s in subjects
            }

        saved = {}

        def fake_save(out, params, stats, bank, cfg, name="best_model"):
            saved[Path(out).name] = cfg.data.subject
            return Path(out) / name

        monkeypatch.setattr(cp, "fit_categories", fake_fit)
        monkeypatch.setattr(ckpt, "save_checkpoint", fake_save)
        monkeypatch.setattr(vis, "plot_history", lambda *a, **k: None)
        rc = main([
            "train-multi", "--dataset-dir", str(fake_mvtec),
            "--outputs-dir", str(tmp_path),
            "--subjects", "bottle,carpet", "--imsize", "64",
        ])
        assert rc == 0
        assert saved == {"bottle": "bottle", "carpet": "carpet"}
        # numeric history twin of the plots, one per category
        for s in ("bottle", "carpet"):
            assert json.loads((tmp_path / s / "history.json").read_text()) == {}


class TestTrainMultiExitBarrier:
    """ADVICE r4: a failing controller's exit barrier must be short and
    must never mask the original traceback."""

    def _patch(self, monkeypatch, raise_exc):
        from ssad_tpu.parallel import distributed as dist

        calls = {}

        def fake_barrier(name, timeout_s=1200.0):
            calls["name"] = name
            calls["timeout_s"] = timeout_s
            if raise_exc:
                raise TimeoutError("barrier timed out")

        monkeypatch.setattr(dist, "barrier", fake_barrier)
        return calls

    def test_clean_exit_uses_long_timeout(self, monkeypatch):
        from ssad_tpu.cli import _train_multi_exit_barrier

        calls = self._patch(monkeypatch, raise_exc=False)
        _train_multi_exit_barrier(failing=False)
        assert calls["timeout_s"] == 1200.0

    def test_failing_exit_short_timeout_and_swallows(self, monkeypatch, capsys):
        from ssad_tpu.cli import _train_multi_exit_barrier

        calls = self._patch(monkeypatch, raise_exc=True)
        # must NOT raise: a raise-in-finally would replace the original
        # controller traceback with the barrier's timeout
        _train_multi_exit_barrier(failing=True)
        assert calls["timeout_s"] == 30.0
        assert "exit barrier skipped" in capsys.readouterr().err

    def test_clean_exit_barrier_failure_still_raises(self, monkeypatch):
        from ssad_tpu.cli import _train_multi_exit_barrier

        self._patch(monkeypatch, raise_exc=True)
        with pytest.raises(TimeoutError):
            _train_multi_exit_barrier(failing=False)


class TestProfileCommand:
    def test_trace_written(self, fake_mvtec, tmp_path, capsys):
        rc = main([
            "profile", "--dataset-dir", str(fake_mvtec),
            "--outputs-dir", str(tmp_path), "--subject", "bottle",
            "--imsize", "64", "--batch-size", "4",
            "--profile-dir", str(tmp_path / "trace"), "--steps", "2",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["steps"] == 2 and summary["mean_ms"] > 0
        assert any((tmp_path / "trace").rglob("*"))

    def test_patch_program_trace(self, fake_mvtec, tmp_path, capsys):
        """--what patch traces the fused patch-scoring program (the
        serving-relevant inference unit) instead of the train step."""
        rc = main([
            "profile", "--dataset-dir", str(fake_mvtec),
            "--outputs-dir", str(tmp_path), "--subject", "bottle",
            "--imsize", "64", "--patch-dim", "16", "--stride", "16",
            "--what", "patch", "--profile-batch", "2",
            "--profile-dir", str(tmp_path / "ptrace"), "--steps", "2",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["steps"] == 2 and summary["mean_ms"] > 0
        assert any((tmp_path / "ptrace").rglob("*"))


class TestSweepSkipExisting:
    def test_existing_checkpoints_are_skipped(self, fake_mvtec, tmp_path,
                                              monkeypatch, capsys):
        """--skip-existing makes sweeps restartable: a crash at category
        k must not re-train the finished k-1 on restart."""
        import ssad_tpu.cli as cli

        (tmp_path / "bottle" / "best_model").mkdir(parents=True)
        trained = []
        monkeypatch.setattr(
            cli, "cmd_train", lambda a: trained.append(a.subject) or 0
        )
        rc = main([
            "sweep", "--dataset-dir", str(fake_mvtec),
            "--outputs-dir", str(tmp_path),
            "--subjects", "bottle,carpet", "--skip-existing",
        ])
        assert rc == 0
        assert trained == ["carpet"]
        assert "bottle: checkpoint exists" in capsys.readouterr().out


class TestDoctor:
    def test_healthy_on_cpu(self, capsys):
        rc = main(["doctor", "--platform", "cpu", "--probe-timeout", "120"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"] is True
        assert out["backend"]["platform"] == "cpu"
        assert out["backend"]["n_devices"] >= 1
        assert out["compile_cache"]["writable"] is True

    def test_hung_backend_reported_not_hung(self, capsys):
        """The probe's whole purpose: a backend that hangs (dead TPU
        tunnel) must be REPORTED within the timeout, never hang the
        doctor itself."""
        rc = main(["doctor", "--platform", "cpu", "--probe-timeout", "0.01"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1 and out["ok"] is False
        assert "unreachable" in out["backend"]["error"]


class TestSweepPreemption:
    """Drain semantics of cmd_sweep (the heavy SIGTERM integration runs
    in test_trainer.py::TestGracefulPreemption against cmd_train)."""

    def _args(self, tmp_path, subjects="bottle,carpet"):
        import argparse

        return argparse.Namespace(
            subjects=subjects, outputs_dir=str(tmp_path),
            skip_existing=False, resume_dir=None, quiet=True,
        )

    def test_propagates_cmd_train_preemption_code(self, tmp_path, monkeypatch):
        from ssad_tpu import cli

        calls = []

        def fake_train(args):
            calls.append(args.subject)
            return 75

        monkeypatch.setattr(cli, "cmd_train", fake_train)
        assert cli.cmd_sweep(self._args(tmp_path)) == 75
        assert calls == ["bottle"]  # stops, does not start carpet

    def test_signal_between_subjects_stops_before_next(
        self, tmp_path, monkeypatch, capsys
    ):
        import os as _os
        import signal as _signal

        from ssad_tpu import cli

        calls = []

        def fake_train(args):
            calls.append(args.subject)
            # signal arrives while a subject trains WITHOUT a resume
            # dir: cmd_train has no inner guard, the sweep guard
            # latches it and stops before the next subject
            _os.kill(_os.getpid(), _signal.SIGTERM)
            return 0

        monkeypatch.setattr(cli, "cmd_train", fake_train)
        assert cli.cmd_sweep(self._args(tmp_path)) == 75
        assert calls == ["bottle"]
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["preempted"] is True and out["remaining"] == ["carpet"]

    def test_per_subject_resume_dirs(self, tmp_path, monkeypatch):
        from ssad_tpu import cli

        seen = {}

        def fake_train(args):
            seen[args.subject] = args.resume_dir
            return 0

        monkeypatch.setattr(cli, "cmd_train", fake_train)
        args = self._args(tmp_path)
        args.resume_dir = str(tmp_path / "resume")
        assert cli.cmd_sweep(args) == 0
        assert seen == {
            "bottle": str(tmp_path / "resume" / "bottle"),
            "carpet": str(tmp_path / "resume" / "carpet"),
        }
