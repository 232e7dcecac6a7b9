"""Multi-process (DCN-analog) validation: two coordinated controller
processes build ONE global 2×4 mesh and run the stacked category step.

This is the evidence behind the 'model'-axis-is-DCN-safe claim: the
global-view program (stack_category_data → make_multi_category_step)
must compose across process boundaries — device ordering, host-data
placement onto non-addressable shards, cross-process collectives, and
host gathers — and reproduce the single-process 8-device result.

Runs real subprocesses (jax.distributed needs one backend per process,
which the test process cannot provide twice), so it is the slowest test
in the suite; each worker compiles the full stacked ResNet step.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "_mp_worker.py"
REPO = Path(__file__).parent.parent


def _run_worker(proc_id, n_proc, port, out, env):
    return [sys.executable, str(WORKER), str(proc_id), str(n_proc), str(port),
            str(out)]


@pytest.mark.slow
class TestMultiProcess:
    def test_two_process_step_matches_single_process(self, tmp_path):
        env = {**os.environ}
        # the workers choose their own platform/device flags
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

        # single-process 8-device reference
        ref_out = tmp_path / "ref.json"
        r = subprocess.run(
            _run_worker(0, 1, 0, ref_out, env), env=env, cwd=REPO,
            capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stdout + r.stderr

        # two processes × 4 devices, shared coordinator
        port = 29300 + os.getpid() % 500
        mp_out = tmp_path / "mp.json"
        p1 = subprocess.Popen(
            _run_worker(1, 2, port, tmp_path / "unused.json", env), env=env,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            p0 = subprocess.run(
                _run_worker(0, 2, port, mp_out, env), env=env, cwd=REPO,
                capture_output=True, text=True, timeout=1200,
            )
            out1, _ = p1.communicate(timeout=120)
        finally:
            if p1.poll() is None:
                p1.kill()
        assert p0.returncode == 0, p0.stdout + p0.stderr
        assert p1.returncode == 0, out1

        ref = json.loads(ref_out.read_text())
        mp = json.loads(mp_out.read_text())
        assert ref["processes"] == 1 and mp["processes"] == 2
        # same global program, same data, same keys → same step result;
        # cross-process (Gloo) vs in-process collectives may reduce in a
        # different order, so allow float32 reduction-order slack
        np.testing.assert_allclose(
            np.asarray(mp["metrics"]), np.asarray(ref["metrics"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mp["kernel"]), np.asarray(ref["kernel"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_cli_train_multi_two_processes(self, fake_mvtec, tmp_path):
        """End-to-end reachability of the multi-controller path from the
        product surface: two `cli train-multi --coordinator` processes
        (4 virtual CPU devices each) run the full two-phase fit over the
        global 8-device mesh; process 0 writes the checkpoint +
        histories, process 1 writes nothing."""
        env = {**os.environ}
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        # share the suite's persistent compile cache across reruns
        env["SSAD_JAX_CACHE"] = os.environ.get(
            "SSAD_TEST_JAX_CACHE", "/tmp/ssad_tpu_test_jax_cache"
        )
        port = 29800 + os.getpid() % 500
        outs = [tmp_path / "out0", tmp_path / "out1"]

        def cmd(pid):
            return [
                sys.executable, "-m", "ssad_tpu.cli", "train-multi",
                "--dataset-dir", str(fake_mvtec),
                "--outputs-dir", str(outs[pid]),
                "--subjects", "bottle", "--imsize", "64",
                "--batch-size", "4", "--min-dataset-length", "4",
                "--projection-epochs", "1", "--fine-tune-epochs", "1",
                "--model-shards", "1", "--stack", "1",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "4", "--quiet",
            ]

        p1 = subprocess.Popen(
            cmd(1), env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        try:
            p0 = subprocess.run(
                cmd(0), env=env, cwd=REPO, capture_output=True, text=True,
                timeout=1200,
            )
            out1, _ = p1.communicate(timeout=120)
        finally:
            if p1.poll() is None:
                p1.kill()
        assert p0.returncode == 0, p0.stdout + p0.stderr
        assert p1.returncode == 0, out1

        assert (outs[0] / "bottle" / "best_model").exists()
        hist = json.loads((outs[0] / "bottle" / "history.json").read_text())
        assert len(hist["fine_tune_val_loss"]) == 1
        # non-zero processes write no artifacts (hosts may not share a fs)
        assert not (outs[1] / "bottle").exists()

    def test_cli_train_multi_coordinated_drain(self, fake_mvtec, tmp_path):
        """Coordinated preemption across controllers: SIGTERM lands on
        process 1 ONLY; the epoch-boundary consensus (dist.global_any)
        makes BOTH processes drain at the same persisted boundary and
        exit 75.  Re-running the same two commands completes the full
        schedule and process 0 writes the artifacts."""
        import signal
        import time

        env = {**os.environ}
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        env["SSAD_JAX_CACHE"] = os.environ.get(
            "SSAD_TEST_JAX_CACHE", "/tmp/ssad_tpu_test_jax_cache"
        )
        port = 30300 + os.getpid() % 500
        outs = [tmp_path / "out0", tmp_path / "out1"]
        resume = tmp_path / "resume"  # same host == the shared-fs contract

        def cmd(pid):
            return [
                sys.executable, "-m", "ssad_tpu.cli", "train-multi",
                "--dataset-dir", str(fake_mvtec),
                "--outputs-dir", str(outs[pid]),
                "--subjects", "bottle", "--imsize", "64",
                "--batch-size", "4", "--min-dataset-length", "4",
                "--projection-epochs", "1", "--fine-tune-epochs", "12",
                "--model-shards", "1", "--stack", "1",
                "--resume-dir", str(resume),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "4", "--quiet",
            ]

        snap = resume / "multi_bottle" / "resume_snapshot.pkl"
        # worker output goes to FILES, not pipes: nobody drains a pipe
        # while this test polls for the snapshot, and the per-program
        # cpu_aot_loader stderr chatter (~2 KB x dozens of programs)
        # overflows the 64 KB pipe buffer and deadlocks the workers
        logs = [open(tmp_path / f"w{pid}.log", "w+") for pid in (0, 1)]
        procs = [
            subprocess.Popen(cmd(pid), env=env, cwd=REPO, stdout=log,
                             stderr=subprocess.STDOUT, text=True)
            for pid, log in zip((0, 1), logs)
        ]

        def text(i):
            logs[i].flush()
            return (tmp_path / f"w{i}.log").read_text()

        try:
            deadline = time.time() + 900
            while time.time() < deadline and not snap.exists():
                for i, p in enumerate(procs):
                    if p.poll() is not None:
                        raise AssertionError(f"worker died early:\n{text(i)}")
                time.sleep(1)
            assert snap.exists(), "no group snapshot within the deadline"
            procs[1].send_signal(signal.SIGTERM)  # the NON-writer
            for p in procs:
                p.wait(timeout=600)
            outs_text = [text(0), text(1)]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for log in logs:
                log.close()
        # consensus drained BOTH processes
        assert procs[0].returncode == 75, outs_text[0]
        assert procs[1].returncode == 75, outs_text[1]
        info = json.loads(outs_text[0].strip().splitlines()[-1])
        assert info["preempted"] is True
        total = {"projection": 1, "fine_tune": 12}[info["stage"]]
        assert info["epochs_done"] < total
        assert not (outs[0] / "bottle").exists()  # no partial artifacts

        # same commands again: continue from the drained boundary
        # (file-backed output again — same pipe-overflow hazard)
        log1 = open(tmp_path / "w1b.log", "w+")
        p1 = subprocess.Popen(cmd(1), env=env, cwd=REPO, stdout=log1,
                              stderr=subprocess.STDOUT, text=True)
        try:
            p0 = subprocess.run(cmd(0), env=env, cwd=REPO,
                                capture_output=True, text=True, timeout=1200)
            p1.wait(timeout=120)
        finally:
            if p1.poll() is None:
                p1.kill()
            log1.close()
        out1 = (tmp_path / "w1b.log").read_text()
        assert p0.returncode == 0, p0.stdout + p0.stderr
        assert p1.returncode == 0, out1
        hist = json.loads((outs[0] / "bottle" / "history.json").read_text())
        assert len(hist["fine_tune_val_loss"]) == 12
        assert (outs[0] / "bottle" / "best_model").exists()
