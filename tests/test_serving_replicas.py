"""Multi-device serving: replica-per-device parallel scoring.

serving/replicas.py + the BatchingScorer runner pool.  The threading
semantics are tested with stub callables (deterministic, no JAX on the
hot path); the device-placement path runs a real exported artifact
replicated over the 8 virtual CPU devices the suite forces.

The reference has no serving path at all (its inference is a
single-device Lightning predict loop, tools.py:310-390); this subsystem
is a TPU-native addition, so the oracle is self-consistency: replicated
scoring must be indistinguishable from single-device scoring except in
throughput.
"""

import threading
import time

import numpy as np
import pytest


def _sum_scorer(x):
    s = x.reshape(x.shape[0], -1).sum(axis=1)
    return s, (s > 100).astype(np.int32)


def _make_slow(delay_s, calls):
    """A stub scorer that sleeps (releasing the GIL, like a device
    execution would block off-thread) and records which replica ran."""

    def fn(x):
        calls.append(threading.get_ident())
        time.sleep(delay_s)
        return _sum_scorer(x)

    return fn


class TestRunnerPool:
    def _scorer(self, n_fns, batch=4, delay_s=0.0, max_delay_ms=5.0):
        from ssad_tpu.serving.server import BatchingScorer

        calls = []
        fns = [_make_slow(delay_s, calls) for _ in range(n_fns)]
        return BatchingScorer(fns, batch=batch, max_delay_ms=max_delay_ms), calls

    def test_fanout_correct_across_replicas(self):
        """48 concurrent distinct images through 4 replicas: every
        caller gets ITS result (no cross-wiring between concurrently
        executing batches)."""
        sc, _ = self._scorer(4, batch=4, delay_s=0.02)
        results, errors = {}, []

        def worker(i):
            try:
                img = np.full((2, 2, 3), float(i), np.float32)
                score, _ = sc.score(img, timeout=30)
                results[i] = float(score)
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        try:
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(48)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            assert not errors
            for i in range(48):
                assert results[i] == pytest.approx(2 * 2 * 3 * i)
        finally:
            sc.close()

    def test_batches_execute_concurrently(self):
        """4 full batches through 4 replicas each sleeping 0.25 s must
        finish well under the 1 s serial time."""
        sc, calls = self._scorer(4, batch=4, delay_s=0.25, max_delay_ms=2.0)
        try:
            # pre-stage ALL requests, then wait: the collector drains
            # the queue into back-to-back batches
            reqs = [
                sc.submit(np.full((2, 2, 3), float(i), np.float32))
                for i in range(16)
            ]
            t0 = time.perf_counter()
            for r in reqs:
                assert r.event.wait(10)
                assert r.error is None
            wall = time.perf_counter() - t0
        finally:
            sc.close()
        assert len(calls) == 4
        assert len(set(calls)) >= 2, "only one replica thread ever ran"
        assert wall < 0.75, f"4×0.25s batches took {wall:.2f}s — no overlap"

    def test_stats_count_per_replica(self):
        sc, _ = self._scorer(3, batch=2, delay_s=0.0)
        try:
            for i in range(10):
                sc.score(np.full((2, 2, 3), float(i), np.float32))
            st = sc.stats()
            assert st["replicas"] == 3
            assert sum(st["replica_batches"]) == st["batches"]
            assert st["requests"] == 10
        finally:
            sc.close()

    def test_single_fn_stats_unchanged(self):
        """The single-replica path keeps its historical stats shape
        (no replicas keys) — dashboards key on it."""
        from ssad_tpu.serving.server import BatchingScorer

        sc = BatchingScorer(_sum_scorer, batch=2)
        try:
            sc.score(np.ones((2, 2, 3), np.float32))
            assert "replicas" not in sc.stats()
        finally:
            sc.close()

    def test_error_hits_only_its_batch(self):
        """A replica fault fails its own batch's waiters; other batches
        (on healthy replicas) still succeed."""
        from ssad_tpu.serving.server import BatchingScorer

        lock, fired = threading.Lock(), [False]

        def flaky(x):
            # the FIRST batch to execute — on whichever replica the
            # scheduler hands it to — faults; everything after succeeds
            with lock:
                if not fired[0]:
                    fired[0] = True
                    raise RuntimeError("kaboom")
            return _sum_scorer(x)

        sc = BatchingScorer([flaky, flaky], batch=2, max_delay_ms=2.0)
        try:
            oks, fails = [], []

            def worker(i):
                try:
                    oks.append(sc.score(np.full((2, 2, 3), float(i), np.float32), timeout=15))
                except RuntimeError:
                    fails.append(i)

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=20)
            # exactly one batch (≤2 requests) died; everyone else scored
            assert 1 <= len(fails) <= 2
            assert len(oks) == 8 - len(fails)
        finally:
            sc.close()

    def test_close_drains_and_joins(self):
        """close() with staged batches in the runner queue returns
        without hanging and completes the staged work."""
        sc, _ = self._scorer(2, batch=2, delay_s=0.05, max_delay_ms=1.0)
        reqs = [sc.submit(np.full((2, 2, 3), float(i), np.float32)) for i in range(8)]
        sc.close()
        done = sum(1 for r in reqs if r.event.is_set())
        assert done == 8  # every request either scored or was cancelled
        scored = sum(1 for r in reqs if r.error is None)
        assert scored >= 2  # at least the in-flight batch completed


class TestPickDevices:
    def test_zero_means_all(self):
        import jax

        from ssad_tpu.serving.replicas import pick_devices

        assert pick_devices(0) == jax.local_devices()
        assert pick_devices(None) == jax.local_devices()
        assert len(pick_devices(2)) == 2

    def test_overask_raises(self):
        import jax

        from ssad_tpu.serving.replicas import pick_devices

        with pytest.raises(ValueError):
            pick_devices(len(jax.local_devices()) + 1)


@pytest.mark.slow
class TestDeviceReplicas:
    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        import jax

        from ssad_tpu.config import ModelConfig
        from ssad_tpu.evaluation.inference import InferenceEngine
        from ssad_tpu.models.peranet import build_model, init_model
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        model = build_model(ModelConfig(compute_dtype="float32"))
        params, stats = init_model(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
        engine = InferenceEngine(model, params, stats)
        bank = np.random.default_rng(0).normal(size=(50, 512)).astype(np.float32)
        exported, meta = export_scorer(
            engine, bank, mode="image", batch=4, imsize=(64, 64), k=3,
            threshold=0.5,
        )
        path = save_artifact(
            tmp_path_factory.mktemp("replicas") / "img.ssadexp", exported, meta
        )
        return load_scorer(path)

    def test_replicas_match_single_device(self, artifact):
        """The same batch scored on every device gives the single-device
        answer — the program is identical, only the placement differs."""
        import jax

        from ssad_tpu.serving.replicas import device_replicas

        reps = device_replicas(artifact, jax.local_devices()[:4])
        x = np.random.default_rng(1).uniform(size=(4, 64, 64, 3)).astype(np.float32)
        ref = tuple(np.asarray(r) for r in artifact._call(x))
        for rep in reps:
            assert str(rep.device) in repr(rep)
            out = rep(x)
            for got, want in zip(out, ref):
                np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    def test_replicated_batcher_end_to_end(self, artifact):
        """Concurrent single-image submits through a 4-replica batcher
        reproduce the direct ServedScorer outputs image-for-image."""
        import jax

        from ssad_tpu.serving.replicas import device_replicas
        from ssad_tpu.serving.server import BatchingScorer

        reps = device_replicas(artifact, jax.local_devices()[:4])
        for r in reps:
            r.warmup(max_calls=2, settled_s=1e9)  # one call each: compile
        sc = BatchingScorer(reps, batch=artifact.batch, max_delay_ms=10.0)
        imgs = np.random.default_rng(2).uniform(size=(12, 64, 64, 3)).astype(np.float32)
        want_scores, want_labels, _ = artifact(imgs)
        got = {}

        def worker(i):
            score, label, _ = sc.score(imgs[i], timeout=60)
            got[i] = (float(score), int(label))

        try:
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert len(got) == 12
            for i in range(12):
                assert got[i][0] == pytest.approx(float(want_scores[i]), abs=1e-5)
                assert got[i][1] == int(want_labels[i])
            st = sc.stats()
            assert st["replicas"] == 4
            assert sum(st["replica_batches"]) == st["batches"]
        finally:
            sc.close()
