"""Serving subsystem: AOT export artifacts, dynamic batching, HTTP API.

The reference has no deployment story — its inference path is a live
Lightning `Trainer.predict` loop over a Python checkpoint
(/root/reference/src/tools.py:310-390).  The serving subsystem is a
TPU-native addition: `jax.export` AOT artifacts (weights + bank +
threshold baked into one serialized program), a dynamic batcher that
fills the fixed compiled batch shape, and a stdlib HTTP front end.

Threading/HTTP layers are tested against a stub scorer (no JAX on the
hot path); the export roundtrip is checked bit-for-bit against the live
InferenceEngine on a tiny model.
"""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# BatchingScorer (stub scorer — pure threading semantics)
# ---------------------------------------------------------------------------


def _sum_scorer(x):
    """Identifies each image by its pixel sum; label = sum > 100."""
    s = x.reshape(x.shape[0], -1).sum(axis=1)
    return s, (s > 100).astype(np.int32)


class TestBatchingScorer:
    def _make(self, batch=4, max_delay_ms=10.0, fn=_sum_scorer):
        from ssad_tpu.serving.server import BatchingScorer

        return BatchingScorer(fn, batch=batch, max_delay_ms=max_delay_ms)

    def test_single_request_roundtrip(self):
        sc = self._make()
        try:
            img = np.full((4, 4, 3), 2.0, np.float32)
            score, label = sc.score(img)
            assert score == pytest.approx(4 * 4 * 3 * 2.0)
            assert label == 0
        finally:
            sc.close()

    def test_concurrent_fanout_routes_results(self):
        """32 threads submit distinct images; each must get ITS result
        back (the padding rows and batch fan-out must not cross wires)."""
        sc = self._make(batch=4, max_delay_ms=20.0)
        results = {}
        errors = []

        def worker(i):
            try:
                img = np.full((2, 2, 3), float(i), np.float32)
                score, _ = sc.score(img)
                results[i] = float(score)
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        try:
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(32)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            assert not errors
            for i in range(32):
                assert results[i] == pytest.approx(2 * 2 * 3 * i)
        finally:
            sc.close()

    def test_error_propagates_to_every_waiter(self):
        def broken(x):
            raise RuntimeError("kaboom")

        sc = self._make(fn=broken)
        try:
            with pytest.raises(RuntimeError, match="kaboom"):
                sc.score(np.zeros((2, 2, 3), np.float32))
        finally:
            sc.close()

    def test_stats_and_occupancy(self):
        sc = self._make(batch=4, max_delay_ms=1.0)
        try:
            for _ in range(5):
                sc.score(np.ones((2, 2, 3), np.float32))
            st = sc.stats()
            assert st["requests"] == 5
            assert st["batches"] >= 1
            assert 0.0 < st["mean_batch_occupancy"] <= 1.0
            assert st["latency_ms_p50"] is not None
        finally:
            sc.close()

    def test_closed_scorer_rejects_submissions(self):
        sc = self._make()
        sc.close()
        with pytest.raises(RuntimeError):
            sc.submit(np.zeros((2, 2, 3), np.float32))

    def test_requests_behind_close_sentinel_fail_fast(self):
        """A request racing close() must get an immediate error, not
        block out the full score timeout."""
        sc = self._make()
        sc._closed = True  # simulate the race: submit won the check...
        sc._closed = False
        req = sc.submit(np.zeros((2, 2, 3), np.float32))
        # ...but close()'s sentinel could land first in a real race;
        # either way close() must complete or cancel everything queued
        sc.close()
        assert req.event.wait(5)
        assert req.error is not None or req.result is not None

    def test_overload_sheds_instead_of_queueing(self):
        """With max_queue set, submissions beyond the bound raise
        Overloaded immediately — bounded latency beats unbounded
        queueing under overload."""
        import time as _time

        from ssad_tpu.serving.server import Overloaded

        gate = threading.Event()

        def slow(x):
            gate.wait(10)
            return _sum_scorer(x)

        sc = self._make(batch=1, max_delay_ms=0.1, fn=slow)
        sc.max_queue = 3
        try:
            reqs = [sc.submit(np.zeros((2, 2, 3), np.float32))
                    for _ in range(3)]
            # the collector may have already popped one — top the queue
            # back up until the bound engages, then overflow must shed
            deadline = _time.perf_counter() + 5
            with pytest.raises(Overloaded):
                while _time.perf_counter() < deadline:
                    reqs.append(sc.submit(np.zeros((2, 2, 3), np.float32)))
                raise AssertionError("bound never engaged")
            st = sc.stats()
            assert st["max_queue"] == 3 and st["queue_depth"] >= 3
        finally:
            gate.set()
            sc.close()

    def test_stats_window_is_bounded(self):
        sc = self._make(batch=1, max_delay_ms=0.1)
        try:
            for _ in range(20):
                sc.score(np.ones((2, 2, 3), np.float32))
            assert sc.stats()["requests"] == 20
            assert sc._latencies.maxlen == 1024
            assert sc._occupancies.maxlen == 1024
        finally:
            sc.close()


# ---------------------------------------------------------------------------
# HTTP front end (stub scorer)
# ---------------------------------------------------------------------------


@pytest.fixture()
def image_server():
    from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

    sc = BatchingScorer(_sum_scorer, batch=4, max_delay_ms=5.0)
    meta = {"mode": "image", "imsize": [8, 8], "threshold": 100.0}
    srv = AnomalyHTTPServer(sc, meta, port=0).start()
    yield srv
    srv.stop()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read().decode())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return json.loads(r.read().decode())


class TestHTTPServer:
    def test_healthz_and_stats(self, image_server):
        assert _get(image_server.port, "/healthz") == {"ok": True, "mode": "image"}
        st = _get(image_server.port, "/stats")
        assert "requests" in st

    def test_score_npy_body(self, image_server):
        img = np.full((8, 8, 3), 1.0, np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        out = _post(image_server.port, "/score", buf.getvalue())
        assert out["score"] == pytest.approx(8 * 8 * 3)
        assert out["label"] == 1
        assert out["threshold"] == 100.0
        assert out["ms"] >= 0

    def test_score_png_body_resizes(self, image_server):
        from PIL import Image

        # 16×16 PNG must be resized down to the model's 8×8 geometry
        arr = np.full((16, 16, 3), 255, np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out = _post(image_server.port, "/score", buf.getvalue())
        assert out["score"] == pytest.approx(8 * 8 * 3 * 1.0, rel=1e-3)

    def test_bad_body_is_400(self, image_server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{image_server.port}/score",
            data=b"not an image",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_wrong_npy_geometry_is_400_before_batching(self, image_server):
        """A mis-shaped npy must be rejected at decode time — inside a
        batch it would take innocent co-batched requests down."""
        arr = np.zeros((16, 16, 3), np.float32)  # model is 8×8
        buf = io.BytesIO()
        np.save(buf, arr)
        req = urllib.request.Request(
            f"http://127.0.0.1:{image_server.port}/score",
            data=buf.getvalue(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400
        assert "(8, 8, 3)" in exc.value.read().decode()
        # the server still works for well-formed requests
        good = np.ones((8, 8, 3), np.float32)
        buf = io.BytesIO()
        np.save(buf, good)
        out = _post(image_server.port, "/score", buf.getvalue())
        assert out["score"] == pytest.approx(8 * 8 * 3)

    def test_scoring_timeout_is_504(self):
        import time as _time

        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def slow(x):
            _time.sleep(1.0)
            return _sum_scorer(x)

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1)
        srv = AnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8]}, port=0, score_timeout=0.05
        ).start()
        try:
            buf = io.BytesIO()
            np.save(buf, np.zeros((8, 8, 3), np.float32))
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/score",
                data=buf.getvalue(), method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 504
        finally:
            srv.stop()

    def test_overload_is_503(self):
        """Queue-full load shedding surfaces as HTTP 503 — the status
        load balancers key on for back-off/retry-elsewhere."""
        import threading as _threading

        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        gate = _threading.Event()

        def slow(x):
            gate.wait(10)
            return _sum_scorer(x)

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1, max_queue=1)
        srv = AnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8]}, port=0, score_timeout=15
        ).start()
        try:
            buf = io.BytesIO()
            np.save(buf, np.zeros((8, 8, 3), np.float32))
            body = buf.getvalue()
            codes = []

            def hit():
                try:
                    _post(srv.port, "/score", body)
                    codes.append(200)
                except urllib.error.HTTPError as e:
                    codes.append(e.code)

            threads = [_threading.Thread(target=hit) for _ in range(8)]
            for t in threads:
                t.start()
            import time as _time

            _time.sleep(0.5)  # let the burst pile up against the gate
            gate.set()
            for t in threads:
                t.join(timeout=30)
            assert 503 in codes  # overflow shed
            assert 200 in codes  # admitted requests still served
        finally:
            gate.set()
            srv.stop()

    def test_concurrent_burst_no_resets(self, image_server):
        """A 32-way simultaneous burst must not drop connections (the
        stdlib listen backlog default of 5 resets connections under
        exactly the load the batcher exists to absorb)."""
        import threading

        buf = io.BytesIO()
        np.save(buf, np.ones((8, 8, 3), np.float32))
        body = buf.getvalue()
        errs, outs = [], []

        def hit():
            try:
                outs.append(_post(image_server.port, "/score", body))
            except Exception as e:  # pragma: no cover - failure path
                errs.append(e)

        threads = [threading.Thread(target=hit) for _ in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert len(outs) == 32
        assert all(o["score"] == pytest.approx(8 * 8 * 3) for o in outs)

    def test_multi_model_routing(self):
        """Several artifacts behind one port: POST /score/<name> routes,
        bare /score is ambiguous (400 + the model list), stats are
        per-model, and stop() closes every batcher."""
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def double_scorer(x):
            s = 2 * x.reshape(x.shape[0], -1).sum(axis=1)
            return s, (s > 100).astype(np.int32)

        models = {
            "bottle": (BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0),
                       {"mode": "image", "imsize": [8, 8]}),
            "carpet": (BatchingScorer(double_scorer, batch=2, max_delay_ms=2.0),
                       {"mode": "image", "imsize": [8, 8]}),
        }
        srv = AnomalyHTTPServer(models=models, port=0).start()
        try:
            buf = io.BytesIO()
            np.save(buf, np.ones((8, 8, 3), np.float32))
            body = buf.getvalue()
            out_b = _post(srv.port, "/score/bottle", body)
            out_c = _post(srv.port, "/score/carpet", body)
            assert out_b["score"] == pytest.approx(8 * 8 * 3)
            assert out_c["score"] == pytest.approx(2 * 8 * 8 * 3)
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(srv.port, "/score", body)
            assert exc.value.code == 400
            assert "bottle" in exc.value.read().decode()
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(srv.port, "/score/zipper", body)
            assert exc.value.code == 404
            health = _get(srv.port, "/healthz")
            assert health["models"] == {"bottle": "image", "carpet": "image"}
            st = _get(srv.port, "/stats")
            assert st["bottle"]["requests"] == 1
            assert st["carpet"]["requests"] == 1
        finally:
            srv.stop()
        for sc, _ in models.values():
            assert sc._closed

    def test_unknown_route_is_404(self, image_server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                f"http://127.0.0.1:{image_server.port}/nope", timeout=30
            )
        assert exc.value.code == 404

    def test_patch_mode_heatmap(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def map_scorer(x):
            return (x.mean(axis=-1),)  # (B, H, W)

        sc = BatchingScorer(map_scorer, batch=2, max_delay_ms=5.0)
        meta = {"mode": "patch", "imsize": [8, 8]}
        srv = AnomalyHTTPServer(sc, meta, port=0).start()
        try:
            img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            out = _post(srv.port, "/score?heatmap=1", buf.getvalue())
            assert out["map_max"] == pytest.approx(float(img.mean(-1).max()), rel=1e-5)
            assert out["map_mean"] == pytest.approx(float(img.mean(-1).mean()), rel=1e-5)
            import base64

            from PIL import Image

            png = base64.b64decode(out["heatmap_b64"])
            hm = Image.open(io.BytesIO(png))
            assert hm.size == (8, 8)
        finally:
            srv.stop()


# ---------------------------------------------------------------------------
# AOT export roundtrip (tiny real model)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_engine():
    import jax

    from ssad_tpu.config import ModelConfig
    from ssad_tpu.evaluation.inference import InferenceEngine
    from ssad_tpu.models.peranet import build_model, init_model

    model = build_model(ModelConfig(compute_dtype="float32"))
    params, stats = init_model(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
    engine = InferenceEngine(model, params, stats)
    bank = np.random.default_rng(0).normal(size=(50, 512)).astype(np.float32)
    return engine, bank


@pytest.mark.slow
class TestExportRoundtrip:
    def test_image_mode_matches_live_engine(self, tiny_engine, tmp_path):
        import jax
        import jax.numpy as jnp

        from ssad_tpu.ops import image as im
        from ssad_tpu.ops.knn import knn_cosine_scores
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        exported, meta = export_scorer(
            engine, bank, mode="image", batch=4, imsize=(64, 64), k=3,
            threshold=0.5,
        )
        path = save_artifact(tmp_path / "img.ssadexp", exported, meta)
        scorer = load_scorer(path)
        assert scorer.batch == 4
        assert scorer.meta["mode"] == "image"

        # 6 raw images through a batch-4 artifact: chunk + pad + unpad
        imgs = np.random.default_rng(1).uniform(size=(6, 64, 64, 3)).astype(np.float32)
        scores, labels, logits = scorer(imgs)
        assert scores.shape == (6,) and labels.shape == (6,)
        assert logits.shape == (6, engine.model.num_classes)

        xn = jax.vmap(im.normalize_imagenet)(jnp.asarray(imgs))
        _, emb = engine.predict_batch(xn)
        ref = np.asarray(knn_cosine_scores(emb, jnp.asarray(bank), k=3))
        np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(labels, (ref > 0.5).astype(np.int32))

        # a zero-row batch fails with a named error, not an unpacking
        # TypeError from the pipelined chunk loop
        with pytest.raises(ValueError, match="empty batch"):
            scorer(np.zeros((0, 64, 64, 3), np.float32))

    def test_patch_mode_matches_live_engine(self, tiny_engine, tmp_path):
        import jax
        import jax.numpy as jnp

        from ssad_tpu.ops import image as im
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        exported, meta = export_scorer(
            engine, bank, mode="patch", batch=2, imsize=(64, 64), k=3,
            patch_dim=16, stride=16,
        )
        path = save_artifact(tmp_path / "patch.ssadexp", exported, meta)
        scorer = load_scorer(path)
        imgs = np.random.default_rng(2).uniform(size=(3, 64, 64, 3)).astype(np.float32)
        (maps,) = scorer(imgs)
        assert maps.shape == (3, 64, 64)

        xn = jax.vmap(im.normalize_imagenet)(jnp.asarray(imgs))
        ref = np.asarray(
            engine.score_patch_maps(xn, bank, dim=16, stride=16, k=3, upsample_to=64)
        )
        np.testing.assert_allclose(maps, ref, rtol=1e-4, atol=1e-5)

    def test_mahalanobis_image_mode_matches_live_detector(
        self, tiny_engine, tmp_path
    ):
        """--scorer mahalanobis bakes the fitted Gaussian (mean +
        precision) instead of the k-NN bank; the served scores must
        match MahalanobisDetector.predict on the live engine."""
        import jax
        import jax.numpy as jnp

        from ssad_tpu.models.detector import MahalanobisDetector
        from ssad_tpu.ops import image as im
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        det = MahalanobisDetector().fit(jnp.asarray(bank), jax.random.key(0))
        exported, meta = export_scorer(
            engine, None, mode="image", batch=4, imsize=(64, 64),
            threshold=float(det.threshold), scorer="mahalanobis",
            mean=det.mean, precision=det.precision,
        )
        assert meta["scorer"] == "mahalanobis"
        assert meta["knn_impl"] is None
        path = save_artifact(tmp_path / "maha.ssadexp", exported, meta)
        scorer = load_scorer(path)

        imgs = np.random.default_rng(5).uniform(size=(4, 64, 64, 3)).astype(np.float32)
        scores, labels, _ = scorer(imgs)
        xn = jax.vmap(im.normalize_imagenet)(jnp.asarray(imgs))
        _, emb = engine.predict_batch(xn)
        ref = np.asarray(det.predict(emb))
        np.testing.assert_allclose(scores, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            labels, (ref > det.threshold).astype(np.int32)
        )

    def test_mahalanobis_patch_mode_matches_live_engine(
        self, tiny_engine, tmp_path
    ):
        import jax
        import jax.numpy as jnp

        from ssad_tpu.models.detector import MahalanobisDetector
        from ssad_tpu.ops import image as im
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        det = MahalanobisDetector().fit(jnp.asarray(bank), jax.random.key(1))
        exported, meta = export_scorer(
            engine, None, mode="patch", batch=2, imsize=(64, 64),
            patch_dim=16, stride=16, scorer="mahalanobis",
            mean=det.mean, precision=det.precision,
        )
        path = save_artifact(tmp_path / "maha_p.ssadexp", exported, meta)
        scorer = load_scorer(path)
        imgs = np.random.default_rng(6).uniform(size=(2, 64, 64, 3)).astype(np.float32)
        (maps,) = scorer(imgs)
        assert maps.shape == (2, 64, 64)

        xn = jax.vmap(im.normalize_imagenet)(jnp.asarray(imgs))
        ref = np.asarray(
            engine.score_patch_maps_mahalanobis(
                xn, det.mean, det.precision, dim=16, stride=16, upsample_to=64
            )
        )
        np.testing.assert_allclose(maps, ref, rtol=1e-4, atol=1e-5)

    def test_mahalanobis_requires_stats(self, tiny_engine):
        from ssad_tpu.serving.export import export_scorer

        engine, _ = tiny_engine
        with pytest.raises(ValueError, match="mean and precision"):
            export_scorer(engine, None, mode="image", batch=1,
                          imsize=(64, 64), scorer="mahalanobis")

    def test_bf16_weight_cast(self, tiny_engine, tmp_path):
        """--dtype bfloat16 shrinks the artifact and perturbs scores
        only at bf16 noise level (the backbone computes in its
        compute_dtype either way; the bank and k-NN stay f32)."""
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        kw = dict(mode="image", batch=2, imsize=(64, 64), k=3, threshold=0.5)
        exp32, meta32 = export_scorer(engine, bank, **kw)
        exp16, meta16 = export_scorer(engine, bank, dtype="bfloat16", **kw)
        assert meta16["weights_dtype"] == "bfloat16"
        p32 = save_artifact(tmp_path / "f32.ssadexp", exp32, meta32)
        p16 = save_artifact(tmp_path / "bf16.ssadexp", exp16, meta16)
        import os

        assert os.path.getsize(p16) < 0.7 * os.path.getsize(p32)
        imgs = np.random.default_rng(7).uniform(size=(2, 64, 64, 3)).astype(np.float32)
        s32 = load_scorer(p32)(imgs)[0]
        s16 = load_scorer(p16)(imgs)[0]
        np.testing.assert_allclose(s16, s32, atol=0.02)

    def test_int8_weight_only_quantization(self, tiny_engine, tmp_path):
        """--dtype int8 (weight-only, per-output-channel symmetric)
        shrinks the artifact well past bf16 and keeps scores at
        quantization-noise level with identical labels."""
        import os

        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        kw = dict(mode="image", batch=2, imsize=(64, 64), k=3, threshold=0.5)
        exp32, meta32 = export_scorer(engine, bank, **kw)
        exp8, meta8 = export_scorer(engine, bank, dtype="int8", **kw)
        assert meta8["weights_dtype"] == "int8"
        p32 = save_artifact(tmp_path / "f32.ssadexp", exp32, meta32)
        p8 = save_artifact(tmp_path / "int8.ssadexp", exp8, meta8)
        # weights dominate the artifact; int8 leaves are 4x smaller than f32
        assert os.path.getsize(p8) < 0.45 * os.path.getsize(p32)
        imgs = np.random.default_rng(9).uniform(size=(4, 64, 64, 3)).astype(np.float32)
        s32, l32, _ = load_scorer(p32)(imgs)
        s8, l8, _ = load_scorer(p8)(imgs)
        np.testing.assert_allclose(s8, s32, atol=0.03)
        np.testing.assert_array_equal(l8, l32)

    def test_quantize_tree_roundtrip(self):
        """Per-channel int8: ≥2-D float leaves quantize (error ≤ half a
        quantization step + bf16 rounding), 1-D/integer leaves pass
        through exactly."""
        import jax.numpy as jnp

        from ssad_tpu.serving.quant import dequantize_tree, quantize_tree

        rng = np.random.default_rng(0)
        tree = {
            "conv": {"kernel": jnp.asarray(
                rng.normal(0, 0.1, (3, 3, 16, 32)), jnp.float32)},
            "bn": {"scale": jnp.full((32,), 1.5), "bias": jnp.zeros((32,))},
            "step": jnp.int32(7),
        }
        qt = quantize_tree(tree)
        assert sum(1 for l in qt.leaves if l.dtype == jnp.int8) == 1
        deq = dequantize_tree(qt)
        assert deq["step"] == 7
        np.testing.assert_array_equal(deq["bn"]["scale"], tree["bn"]["scale"])
        w = np.asarray(tree["conv"]["kernel"], np.float32)
        d = np.asarray(deq["conv"]["kernel"], np.float32)
        amax = np.abs(w).max(axis=(0, 1, 2))
        err = np.abs(w - d).max(axis=(0, 1, 2))
        assert (err <= amax / 254 + amax * 2**-8 + 1e-8).all()

    def test_cross_lowering_without_local_device_errors(self, tiny_engine):
        from ssad_tpu.serving.export import export_scorer

        engine, bank = tiny_engine
        with pytest.raises(ValueError, match="no local 'tpu' device"):
            export_scorer(engine, bank, mode="image", batch=1,
                          imsize=(64, 64), platform="tpu")

    def test_knn_force_impl(self):
        import jax.numpy as jnp

        from ssad_tpu.ops import knn

        q = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(10, 32)), jnp.float32)
        base = np.asarray(knn.knn_cosine_scores(q, b, k=3))
        with knn.force_impl("xla"):
            forced = np.asarray(knn.knn_cosine_scores(q, b, k=3))
        np.testing.assert_allclose(forced, base, rtol=1e-6)
        assert knn._IMPL_OVERRIDE is None
        with pytest.raises(ValueError):
            with knn.force_impl("cuda"):
                pass

    def test_artifact_rejects_garbage(self, tmp_path):
        from ssad_tpu.serving.export import load_scorer

        p = tmp_path / "bad.ssadexp"
        p.write_bytes(b"definitely not an artifact")
        with pytest.raises(ValueError, match="not an ssad_tpu serving artifact"):
            load_scorer(p)

    def test_wrong_geometry_rejected(self, tiny_engine, tmp_path):
        from ssad_tpu.serving.export import export_scorer, load_scorer, save_artifact

        engine, bank = tiny_engine
        exported, meta = export_scorer(
            engine, bank, mode="image", batch=2, imsize=(64, 64), k=3
        )
        path = save_artifact(tmp_path / "img.ssadexp", exported, meta)
        scorer = load_scorer(path)
        with pytest.raises(ValueError, match="expected"):
            scorer(np.zeros((1, 32, 32, 3), np.float32))


# ---------------------------------------------------------------------------
# CLI export + end-to-end served scoring from a checkpoint
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_checkpoint(tiny_engine, tmp_path_factory):
    """tiny_engine saved as a 'bottle' checkpoint with a full bank."""
    import jax.numpy as jnp

    from ssad_tpu import config
    from ssad_tpu.train import checkpoint as ckpt_mod
    from ssad_tpu.train.memory_bank import MemoryBank

    engine, bank_rows = tiny_engine
    bank = MemoryBank(
        data=jnp.asarray(bank_rows),
        cursor=jnp.zeros((), jnp.int32),
        count=jnp.asarray(bank_rows.shape[0], jnp.int32),
    )
    cfg = config.TrainConfig(
        data=config.DataConfig(
            dataset_dir="unused", subject="bottle", imsize=(64, 64)
        ),
        model=config.ModelConfig(compute_dtype="float32"),
    )
    models = tmp_path_factory.mktemp("serving_models")
    ckpt_mod.save_checkpoint(
        models / "bottle", engine.params, engine.batch_stats, bank, cfg
    )
    return models


@pytest.mark.slow
class TestExportCheckpoint:
    def test_patch_mode_requires_patch_normality(self, tiny_checkpoint, tmp_path):
        """The image-level memory bank holds whole-image embeddings —
        the WRONG normality distribution for patch scoring (the
        evaluator always re-embeds patches, evaluator.py
        min_bank_rows=10**9); patch export must refuse to bake it."""
        from ssad_tpu.serving.export import export_checkpoint

        with pytest.raises(ValueError, match="patch-mode export"):
            export_checkpoint(
                str(tiny_checkpoint / "bottle" / "best_model"),
                str(tmp_path / "p.ssadexp"), mode="patch",
            )

    def test_mahalanobis_from_checkpoint(self, tiny_checkpoint, tmp_path):
        """scorer='mahalanobis' end-to-end from a checkpoint: the
        Gaussian is fitted on the bank rows and the calibrated
        threshold rides in the header."""
        from ssad_tpu.serving.export import export_checkpoint, load_scorer

        path = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "m.ssadexp"), mode="image", batch=2,
            scorer="mahalanobis",
        )
        scorer = load_scorer(path)
        assert scorer.meta["scorer"] == "mahalanobis"
        assert np.isfinite(scorer.meta["threshold"])
        # drift baseline: the fit-time validation scores ride along
        cal = scorer.meta["calibration"]
        assert cal["source"] == "fit-val-mahalanobis"
        assert cal["n"] >= 1 and len(cal["probs"]) == len(cal["values"])
        # threshold rule is max-of-val, so the top quantile IS the threshold
        assert cal["values"][-1] == pytest.approx(scorer.meta["threshold"], rel=1e-5)
        imgs = np.random.default_rng(8).uniform(size=(2, 64, 64, 3)).astype(np.float32)
        scores, labels, _ = scorer(imgs)
        assert np.isfinite(scores).all()
        assert set(np.unique(labels)) <= {0, 1}

    def test_patch_mode_reembeds_from_dataset(
        self, tiny_checkpoint, fake_mvtec, tmp_path
    ):
        from ssad_tpu.serving.export import export_checkpoint, load_scorer

        path = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "p.ssadexp"), mode="patch", batch=2,
            patch_dim=16, stride=16, dataset_dir=str(fake_mvtec),
            n_normality_images=2,
        )
        scorer = load_scorer(path)
        assert scorer.meta["mode"] == "patch"
        # drift baseline is per-image map maxima (the quantity the
        # server tracks), scored through the fused patch program
        cal = scorer.meta["calibration"]
        assert cal["source"] == "val-image-map-max-knn"
        assert cal["n"] >= 1 and np.isfinite(cal["values"]).all()
        imgs = np.random.default_rng(4).uniform(size=(2, 64, 64, 3)).astype(np.float32)
        (maps,) = scorer(imgs)
        assert maps.shape == (2, 64, 64)
        assert np.isfinite(maps).all()


@pytest.mark.slow
class TestCliExport:
    def test_export_then_serve_roundtrip(self, tiny_engine, tiny_checkpoint,
                                         tmp_path, capsys):
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import load_scorer
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        engine, _ = tiny_engine
        models = tiny_checkpoint

        rc = main([
            "export", "--models-dir", str(models), "--subject", "bottle",
            "--mode", "image", "--batch", "2",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mode"] == "image"
        scorer = load_scorer(out["artifact"])
        # the exported program carries the calibrated threshold
        assert np.isfinite(scorer.meta["threshold"])
        assert scorer.meta["imsize"] == [64, 64]

        # the full serving stack over the real artifact
        batcher = BatchingScorer(scorer, batch=scorer.batch, max_delay_ms=5.0)
        srv = AnomalyHTTPServer(batcher, scorer.meta, port=0).start()
        try:
            img = np.random.default_rng(3).uniform(size=(64, 64, 3)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            res = _post(srv.port, "/score", buf.getvalue())
            assert np.isfinite(res["score"])
            assert res["label"] in (0, 1)
            assert len(res["logits"]) == engine.model.num_classes
        finally:
            srv.stop()


# ---------------------------------------------------------------------------
# Load generator (serving/loadgen.py)
# ---------------------------------------------------------------------------


class TestLoadgen:
    def test_npy_body_matches_geometry(self):
        from ssad_tpu.serving.loadgen import npy_body

        arr = np.load(io.BytesIO(npy_body((8, 8), seed=3)))
        assert arr.shape == (8, 8, 3) and arr.dtype == np.float32
        assert 0.0 <= arr.min() and arr.max() < 1.0

    def test_closed_loop_run_against_stub_server(self, image_server):
        """Every request lands, qps is positive, latency percentiles
        are ordered, and the server-side batcher saw the traffic."""
        from ssad_tpu.serving.loadgen import fetch_stats, npy_body, run_load

        body = npy_body((8, 8))
        report = run_load(
            "127.0.0.1", image_server.port, body,
            concurrency=4, total=40,
        )
        assert report["ok"] == 40
        assert report["shed"] == 0 and report["errors"] == 0
        assert report["qps"] > 0
        lat = report["latency_ms"]
        assert lat["p50"] <= lat["p95"] <= lat["p99"] <= lat["max"]
        st = fetch_stats("127.0.0.1", image_server.port)
        assert st["requests"] >= 40
        assert 0 < st["mean_batch_occupancy"] <= 1.0

    def test_shed_requests_counted_not_errored(self):
        """Against a slow batch-1 scorer with a 1-deep admission queue,
        a concurrent closed loop must see 503s — and the report must
        separate them from transport errors and keep the books
        balanced."""
        import time as _time

        from ssad_tpu.serving.loadgen import npy_body, run_load
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def slow(x):
            _time.sleep(0.05)
            return (x.reshape(x.shape[0], -1).sum(axis=1),
                    np.zeros(x.shape[0], np.int32))

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1, max_queue=1)
        meta = {"mode": "image", "imsize": [8, 8]}
        srv = AnomalyHTTPServer(sc, meta, port=0).start()
        try:
            report = run_load(
                "127.0.0.1", srv.port, npy_body((8, 8)),
                concurrency=8, total=24,
            )
            assert report["ok"] + report["shed"] + report["errors"] == 24
            assert report["shed"] > 0
            assert report["errors"] == 0
        finally:
            srv.stop()


@pytest.mark.slow
class TestCliServeBench:
    def test_serve_bench_over_real_artifact(self, tiny_checkpoint, tmp_path,
                                            capsys):
        """cli serve-bench --artifact: exports nothing itself — it
        warms the artifact, starts the in-process HTTP server, drives
        the closed loop, and prints one JSON report."""
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        path = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "img.ssadexp"), mode="image", batch=2,
        )
        rc = main([
            "serve-bench", "--artifact", path,
            "--concurrency", "2", "--requests", "12", "--warmup", "2",
        ])
        assert rc == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["ok"] == 12
        assert report["errors"] == 0
        assert report["qps"] > 0
        assert report["latency_ms"]["p50"] > 0
        assert report["server_stats"]["requests"] >= 12
        assert report["target"].endswith("/score")


class TestMetricsEndpoint:
    def test_http11_keepalive(self, image_server):
        """The server must speak HTTP/1.1 so closed-loop clients reuse
        connections (HTTP/1.0 forces a TCP connect per request, which
        would pollute every serve-bench latency number)."""
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", image_server.port,
                                          timeout=30)
        for _ in range(2):  # second request must ride the same socket
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            resp.read()
            assert resp.version == 11
            assert resp.status == 200
        conn.close()

    def test_families_are_grouped(self, image_server):
        """Prometheus text format: every line of a metric family must
        form one uninterrupted group (HELP/TYPE first, then all
        samples) — strict parsers reject interleaved families."""
        with urllib.request.urlopen(
            f"http://127.0.0.1:{image_server.port}/metrics", timeout=30
        ) as r:
            lines = r.read().decode().strip().splitlines()
        fam = lambda ln: ln.split()[2] if ln.startswith("#") else \
            ln.split("{")[0].split()[0]
        seen, prev = set(), None
        for ln in lines:
            f = fam(ln)
            if f != prev:
                assert f not in seen, f"family {f} interleaved"
                seen.add(f)
                prev = f

    def test_prometheus_exposition(self, image_server):
        buf = io.BytesIO()
        np.save(buf, np.ones((8, 8, 3), np.float32))
        _post(image_server.port, "/score", buf.getvalue())
        with urllib.request.urlopen(
            f"http://127.0.0.1:{image_server.port}/metrics", timeout=30
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        assert "# TYPE ssad_requests_total counter" in body
        assert 'ssad_requests_total{model="default"} 1' in body
        assert 'ssad_request_latency_ms{model="default",quantile="0.5"}' in body
        assert 'ssad_batch_occupancy_mean{model="default"}' in body

    def test_per_model_series(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        models = {
            "bottle": (BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0),
                       {"mode": "image", "imsize": [8, 8]}),
            "carpet": (BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0),
                       {"mode": "image", "imsize": [8, 8]}),
        }
        srv = AnomalyHTTPServer(models=models, port=0).start()
        try:
            buf = io.BytesIO()
            np.save(buf, np.ones((8, 8, 3), np.float32))
            _post(srv.port, "/score/carpet", buf.getvalue())
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=30
            ) as r:
                body = r.read().decode()
            assert 'ssad_requests_total{model="bottle"} 0' in body
            assert 'ssad_requests_total{model="carpet"} 1' in body
        finally:
            srv.stop()


@pytest.mark.slow
class TestCliScore:
    def test_folder_scoring_image_mode(self, tiny_checkpoint, tmp_path, capsys):
        """cli score over a mixed folder (PNG + npy): one CSV row per
        image, labels from the artifact's calibrated threshold."""
        from PIL import Image

        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "img.ssadexp"), mode="image", batch=2,
        )
        folder = tmp_path / "imgs"
        folder.mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(
                (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
            ).save(folder / f"im{i}.png")
        np.save(folder / "raw.npy",
                rng.uniform(size=(64, 64, 3)).astype(np.float32))
        (folder / "notes.txt").write_text("ignored")

        out = tmp_path / "scored"
        rc = main(["score", "--artifact", art, str(folder), "--out", str(out)])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "image" and summary["n"] == 3
        import csv as _csv

        with open(summary["csv"]) as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 3
        assert {r["path"].rsplit("/", 1)[-1] for r in rows} == {
            "im0.png", "im1.png", "raw.npy"
        }
        for r in rows:
            assert np.isfinite(float(r["score"]))
            assert r["label"] in ("0", "1")

    def test_patch_mode_heatmaps(self, tiny_checkpoint, fake_mvtec, tmp_path,
                                 capsys):
        from PIL import Image

        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "p.ssadexp"), mode="patch", batch=2,
            patch_dim=16, stride=16, dataset_dir=str(fake_mvtec),
            n_normality_images=2,
        )
        img = tmp_path / "one.png"
        Image.fromarray(
            (np.random.default_rng(1).uniform(size=(64, 64, 3)) * 255
             ).astype(np.uint8)
        ).save(img)
        out = tmp_path / "scored_patch"
        rc = main(["score", "--artifact", art, str(img), "--out", str(out),
                   "--heatmaps"])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "patch" and summary["n"] == 1
        # index-prefixed name: bare stems collide across subfolders
        hm = Image.open(out / "heatmaps" / "00000_one.png")
        assert hm.size == (64, 64)

    def test_npy_geometry_mismatch_fails_loud(self, tiny_checkpoint, tmp_path):
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "img2.ssadexp"), mode="image", batch=2,
        )
        bad = tmp_path / "bad.npy"
        np.save(bad, np.zeros((8, 8, 3), np.float32))
        with pytest.raises(SystemExit, match="must be"):
            main(["score", "--artifact", art, str(bad),
                  "--out", str(tmp_path / "o")])


class TestImageContract:
    """The [0,1] float32 input contract is enforced, not assumed."""

    def test_uint8_npy_is_rescaled(self, image_server):
        buf = io.BytesIO()
        np.save(buf, np.full((8, 8, 3), 255, np.uint8))
        out = _post(image_server.port, "/score", buf.getvalue())
        # _sum_scorer sums the rescaled [0,1] image: 255→1.0 per texel
        assert out["score"] == pytest.approx(8 * 8 * 3)

    def test_out_of_range_float_is_400(self, image_server):
        buf = io.BytesIO()
        np.save(buf, np.full((8, 8, 3), 255.0, np.float32))
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(image_server.port, "/score", buf.getvalue())
        assert exc.value.code == 400
        assert "scale" in exc.value.read().decode()

    def test_integer_npy_other_than_uint8_is_400(self, image_server):
        buf = io.BytesIO()
        np.save(buf, np.zeros((8, 8, 3), np.int32))
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(image_server.port, "/score", buf.getvalue())
        assert exc.value.code == 400

    def test_chunked_body_is_rejected_and_connection_closed(self, image_server):
        """Content-Length-only framing: a chunked body cannot be
        drained, and under keep-alive its bytes would desync the
        socket — reject with 411 and close."""
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", image_server.port,
                                          timeout=30)
        conn.putrequest("POST", "/score")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"5\r\nhello\r\n0\r\n\r\n")
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 411
        assert b"chunked" in body
        assert resp.will_close
        conn.close()

    def test_heatmap_query_is_parsed_not_substring_matched(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def map_scorer(x):
            return (x.mean(axis=-1),)

        sc = BatchingScorer(map_scorer, batch=2, max_delay_ms=5.0)
        srv = AnomalyHTTPServer(sc, {"mode": "patch", "imsize": [8, 8]},
                                port=0).start()
        try:
            buf = io.BytesIO()
            np.save(buf, np.random.default_rng(0).uniform(
                size=(8, 8, 3)).astype(np.float32))
            body = buf.getvalue()
            # "no_heatmap=1" contains the substring "heatmap=1" but
            # must NOT trigger the expensive PNG encode
            out = _post(srv.port, "/score?no_heatmap=1", body)
            assert "heatmap_b64" not in out
            out = _post(srv.port, "/score?heatmap=1", body)
            assert "heatmap_b64" in out
        finally:
            srv.stop()


class TestHTTPFuzz:
    def test_garbage_bodies_never_crash_the_server(self, image_server):
        """Seeded fuzz: random byte soup, truncated npy headers, wrong
        pickles — every request must come back as a JSON 4xx (never a
        5xx, a hang, or a dropped server), and real requests must still
        work afterwards."""
        rng = np.random.default_rng(0)
        bodies = [
            b"",
            b"\x00" * 64,
            rng.bytes(512),
            b"\x93NUMPY" + rng.bytes(64),          # truncated/corrupt npy
            b"\x93NUMPY\x01\x00" + b"\xff" * 32,   # bad header length
            "{'json': 'not an image'}".encode(),
            b"GIF89a" + rng.bytes(32),             # wrong image format
        ]
        for body in bodies:
            req = urllib.request.Request(
                f"http://127.0.0.1:{image_server.port}/score",
                data=body, method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert 400 <= exc.value.code < 500, body[:16]
            assert "error" in json.loads(exc.value.read().decode())
        # the server survived and still scores
        buf = io.BytesIO()
        np.save(buf, np.ones((8, 8, 3), np.float32))
        out = _post(image_server.port, "/score", buf.getvalue())
        assert out["score"] == pytest.approx(8 * 8 * 3)


@pytest.mark.slow
class TestPatchArtifactServed:
    def test_patch_artifact_over_http(self, tiny_checkpoint, fake_mvtec,
                                      tmp_path):
        """A REAL patch-mode artifact (re-embedded normality, fused
        extract→embed→kNN→blur→upsample program) served over the full
        HTTP stack: finite map stats + a decodable heatmap PNG."""
        import base64

        from PIL import Image

        from ssad_tpu.serving.export import export_checkpoint, load_scorer
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "p.ssadexp"), mode="patch", batch=2,
            patch_dim=16, stride=16, dataset_dir=str(fake_mvtec),
            n_normality_images=2,
        )
        scorer = load_scorer(art)
        srv = AnomalyHTTPServer(
            BatchingScorer(scorer, batch=scorer.batch, max_delay_ms=5.0),
            scorer.meta, port=0,
        ).start()
        try:
            img = np.random.default_rng(9).uniform(
                size=(64, 64, 3)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            out = _post(srv.port, "/score?heatmap=1", buf.getvalue())
            assert np.isfinite(out["map_max"]) and np.isfinite(out["map_mean"])
            assert out["map_max"] >= out["map_mean"]
            hm = Image.open(io.BytesIO(base64.b64decode(out["heatmap_b64"])))
            assert hm.size == (64, 64)  # upsampled to the input geometry
        finally:
            srv.stop()


class TestOpenLoop:
    def test_rate_paces_the_offered_load(self, image_server):
        """Open-loop: 30 requests at 100/s must take ≥ ~0.3 s of wall
        clock even though the stub server could absorb them instantly —
        the schedule, not the service rate, sets the pace."""
        from ssad_tpu.serving.loadgen import npy_body, run_load

        report = run_load(
            "127.0.0.1", image_server.port, npy_body((8, 8)),
            concurrency=4, total=30, rate=100.0,
        )
        assert report["ok"] == 30
        assert report["offered_rate"] == 100.0
        assert report["wall_s"] >= 0.28

    def test_slow_server_accrues_queueing_latency(self):
        """Coordinated-omission check: with service time ~40 ms and
        offered rate 100/s (period 10 ms), scheduled arrivals back up —
        measured p95 must far exceed one service time because latency
        counts from the SCHEDULE, not from when a worker got free."""
        import time as _time

        from ssad_tpu.serving.loadgen import npy_body, run_load
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def slow(x):
            _time.sleep(0.04)
            return (x.reshape(x.shape[0], -1).sum(axis=1),
                    np.zeros(x.shape[0], np.int32))

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1)
        srv = AnomalyHTTPServer(sc, {"mode": "image", "imsize": [8, 8]},
                                port=0).start()
        try:
            report = run_load(
                "127.0.0.1", srv.port, npy_body((8, 8)),
                concurrency=1, total=15, rate=100.0,
            )
            assert report["ok"] == 15
            # 15 requests offered over 0.15 s into a ~0.6 s server:
            # the last ones queue ~0.45 s behind schedule
            assert report["latency_ms"]["p95"] > 200.0
        finally:
            srv.stop()


@pytest.mark.slow
class TestEvaluateArtifact:
    def test_image_artifact_metrics(self, tiny_checkpoint, fake_mvtec,
                                    tmp_path, capsys):
        """evaluate-artifact measures the EXPORTED program on labeled
        data: AUROC/F1 plus F1 at the baked threshold — the
        deployment-validation step for quantized artifacts."""
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "img.ssadexp"), mode="image", batch=2,
        )
        rc = main([
            "evaluate-artifact", "--artifact", art,
            "--dataset-dir", str(fake_mvtec), "--chunk", "2",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["subject"] == "bottle" and out["mode"] == "image"
        assert 0.0 <= out["image_auroc"] <= 1.0
        assert 0.0 <= out["f1_at_baked_threshold"] <= 1.0
        assert out["baked_threshold"] == pytest.approx(
            json.loads(json.dumps(out["baked_threshold"]))
        )
        assert out["n_test"] >= 2

    def test_patch_artifact_metrics(self, tiny_checkpoint, fake_mvtec,
                                    tmp_path, capsys):
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import export_checkpoint

        art = export_checkpoint(
            str(tiny_checkpoint / "bottle" / "best_model"),
            str(tmp_path / "p.ssadexp"), mode="patch", batch=2,
            patch_dim=16, stride=16, dataset_dir=str(fake_mvtec),
            n_normality_images=2,
        )
        rc = main([
            "evaluate-artifact", "--artifact", art,
            "--dataset-dir", str(fake_mvtec), "--chunk", "2",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mode"] == "patch"
        assert 0.0 <= out["pixel_auroc"] <= 1.0
        assert np.isfinite(out["aupro"]) and np.isfinite(out["iou"])


@pytest.mark.slow
class TestExportValidate:
    def test_quantized_export_reports_drift(self, tiny_checkpoint, tmp_path,
                                            capsys):
        """--validate on a --dtype export: a float twin of the same
        config is exported, drift + label agreement reported, and the
        twin cleaned up."""
        from ssad_tpu.cli import main

        out = tmp_path / "b_int8.ssadexp"
        rc = main([
            "export", "--models-dir", str(tiny_checkpoint),
            "--subject", "bottle", "--mode", "image", "--batch", "2",
            "--dtype", "int8", "--out", str(out), "--validate",
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        v = summary["validation"]
        assert v["finite"] is True
        assert v["max_abs_score_drift"] < 0.05
        assert v["label_agreement"] == 1.0
        assert not out.with_suffix(".float_ref.ssadexp").exists()


class TestReadyz:
    def test_ready_when_scoring_works(self, image_server):
        assert _get(image_server.port, "/readyz") == {"ready": True}

    def test_503_when_backend_is_broken(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def broken(x):
            raise RuntimeError("backend gone")

        sc = BatchingScorer(broken, batch=1, max_delay_ms=0.1)
        srv = AnomalyHTTPServer(sc, {"mode": "image", "imsize": [8, 8]},
                                port=0, ready_timeout=5.0).start()
        try:
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(srv.port, "/readyz")
            assert exc.value.code == 503
            body = json.loads(exc.value.read().decode())
            assert body["ready"] is False
            assert "backend gone" in str(body["failures"])
        finally:
            srv.stop()


# ---------------------------------------------------------------------------
# Score-drift monitoring (serving/drift.py)
# ---------------------------------------------------------------------------


class TestDrift:
    def test_quantile_summary_roundtrip(self):
        from ssad_tpu.serving.drift import quantile_summary

        rng = np.random.default_rng(0)
        s = quantile_summary(rng.normal(1.0, 0.2, 500))
        assert s["n"] == 500
        assert s["values"] == sorted(s["values"])
        assert s["probs"][0] == 0.0 and s["probs"][-1] == 1.0
        with pytest.raises(ValueError):
            quantile_summary([])

    def test_ks_small_for_same_distribution(self):
        from ssad_tpu.serving.drift import (
            ks_alert_level, ks_statistic, quantile_summary,
        )

        rng = np.random.default_rng(1)
        baseline = quantile_summary(rng.normal(1.0, 0.2, 2000))
        same = rng.normal(1.0, 0.2, 400)
        ks = ks_statistic(same, baseline)
        assert ks < ks_alert_level(len(same), baseline["n"])

    def test_ks_large_for_shifted_distribution(self):
        from ssad_tpu.serving.drift import (
            ks_alert_level, ks_statistic, quantile_summary,
        )

        rng = np.random.default_rng(2)
        baseline = quantile_summary(rng.normal(1.0, 0.2, 2000))
        shifted = rng.normal(1.6, 0.2, 400)  # 3σ mean shift
        ks = ks_statistic(shifted, baseline)
        assert ks > 2 * ks_alert_level(len(shifted), baseline["n"])

    def test_tracker_gates_on_min_scores_and_baseline(self):
        from ssad_tpu.serving.drift import ScoreTracker, quantile_summary

        rng = np.random.default_rng(3)
        baseline = quantile_summary(rng.normal(0.0, 1.0, 1000))
        tr = ScoreTracker(baseline=baseline, min_scores=10)
        for v in rng.normal(0.0, 1.0, 9):
            tr.observe(v)
        st = tr.stats()
        assert st["recent_n"] == 9 and st["drift_ks"] is None
        tr.observe(0.0)
        st = tr.stats()
        assert st["drift_ks"] is not None
        assert st["drift_alert"] is False
        # no baseline → recent stats only, drift stays None forever
        tr2 = ScoreTracker(baseline=None, min_scores=1)
        tr2.observe(1.0)
        st2 = tr2.stats()
        assert st2["recent_p50"] == 1.0 and st2["drift_ks"] is None

    def test_tracker_window_is_bounded(self):
        from ssad_tpu.serving.drift import ScoreTracker

        tr = ScoreTracker(window=16, min_scores=1)
        for v in range(100):
            tr.observe(float(v))
        st = tr.stats()
        assert st["recent_n"] == 16
        assert st["observed_total"] == 100
        assert st["recent_p50"] >= 84.0  # only the newest window remains


class TestHTTPDrift:
    def _server(self, baseline):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        sc = BatchingScorer(_sum_scorer, batch=4, max_delay_ms=2.0)
        meta = {"mode": "image", "imsize": [8, 8], "threshold": 150.0,
                "calibration": baseline}
        return AnomalyHTTPServer(sc, meta, port=0).start()

    def test_drift_alert_fires_on_shifted_scores(self):
        """Calibrated around pixel-sum≈96; all-ones posts score 192 —
        the live stream is totally separated from calibration, so the
        KS must hit ~1 and alert once min_scores requests arrive."""
        from ssad_tpu.serving.drift import quantile_summary

        rng = np.random.default_rng(0)
        baseline = quantile_summary(rng.normal(96.0, 2.0, 500))
        srv = self._server(baseline)
        srv.trackers["default"].min_scores = 8
        try:
            img = np.full((8, 8, 3), 1.0, np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            for _ in range(8):
                _post(srv.port, "/score", buf.getvalue())
            st = _get(srv.port, "/stats")["scores"]
            assert st["recent_n"] == 8
            assert st["drift_ks"] == pytest.approx(1.0)
            assert st["drift_alert"] is True
            metrics = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=30
            ).read().decode()
            assert 'ssad_score_drift_ks{model="default"} 1.0' in metrics
            assert 'ssad_score_drift_alert{model="default"} 1' in metrics
            assert 'ssad_recent_score{model="default",quantile="0.5"}' in metrics
        finally:
            srv.stop()

    def test_no_calibration_still_tracks_scores(self, image_server):
        img = np.full((8, 8, 3), 0.5, np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        _post(image_server.port, "/score", buf.getvalue())
        st = _get(image_server.port, "/stats")["scores"]
        assert st["recent_n"] >= 1
        assert st["drift_ks"] is None
        # /metrics omits the drift families but keeps the score summary
        metrics = urllib.request.urlopen(
            f"http://127.0.0.1:{image_server.port}/metrics", timeout=30
        ).read().decode()
        assert "ssad_score_drift_ks{" not in metrics
        assert 'ssad_recent_score{model="default",quantile="0.5"}' in metrics


# ---------------------------------------------------------------------------
# ServingClient (serving/client.py) + `cli score --url`
# ---------------------------------------------------------------------------


class TestServingClient:
    def _client(self, srv, **kw):
        from ssad_tpu.serving.client import ServingClient

        return ServingClient(f"http://127.0.0.1:{srv.port}", **kw)

    def test_score_array_and_keepalive(self, image_server):
        cl = self._client(image_server)
        img = np.full((8, 8, 3), 1.0, np.float32)
        out = cl.score(img)
        assert out["score"] == pytest.approx(8 * 8 * 3)
        conn = cl._local.conn
        out2 = cl.score(img / 2)
        assert out2["score"] == pytest.approx(8 * 8 * 3 / 2)
        # both requests rode the SAME keep-alive connection
        assert cl._local.conn is conn
        cl.close()
        assert cl._local.conn is None

    def test_uint8_arrays_are_accepted(self, image_server):
        cl = self._client(image_server)
        out = cl.score(np.full((8, 8, 3), 255, np.uint8))
        assert out["score"] == pytest.approx(8 * 8 * 3)

    def test_bad_geometry_maps_to_badrequest(self, image_server):
        from ssad_tpu.serving.client import BadRequest

        cl = self._client(image_server)
        with pytest.raises(BadRequest) as exc:
            cl.score(np.zeros((16, 16, 3), np.float32))
        assert exc.value.status == 400
        assert "(8, 8, 3)" in str(exc.value)

    def test_unknown_model_maps_to_nosuchroute(self, image_server):
        from ssad_tpu.serving.client import NoSuchRoute

        cl = self._client(image_server, model="nope")
        with pytest.raises(NoSuchRoute):
            cl.score(np.zeros((8, 8, 3), np.float32))

    def test_introspection_surface(self, image_server):
        cl = self._client(image_server)
        assert cl.healthz()["ok"] is True
        assert cl.readyz()["ready"] is True
        cl.score(np.full((8, 8, 3), 0.25, np.float32))
        st = cl.stats()
        assert st["requests"] >= 1 and "scores" in st
        assert "ssad_requests_total" in cl.metrics()

    def test_score_file_posts_raw_bytes(self, image_server, tmp_path):
        from PIL import Image

        arr = np.full((16, 16, 3), 255, np.uint8)  # resized server-side
        p = tmp_path / "shot.png"
        Image.fromarray(arr).save(p)
        cl = self._client(image_server)
        out = cl.score_file(p)
        assert out["score"] == pytest.approx(8 * 8 * 3, rel=1e-3)

    def test_heatmap_is_decoded_to_array(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def map_scorer(x):
            return (x.mean(axis=-1),)

        sc = BatchingScorer(map_scorer, batch=2, max_delay_ms=5.0)
        srv = AnomalyHTTPServer(sc, {"mode": "patch", "imsize": [8, 8]},
                                port=0).start()
        try:
            cl = self._client(srv)
            out = cl.score(np.random.default_rng(0)
                           .uniform(size=(8, 8, 3)).astype(np.float32),
                           heatmap=True)
            assert "heatmap_b64" not in out
            assert out["heatmap"].shape == (8, 8)
            assert out["heatmap"].dtype == np.uint8
        finally:
            srv.stop()

    def test_overloaded_retry_drains(self):
        """retries>0 re-submits shed requests with backoff: a burst
        that overflows a max_queue=1 server still fully completes."""
        import threading
        import time as _time

        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def slow(x):
            _time.sleep(0.15)
            s = x.reshape(x.shape[0], -1).sum(axis=1)
            return s, (s > 100).astype(np.int32)

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1, max_queue=1)
        srv = AnomalyHTTPServer(sc, {"mode": "image", "imsize": [8, 8]},
                                port=0).start()
        try:
            cl = self._client(srv, retries=8, backoff_s=0.05)
            results = []

            def hit():
                results.append(
                    cl.score(np.full((8, 8, 3), 1.0, np.float32))["score"]
                )

            threads = [threading.Thread(target=hit) for _ in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(results) == 4
            assert all(r == pytest.approx(8 * 8 * 3) for r in results)
        finally:
            srv.stop()

    def test_readyz_returns_state_without_raising(self):
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def broken(x):
            raise RuntimeError("backend gone")

        sc = BatchingScorer(broken, batch=1, max_delay_ms=0.1)
        srv = AnomalyHTTPServer(sc, {"mode": "image", "imsize": [8, 8]},
                                port=0, ready_timeout=5.0).start()
        try:
            out = self._client(srv).readyz()
            assert out["ready"] is False and "backend gone" in str(out["failures"])
        finally:
            srv.stop()


class TestCliScoreRemote:
    def test_folder_sweep_against_running_server(self, image_server,
                                                 tmp_path, capsys):
        """Thin-client mode: good files score, a bad-geometry npy lands
        in errors.csv, and the sweep finishes."""
        import csv

        from PIL import Image

        from ssad_tpu.cli import main

        folder = tmp_path / "shots"
        folder.mkdir()
        Image.fromarray(np.full((16, 16, 3), 255, np.uint8)).save(
            folder / "a.png"
        )
        np.save(folder / "b.npy", np.full((8, 8, 3), 0.5, np.float32))
        np.save(folder / "zz_bad.npy", np.zeros((4, 4, 3), np.float32))

        out_dir = tmp_path / "scored"
        rc = main([
            "score", "--url", f"http://127.0.0.1:{image_server.port}",
            str(folder), "--out", str(out_dir),
        ])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["n"] == 2 and summary["n_errors"] == 1
        rows = list(csv.reader(open(out_dir / "scores.csv")))
        assert rows[0] == ["path", "score", "label"]
        assert len(rows) == 3
        errs = list(csv.reader(open(out_dir / "errors.csv")))
        assert errs[1][0].endswith("zz_bad.npy") and errs[1][1] == "400"

    def test_requires_exactly_one_source(self, tmp_path):
        from ssad_tpu.cli import main

        with pytest.raises(SystemExit, match="exactly one"):
            main(["score", str(tmp_path), "--out", str(tmp_path / "o")])


# ---------------------------------------------------------------------------
# Reload-race hardening (review findings: torn snapshots, wedged close,
# timeout re-submission)
# ---------------------------------------------------------------------------


class TestReloadRaceHardening:
    def test_close_with_wedged_collector_leaves_sentinel(self):
        """close() while the collector is stuck inside a long scorer
        call (tunneled-TPU stall) must NOT drain the queue — that could
        eat the shutdown sentinel and strand the collector (and leak
        its replicas) forever.  The collector finishes shutdown itself
        once it unblocks."""
        from ssad_tpu.serving.server import BatchingScorer, _Request

        gate = threading.Event()

        def stuck(x):
            gate.wait(timeout=30)
            return (x.reshape(x.shape[0], -1).sum(axis=1),)

        sc = BatchingScorer(stuck, batch=1, max_delay_ms=1.0)
        sc._join_s = 0.2
        try:
            pending = sc.submit(np.zeros((2, 2, 3), np.float32))
            time.sleep(0.1)  # let the collector enter the scorer call
            sc.close()  # join times out; collector still wedged
            assert sc._thread.is_alive()
            # a request that raced past submit()'s closed check sits
            # behind the sentinel; the collector must cancel it later
            straggler = _Request(np.zeros((2, 2, 3), np.float32))
            sc._queue.put(straggler)
        finally:
            gate.set()
        sc._thread.join(timeout=10)
        assert not sc._thread.is_alive()  # sentinel was NOT consumed
        assert pending.event.wait(5) and pending.error is None
        assert straggler.event.wait(5)
        assert isinstance(straggler.error, RuntimeError)

    def test_build_stats_tolerates_torn_tracker_snapshot(self):
        """/admin/reload swaps `models` and `trackers` as two separate
        assignments; a reader that catches the torn state (new models,
        old trackers) must degrade to empty score stats, not KeyError —
        on the native front end that exception would kill the sole
        poller thread."""
        from ssad_tpu.serving.server import (
            BatchingScorer, _prometheus_metrics, build_stats,
        )

        sc = BatchingScorer(_sum_scorer, batch=2, max_delay_ms=1.0)
        try:
            models = {"renamed": (sc, {"mode": "image", "imsize": [8, 8]})}
            stale_trackers = {}  # tracker for "renamed" not swapped in yet
            stats = build_stats(models, stale_trackers)
            assert stats["scores"] == {}
            text = _prometheus_metrics(models, stale_trackers)
            assert 'ssad_requests_total{model="renamed"}' in text
            # multi-model shape too
            stats = build_stats(
                {**models, "other": models["renamed"]}, stale_trackers
            )
            assert stats["renamed"]["scores"] == {}
        finally:
            sc.close()

    def test_scoring_with_missing_tracker_still_200(self):
        """A /score that resolves its model from one generation and the
        tracker dict from the next must still answer 200 — only the
        drift observation is dropped."""
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        sc = BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0)
        srv = AnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8], "threshold": 100.0},
            port=0,
        ).start()
        try:
            srv.trackers = {}  # simulate the torn mid-reload window
            buf = io.BytesIO()
            np.save(buf, np.full((8, 8, 3), 0.5, np.float32))
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/score", data=buf.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 200
                assert "score" in json.loads(r.read().decode())
        finally:
            srv.stop()

    def test_client_timeout_is_not_resubmitted(self):
        """A POST that times out client-side may have reached the
        server — the transparent-reconnect retry must NOT re-send it
        (double-scoring, drift double-counts; for /admin/reload a
        spurious 409 against the caller's own reload)."""
        from ssad_tpu.serving.client import ServingClient
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer

        def slow(x):
            time.sleep(1.0)
            return (x.reshape(x.shape[0], -1).sum(axis=1),
                    np.zeros(x.shape[0], np.int32))

        sc = BatchingScorer(slow, batch=1, max_delay_ms=1.0)
        srv = AnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [4, 4], "threshold": 1.0},
            port=0,
        ).start()
        try:
            client = ServingClient(
                f"http://127.0.0.1:{srv.port}", timeout=0.25, retries=3
            )
            with pytest.raises(TimeoutError):
                client.score(np.zeros((4, 4, 3), np.float32))
            time.sleep(1.5)  # let any (wrong) re-submission get scored
            assert sc.stats()["requests"] == 1
        finally:
            srv.stop()
