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


@pytest.mark.slow
class TestCliExport:
    def test_export_then_serve_roundtrip(self, tiny_engine, tmp_path, capsys):
        import jax.numpy as jnp

        from ssad_tpu import config
        from ssad_tpu.cli import main
        from ssad_tpu.serving.export import load_scorer
        from ssad_tpu.serving.server import AnomalyHTTPServer, BatchingScorer
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
        models = tmp_path / "models"
        ckpt_mod.save_checkpoint(
            models / "bottle", engine.params, engine.batch_stats, bank, cfg
        )

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
