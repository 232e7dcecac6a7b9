"""Data-parallel inference (parallel/infer_parallel.py): the sharded
engine must reproduce the single-device engine's numbers exactly — the
program contains no collectives, each shard scores its local slice —
including when the batch doesn't divide the mesh (padding path).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_engine():
    import jax

    from ssad_tpu.config import ModelConfig
    from ssad_tpu.evaluation.inference import InferenceEngine
    from ssad_tpu.models.peranet import build_model, init_model

    model = build_model(ModelConfig(compute_dtype="float32"))
    params, stats = init_model(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
    return InferenceEngine(model, params, stats)


@pytest.fixture(scope="module")
def sharded(tiny_engine):
    from ssad_tpu.parallel.infer_parallel import maybe_shard_engine

    return maybe_shard_engine(tiny_engine, 4)


def _images(n, rng_seed=0, size=64):
    return np.random.default_rng(rng_seed).uniform(
        size=(n, size, size, 3)
    ).astype(np.float32)


class TestShardedEngine:
    def test_forward_matches_single_device(self, tiny_engine, sharded):
        x = _images(8)
        logits_1, emb_1 = tiny_engine.predict_batch(x)
        logits_n, emb_n = sharded.predict_batch(x)
        np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(emb_n), np.asarray(emb_1),
                                   rtol=1e-5, atol=1e-5)

    def test_indivisible_batch_is_padded_and_trimmed(self, tiny_engine, sharded):
        x = _images(6, rng_seed=1)  # 6 % 4 != 0
        logits_1, _ = tiny_engine.predict_batch(x)
        logits_n, emb_n = sharded.predict_batch(x)
        assert logits_n.shape[0] == 6 and emb_n.shape[0] == 6
        np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1),
                                   rtol=1e-5, atol=1e-5)

    def test_patch_forward_matches(self, tiny_engine, sharded):
        x = _images(4, rng_seed=2)
        logits_1, emb_1, n_1 = tiny_engine.predict_patches(x, dim=32, stride=32)
        logits_n, emb_n, n_n = sharded.predict_patches(x, dim=32, stride=32)
        assert n_1 == n_n
        np.testing.assert_allclose(np.asarray(emb_n), np.asarray(emb_1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logits_n), np.asarray(logits_1),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_patch_scoring_matches(self, tiny_engine, sharded):
        x = _images(4, rng_seed=3)
        bank = np.random.default_rng(9).normal(size=(64, 512)).astype(np.float32)
        maps_1 = tiny_engine.score_patch_maps(x, bank, dim=32, stride=32,
                                              k=3, upsample_to=64)
        maps_n = sharded.score_patch_maps(x, bank, dim=32, stride=32,
                                          k=3, upsample_to=64)
        assert maps_n.shape == (4, 64, 64)
        np.testing.assert_allclose(np.asarray(maps_n), np.asarray(maps_1),
                                   rtol=1e-5, atol=1e-5)

    def test_mahalanobis_scoring_matches(self, tiny_engine, sharded):
        import jax

        from ssad_tpu.models.detector import MahalanobisDetector

        x = _images(4, rng_seed=4)
        rows = np.random.default_rng(5).normal(size=(80, 512)).astype(np.float32)
        det = MahalanobisDetector().fit(rows, jax.random.key(0))
        maps_1 = tiny_engine.score_patch_maps_mahalanobis(
            x, det.mean, det.precision, dim=32, stride=32, upsample_to=None
        )
        maps_n = sharded.score_patch_maps_mahalanobis(
            x, det.mean, det.precision, dim=32, stride=32, upsample_to=None
        )
        np.testing.assert_allclose(np.asarray(maps_n), np.asarray(maps_1),
                                   rtol=1e-5, atol=1e-5)

    def test_actually_sharded(self, sharded):
        """The compiled forward really distributes the batch: each
        device holds a (B/n, ...) shard of the output, not a replica."""
        x = _images(8, rng_seed=6)
        logits, _ = sharded.predict_batch(x)
        shards = logits.addressable_shards
        assert len(shards) >= 4
        data_shards = [s for s in shards if s.data.shape[0] == 8 // 4]
        assert len(data_shards) == 4

    def test_driver_functions_accept_sharded_engine(self, sharded, tiny_engine):
        """predict_mvtec works unchanged when handed the sharded engine
        (duck-typed interface)."""
        from ssad_tpu.data.mvtec import MVTecTestData
        from ssad_tpu.evaluation.inference import predict_mvtec

        images = _images(5, rng_seed=7)
        gts = np.zeros((5, 64, 64), np.uint8)
        gts[3:, 20:30, 20:30] = 1
        data = MVTecTestData(
            subject="bottle", imsize=(64, 64), images=images,
            ground_truths=gts, labels=(gts.max(axis=(1, 2)) > 0).astype(np.int32),
            filenames=[f"img{i}.png" for i in range(5)],
        )
        out_1 = predict_mvtec(tiny_engine, data, batch_size=4)
        out_n = predict_mvtec(sharded, data, batch_size=4)
        np.testing.assert_allclose(
            np.asarray(out_n.embeddings), np.asarray(out_1.embeddings),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out_n.y_hat), np.asarray(out_1.y_hat)
        )

    def test_maybe_shard_engine_passthrough_and_validation(self, tiny_engine):
        from ssad_tpu.parallel.infer_parallel import maybe_shard_engine

        assert maybe_shard_engine(tiny_engine, None) is tiny_engine
        assert maybe_shard_engine(tiny_engine, 1) is tiny_engine
        with pytest.raises(ValueError, match="exceeds"):
            maybe_shard_engine(tiny_engine, 1024)
