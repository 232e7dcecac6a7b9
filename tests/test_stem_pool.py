"""Fused stem+BN+ReLU+maxpool (ops/stem_pool.py) equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu.config import ModelConfig
from ssad_tpu.models.peranet import build_model, init_model
from ssad_tpu.ops import stem_pool as sp


class TestMaxpoolHelper:
    def test_matches_reduce_window(self, rng):
        """The reshape-based 3×3/s2/p1 maxpool (no strided slices — the
        Mosaic constraint) must equal lax.reduce_window on post-ReLU
        (non-negative) inputs."""
        y = jnp.asarray(
            np.maximum(rng.standard_normal((3, 32, 32, 8)), 0.0).astype(np.float32)
        )
        ref = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        np.testing.assert_allclose(np.asarray(sp._maxpool3s2(y)), np.asarray(ref))


class TestStemPoolXla:
    def test_matches_model_stem(self, rng):
        """stem_pool_xla(folded kernel, BN affine) must equal the model's
        folded-stem path (StemConv fold_2x → bn1 → relu → maxpool) to
        f32 tolerance — same math, different fusion."""
        model = build_model(ModelConfig(compute_dtype="float32"))
        params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
        # make BN stats non-trivial so the affine actually matters
        stats = dict(stats)
        bb = dict(stats["backbone"])
        bn1 = dict(bb["bn1"])
        bn1["mean"] = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * 0.1
        bn1["var"] = jnp.asarray(rng.random(64).astype(np.float32)) + 0.5
        bb["bn1"] = bn1
        stats["backbone"] = bb
        variables = {"params": params, "batch_stats": stats}

        x = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))

        # unfused: run the model's stem (backbone_features on 32² inputs
        # takes the fold_2x path) and grab the post-maxpool input by
        # re-deriving it — cleanest is comparing the FULL model outputs:
        # fused-stem forward via from_stem vs the plain forward
        k4 = sp.fold_stem_kernel(params["backbone"]["conv1"]["kernel"])
        scale, bias = sp.bn_affine(
            params["backbone"]["bn1"]["scale"], params["backbone"]["bn1"]["bias"],
            bn1["mean"], bn1["var"],
        )
        x_stem = sp.stem_pool_xla(x, k4, scale, bias)
        out_fused = model.apply(variables, x_stem, train=False, method=type(model).from_stem)
        out_plain = model.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_fused["latent_space"]),
            np.asarray(out_plain["latent_space"]), rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_fused["classifier"]),
            np.asarray(out_plain["classifier"]), rtol=1e-4, atol=1e-4,
        )


class TestStemPoolS2d:
    def test_matches_xla_oracle(self, rng):
        """The output-parity conv + shifted-max pool must equal the
        im2col oracle: f32 within matmul reassociation tolerance, bf16
        within ONE ulp on a vanishing fraction of elements.  Both paths
        accumulate the same 48 taps in f32 and round to bf16 once (the
        parity kernel's extra taps are structural zeros; rounding before
        the max commutes) — but f32 addition isn't associative, so a
        different emitter's summation tree can flip the last bf16 bit
        when the exact sum lands near a rounding boundary.  On the TPU
        implicit-GEMM emitter the two were observed bit-exact; CPU's
        conv emitter produces ~3/81920 one-ulp flips, which is what this
        tolerance encodes."""
        x = jnp.asarray(rng.random((5, 32, 32, 3), dtype=np.float32))
        k4 = jnp.asarray(rng.standard_normal((4, 4, 3, 64)).astype(np.float32)) * 0.1
        scale = jnp.asarray(rng.random(64, dtype=np.float32)) + 0.5
        bias = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * 0.1
        ref = sp.stem_pool_xla(x, k4, scale, bias)
        out = sp.stem_pool_s2d(sp.s2d_image(x), k4, scale, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

        xb = x.astype(jnp.bfloat16)
        k4b = k4.astype(jnp.bfloat16)
        refb = np.asarray(sp.stem_pool_xla(xb, k4b, scale, bias), np.float32)
        outb = np.asarray(
            sp.stem_pool_s2d(sp.s2d_image(xb), k4b, scale, bias), np.float32
        )
        # ≤ 1 bf16 ulp (eps = 2^-7) relative, and near-exact overall.
        # The tiny atol covers the zero-reference corner of the same
        # reassociation class: a pre-ReLU sum near 0 can land on
        # opposite signs in the two paths, making one side exactly 0.0
        # (infinite relative error at ~1e-7 absolute).
        np.testing.assert_allclose(outb, refb, rtol=2.0 ** -7, atol=1e-6)
        mismatch = np.count_nonzero(outb != refb) / outb.size
        assert mismatch < 1e-3, f"too many last-bit flips: {mismatch:.2e}"

    def test_engine_s2d_route_matches_default(self, rng):
        """The opt-in s2d_stem engine route must score identically to
        the default path (f32 tolerance) — extraction, stem, backbone
        resume, k-NN and map assembly all swap representation."""
        from ssad_tpu.evaluation.inference import InferenceEngine
        from ssad_tpu.models.detector import AnomalyDetector

        model = build_model(ModelConfig(compute_dtype="float32"))
        params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
        bank = jnp.asarray(rng.random((64, 512), dtype=np.float32))
        det = AnomalyDetector(k=3).fit(bank, jax.random.key(0))
        x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))

        s2d = InferenceEngine(model, params, stats, s2d_stem=True)
        plain = InferenceEngine(model, params, stats, fused_stem=False)
        m_s2d = np.asarray(s2d.score_patch_maps(x, det.bank, dim=32, stride=8, k=3))
        m_plain = np.asarray(plain.score_patch_maps(x, det.bank, dim=32, stride=8, k=3))
        np.testing.assert_allclose(m_s2d, m_plain, rtol=5e-3, atol=1e-4)

    def test_extraction_commutes_with_s2d(self, rng):
        """Extracting (16, 16, 12) patches at stride s/2 from the s2d
        image must equal s2d-ing each (32, 32, 3) patch extracted at
        stride s — same grid, same inverse permutation — so the engine's
        s2d route scores the identical window set."""
        from ssad_tpu.ops import patches as P

        img = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
        p1, inv1 = P.extract_patches_shuffled(img, 32, 8)
        ps, inv2 = P.extract_patches_shuffled(sp.s2d_image(img), 16, 4)
        assert np.array_equal(np.asarray(inv1), np.asarray(inv2))
        b, n = p1.shape[0], p1.shape[1]
        p1s = sp.s2d_image(p1.reshape((b * n,) + p1.shape[2:])).reshape(
            b, n, 16, 16, 12
        )
        assert np.array_equal(np.asarray(p1s), np.asarray(ps))


class TestStemPoolPallas:
    def test_interpret_matches_xla(self, rng):
        """The parity-plane Mosaic kernel (interpreted) must reproduce
        the XLA oracle bit-for-bit up to f32 matmul tolerance — incl. a
        non-multiple-of-tile batch exercising the pad path."""
        x = jnp.asarray(rng.random((9, 32, 32, 3), dtype=np.float32))
        k4 = jnp.asarray(rng.standard_normal((4, 4, 3, 64)).astype(np.float32)) * 0.1
        scale = jnp.asarray(rng.random(64, dtype=np.float32)) + 0.5
        bias = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * 0.1
        ref = sp.stem_pool_xla(x, k4, scale, bias)
        out = sp.stem_pool_pallas(x, k4, scale, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestEngineFusedStem:
    def test_fused_engine_matches_unfused(self, rng):
        """score_patch_maps with the fused stem equals the unfused
        engine (f32 model; the CPU dispatch exercises the XLA variant of
        the fused path)."""
        from ssad_tpu.evaluation.inference import InferenceEngine
        from ssad_tpu.models.detector import AnomalyDetector

        model = build_model(ModelConfig(compute_dtype="float32"))
        params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
        bank = jnp.asarray(rng.random((64, 512), dtype=np.float32))
        det = AnomalyDetector(k=3).fit(bank, jax.random.key(0))
        x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))

        fused = InferenceEngine(model, params, stats, fused_stem=True)
        plain = InferenceEngine(model, params, stats, fused_stem=False)
        m_fused = np.asarray(
            fused.score_patch_maps(x, det.bank, dim=32, stride=8, k=3)
        )
        m_plain = np.asarray(
            plain.score_patch_maps(x, det.bank, dim=32, stride=8, k=3)
        )
        assert m_fused.shape == m_plain.shape
        # tolerance: both paths are f32, but the im2col matmul sums the
        # 48 stem taps in a different order than the conv, and ~5e-5
        # stem-output deltas grow to ~5e-4 through 18 residual layers
        np.testing.assert_allclose(m_fused, m_plain, rtol=5e-3, atol=1e-4)

        # embeddings path (normality) too
        _, e_fused, _ = fused.predict_patches(x, 32, 8)
        _, e_plain, _ = plain.predict_patches(x, 32, 8)
        np.testing.assert_allclose(
            np.asarray(e_fused), np.asarray(e_plain), rtol=5e-3, atol=1e-3
        )
