"""Tests for ops/: image primitives, rasterization, patches, k-NN.

Where a host-side oracle exists (PIL, torch.unfold, sklearn, scipy) the
on-device op is validated against it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu.ops import image as im
from ssad_tpu.ops import knn, patches, rasterize


class TestImageOps:
    def test_normalize_roundtrip(self, rng):
        x = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        y = im.denormalize_imagenet(im.normalize_imagenet(x))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_gaussian_blur_matches_torchvision_semantics(self, rng):
        # oracle: scipy separable gaussian with reflect(101) boundaries
        from scipy.ndimage import correlate1d

        x = rng.random((32, 32), dtype=np.float32)
        sigma = im.torchvision_default_sigma(7)
        k = np.asarray(im._gaussian_kernel1d(7, sigma))
        ref = correlate1d(x, k, axis=0, mode="mirror")
        ref = correlate1d(ref, k, axis=1, mode="mirror")
        out = im.gaussian_blur(jnp.asarray(x), ksize=7)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_blur_shapes(self, rng):
        x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
        assert im.gaussian_blur(x, 7).shape == x.shape
        assert im.gaussian_blur(x[0], 7).shape == x[0].shape

    def test_color_jitter_zero_is_identity(self, rng):
        x = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32)) * 0.5
        y = im.color_jitter(jax.random.key(0), x, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_color_jitter_bounded(self, rng):
        x = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
        for s in range(5):
            y = im.color_jitter(jax.random.key(s), x, 0.1, 0.1, 0.1)
            assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
            assert not np.allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_affine_identity(self, rng):
        x = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        y = im.affine_nearest(x, jnp.float32(0.0), jnp.float32(1.0))
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_affine_scale_shrinks_content(self):
        x = jnp.zeros((33, 33, 1)).at[16, 16, 0].set(1.0)
        # scale > 1 zooms in; the center pixel remains near the center
        y = im.affine_nearest(x, jnp.float32(0.0), jnp.float32(1.1))
        cy, cx = np.unravel_index(np.argmax(np.asarray(y)[..., 0]), (33, 33))
        assert abs(cy - 16) <= 1 and abs(cx - 16) <= 1

    def test_upsample_anomaly_maps(self, rng):
        m = jnp.asarray(rng.random((2, 9, 9), dtype=np.float32))
        out = im.upsample_anomaly_maps(m, 64)
        assert out.shape == (2, 64, 64)
        assert float(jnp.min(out)) >= 0.0

    @pytest.mark.parametrize(
        "s,target",
        # includes s < ksize (2, 3): the reflect fold wraps more than
        # once there — the regression the small-grid CLI tests caught
        [(2, 16), (3, 32), (9, 64), (29, 256), (33, 256)],
    )
    def test_fused_upsample_matches_staged(self, rng, s, target):
        """The blur⊗upsample composite (two matmuls against a
        precomputed operator) must equal the staged conv→ReLU→resize
        pipeline to f32 roundoff on non-negative maps — the only kind
        the product produces (k-NN / Mahalanobis distances ≥ 0)."""
        m = jnp.asarray(rng.random((3, s, s), dtype=np.float32))
        staged = np.asarray(im.upsample_anomaly_maps_staged(m, target))
        fused = np.asarray(im.upsample_anomaly_maps_fused(m, target))
        np.testing.assert_allclose(fused, staged, rtol=1e-5, atol=2e-6)

    def test_fused_upsample_operator_rows_sum_to_one(self):
        """Blur and bilinear resize both preserve constants, so every
        row of the composed operator sums to 1 — catches reflect-index
        or resize-weight mistakes structurally."""
        op = im._blur_upsample_matrix(29, 256)
        np.testing.assert_allclose(op.sum(axis=1), 1.0, atol=1e-5)

    def test_color_cosine_similarity(self):
        a = jnp.array([0.5, 0.5, 0.5])
        assert float(im.color_cosine_similarity(a, a * 2)) == pytest.approx(1.0, abs=1e-6)
        b = jnp.array([1.0, 0.0, 0.0])
        c = jnp.array([0.0, 1.0, 0.0])
        assert float(im.color_cosine_similarity(b, c)) == pytest.approx(0.0, abs=1e-6)


class TestRasterize:
    def test_polygon_matches_pil(self, rng):
        from PIL import Image, ImageDraw

        h = w = 48
        for seed in range(4):
            r = np.random.default_rng(seed)
            # polygon points on the border of a 30x20 rect at offset (9, 14)
            ox, oy, pw, ph = 9, 14, 30, 20
            pts = [
                (ox + 0, oy + r.integers(1, ph)),
                (ox + r.integers(1, pw), oy + 0),
                (ox + pw, oy + r.integers(1, ph)),
                (ox + r.integers(1, pw), oy + ph),
            ]
            pil = Image.new("1", (w, h), 0)
            ImageDraw.Draw(pil).polygon(pts, fill=1)
            ref = np.asarray(pil, dtype=np.float32)

            verts = np.zeros((8, 2), np.float32)
            verts[:4] = np.asarray(pts, np.float32)
            out = np.asarray(
                rasterize.polygon_mask(jnp.asarray(verts), jnp.int32(4), (h, w))
            )
            inter = np.sum((out > 0) & (ref > 0))
            union = np.sum((out > 0) | (ref > 0))
            assert inter / union > 0.85, f"seed {seed}: IoU {inter/union}"

    def test_polygon_vertex_padding(self):
        # a triangle defined with num_vertices=3 out of MAX=8 slots
        verts = np.zeros((8, 2), np.float32)
        verts[:3] = [[4, 4], [28, 4], [16, 28]]
        out = np.asarray(rasterize.polygon_mask(jnp.asarray(verts), jnp.int32(3), (32, 32)))
        area = out.sum()
        assert 200 < area < 360  # true area = 0.5*24*24 = 288

    def test_polyline_width(self):
        pts = np.zeros((8, 2), np.float32)
        pts[:2] = [[4, 16], [28, 16]]
        m = np.asarray(rasterize.polyline_mask(jnp.asarray(pts), jnp.int32(2), 3.0, (32, 32)))
        col = m[:, 16]
        assert col.sum() == 3  # rows 15,16,17
        assert m[16, 10] == 1 and m[16, 2] == 0

    def test_polyline_inactive_segments(self):
        pts = np.zeros((8, 2), np.float32)
        pts[:2] = [[4, 4], [8, 4]]
        pts[2:] = [[30, 30]] * 6  # would draw elsewhere if active
        m = np.asarray(rasterize.polyline_mask(jnp.asarray(pts), jnp.int32(2), 1.0, (32, 32)))
        assert m[30, 30] == 0 and m[4, 6] == 1

    def test_rotated_rect(self):
        m0 = np.asarray(
            rasterize.rotated_rect_mask(
                jnp.array([16.0, 16.0]), jnp.float32(10), jnp.float32(6), jnp.float32(0.0), (32, 32)
            )
        )
        # axis-aligned 10x6 rect (closed bounds → 11x7 pixels)
        assert 60 <= m0.sum() <= 80
        m45 = np.asarray(
            rasterize.rotated_rect_mask(
                jnp.array([16.0, 16.0]), jnp.float32(10), jnp.float32(6), jnp.float32(45.0), (32, 32)
            )
        )
        assert 50 <= m45.sum() <= 90  # area preserved under rotation

    def test_savgol_matches_scipy(self, rng):
        from scipy.signal import savgol_filter

        pts = rng.random((60, 2)).astype(np.float32) * 100
        ref = savgol_filter(pts, 10, 2, axis=0)
        out = np.asarray(rasterize.smooth_polyline(jnp.asarray(pts)))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-2)


class TestPatches:
    def test_matches_torch_unfold(self, rng):
        import torch

        x = rng.random((2, 24, 24, 3), dtype=np.float32)
        ours = np.asarray(patches.extract_patches(jnp.asarray(x), dim=8, stride=4))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        p = xt.unfold(2, 8, 4).unfold(3, 8, 4)
        p = p.reshape(2, 3, -1, 8, 8).permute(0, 2, 3, 4, 1)  # (B,P,h,w,C)
        np.testing.assert_allclose(ours, p.numpy(), atol=1e-6)

    def test_grid_side(self):
        assert patches.grid_side(256, 32, 8) == 29  # 841 patches
        assert patches.grid_side(256, 32, 4) == 57  # 3249 patches


class TestKnn:
    def test_matches_sklearn(self, rng):
        from sklearn.neighbors import NearestNeighbors

        bank = rng.random((200, 64), dtype=np.float32)
        q = rng.random((50, 64), dtype=np.float32)
        nbrs = NearestNeighbors(n_neighbors=3, metric="cosine").fit(bank)
        ref = nbrs.kneighbors(q)[0].mean(axis=1)
        out = np.asarray(knn.knn_cosine_scores_xla(jnp.asarray(q), jnp.asarray(bank), k=3))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_pallas_interpret_matches_xla(self, rng):
        # run the pallas kernel in interpreter mode on CPU
        from jax.experimental.pallas import tpu as pltpu

        bank = jnp.asarray(rng.random((100, 32), dtype=np.float32))
        q = jnp.asarray(rng.random((40, 32), dtype=np.float32))
        ref = knn.knn_cosine_scores_xla(q, bank, k=3)
        with pltpu.force_tpu_interpret_mode():
            out = knn.knn_cosine_scores_pallas(q, bank, k=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_counts_duplicate_bank_rows_like_topk(self, rng):
        """The bank legitimately holds bit-identical duplicate rows (the
        same image sampled twice in a batch inserts twice); top-k
        semantics count each duplicate separately.  The kernel's
        max-elimination pass must remove ONE tied occurrence per pass,
        not all of them — masking all ties substitutes the (k+1)-th
        neighbor and inflates normal samples' anomaly scores."""
        from jax.experimental.pallas import tpu as pltpu

        base = rng.random((20, 32)).astype(np.float32)
        bank = jnp.asarray(np.concatenate([base, base[:5]]))  # 5 dups
        q = jnp.asarray(base[:8] + 1e-3 * rng.standard_normal((8, 32)).astype(np.float32))
        ref = knn.knn_cosine_scores_xla(q, bank, k=3)
        with pltpu.force_tpu_interpret_mode():
            out = knn.knn_cosine_scores_pallas(q, bank, k=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_exact_neighbor(self):
        bank = jnp.eye(8, dtype=jnp.float32)
        q = bank[:2]
        scores = np.asarray(knn.knn_cosine_scores_xla(q, bank, k=1))
        np.testing.assert_allclose(scores, 0.0, atol=1e-6)

    def test_force_pallas_is_loud(self, rng, monkeypatch):
        """SSAD_FORCE_PALLAS=1 must surface kernel failures instead of
        silently degrading to XLA (the TPU-pallas kernel cannot lower on
        the CPU backend, so the dispatch must raise here).  The env var
        is read once at module import (per-call reads would be baked
        into jitted callers at trace time), so the test flips the
        module-level flag it feeds."""
        bank = jnp.asarray(rng.random((16, 8), dtype=np.float32))
        q = jnp.asarray(rng.random((4, 8), dtype=np.float32))
        monkeypatch.setattr(knn, "_FORCE_PALLAS", True)
        with pytest.raises(Exception):
            knn.knn_cosine_scores(q, bank, k=3)
        monkeypatch.setattr(knn, "_FORCE_PALLAS", False)
        out = np.asarray(knn.knn_cosine_scores(q, bank, k=3))
        ref = np.asarray(knn.knn_cosine_scores_xla(q, bank, k=3))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_tiled_interpret_matches_xla(self, rng):
        """The streaming-bank kernel must match lax.top_k on a bank that
        spans several 1024-row tiles, including a ragged final tile
        whose padding columns must be masked out."""
        from jax.experimental.pallas import tpu as pltpu

        bank = jnp.asarray(rng.random((2500, 32), dtype=np.float32))
        q = jnp.asarray(rng.random((40, 32), dtype=np.float32))
        ref = knn.knn_cosine_scores_xla(q, bank, k=3)
        with pltpu.force_tpu_interpret_mode():
            out = knn.knn_cosine_scores_pallas_tiled(q, bank, k=3)
        # bf16x3 sims (not HIGHEST): documented fidelity is ~1e-5 absolute
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_tiled_counts_duplicates_across_tiles(self, rng):
        """Duplicate bank rows landing in DIFFERENT bank tiles must each
        count toward the top-k (the per-lane streaming insert sees every
        candidate individually, so duplicates survive to the final
        cross-lane reduction like they do under lax.top_k/sklearn)."""
        from jax.experimental.pallas import tpu as pltpu

        base = rng.random((1500, 32)).astype(np.float32)
        bank_np = np.concatenate([base, base[:200]])  # dups in tile 0 and 1
        q = jnp.asarray(
            base[:16] + 1e-3 * rng.standard_normal((16, 32)).astype(np.float32)
        )
        bank = jnp.asarray(bank_np)
        ref = knn.knn_cosine_scores_xla(q, bank, k=3)
        with pltpu.force_tpu_interpret_mode():
            out = knn.knn_cosine_scores_pallas_tiled(q, bank, k=3)
        # bf16x3 sims (not HIGHEST): documented fidelity is ~1e-5 absolute
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_bank_size_picks_kernel(self, rng, monkeypatch):
        """Dispatch is size-aware: banks beyond the resident kernel's
        VMEM envelope take the streaming-tiled kernel on TPU (they used
        to fall back to XLA — a 35k-row bank would overflow VMEM in the
        resident kernel at Mosaic compile time, inside the outer jitted
        scoring program where the dispatch's try/except cannot catch
        it), banks within it stay on the resident kernel."""
        def resident_sentinel(*a, **kw):
            raise AssertionError("resident kernel")

        def tiled_sentinel(*a, **kw):
            raise AssertionError("tiled kernel")

        monkeypatch.setattr(knn, "knn_cosine_scores_pallas", resident_sentinel)
        monkeypatch.setattr(
            knn, "knn_cosine_scores_pallas_tiled", tiled_sentinel
        )
        monkeypatch.setattr(knn.jax, "default_backend", lambda: "tpu")
        # force: sentinel failures must not be swallowed by the fallback
        monkeypatch.setattr(knn, "_FORCE_PALLAS", True)
        big = jnp.asarray(
            rng.random((knn.PALLAS_MAX_BANK_ROWS + 1, 8), dtype=np.float32)
        )
        q = jnp.asarray(rng.random((4, 8), dtype=np.float32))
        with pytest.raises(AssertionError, match="tiled kernel"):
            knn.knn_cosine_scores(q, big, k=3)
        small = big[: knn.PALLAS_MAX_BANK_ROWS]
        with pytest.raises(AssertionError, match="resident kernel"):
            knn.knn_cosine_scores(q, small, k=3)
        # without force, on a non-TPU backend, both sizes take XLA
        monkeypatch.setattr(knn, "_FORCE_PALLAS", False)
        monkeypatch.setattr(knn.jax, "default_backend", lambda: "cpu")
        ref = np.asarray(knn.knn_cosine_scores_xla(q, big, k=3))
        out = np.asarray(knn.knn_cosine_scores(q, big, k=3))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestShear:
    """The two-level (coarse+fine, padded) shear must be bit-identical
    to the direct roll-accumulate it replaces (ops/image.py)."""

    def test_two_level_equals_direct(self, rng):
        from ssad_tpu.ops import image as im

        for size in (16, 37, 64):
            img = jnp.asarray(rng.random((size, size, 3), dtype=np.float32))
            for m in (3, 9, 20):
                for axis in (0, 1):
                    shifts = jnp.asarray(
                        rng.integers(-m, m + 1, size), jnp.int32
                    )
                    a = im._shear(img, shifts, axis, m)
                    b = im._shear_2level(img, shifts, axis, m)
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rotate_roundtrip_identity(self):
        from ssad_tpu.ops import image as im

        img = jnp.asarray(np.random.default_rng(0).random((32, 32, 3), np.float32))
        out = im.rotate_small_angle(img, jnp.float32(0.0), 3.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


class TestCoreset:
    def _oracle(self, x, k, first):
        """Naive numpy k-center greedy on cosine geometry."""
        xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        sel = [first]
        min_d = np.full(x.shape[0], np.inf)
        for _ in range(1, k):
            d = 2.0 - 2.0 * (xn @ xn[sel[-1]])
            min_d = np.minimum(min_d, d)
            sel.append(int(np.argmax(min_d)))
        return sel

    def test_matches_numpy_oracle(self, rng):
        from ssad_tpu.ops.coreset import kcenter_greedy

        x = rng.normal(size=(60, 8)).astype(np.float32)
        key = jax.random.key(7)
        idx = np.asarray(kcenter_greedy(jnp.asarray(x), 12, key))
        first = int(jax.random.randint(key, (), 0, 60))
        assert idx.tolist() == self._oracle(x, 12, first)

    def test_covers_better_than_random_subset(self, rng):
        """Minimax coverage: the greedy coreset's covering radius must
        beat a random subset of the same size on clustered data."""
        from ssad_tpu.ops.coreset import kcenter_greedy

        centers = rng.normal(size=(10, 16)).astype(np.float32) * 5
        x = np.concatenate(
            [c + rng.normal(size=(40, 16)).astype(np.float32) * 0.1
             for c in centers]
        )
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)

        def radius(sel):
            d = 2.0 - 2.0 * (xn @ xn[sel].T)
            return d.min(axis=1).max()

        greedy = np.asarray(kcenter_greedy(jnp.asarray(x), 20, jax.random.key(0)))
        rand = rng.choice(x.shape[0], size=20, replace=False)
        assert radius(greedy) < radius(rand)

    def test_select_identity_below_k(self, rng):
        from ssad_tpu.ops.coreset import coreset_select

        x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
        out = coreset_select(x, 10)
        np.testing.assert_array_equal(out, x)

    def test_no_duplicate_selections(self, rng):
        from ssad_tpu.ops.coreset import kcenter_greedy

        x = rng.normal(size=(50, 6)).astype(np.float32)
        idx = np.asarray(kcenter_greedy(jnp.asarray(x), 25, jax.random.key(3)))
        assert len(set(idx.tolist())) == 25

    def test_detector_fit_on_coreset(self, rng):
        """attach_anomaly_scores(coreset=...) distills the bank INSIDE
        fit, after the 70/30 split: the bank is the WHOLE coreset (not
        70% of it — a punctured maximin cover loses coverage), and
        scoring still works end-to-end."""
        from ssad_tpu.constants import ModelOutputs
        from ssad_tpu.evaluation.inference import attach_anomaly_scores

        normality = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
        outputs = ModelOutputs(
            embeddings=jnp.asarray(rng.normal(size=(9, 32)).astype(np.float32))
        )
        outputs, det = attach_anomaly_scores(
            outputs, normality, k=3, coreset=40
        )
        assert det.bank.shape[0] == 40
        assert np.isfinite(np.asarray(outputs.anomaly_maps)).all()

    def test_coreset_bank_rows_come_from_train_split_only(self, rng):
        """The calibration val rows must stay OUT of the bank: every
        bank row is an original train-split row, and none equals a
        val-split row (threshold calibrated on genuinely held-out
        data)."""
        from ssad_tpu.models.detector import AnomalyDetector

        emb = rng.normal(size=(100, 16)).astype(np.float32)
        key = jax.random.key(5)
        det = AnomalyDetector(k=3).fit(jnp.asarray(emb), key, coreset=20)
        perm = np.asarray(jax.random.permutation(key, 100))
        n_val = 30
        train_rows = {tuple(r) for r in emb[perm[n_val:]]}
        val_rows = {tuple(r) for r in emb[perm[:n_val]]}
        for row in np.asarray(det.bank):
            assert tuple(row) in train_rows
            assert tuple(row) not in val_rows

    def test_coreset_fit_ranks_like_full_bank_on_clustered_normality(
        self, rng
    ):
        """The regression the round-3 wiring caused: on clustered
        normality (duplicate-heavy, like patch banks), a coreset at a
        20% rate must separate normal from anomalous queries about as
        well as the full bank.  Split-before-select keeps the whole
        cover in the bank, so held-out normal queries score low."""
        from sklearn.metrics import roc_auc_score

        from ssad_tpu.models.detector import AnomalyDetector

        centers = rng.normal(size=(12, 16)).astype(np.float32) * 4
        normal = np.concatenate(
            [c + rng.normal(size=(50, 16)).astype(np.float32) * 0.15
             for c in centers]
        )
        rng.shuffle(normal)
        q_normal = np.concatenate(
            [c + rng.normal(size=(8, 16)).astype(np.float32) * 0.15
             for c in centers]
        )
        q_anom = rng.normal(size=(40, 16)).astype(np.float32) * 4
        queries = jnp.asarray(np.concatenate([q_normal, q_anom]))
        labels = np.r_[np.zeros(len(q_normal)), np.ones(len(q_anom))]

        full = AnomalyDetector(k=3).fit(jnp.asarray(normal), jax.random.key(0))
        core = AnomalyDetector(k=3).fit(
            jnp.asarray(normal), jax.random.key(0), coreset=120
        )
        auc_full = roc_auc_score(labels, np.asarray(full.predict(queries)))
        auc_core = roc_auc_score(labels, np.asarray(core.predict(queries)))
        assert auc_core > auc_full - 0.02, (auc_core, auc_full)
        # and the calibrated threshold stays sane: held-out normal
        # queries are not all flagged anomalous
        flagged = np.asarray(core.predict(queries[: len(q_normal)]))
        assert (flagged > core.threshold).mean() < 0.5
