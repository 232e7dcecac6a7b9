"""Reference-policy distribution tests for the synthesis engine.

The on-device samplers cannot be pixel-exact with the reference's
PIL pipeline, but their SAMPLING DISTRIBUTIONS must match its policy.
Each test re-implements the reference's numpy/random policy locally
(cited file:line into /root/reference/src) and compares large-sample
histograms with two-sample KS tests (and analytic binomial checks)
under fixed seeds, so the suite pins the rebuild to the reference's
distributions — not just to self-consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import chisquare, ks_2samp

from ssad_tpu.config import AugConfig
from ssad_tpu.data import synthetic as syn

N = 8000
#: fixed-seed runs make this deterministic; the threshold only guards
#: against distributional drift, not sampling noise flakiness
P_MIN = 1e-4


def _keys(seed, n=N):
    return jax.random.split(jax.random.key(seed), n)


# --- reference policy, reimplemented test-locally ---------------------------


def ref_polygon_points(rng, w, h):
    """rect2poly(regular=False, sides=8): 1-2 points per rectangle side,
    two-point sides drawn from half-ranges in a fixed order
    (dataset_generator.py:63-98; random.randint is INCLUSIVE)."""
    pts = []
    for side in range(4):
        two = rng.integers(1, 3) == 2  # random.randint(1, 2)
        if side == 0:  # left
            if not two:
                pts.append((0, rng.integers(1, h + 1)))
            else:
                pts.append((0, rng.integers(h // 2 + 1, h + 1)))
                pts.append((0, rng.integers(1, h // 2 + 1)))
        elif side == 1:  # top
            if not two:
                pts.append((rng.integers(1, w + 1), 0))
            else:
                pts.append((rng.integers(1, w // 2 + 1), 0))
                pts.append((rng.integers(w // 2 + 1, w + 1), 0))
        elif side == 2:  # right
            if not two:
                pts.append((w, rng.integers(1, h + 1)))
            else:
                pts.append((w, rng.integers(1, h // 2 + 1)))
                pts.append((w, rng.integers(h // 2 + 1, h + 1)))
        else:  # bottom
            if not two:
                pts.append((rng.integers(1, w + 1), h))
            else:
                pts.append((rng.integers(w // 2 + 1, w + 1), h))
                pts.append((rng.integers(1, w // 2 + 1), h))
    return pts


def ref_crop_geometry(rng, area_ratio, aspect_ranges, cut_w, cut_h):
    """generate_patch size/position sampling (dataset_generator.py:164-191)."""
    area = rng.uniform(*area_ratio) * (cut_w * cut_h)
    a1 = rng.uniform(*aspect_ranges[0])
    a2 = rng.uniform(*aspect_ranges[1])
    aspect = a1 if rng.random() < 0.5 else a2
    pw = max(int(np.sqrt(area * aspect)), 2)
    ph = max(int(np.sqrt(area / aspect)), 2)
    w = max(cut_w - pw, 1)
    h = max(cut_h - ph, 1)
    left = rng.integers(0, w + 1)
    top = rng.integers(0, h + 1)
    return pw, ph, left, top


def ref_walk(rng, m, n):
    """Line-point progressive index recurrence (datasets.py:362-368):
    index_0=0, index_i = randint(index_{i-1}, int(m*i/n))."""
    c = 0
    idx = []
    for i in range(n):
        b = int(m * i / n)
        j = int(rng.integers(c, b + 1))
        idx.append(j)
        c = j
    return np.array(idx)


def sorted_uniform_ranks(rng, m, n):
    """The ROUND-2 policy this suite replaced: n sorted uniforms.  Kept
    only to prove the KS tests have the power to reject it."""
    return np.sort((rng.random(n) * m).astype(np.int64))


# --- tests ------------------------------------------------------------------


class TestPolygonVertices:
    W, H = 41, 29

    def _ours(self):
        f = jax.jit(
            jax.vmap(
                lambda k: syn._polygon_vertices(
                    k, jnp.int32(self.W), jnp.int32(self.H)
                )
            )
        )
        verts, counts = f(_keys(0))
        return np.asarray(verts), np.asarray(counts)

    def _theirs(self):
        rng = np.random.default_rng(1)
        all_pts, counts = [], []
        for _ in range(N):
            pts = ref_polygon_points(rng, self.W, self.H)
            all_pts.append(pts)
            counts.append(len(pts))
        return all_pts, np.array(counts)

    def test_vertex_count_is_binomial(self):
        """#vertices − 4 ~ Binomial(4, ½) for both implementations
        (each side contributes a second point with p=½)."""
        _, ours = self._ours()
        _, theirs = self._theirs()
        from scipy.stats import binom

        expected = binom.pmf(np.arange(5), 4, 0.5) * N
        for counts in (ours, theirs):
            obs = np.bincount(counts - 4, minlength=5)[:5]
            assert chisquare(obs, expected).pvalue > P_MIN

    def test_edge_coordinate_distributions_match(self):
        verts, counts = self._ours()
        valid = np.arange(8)[None, :] < counts[:, None]
        v = verts[valid]
        ours_left_y = v[(v[:, 0] == 0)][:, 1]
        ours_top_x = v[(v[:, 1] == 0)][:, 0]

        pts, _ = self._theirs()
        flat = np.array([p for sample in pts for p in sample], np.float64)
        ref_left_y = flat[flat[:, 0] == 0][:, 1]
        ref_top_x = flat[flat[:, 1] == 0][:, 0]

        assert ks_2samp(ours_left_y, ref_left_y).pvalue > P_MIN
        assert ks_2samp(ours_top_x, ref_top_x).pvalue > P_MIN


class TestCropGeometry:
    CUT = 256

    @pytest.mark.parametrize(
        "area_ratio,aspect",
        [
            (AugConfig().patch_area_ratio, AugConfig().patch_aspect_ratio),
            (AugConfig().scar_area_ratio, AugConfig().scar_aspect_ratio),
        ],
        ids=["patch", "scar"],
    )
    def test_size_and_position_match(self, area_ratio, aspect):
        f = jax.jit(
            jax.vmap(
                lambda k: syn._gen_crop_geometry(
                    k, area_ratio, aspect, (self.CUT, self.CUT)
                )
            )
        )
        pw, ph, left, top = (np.asarray(a) for a in f(_keys(2)))

        rng = np.random.default_rng(3)
        ref = np.array(
            [
                ref_crop_geometry(rng, area_ratio, aspect, self.CUT, self.CUT)
                for _ in range(N)
            ]
        )
        assert ks_2samp(pw, ref[:, 0]).pvalue > P_MIN
        assert ks_2samp(ph, ref[:, 1]).pvalue > P_MIN
        assert ks_2samp(pw * ph, ref[:, 0] * ref[:, 1]).pvalue > P_MIN  # area
        assert ks_2samp(left, ref[:, 2]).pvalue > P_MIN
        assert ks_2samp(top, ref[:, 3]).pvalue > P_MIN


class TestLineWalk:
    M = 256 * 256  # full-mask coord count at the reference's 256px size
    NPTS = 60  # image-level line_points (datasets.py:360)
    WALKS = 1200

    def _ours(self):
        f = jax.jit(
            jax.vmap(lambda k: syn._walk_ranks(k, jnp.int32(self.M), self.NPTS))
        )
        return np.asarray(f(_keys(4, self.WALKS)), np.int64)

    def _theirs(self):
        rng = np.random.default_rng(5)
        return np.stack([ref_walk(rng, self.M, self.NPTS) for _ in range(self.WALKS)])

    def test_spacing_and_endpoint_match(self):
        ours, theirs = self._ours(), self._theirs()
        # the walk starts pinned at 0 in both (randint(0, 0))
        assert (ours[:, 0] == 0).all() and (theirs[:, 0] == 0).all()
        assert ks_2samp(
            np.diff(ours, axis=1).ravel(), np.diff(theirs, axis=1).ravel()
        ).pvalue > P_MIN
        assert ks_2samp(ours[:, -1], theirs[:, -1]).pvalue > P_MIN
        # positions mid-walk (lag below the diagonal is part of the policy)
        assert ks_2samp(ours[:, 30], theirs[:, 30]).pvalue > P_MIN

    def test_rejects_sorted_uniform_policy(self):
        """Power check: the very statistic above must REJECT the round-2
        sorted-uniform sampler — otherwise these tests prove nothing."""
        theirs = self._theirs()
        rng = np.random.default_rng(6)
        old = np.stack(
            [sorted_uniform_ranks(rng, self.M, self.NPTS) for _ in range(self.WALKS)]
        )
        p = ks_2samp(
            np.diff(old, axis=1).ravel(), np.diff(theirs, axis=1).ravel()
        ).pvalue
        assert p < 1e-10, f"sorted-uniform spacing not rejected (p={p})"
