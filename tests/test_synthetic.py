"""Distribution-level tests for the on-device defect engine.

Pixel-exact parity with PIL is impossible (and not the goal); these
tests pin the *distributions* the reference produces: label balance,
defect area fractions, containment, mask compaction, and per-mode
behaviors (SURVEY.md §7 'hard parts' #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssad_tpu.data import masks
from ssad_tpu.data.synthetic import SynthSpec, batched_synthesizer
from ssad_tpu.ops import image as im


@pytest.fixture(scope="module")
def scene():
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack(
        [0.3 + 0.3 * xx / W, 0.4 + 0.2 * yy / H, 0.5 * np.ones_like(xx, float)], -1
    ).astype(np.float32)
    # texture so that same-image cut-paste is visible to the tests
    rng = np.random.default_rng(7)
    img = np.clip(img + rng.normal(0, 0.08, img.shape).astype(np.float32), 0, 1)
    disc = ((yy - 64) ** 2 + (xx - 64) ** 2) < 45**2
    img[disc] = np.clip(img[disc] + 0.25, 0, 1)
    mask = disc.astype(np.uint8)
    coords, n = masks.pack_coords(mask)
    return img, mask, coords, n


def run_batch(scene, spec, batch=96, seed=0, non_fixed=False):
    img, mask, coords, n = scene
    fn = jax.jit(batched_synthesizer(spec, per_image_masks=False))
    keys = jax.random.split(jax.random.key(seed), batch)
    imgs = jnp.asarray(np.stack([img] * batch))
    pool = jnp.asarray(np.stack([img, np.roll(img, 30, axis=0)]))
    x, y, orig = fn(
        keys, imgs, pool, jnp.int32(2), jnp.asarray(mask, jnp.float32),
        jnp.asarray(coords), jnp.int32(n),
    )
    return np.asarray(x), np.asarray(y), np.asarray(orig), img


def changed_fraction(x_norm, base_img, thresh=0.12):
    """Fraction of pixels that differ from the base image beyond what
    color jitter alone produces."""
    x = np.asarray(jax.vmap(im.denormalize_imagenet)(jnp.asarray(x_norm)))
    return np.stack([np.mean(np.abs(xi - base_img).max(-1) > thresh) for xi in x])


class TestImageLevel:
    def test_output_contract(self, scene):
        spec = SynthSpec(subject="bottle", imsize=(128, 128))
        x, y, orig, img = run_batch(scene, spec, batch=32)
        assert x.shape == (32, 128, 128, 3)
        assert orig.shape == (32, 128, 128, 3)
        assert np.isfinite(x).all()
        assert set(np.unique(y)) <= {0, 1, 2, 3}
        np.testing.assert_allclose(orig[0], img, atol=1e-6)  # original untouched

    def test_label_balance(self, scene):
        spec = SynthSpec(subject="bottle", imsize=(128, 128))
        ys = []
        for s in range(4):
            _, y, _, _ = run_batch(scene, spec, batch=96, seed=s)
            ys.append(y)
        counts = np.bincount(np.concatenate(ys), minlength=4)
        # uniform 4-way sampler (datasets.py:215): each class ≈ 96
        assert counts.min() > 60 and counts.max() < 140, counts

    def test_defect_area_fractions(self, scene):
        # area hyperparams (datasets.py:36-42): patch 3-7% of image,
        # scar 0.3-0.7% × 2-5 copies, line is thin
        spec = SynthSpec(subject="screw", imsize=(128, 128))  # non-fixed: no affine
        x, y, _, img = run_batch(scene, spec, batch=96, seed=1)
        frac = changed_fraction(x, img)
        patch_fr = frac[y == 1]
        scar_fr = frac[y == 2]
        line_fr = frac[y == 3]
        good_fr = frac[y == 0]
        assert good_fr.max() < 0.005, "good images must only be jittered"
        # polygon mask covers roughly half the patch rect on average
        assert 0.002 < np.median(patch_fr) < 0.08, np.median(patch_fr)
        assert np.median(scar_fr) < 0.04
        assert 0 < np.median(line_fr) < 0.02
        # defects actually appear
        assert (patch_fr > 0.001).mean() > 0.9
        assert (scar_fr > 0.0005).mean() > 0.9

    def test_scar_containment(self, scene):
        # image-wise scar container scale = 2 → defects confined to the
        # central half of the canvas (dataset_generator.py:15-24)
        spec = SynthSpec(subject="screw", imsize=(128, 128))
        x, y, _, img = run_batch(scene, spec, batch=96, seed=2)
        x_dn = np.asarray(jax.vmap(im.denormalize_imagenet)(jnp.asarray(x)))
        center = 64
        reach = int(center / 2.0)  # container for scars
        margin = 8  # scar bbox may stick out by ~half its size
        for i in np.where(y == 2)[0]:
            diff = np.abs(x_dn[i] - img).max(-1) > 0.15
            if not diff.any():
                continue
            ys_, xs_ = np.nonzero(diff)
            assert ys_.min() >= center - reach - margin
            assert ys_.max() <= center + reach + margin
            assert xs_.min() >= center - reach - margin
            assert xs_.max() <= center + reach + margin

    def test_line_stays_on_object_mask(self, scene):
        img, mask, coords, n = scene
        spec = SynthSpec(subject="screw", imsize=(128, 128))
        x, y, _, _ = run_batch(scene, spec, batch=96, seed=3)
        x_dn = np.asarray(jax.vmap(im.denormalize_imagenet)(jnp.asarray(x)))
        # dilate mask generously (smoothing can push points slightly out)
        import cv2

        dil = cv2.dilate(mask, np.ones((9, 9), np.uint8)) > 0
        for i in np.where(y == 3)[0]:
            diff = np.abs(x_dn[i] - img).max(-1) > 0.2
            if diff.sum() < 4:
                continue
            on_mask = (diff & dil).sum() / diff.sum()
            assert on_mask > 0.85, f"line {i}: only {on_mask:.2f} on mask"


class TestPatchLevel:
    def test_canvas_size_and_forced_good(self, scene):
        img, mask, coords, n = scene
        spec = SynthSpec(subject="carpet", imsize=(128, 128), patch_localization=True, patch_size=64)
        # all-zero mask → label forced to 0 (datasets.py:258-259)
        fn = jax.jit(batched_synthesizer(spec, per_image_masks=False))
        keys = jax.random.split(jax.random.key(0), 32)
        imgs = jnp.asarray(np.stack([img] * 32))
        pool = imgs[:2]
        zero_mask = jnp.zeros((128, 128), jnp.float32)
        x, y, _ = fn(keys, imgs, pool, jnp.int32(2), zero_mask, jnp.asarray(coords), jnp.int32(n))
        assert x.shape == (32, 64, 64, 3)
        assert np.all(np.asarray(y) == 0)

    def test_patch_mode_produces_defects(self, scene):
        img, mask, coords, n = scene
        spec = SynthSpec(subject="carpet", imsize=(128, 128), patch_localization=True, patch_size=64)
        fn = jax.jit(batched_synthesizer(spec, per_image_masks=False))
        keys = jax.random.split(jax.random.key(5), 64)
        imgs = jnp.asarray(np.stack([img] * 64))
        ones = jnp.ones((128, 128), jnp.float32)
        x, y, _ = fn(keys, imgs, imgs[:2], jnp.int32(2), ones, jnp.asarray(coords), jnp.int32(n))
        y = np.asarray(y)
        assert (y > 0).sum() > 20  # texture with full mask: no forcing

    def test_precrop_subjects_compile(self, scene):
        img, mask, coords, n = scene
        # capsule/screw pre-crops (datasets.py:243-248) need a ≥256 canvas
        H = W = 256
        big = np.resize(img, (H, W, 3)).astype(np.float32)
        for subject in ("capsule", "screw"):
            spec = SynthSpec(subject=subject, imsize=(H, W), patch_localization=True, patch_size=64)
            fn = jax.jit(batched_synthesizer(spec, per_image_masks=False))
            keys = jax.random.split(jax.random.key(1), 4)
            imgs = jnp.asarray(np.stack([big] * 4))
            m = jnp.ones((H, W), jnp.float32)
            c, cn = masks.pack_coords(np.ones((H, W), np.uint8))
            x, y, _ = fn(keys, imgs, imgs[:1], jnp.int32(1), m, jnp.asarray(c), jnp.int32(cn))
            assert x.shape == (4, 64, 64, 3)
            assert np.isfinite(np.asarray(x)).all()


class TestMasks:
    def test_object_mask_finds_disc(self):
        yy, xx = np.mgrid[0:128, 0:128]
        img = np.full((128, 128, 3), 40, np.uint8)
        disc = ((yy - 64) ** 2 + (xx - 64) ** 2) < 40**2
        img[disc] = 200
        m = masks.object_mask(img)
        # mask mostly covers the disc, not the background
        assert (m & disc).sum() / disc.sum() > 0.8
        assert (m & ~disc).sum() / (~disc).sum() < 0.1

    def test_object_mask_empty_fallback(self):
        img = np.full((64, 64, 3), 128, np.uint8)  # no edges at all
        m = masks.object_mask(img)
        assert m.all()  # reference quirk: empty labels → full white

    def test_fill_holes(self):
        m = np.zeros((16, 16), bool)
        m[4:12, 4:12] = True
        m[7:9, 7:9] = False  # hole
        out = masks.fill_holes(m)
        assert out[7, 7] and out[8, 8]
        assert not out[0, 0]

    def test_fill_holes_matches_scipy(self):
        """Oracle test incl. the cases the single-corner-seed cv2 path
        got wrong: a foreground (0,0) pixel, and background split into
        several border-touching regions (cable-style border-to-border
        edges) — only true enclosed holes may be filled."""
        from scipy.ndimage import binary_fill_holes

        rng = np.random.default_rng(0)
        for _ in range(50):
            m = (rng.random((24, 24)) < 0.35)
            np.testing.assert_array_equal(
                masks.fill_holes(m).astype(bool), binary_fill_holes(m)
            )
        corner = np.ones((8, 8), bool)
        corner[4:6, 4:6] = False
        np.testing.assert_array_equal(
            masks.fill_holes(corner).astype(bool), binary_fill_holes(corner)
        )
        split = np.zeros((10, 10), bool)
        split[:, 5] = True  # wall: background splits into two border regions
        split[3:5, 7] = True
        np.testing.assert_array_equal(
            masks.fill_holes(split).astype(bool), binary_fill_holes(split)
        )

    def test_pack_coords_order(self):
        m = np.zeros((4, 4), np.uint8)
        m[1, 2] = 1
        m[2, 0] = 1
        c, n = masks.pack_coords(m)
        assert n == 2
        # row-major, (x, y) pairs — reference coords_map convention
        np.testing.assert_array_equal(c[0], [2, 1])
        np.testing.assert_array_equal(c[1], [0, 2])
        # padding repeats last coord
        np.testing.assert_array_equal(c[2], [0, 2])


class TestHoistedCutGather:
    """The batched path pre-gathers texture cut images outside the vmap
    using the same key slot the per-sample path uses — patch-mode
    outputs must be bit-identical to the plain per-sample vmap."""

    def test_patch_mode_bit_identical(self, scene):
        from ssad_tpu.data.synthetic import make_synthesizer

        img, mask, coords, count = scene
        pool = np.stack([img, np.roll(img, 30, axis=0)])
        spec = SynthSpec(
            subject="carpet", imsize=(128, 128), patch_localization=True,
            patch_size=64,
        )
        batched = batched_synthesizer(spec, per_image_masks=False)
        plain = jax.vmap(
            make_synthesizer(spec), in_axes=(0, 0, None, None, None, None, None)
        )
        keys = jax.random.split(jax.random.key(3), 16)
        imgs = jnp.broadcast_to(jnp.asarray(img), (16,) + img.shape)
        args = (keys, imgs, jnp.asarray(pool), jnp.int32(pool.shape[0]),
                jnp.asarray(mask), jnp.asarray(coords), jnp.int32(count))
        xb, yb, _ = batched(*args)
        xp, yp, _ = plain(*args)
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(yp))
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xp))
