"""Native C++ loader (ssad_tpu/native): PIL-parity and fallback tests.

The PIL path in data/mvtec.py is the oracle: the native loader must
reproduce its decode (exactly, at native size) and its bicubic resize
(to <2/255 per pixel — PIL uses fixed-point int16 weights, the native
kernel float64).
"""

import numpy as np
import pytest
from PIL import Image

from ssad_tpu import native
from ssad_tpu.data import mvtec


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(7)
    paths = []
    for i, size in enumerate([(97, 131), (256, 256), (300, 200)]):
        arr = (rng.random(size + (3,)) * 255).astype(np.uint8)
        p = d / f"img{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


needs_native = pytest.mark.skipif(
    not native.available(), reason="native loader not built (no g++/libpng)"
)


@needs_native
def test_decode_exact_at_native_size(png_dir):
    p = png_dir[1]  # 256x256, no resize
    got = native.decode_resize_batch([p], (256, 256))[0]
    want = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_array_equal(got, want)


@needs_native
def test_resize_matches_pil_bicubic(png_dir):
    for p in png_dir:
        got = native.decode_resize_batch([p], (64, 80))[0]
        want = mvtec.load_image(p, (64, 80))
        assert np.abs(got - want).max() < 2.0 / 255.0, p


@needs_native
def test_upscale_matches_pil(png_dir):
    p = png_dir[0]  # 97x131 -> larger
    got = native.decode_resize_batch([p], (160, 160))[0]
    want = mvtec.load_image(p, (160, 160))
    assert np.abs(got - want).max() < 2.0 / 255.0


@needs_native
def test_threaded_equals_sequential(png_dir):
    a = native.decode_resize_batch(png_dir * 3, (48, 48), n_threads=1)
    b = native.decode_resize_batch(png_dir * 3, (48, 48), n_threads=4)
    np.testing.assert_array_equal(a, b)


@needs_native
def test_grayscale_mask_stack(tmp_path):
    mask = np.zeros((100, 120), np.uint8)
    mask[20:60, 30:90] = 255
    p = tmp_path / "gt.png"
    Image.fromarray(mask, mode="L").save(p)
    got = mvtec.load_mask_stack([None, str(p)], (64, 64))
    assert got.shape == (2, 64, 64)
    np.testing.assert_array_equal(got[0], 0.0)
    want = mvtec.load_mask(str(p), (64, 64))
    np.testing.assert_array_equal(got[1], want)


@needs_native
def test_load_stack_uses_native_and_matches_pil(png_dir):
    got = mvtec.load_stack(png_dir, (72, 72))
    want = np.stack([mvtec.load_image(p, (72, 72)) for p in png_dir])
    assert np.abs(got - want).max() < 2.0 / 255.0


def test_failure_falls_back(tmp_path, png_dir):
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not a png")
    assert native.decode_resize_batch([str(bad)], (32, 32)) is None
    # unsupported extension → None → caller falls back to PIL
    assert native.decode_resize_batch(["/nonexistent.bmp"], (32, 32)) is None


def test_jpeg_roundtrip(tmp_path):
    if not native.available():
        pytest.skip("native loader not built")
    rng = np.random.default_rng(3)
    arr = (rng.random((90, 110, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=95)
    got = native.decode_resize_batch([str(p)], (90, 110))[0]
    want = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    # libjpeg IDCT variants may differ by a couple of quantization steps
    assert np.abs(got - want).max() <= 4.0 / 255.0
