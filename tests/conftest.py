"""Test configuration.

Tests run on CPU with 8 virtual devices (the standard JAX fake-backend
trick) so every sharding/collective path is exercised without TPU
hardware.  Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

# The env may pre-select a TPU platform plugin (JAX_PLATFORMS=axon via
# sitecustomize) that wins over the env var; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (works for XLA:CPU since jax 0.4.30):
# the suite recompiles near-identical ResNet train/eval programs dozens
# of times on this 1-core host — cache hits cut full-suite wall time
# substantially.  Keyed by HLO + topology, so it is correctness-safe.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SSAD_TEST_JAX_CACHE", "/tmp/ssad_tpu_test_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def fake_mvtec(tmp_path_factory):
    """A miniature dataset tree with the MVTec-AD layout.

    Two categories ('bottle'-like object, 'carpet'-like texture), a
    handful of 64px images, plus test defects with ground-truth masks.
    """
    from PIL import Image

    root = tmp_path_factory.mktemp("mvtec")
    rng = np.random.default_rng(42)
    size = (64, 64)

    def save(path, arr):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr).save(path)

    for cat, base in (("bottle", 180), ("carpet", 90)):
        for i in range(6):
            img = np.full(size + (3,), base, np.uint8)
            img += rng.integers(0, 20, size + (3,), dtype=np.uint8)
            if cat == "bottle":
                # a bright disc in the middle so object-mask extraction
                # has something to find
                yy, xx = np.mgrid[0:64, 0:64]
                disc = (yy - 32) ** 2 + (xx - 32) ** 2 < 24**2
                img[disc] = np.clip(img[disc].astype(int) + 60, 0, 255).astype(np.uint8)
            save(root / cat / "train" / "good" / f"{i:03d}.png", img)
        # test images: 2 good + 2 defective with GT masks
        for i in range(2):
            img = np.full(size + (3,), base, np.uint8)
            save(root / cat / "test" / "good" / f"{i:03d}.png", img)
        for i in range(2):
            img = np.full(size + (3,), base, np.uint8)
            img[20:30, 20:40] = 250
            save(root / cat / "test" / "broken" / f"{i:03d}.png", img)
            gt = np.zeros(size, np.uint8)
            gt[20:30, 20:40] = 255
            save(root / cat / "ground_truth" / "broken" / f"{i:03d}_mask.png", gt)
    return root
