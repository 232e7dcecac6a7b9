"""Headline benchmark: augmented-train-image throughput per chip.

Measures the on-device synthetic-defect pipeline (image-level, 256px,
batch 96 — the reference's training configuration, tools.py:212,
datasets.py:171) end-to-end on the default backend, consumed the way
the fused train step consumes it.  Baseline target: ≥5,000 augmented
train images/sec/chip (BASELINE.json; the reference's PIL pipeline on
8 CPU workers reaches ~0.1-0.3k).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ssad_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from ssad_tpu.data import masks
from ssad_tpu.data.synthetic import SynthSpec, batched_synthesizer

BASELINE_IMAGES_PER_SEC = 5000.0


def main() -> None:
    rng = np.random.default_rng(0)
    h = w = 256
    batch = 96
    n_images = 220  # typical MVTec train-set size

    images = jnp.asarray(rng.random((n_images, h, w, 3), dtype=np.float32))
    pool = images[:15]
    mask = np.zeros((h, w), np.uint8)
    mask[32:-32, 32:-32] = 1
    coords, count = masks.pack_coords(mask)
    mask_j = jnp.asarray(mask, jnp.float32)
    coords_j = jnp.asarray(coords)

    spec = SynthSpec(subject="bottle", imsize=(h, w))
    synth = batched_synthesizer(spec, per_image_masks=False)

    @jax.jit
    def step(key):
        k_idx, k_syn = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch,), 0, n_images)
        keys = jax.random.split(k_syn, batch)
        x, y, _ = synth(
            keys, images[idx], pool, jnp.int32(pool.shape[0]), mask_j, coords_j,
            jnp.int32(count),
        )
        # consume like the fused train step (no giant host outputs)
        return jnp.sum(x, dtype=jnp.float32), jnp.sum(y)

    s, _ = step(jax.random.key(0))
    float(s)  # full warm-up sync

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        s, _ = step(jax.random.key(i + 1))
    float(s)  # value readback — block_until_ready alone under-reports
    # on tunneled backends
    dt = (time.perf_counter() - t0) / iters
    images_per_sec = batch / dt

    print(
        json.dumps(
            {
                "metric": "aug_train_images_per_sec_per_chip",
                "value": round(images_per_sec, 1),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
