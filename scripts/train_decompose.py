"""Per-stage device-time decomposition of the fused TRAIN step
(round-4 verdict weak #3 / next-round #3: the published train roofline
used XLA "bytes accessed" as its memory roof and the measured step beat
it by 21% — a roof below the measured point is not a bound).  bench.py
now publishes a min-traffic bytes basis; this script is the companion
per-bucket attribution, the same treatment scripts/patch_decompose.py
gave the patch path.

Times a cumulative ladder of sub-programs, each adding one stage of the
real fused step (train/trainer.py train_step; reference hot loop #2,
models.py:256-277):

    synthesis   sample batch rows + full on-device defect synthesis
    + fwd       train-mode forward (ResNet-18 + heads) + CE loss
    + bwd       value_and_grad (forward + backward)
    + opt       SGD momentum update (optax) applied to all params
    full        the PRODUCT step: + bank-fill eval forward + ring insert

Per rung: measured ms (best-stabilized over rounds, tunnel-warm), the
delta to the previous rung (attribution of the added stage), XLA
cost-analysis FLOPs with the compute speed-of-light, and XLA "bytes
accessed" for context (NOT a roof — see bench.py train_roofline
bytes_basis).  Run on the real chip:

    python scripts/train_decompose.py [batch ...]
"""

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ssad_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _cost, _peak, _timeit  # noqa: E402


def build_trainer(rng, h, w, batch, n_images):
    from ssad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
    from ssad_tpu.data import masks
    from ssad_tpu.data.mvtec import PretextData
    from ssad_tpu.train.trainer import Trainer

    mask = np.zeros((h, w), np.uint8)
    mask[32:-32, 32:-32] = 1
    coords, count = masks.pack_coords(mask)
    images = rng.random((n_images, h, w, 3), dtype=np.float32)
    data = PretextData(
        subject="bottle", imsize=(h, w),
        train_images=images, val_images=images[:16],
        cut_pool=images[:15], fixed_mask=mask.astype(np.float32),
        fixed_coords=coords, fixed_count=count,
    )
    cfg = TrainConfig(
        data=DataConfig(imsize=(h, w), batch_size=batch, subject="bottle"),
        model=ModelConfig(),
        optim=OptimConfig(),
    )
    return Trainer(cfg, data)


def build_rungs(trainer, stage="fine_tune"):
    """Cumulative ladder over the SAME code paths the product step jits
    (trainer.py train_step) — each rung is its own program, so deltas
    attribute device time to the added stage (fusion boundaries shift a
    little between programs; deltas are attribution, not bit-exact)."""
    import optax

    from ssad_tpu.train import optim as optim_mod
    from ssad_tpu.train.trainer import _epoch_steps

    model = trainer.model
    steps = _epoch_steps(
        trainer.data.train_images.shape[0],
        trainer.cfg.data.min_dataset_length,
        trainer.cfg.data.batch_size,
    )
    tx = optim_mod.build_optimizer(
        trainer.cfg.optim, stage, steps, trainer._params_template
    )

    @jax.jit
    def r_synthesis(state, key, images, masks, coords, counts, pool):
        x, y, orig = trainer._make_batch(key, images, masks, coords, counts, pool)
        return (jnp.sum(x, dtype=jnp.float32), jnp.sum(y),
                jnp.sum(orig, dtype=jnp.float32))

    def _loss(params, batch_stats, x, y):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"],
        )
        logits = out["classifier"]
        emb = out["latent_space"]
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, (mutated["batch_stats"], logits, emb)

    @jax.jit
    def r_fwd(state, key, images, masks, coords, counts, pool):
        x, y, _ = trainer._make_batch(key, images, masks, coords, counts, pool)
        loss, (stats, logits, _) = _loss(state.params, state.batch_stats, x, y)
        return loss, jnp.sum(logits)

    @jax.jit
    def r_bwd(state, key, images, masks, coords, counts, pool):
        x, y, _ = trainer._make_batch(key, images, masks, coords, counts, pool)
        (loss, _aux), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, state.batch_stats, x, y
        )
        # consume every grad leaf so nothing dead-code-eliminates
        return loss, sum(
            jnp.sum(g.astype(jnp.float32))
            for g in jax.tree_util.tree_leaves(grads)
        )

    @jax.jit
    def r_opt(state, key, images, masks, coords, counts, pool):
        x, y, _ = trainer._make_batch(key, images, masks, coords, counts, pool)
        (loss, _aux), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, state.batch_stats, x, y
        )
        updates, _new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return loss, sum(
            jnp.sum(p.astype(jnp.float32))
            for p in jax.tree_util.tree_leaves(new_params)
        )

    # full = the PRODUCT step program (donation and all), not a replica
    full_step, _, _, _ = trainer._get_step_fns(stage)

    return [
        ("synthesis", r_synthesis, False),
        ("fwd", r_fwd, False),
        ("bwd", r_bwd, False),
        ("opt", r_opt, False),
        ("full_step", full_step, True),
    ]


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [96]
    h = w = 256
    n_images = 220
    rng = np.random.default_rng(0)
    peak_flops, peak_bw, peak_tag = _peak()

    report = {"device": jax.devices()[0].device_kind, "peak_basis": peak_tag,
              "geometry": {"imsize": h, "n_images": n_images,
                           "stage": "fine_tune", "fill": True}}
    for batch in sizes:
        trainer = build_trainer(rng, h, w, batch, n_images)
        state = trainer.init_state(jax.random.key(0), "fine_tune")
        tr = trainer._device_data("train")
        fill = jnp.asarray(True)
        rows = []
        prev_ms = 0.0
        for name, fn, is_product_step in build_rungs(trainer):
            args = (state, jax.random.key(1), *tr)
            if is_product_step:
                args = args + (fill,)
            c = {"flops": None, "bytes": None}
            try:
                c = _cost(fn.lower(*args).compile())
            except Exception:
                pass
            if is_product_step:
                # the product step donates + returns new state: thread it
                local = {"s": state}

                def run(key, _local=local, _fn=fn):
                    _local["s"], m = _fn(_local["s"], key, *tr, fill)
                    return m["loss"]

                dt = _timeit(run, 20, jax.random.key(1), rounds=6)
            else:
                dt = _timeit(fn, 20, *args, rounds=6)
            ms = dt * 1e3
            row = {
                "stage": name,
                "cum_ms": round(ms, 3),
                "delta_ms": round(ms - prev_ms, 3),
                "flops": c["flops"],
                "xla_bytes_accessed": c["bytes"],
            }
            if c["flops"]:
                row["sol_compute_ms"] = round(c["flops"] / peak_flops * 1e3, 3)
                row["frac_of_compute_sol"] = round(
                    (c["flops"] / peak_flops) / dt, 3
                )
            rows.append(row)
            prev_ms = ms
            print(f"  b{batch} {name}: {ms:.2f} ms (+{row['delta_ms']:.2f})",
                  file=sys.stderr)
        report[f"b{batch}"] = rows
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
