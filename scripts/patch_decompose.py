"""Per-stage device-time decomposition of the fused patch-scoring
program (verdict r3 weak #3: 2.087 ms measured vs 1.138 ms memory SOL
at bs 16 — where do the other ~0.9 ms/image go?).

Times a nested ladder of sub-programs, each adding one stage of the
real pipeline (evaluation/inference.py score_patches):

    extract       (B,256,256,3) → (B·841, 32, 32, 3) merged-lane slices
    + stem        folded conv1+pool (ops/stem_pool)
    + backbone    residual stack + taps + heads → (B·841, 512)
    + knn         cosine top-k against the 1000-row bank
    + map+up      inverse perm + blur⊗upsample to 256²

Per rung: measured ms/image, XLA cost-analysis FLOPs + bytes, and the
speed-of-light time for each resource on this chip.  The DELTA between
consecutive rungs attributes device time to the added stage (fusion
boundaries shift a little between programs — deltas are attribution,
not bit-exact accounting).  Writes one JSON to stdout; run on the real
chip (`python scripts/patch_decompose.py [bs ...]`).

Reference hot loop #4: models.py:363-370.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ssad_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _cost, _peak, _timeit  # noqa: E402


def build_rungs(engine, bank, h, dim, stride, k):
    """Rungs mirror the PRODUCT TPU path: plain module forward with the
    folded stem for 32×32 patches (peranet.backbone_features routes
    stem_fold_2x=True; the external Pallas/XLA stem_pool is gated OFF
    on TPU — ops/stem_pool.fused_available)."""
    import flax.linen as nn

    from ssad_tpu.models.peranet import PeraNet
    from ssad_tpu.ops import patches as patches_mod
    from ssad_tpu.ops.image import upsample_anomaly_maps
    from ssad_tpu.ops.knn import knn_cosine_scores

    model = engine.model

    def extract(x):
        p, inv = patches_mod.extract_patches_shuffled(
            x.astype(jnp.bfloat16), dim=dim, stride=stride
        )
        b, n = p.shape[0], p.shape[1]
        return p.reshape((b * n,) + p.shape[2:]), inv, b, n

    def stem_only(mdl, x):
        bb = mdl.backbone
        x = x.astype(bb.dtype)
        x = bb.conv1(x, fold_2x=True)
        x = bb.bn1(x, use_running_average=True)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    @jax.jit
    def r_extract(variables, x):
        flat, _, _, _ = extract(x)
        return jnp.sum(flat.astype(jnp.float32))

    @jax.jit
    def r_stem(variables, x):
        flat, _, _, _ = extract(x)
        out = model.apply(variables, flat, method=stem_only)
        return jnp.sum(out.astype(jnp.float32))

    def upto_stage(mdl, x, n_stages):
        bb = mdl.backbone
        h = stem_only(mdl, x)
        i = 0
        for stage, num_blocks in enumerate(bb.stage_sizes, start=1):
            if stage > n_stages:
                break
            for _ in range(num_blocks):
                h = bb.blocks[i](h, train=False)
                i += 1
        return h

    def make_stage_rung(n_stages):
        @jax.jit
        def r_stage(variables, x):
            flat, _, _, _ = extract(x)
            out = model.apply(variables, flat,
                              method=functools.partial(upto_stage,
                                                       n_stages=n_stages))
            return jnp.sum(out.astype(jnp.float32))
        return r_stage

    @jax.jit
    def r_backbone(variables, x):
        flat, _, _, _ = extract(x)
        pooled, feats = model.apply(variables, flat, train=False,
                                    method=PeraNet.backbone_features)
        return jnp.sum(pooled)

    @jax.jit
    def r_head(variables, x):
        flat, _, _, _ = extract(x)
        out = model.apply(variables, flat, train=False)
        return jnp.sum(out["latent_space"].astype(jnp.float32))

    @jax.jit
    def r_knn(variables, x, bank):
        flat, _, _, _ = extract(x)
        out = model.apply(variables, flat, train=False)
        return jnp.sum(knn_cosine_scores(out["latent_space"], bank, k=k))

    @jax.jit
    def r_full(variables, x, bank):
        flat, inv, b, n = extract(x)
        out = model.apply(variables, flat, train=False)
        scores = knn_cosine_scores(out["latent_space"], bank, k=k)
        side = int(round(n ** 0.5))
        maps = scores.reshape(b, n)[:, inv].reshape(b, side, side)
        return jnp.sum(upsample_anomaly_maps(maps, h))

    return [
        ("extract", r_extract, False),
        ("stem", r_stem, False),
        ("layer1", make_stage_rung(1), False),
        ("layer2", make_stage_rung(2), False),
        ("layer3", make_stage_rung(3), False),
        ("backbone", r_backbone, False),
        ("head", r_head, False),
        ("knn", r_knn, True),
        ("map_upsample", r_full, True),
    ]


def main():
    from ssad_tpu.config import ModelConfig
    from ssad_tpu.evaluation.inference import InferenceEngine
    from ssad_tpu.models.peranet import build_model, init_model

    sizes = [int(a) for a in sys.argv[1:]] or [16]
    h = w = 256
    dim, stride, k, bank_rows = 32, 8, 3, 1000

    rng = np.random.default_rng(0)
    model = build_model(ModelConfig())
    params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    engine = InferenceEngine(model, params, stats)
    bank = jnp.asarray(rng.random((bank_rows, 512), dtype=np.float32))
    peak_flops, peak_bw, peak_tag = _peak()

    report = {"device": jax.devices()[0].device_kind, "peak_basis": peak_tag,
              "geometry": {"imsize": h, "dim": dim, "stride": stride,
                           "k": k, "bank_rows": bank_rows}}
    for bs in sizes:
        x = jnp.asarray(rng.random((bs, h, w, 3), dtype=np.float32))
        rows = []
        prev_ms = 0.0
        for name, fn, needs_bank in build_rungs(engine, bank, h, dim, stride, k):
            args = (engine._variables, x, bank) if needs_bank else (engine._variables, x)
            compiled = fn.lower(*args).compile()
            c = _cost(compiled)
            dt = _timeit(fn, 20, *args, rounds=6)
            ms = dt * 1e3 / bs
            row = {
                "stage": name,
                "cum_ms_per_image": round(ms, 4),
                "delta_ms_per_image": round(ms - prev_ms, 4),
                "flops": c["flops"],
                "bytes": c["bytes"],
            }
            if c["flops"] and c["bytes"]:
                row["sol_compute_ms_per_image"] = round(
                    c["flops"] / peak_flops * 1e3 / bs, 4)
                row["sol_memory_ms_per_image"] = round(
                    c["bytes"] / peak_bw * 1e3 / bs, 4)
                sol = max(row["sol_compute_ms_per_image"],
                          row["sol_memory_ms_per_image"])
                row["frac_of_sol"] = round(sol / ms, 3)
            rows.append(row)
            prev_ms = ms
            print(f"  bs{bs} {name}: {ms:.3f} ms/img "
                  f"(+{row['delta_ms_per_image']:.3f})", file=sys.stderr)
        report[f"bs{bs}"] = rows
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
