"""Headline benchmark: synthesis throughput, fused-train-step time + MFU,
and patch-scoring latency, on the default backend (the real TPU chip).

Measured pieces:
  1. on-device synthetic-defect pipeline (image-level, 256px, batch 96 —
     the reference's training configuration, tools.py:212,
     datasets.py:171).  Baseline target: ≥5,000 augmented train
     images/sec/chip (BASELINE.json; the reference's PIL pipeline on 8
     CPU workers reaches ~0.1-0.3k);
  2. the fused train step (synthesis → fwd/bwd → SGD → memory-bank
     insert), fill phase active — the actual product of the framework
     (reference hot loop #2, models.py:256-277) — with a FLOPs-based
     MFU estimate from XLA's cost analysis;
  3. patch-mode anomaly scoring: 841 sliding-window patches/image at
     32/stride-8 → embeddings → k-NN against a 1000-row bank
     (reference hot loop #4, models.py:363-370; target <2 ms/image).

Emission contract (timeout-proof, round-5 redesign): the script prints
a COMPLETE JSON line after EVERY finished section, each a superset of
the previous — the driver keeps the tail of stdout, so the last
complete line wins and a wall-clock kill can no longer erase the
round's whole perf record (round 4's driver timeout left rc=124 and
parsed:null).  The first line lands as soon as the headline synthesis
number exists; the core trio (synthesis, default train step, patch
scoring) each flush their own line; extended sections (A/B variants,
b256, image scoring, wide-bank k-NN, pixel metrics) are budget-guarded
by SSAD_BENCH_BUDGET_S (default 1500 s, under the driver's observed
~30 min timeout) and failure-isolated — a skipped/failed section is
recorded in "sections_skipped"/"section_errors" instead of sinking the
artifact.  Keys:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_step_ms": N, "train_images_per_sec": N, "train_mfu": N,
   "train_step_fill32_ms": N, "train_step_s2d_ms": N,
   "train_step_b256_ms": N, "train_b256_images_per_sec": N,
   "patch_score_ms_per_image": N, "patch_score_bs16_ms_per_image": N,
   "image_score_ms_per_image": N, "pixel_metrics_device_ms": N,
   "pixel_metrics_host_ms": N, "patch_roofline": {...},
   "train_roofline": {...}, "device": ..., "elapsed_s": N,
   "sections_skipped": [...]}

The patch_roofline / train_roofline blocks are the decomposition behind
any cross-device or headroom claim: the chip's peak FLOP/s and HBM
bandwidth, the speed-of-light time for each resource, and which one
binds — so converting the measured number to another TPU generation is
arithmetic on the BINDING resource, not hope, and "frac_of_sol" says
how much headroom actually remains.  train_roofline's memory roof uses
a MIN-TRAFFIC bytes basis (batch rows read + full train state
read+written once; activations assumed on-chip — optimistic, as a
speed-of-light must be), because XLA's "bytes accessed" sums every
fusion operand including VMEM-resident reuse and round 4 published a
"roof" the measured step beat by 21%; the XLA number is still reported
as xla_bytes_accessed for context.
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

# dense bf16 peak FLOP/s and HBM bandwidth per chip by device kind
# (public numbers: cloud.google.com/tpu/docs/system-architecture)
_PEAK = (
    ("v6e", 918e12, 1640e9), ("v6", 918e12, 1640e9),
    ("v5p", 459e12, 2765e9), ("v5e", 197e12, 819e9),
    ("v5litepod", 197e12, 819e9), ("v5", 197e12, 819e9),
    ("v4", 275e12, 1228e9), ("v3", 123e12, 900e9), ("v2", 45e12, 700e9),
)


def _peak() -> tuple:
    """(peak_flops, peak_bw, matched_tag); tag records WHICH row matched
    so published conversions say when they rest on the unknown-chip
    fallback instead of silently guessing."""
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for tag, flops, bw in _PEAK:
        if tag in kind:
            return flops, bw, tag
    return 197e12, 819e9, "unknown-assumed-v5e"


def _peak_flops() -> float:
    return _peak()[0]


def _cost(compiled) -> dict:
    """flops + bytes accessed from XLA's cost analysis (best effort)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return {
            "flops": float(cost.get("flops", 0.0)) or None,
            "bytes": float(cost.get("bytes accessed", 0.0)) or None,
        }
    except Exception:
        return {"flops": None, "bytes": None}


def _sync(out) -> None:
    """Force a scalar readback (block_until_ready alone under-reports
    on the tunneled backend)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)


def _warm(fn, *args, max_calls: int = 64, budget_s: float = 300.0) -> None:
    """Warm a program with SINGLE synced calls until call time
    stabilizes (last call ≤ 1.5× the best seen), capped by calls and
    wall clock.

    The tunneled backend warms per program hash over ~dozens of calls
    (observed 10 s → 26 ms on the same step fn).  Without this, the
    first timing round of `iters` calls pays the whole warm-up serially
    — round 5 measured 13+ minutes for ONE section's first round on a
    cold day.  Single calls reach steady state in the same ~dozens of
    calls at a fraction of the wall clock, and the timing rounds below
    still take the best-over-rounds, so the published number is
    unchanged on a warm chip (validated: warm-run numbers reproduce).
    """
    t0 = time.perf_counter()
    best = float("inf")
    for _ in range(max_calls):
        c0 = time.perf_counter()
        _sync(fn(*args))
        c = time.perf_counter() - c0
        best = min(best, c)
        if c <= best * 1.5 and c < 1.0:
            return
        if time.perf_counter() - t0 > budget_s:
            return


def _timeit(fn, iters: int, *args, rounds: int = 4) -> float:
    """Best mean seconds per call over several rounds (after adaptive
    single-call warm-up; see _warm)."""
    _warm(fn, *args)
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        if dt > best * 0.95 and r >= 1:
            return min(best, dt)
        best = min(best, dt)
    return best


def bench_synthesis(rng, h, w, batch, n_images) -> float:
    """Augmented images/sec through the synthesis pipeline alone."""
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

    def run(key):
        s, _ = step(key)
        return s

    # 25 iters/round: plenty above timer resolution at steady state
    # (~6.4 ms/call → 160 ms/round) and half the cost of a round while
    # the tunnel is still warming this program (observed re-cooling
    # after ~1.5 h idle: a cold-ish round at seconds/call dominates the
    # whole bench's wall clock)
    dt = _timeit(run, 25, jax.random.key(1))
    return batch / dt


def bench_train_step(rng, h, w, batch, n_images, model_cfg=None, iters=30):
    """(step_ms, images/sec, mfu) for the fused fine-tune train step
    with the memory-bank fill phase ACTIVE (the expensive half).
    Default model config = the product default (bank_fill_rows=None:
    every accepted row is embedded, the reference behavior)."""
    from ssad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
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
        model=model_cfg or ModelConfig(),
        optim=OptimConfig(),
    )
    trainer = Trainer(cfg, data)
    state = trainer.init_state(jax.random.key(0), "fine_tune")
    step, _, _, _ = trainer._get_step_fns("fine_tune")
    tr = trainer._device_data("train")
    fill = jnp.asarray(True)

    # FLOPs + bytes of one compiled step from XLA's cost analysis
    cost = {"flops": None, "bytes": None}
    try:
        compiled = step.lower(state, jax.random.key(1), *tr, fill).compile()
        cost = _cost(compiled)
    except Exception:
        pass

    def run(key):
        nonlocal state
        state, metrics = step(state, key, *tr, fill)
        return metrics["loss"]

    dt = _timeit(run, iters, jax.random.key(1))

    mfu = None
    roofline = None
    if cost["flops"]:
        mfu = cost["flops"] / dt / _peak_flops()
    if cost["flops"]:
        # which resource binds the fused train step, its speed-of-light
        # time, and how close the measured step sits to it — the
        # arithmetic behind any "headroom is structural" claim
        # (reference hot loop #2, models.py:256-277).
        #
        # Memory roof basis (round-5 fix): MINIMUM HBM traffic the step
        # must do — the sampled batch rows read once + the full train
        # state (params, BN stats, optimizer momentum) read and written
        # once, activations assumed VMEM-resident.  That is a true
        # lower bound, so sol ≤ measured and frac_of_sol ≤ 1 by
        # construction.  XLA's "bytes accessed" (round 4's basis) sums
        # every fusion operand including on-chip reuse — it overcounts
        # unique traffic and produced a "roof" the measured step beat
        # by 21%; kept as xla_bytes_accessed for context only.
        def _nbytes(tree) -> float:
            return float(sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "size")
            ))

        state_bytes = _nbytes((state.params, state.batch_stats, state.opt_state))
        batch_bytes = float(batch * h * w * 3 * 4)  # f32 rows gathered in-graph
        bytes_min = batch_bytes + 2.0 * state_bytes
        peak_flops, peak_bw, tag = _peak()
        t_flops = cost["flops"] / peak_flops
        t_bytes = bytes_min / peak_bw
        sol = max(t_flops, t_bytes)
        roofline = {
            "flops": cost["flops"],
            "bytes_min": bytes_min,
            "xla_bytes_accessed": cost["bytes"],
            "bytes_basis": (
                "min-traffic: batch rows read + state read+write once; "
                "activations assumed on-chip (xla_bytes_accessed "
                "overcounts fusion-operand reuse)"
            ),
            "sol_compute_ms": round(t_flops * 1e3, 3),
            "sol_memory_ms": round(t_bytes * 1e3, 3),
            "bound": "memory" if t_bytes > t_flops else "compute",
            "arithmetic_intensity": round(cost["flops"] / bytes_min, 2),
            "measured_ms": round(dt * 1e3, 2),
            "frac_of_sol": round(sol / dt, 3),
            "peak_basis": tag,
        }
    return dt * 1e3, batch / dt, mfu, roofline


def bench_image_scoring(rng, h, w, bank_rows=1000, bs=32):
    """ms/image for image-level scoring: whole-image embedding + k-NN
    against the memory bank — the reference's image-level inference unit
    (models.py:311-333 predict_step + models.py:363-366 kNN), fused into
    one program by scoring the embeddings in-graph."""
    import jax.numpy as jnp

    from ssad_tpu.config import ModelConfig
    from ssad_tpu.evaluation.inference import InferenceEngine
    from ssad_tpu.models.peranet import build_model, init_model
    from ssad_tpu.ops.knn import knn_cosine_scores

    model = build_model(ModelConfig())
    params, stats = init_model(model, jax.random.key(0), (1, h, w, 3))
    engine = InferenceEngine(model, params, stats)
    bank = jnp.asarray(rng.random((bank_rows, 512), dtype=np.float32))

    @jax.jit
    def score(variables, x, bank):
        out = model.apply(variables, x, train=False)
        return knn_cosine_scores(out["latent_space"], bank, k=3)

    x = jnp.asarray(rng.random((bs, h, w, 3), dtype=np.float32))
    dt = _timeit(lambda x: score(engine._variables, x, bank), 30, x)
    return dt * 1e3 / bs


def bench_patch_scoring(rng, h, w, patch_dim=32, stride=8, bank_rows=1000, bs=8):
    """(ms/image, roofline dict) for sliding-window patch scoring
    (embed 841 patches + k-NN against the bank), batched over bs images."""
    from ssad_tpu.config import ModelConfig
    from ssad_tpu.evaluation.inference import InferenceEngine
    from ssad_tpu.models.detector import AnomalyDetector
    from ssad_tpu.models.peranet import build_model, init_model

    model = build_model(ModelConfig())
    params, stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    engine = InferenceEngine(model, params, stats)
    bank = jnp.asarray(rng.random((bank_rows, 512), dtype=np.float32))
    det = AnomalyDetector(k=3).fit(bank, jax.random.key(0))

    x = jnp.asarray(rng.random((bs, h, w, 3), dtype=np.float32))

    def run(x):
        # fused extract→embed→kNN→blur→upsample, one program; score
        # against the FULL bank_rows bank (det.bank would be the 70%
        # fit split — a 30% smaller matmul than the stated metric)
        return engine.score_patch_maps(
            x, bank, dim=patch_dim, stride=stride, k=3, upsample_to=h
        )

    # roofline decomposition of the ONE compiled program: which
    # resource (MXU FLOPs vs HBM bytes) binds, and its speed-of-light
    # time — the basis for any cross-generation conversion
    roofline = None
    try:
        compiled = engine._score_patches.lower(
            engine._variables, x, bank, patch_dim, stride, 3, h
        ).compile()
        c = _cost(compiled)
        peak_flops, peak_bw, peak_tag = _peak()
        if c["flops"] and c["bytes"]:
            t_flops = c["flops"] / peak_flops
            t_bytes = c["bytes"] / peak_bw
            roofline = {
                "flops": c["flops"],
                "bytes": c["bytes"],
                "sol_compute_ms_per_image": round(t_flops * 1e3 / bs, 4),
                "sol_memory_ms_per_image": round(t_bytes * 1e3 / bs, 4),
                "bound": "memory" if t_bytes > t_flops else "compute",
                "arithmetic_intensity": round(c["flops"] / c["bytes"], 2),
            }
    except Exception:
        pass

    dt = _timeit(run, 20, x)
    ms = dt * 1e3 / bs
    if roofline is not None:
        # BASELINE.md's "<2 ms/image" names v4-8 hardware; the measured
        # chip differs, so publish the conversion ON THE BINDING
        # RESOURCE as arithmetic, not hope: scale by the ratio of this
        # chip's peak (HBM BW if memory-bound, bf16 FLOP/s if
        # compute-bound) to v4's.
        v4_flops, v4_bw = dict((t, (f, b)) for t, f, b in _PEAK)["v4"]
        peak_flops, peak_bw, peak_tag = _peak()
        scale = (
            peak_bw / v4_bw if roofline["bound"] == "memory"
            else peak_flops / v4_flops
        )
        roofline["v4_equiv_ms_per_image"] = round(ms * scale, 3)
        roofline["v4_equiv_basis"] = roofline["bound"]
        # names the _PEAK row the conversion used; "unknown-assumed-v5e"
        # marks the fallback, so the arithmetic is auditable
        roofline["peak_basis"] = peak_tag
    return ms, roofline


def bench_knn_wide_bank(rng, n=6728, m=35840, d=512):
    """(tiled_ms, xla_ms) per batch for wide-normality k-NN scoring:
    one bs-8 patch batch (8×841 queries) against a ~42-image patch bank
    (`evaluate --patch-level --n-normality-images 50`).  Banks this size
    exceed the resident kernel's VMEM envelope and dispatch to the
    streaming-tiled Pallas kernel (ops/knn.py) — measured against the
    XLA matmul+lax.top_k path it replaced."""
    from ssad_tpu.ops import knn

    q = jnp.asarray(rng.random((n, d), dtype=np.float32))
    bank = jnp.asarray(rng.random((m, d), dtype=np.float32))
    xla_ms = _timeit(lambda: knn.knn_cosine_scores_xla(q, bank, k=3), 20) * 1e3
    tiled_ms = (
        _timeit(lambda: knn.knn_cosine_scores_pallas_tiled(q, bank, k=3), 20)
        * 1e3
    )
    return tiled_ms, xla_ms


def bench_pixel_metrics(rng, n_images=120, h=256, w=256):
    """(device_ms, host_ms) for the full pixel-metric set of one
    category (ROC AUC + optimal-F1 threshold + IoU + official AUPRO) at
    a typical MVTec test-set size: the fused one-sort device program
    (evaluation/metrics_device.py) vs the host numpy oracles (three
    argsorts over n_images·256² f64 pixels, reference metrics.py:59-161
    runs the same sweep on CPU)."""
    import time as _time

    from ssad_tpu.evaluation import metrics as M
    from ssad_tpu.evaluation import metrics_device as MD

    gts = np.zeros((n_images, h, w), np.uint8)
    for i in range(n_images):
        if rng.random() < 0.6:
            for _ in range(int(rng.integers(1, 4))):
                cy, cx = int(rng.integers(8, h - 8)), int(rng.integers(8, w - 8))
                r = int(rng.integers(4, 20))
                yy, xx = np.ogrid[:h, :w]
                gts[i][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    maps = (gts * 0.6 + rng.normal(0.3, 0.25, gts.shape)).astype(np.float32)

    t0 = _time.perf_counter()
    labels = gts.ravel() > 0
    scores = maps.ravel()
    fpr, tpr, _ = M.roc_curve(labels, scores)
    M.auc(fpr, tpr)
    thr = M.optimal_f1_threshold(labels, scores)
    M.iou_score(gts.ravel(), scores, thr)
    fprs, pros = M.compute_pro(maps, gts)
    M.compute_aupro(fprs, pros, 0.3)
    host_ms = (_time.perf_counter() - t0) * 1e3

    maps_dev = jax.device_put(maps)
    MD.pixel_metrics(maps_dev, gts)  # compile + warm
    best = float("inf")
    for _ in range(4):
        t0 = _time.perf_counter()
        MD.pixel_metrics(maps_dev, gts)
        best = min(best, _time.perf_counter() - t0)
    return best * 1e3, host_ms


def _probe_backend(timeout_s: float = 120.0) -> str | None:
    """Reach the backend in a SUBPROCESS with a hard timeout.

    Through the remote TPU tunnel, `jax.devices()` does not error when
    the tunnel is down — it hangs forever, which would leave the driver
    with no bench record at all.  A subprocess probe (same trick as
    `cli doctor`) turns that hang into one diagnosable JSON error line
    and a nonzero exit.  Returns None when healthy, else the error."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].device_kind)"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return (f"backend unreachable: jax.devices() hung >{timeout_s:.0f}s "
                "(remote TPU tunnel down?)")
    if r.returncode != 0:
        return f"backend probe failed: {r.stderr.strip()[-300:]}"
    return None


def main() -> None:
    import os

    from ssad_tpu.config import ModelConfig

    t0 = time.monotonic()
    budget = float(os.environ.get("SSAD_BENCH_BUDGET_S", "1500"))

    def remaining() -> float:
        return budget - (time.monotonic() - t0)

    err = _probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": "aug_train_images_per_sec_per_chip",
            "value": None, "unit": "images/sec", "vs_baseline": None,
            "error": err,
        }), flush=True)
        raise SystemExit(1)

    rng = np.random.default_rng(0)
    h = w = 256
    batch = 96
    n_images = 220  # typical MVTec train-set size

    record = {
        "metric": "aug_train_images_per_sec_per_chip",
        "value": None,
        "unit": "images/sec",
        "vs_baseline": None,
        "device": jax.devices()[0].device_kind,
        "budget_s": budget,
    }
    skipped: list = []

    section_s: dict = {}
    record["section_s"] = section_s  # wall clock per section (warm-up
    # included) — the diagnostic for tuning budgets/timeouts

    def emit() -> None:
        record["elapsed_s"] = round(time.monotonic() - t0, 1)
        print(json.dumps(record), flush=True)

    def timed(name: str, fn):
        s0 = time.monotonic()
        out = fn()
        section_s[name] = round(time.monotonic() - s0, 1)
        return out

    # ---- core trio: each flushes its own complete line the moment it
    # lands, so a driver timeout keeps everything measured so far ----
    images_per_sec = timed(
        "synthesis", lambda: bench_synthesis(rng, h, w, batch, n_images)
    )
    record["value"] = round(images_per_sec, 1)
    record["vs_baseline"] = round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3)
    emit()

    step_ms, train_ips, mfu, train_roofline = timed(
        "train_step", lambda: bench_train_step(rng, h, w, batch, n_images)
    )
    record["train_step_ms"] = round(step_ms, 2)
    record["train_images_per_sec"] = round(train_ips, 1)
    record["train_mfu"] = round(mfu, 4) if mfu else None
    record["train_roofline"] = train_roofline
    emit()

    patch_ms, roofline = timed(
        "patch_scoring", lambda: bench_patch_scoring(rng, h, w)
    )
    record["patch_score_ms_per_image"] = round(patch_ms, 3)
    record["patch_roofline"] = roofline
    emit()

    # ---- extended sections: budget-guarded (min_s ≈ worst-case cold
    # compile through the tunnel + measurement) and failure-isolated;
    # most valuable first so a tight budget sheds the cheap tail ----
    record["sections_skipped"] = skipped

    def section(name: str, min_s: float, fn) -> None:
        if remaining() < min_s:
            skipped.append(name)
        else:
            try:
                timed(name, fn)
            except Exception as e:  # never sink the artifact
                record.setdefault("section_errors", {})[name] = repr(e)[:200]
        emit()

    # A/B variants (labeled, not the headline): batch 256 is the
    # measured-throughput batch recommendation (the reference's bs-96
    # stays the accuracy-parity default, datasets.py:501); bank_fill_
    # rows=32 is the round-2 throughput opt-in (≈⅓ the fill-forward
    # work); stem_s2d is the space-to-depth conv1 experiment
    def _b256() -> None:
        ms, ips, _, _ = bench_train_step(rng, h, w, 256, n_images, iters=12)
        record["train_step_b256_ms"] = round(ms, 2)
        record["train_b256_images_per_sec"] = round(ips, 1)

    def _fill32() -> None:
        ms, _, _, _ = bench_train_step(
            rng, h, w, batch, n_images, ModelConfig(bank_fill_rows=32), iters=20
        )
        record["train_step_fill32_ms"] = round(ms, 2)

    def _s2d() -> None:
        ms, _, _, _ = bench_train_step(
            rng, h, w, batch, n_images, ModelConfig(stem_s2d=True), iters=20
        )
        record["train_step_s2d_ms"] = round(ms, 2)

    def _patch16() -> None:
        ms, _ = bench_patch_scoring(rng, h, w, bs=16)
        record["patch_score_bs16_ms_per_image"] = round(ms, 3)

    def _image() -> None:
        record["image_score_ms_per_image"] = round(
            bench_image_scoring(rng, h, w), 3
        )

    def _knn() -> None:
        tiled_ms, xla_ms = bench_knn_wide_bank(rng)
        record["knn_wide_bank_tiled_ms"] = round(tiled_ms, 3)
        record["knn_wide_bank_xla_ms"] = round(xla_ms, 3)

    def _pxm() -> None:
        dev_ms, host_ms = bench_pixel_metrics(rng)
        record["pixel_metrics_device_ms"] = round(dev_ms, 2)
        record["pixel_metrics_host_ms"] = round(host_ms, 2)

    section("train_step_b256", 300, _b256)
    section("train_step_fill32", 240, _fill32)
    section("train_step_s2d", 240, _s2d)
    section("patch_score_bs16", 180, _patch16)
    section("image_scoring", 120, _image)
    section("knn_wide_bank", 120, _knn)
    section("pixel_metrics", 120, _pxm)


if __name__ == "__main__":
    main()
