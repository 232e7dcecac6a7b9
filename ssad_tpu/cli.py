"""Command-line interface.

The reference has no CLI at all — configuration is hand-edited __main__
blocks (evaluator.py:656-699, localizer.py:233-266) and kwargs.  This
exposes the full workflow:

    python -m ssad_tpu.cli train     --dataset-dir D --subject bottle --outputs-dir O
    python -m ssad_tpu.cli evaluate  --dataset-dir D --models-dir O --subjects bottle,carpet
    python -m ssad_tpu.cli infer     --dataset-dir D --models-dir O --subject bottle
    python -m ssad_tpu.cli localize  --dataset-dir D --models-dir O --subject bottle
    python -m ssad_tpu.cli qa        --dataset-dir D --subject bottle --outputs-dir O
    python -m ssad_tpu.cli sweep     --dataset-dir D --outputs-dir O   (train all categories)
    python -m ssad_tpu.cli train-multi --dataset-dir D --subjects all --stack 4
    python -m ssad_tpu.cli profile   --dataset-dir D --subject bottle --profile-dir T
    python -m ssad_tpu.cli parity    --outputs-dir O   (end-to-end accuracy run)
    python -m ssad_tpu.cli export    --models-dir O --subject bottle   (AOT artifact)
    python -m ssad_tpu.cli serve     --artifact O/bottle/bottle_image.ssadexp
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

from ssad_tpu import constants
from ssad_tpu.config import (
    DataConfig, EvalConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)


def _train_cfg(args, n_model: int = 1) -> TrainConfig:
    return TrainConfig(
        data=DataConfig(
            dataset_dir=args.dataset_dir,
            subject=args.subject,
            imsize=(args.imsize, args.imsize),
            batch_size=args.batch_size,
            seed=args.seed,
            patch_localization=args.patch_level,
            patch_size=args.patch_size,
            min_dataset_length=getattr(args, "min_dataset_length", 1000),
        ),
        model=ModelConfig(backbone=getattr(args, 'backbone', 'resnet18'),
                          pretrained_backbone=args.pretrained_backbone),
        optim=OptimConfig(
            projection_epochs=args.projection_epochs,
            projection_lr=args.projection_lr,
            fine_tune_epochs=args.fine_tune_epochs,
            fine_tune_lr=args.fine_tune_lr,
        ),
        mesh=MeshConfig(
            data_axis=getattr(args, "data_shards", None) or -1,
            model_axis=n_model,
        ),
        outputs_dir=args.outputs_dir,
        seed=args.seed,
    )


def cmd_train(args) -> int:
    from ssad_tpu.data import mvtec
    from ssad_tpu.train import checkpoint as ckpt
    from ssad_tpu.train.trainer import (
        GracefulPreemption, Trainer, TrainingPreempted,
    )

    cfg = _train_cfg(args)
    mesh = None
    if getattr(args, "data_shards", None):
        # single-category data parallelism: shard the synthesized batch
        # over a (1, N) mesh; XLA all-reduces the gradients over ICI
        import jax

        from ssad_tpu.parallel.mesh import mesh_from_config

        if args.data_shards > len(jax.devices()):
            raise SystemExit(
                f"--data-shards {args.data_shards} > {len(jax.devices())} "
                "available devices"
            )
        mesh = mesh_from_config(cfg.mesh)
    data = mvtec.prepare_pretext_data(
        cfg.data.dataset_dir, cfg.data.subject, imsize=cfg.data.imsize,
        val_fraction=cfg.data.train_val_split, seed=cfg.data.seed,
        patch_localization=cfg.data.patch_localization,
    )
    resume_dir = getattr(args, "resume_dir", None)
    trainer = Trainer(cfg, data, mesh=mesh)
    if resume_dir is not None:
        # graceful preemption: SIGTERM finishes the epoch, the snapshot
        # persists, and we exit 75 (EX_TEMPFAIL) with a resume hint —
        # a supervisor re-running the SAME command continues from there
        try:
            with GracefulPreemption() as guard:
                result = trainer.fit(
                    seed=cfg.seed, verbose=not args.quiet,
                    resume_dir=resume_dir, stop_requested=guard,
                )
        except TrainingPreempted as p:
            print(json.dumps({
                "preempted": True,
                "subject": args.subject,
                "stage": p.stage,
                "epochs_done": p.epoch + 1,
                "resume_dir": resume_dir,
                "hint": "re-run the same command to continue",
            }))
            return 75
    else:
        result = trainer.fit(seed=cfg.seed, verbose=not args.quiet)
    out = Path(args.outputs_dir) / args.subject
    path = ckpt.save_checkpoint(out, result.params, result.batch_stats, result.bank, cfg)
    if result.best_params is not None:
        ckpt.save_checkpoint(
            out / "logs", result.best_params, result.best_batch_stats, None, cfg,
            name="best_model_so_far",
        )
    from ssad_tpu.evaluation import visualization as vis

    vis.plot_history(
        {k: v for k, v in result.history.items() if k.startswith("projection")},
        out, mode="training",
    )
    vis.plot_history(
        {k: v for k, v in result.history.items() if k.startswith("fine_tune")},
        out, mode="fine_tune",
    )
    _write_history_json(out, result.history)
    print(f"checkpoint: {path}")
    return 0


def _write_history_json(out_dir, history) -> None:
    """Numeric twin of the history plots: per-epoch loss/accuracy as
    plain JSON, so runs can be compared/regressed without parsing PNGs."""
    payload = {k: [float(x) for x in v] for k, v in history.items()}
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "history.json").write_text(json.dumps(payload, indent=1))


def cmd_sweep(args) -> int:
    from ssad_tpu.train.trainer import GracefulPreemption

    subjects = _subjects(args)
    base_resume = getattr(args, "resume_dir", None)
    with GracefulPreemption() as guard:
        for i, subject in enumerate(subjects):
            if guard():
                # drained BETWEEN subjects (a drain DURING a subject's
                # fit surfaces as cmd_train's rc=75 below); finished
                # categories keep their checkpoints — re-running with
                # --skip-existing (or per-subject resume dirs) continues
                print(json.dumps({
                    "preempted": True,
                    "remaining": subjects[i:],
                    "hint": "re-run with --skip-existing to continue",
                }))
                return 75
            if getattr(args, "skip_existing", False) and (
                Path(args.outputs_dir) / subject / "best_model"
            ).exists():
                # restartable sweeps: a crash at category 12/15 must not
                # re-train the finished 11 (each is hours on real data)
                print(f"=== {subject}: checkpoint exists, skipping ===")
                continue
            args.subject = subject
            if base_resume is not None:
                args.resume_dir = str(Path(base_resume) / subject)
            print(f"=== training {subject} ===")
            rc = cmd_train(args)
            if rc:
                return rc
    return 0


def cmd_train_multi(args) -> int:
    """Train several categories simultaneously as one stacked SPMD
    program over the ('model','data') device mesh.

    With --coordinator, this process joins a multi-controller run
    (jax.distributed): every participating host launches the SAME
    command with its own --process-id, the global mesh spans all their
    devices, and the 'model' axis rides DCN across hosts (the
    embarrassingly-parallel category axis — parallel/distributed.py).
    Each host must see the dataset at --dataset-dir; artifacts are
    written by process 0 only, so point --outputs-dir (and any
    --resume-dir) at a shared filesystem for cross-host runs."""
    if getattr(args, "coordinator", None):
        if args.num_processes is None or args.process_id is None:
            raise SystemExit(
                "--coordinator requires --num-processes and --process-id"
            )
        from ssad_tpu.parallel import distributed as dist_mod

        dist_mod.initialize(
            args.coordinator, args.num_processes, args.process_id,
            local_cpu_devices=args.local_devices,
        )
    import jax

    from ssad_tpu.data import mvtec
    from ssad_tpu.parallel.category_parallel import fit_categories
    from ssad_tpu.parallel.mesh import mesh_from_config

    subjects = _subjects(args)
    n_dev = len(jax.devices())
    if args.model_shards:
        n_model = args.model_shards
    else:
        # largest divisor of the device count ≤ the subject count —
        # and, when --stack is given, one that divides the stack so
        # fit_categories' stack % n_model check always passes
        def ok(d):
            if n_dev % d or d > max(len(subjects), 1):
                return False
            return args.stack is None or args.stack % d == 0
        n_model = max((d for d in range(1, n_dev + 1) if ok(d)), default=1)
    cfg = _train_cfg(
        argparse.Namespace(**{**vars(args), "subject": subjects[0]}), n_model=n_model
    )
    # the saved config records the mesh the run actually used;
    # mesh_from_config is the one translation point (config ↔ mesh)
    mesh = mesh_from_config(cfg.mesh)
    datas = [
        mvtec.prepare_pretext_data(
            args.dataset_dir, s, imsize=cfg.data.imsize, seed=args.seed,
            val_fraction=cfg.data.train_val_split,
            patch_localization=cfg.data.patch_localization,
        )
        for s in subjects
    ]
    from ssad_tpu.train.trainer import GracefulPreemption, TrainingPreempted

    preempted = None
    try:
        if args.resume_dir is not None:
            # coordinated drain: SIGTERM on ANY controller latches a
            # local flag; fit_categories polls the cross-process OR at
            # each epoch boundary (dist.global_any), so every process
            # raises TrainingPreempted at the SAME persisted boundary
            with GracefulPreemption() as guard:
                try:
                    results = fit_categories(
                        cfg, subjects, datas, mesh, seed=args.seed,
                        verbose=not args.quiet, stack_size=args.stack,
                        resume_dir=args.resume_dir, stop_requested=guard,
                    )
                except TrainingPreempted as p:
                    preempted = p
        else:
            results = fit_categories(cfg, subjects, datas, mesh, seed=args.seed,
                                     verbose=not args.quiet, stack_size=args.stack,
                                     resume_dir=args.resume_dir)
        if preempted is not None:
            if jax.process_index() == 0:
                print(json.dumps({
                    "preempted": True,
                    "stage": preempted.stage,
                    "epochs_done": preempted.epoch + 1,
                    "resume_dir": args.resume_dir,
                    "hint": "re-run the same command on every host to continue",
                }))
            return 75
        if jax.process_index() == 0:
            _write_train_multi_artifacts(args, cfg, results)
    finally:
        import sys as _sys

        _train_multi_exit_barrier(failing=_sys.exc_info()[0] is not None)
    return 0


def _train_multi_exit_barrier(failing: bool) -> None:
    """Exit rendezvous for `train-multi` controllers.

    Hold EVERY controller until process 0's artifact writes are done.
    Returning early (the old behavior) dropped fast processes into
    jax.distributed's atexit Shutdown barrier; when process 0's
    checkpoint + matplotlib writing outlasted that deadline, the
    coordination service fatally killed it mid-write
    (test_cli_train_multi_two_processes).  A pure KV-store barrier has
    no collective deadline and absorbs the skew regardless of how slow
    the writes are.

    `failing` = an exception is already propagating (a controller died
    with a non-preemption error).  The dead peer will never reach the
    barrier: use a short timeout so survivors don't hang for the full
    1200 s, and never let the barrier's own timeout exception mask the
    original traceback (raise-in-finally replaces the in-flight
    exception) — log and swallow instead.
    """
    import sys as _sys

    from ssad_tpu.parallel import distributed as dist

    try:
        dist.barrier(
            "ssad:train_multi_done", timeout_s=30.0 if failing else 1200.0
        )
    except Exception as be:
        if not failing:
            raise
        print(f"train-multi: exit barrier skipped after error: {be}",
              file=_sys.stderr)


def _write_train_multi_artifacts(args, cfg, results) -> None:
    """Process-0-only artifact writing for `train-multi` (hosts may not
    share a filesystem, and every controller holds all results via
    dist.to_host gathers — one writer suffices)."""
    from ssad_tpu.evaluation import visualization as vis
    from ssad_tpu.train import checkpoint as ckpt

    for subject, r in results.items():
        out = Path(args.outputs_dir) / subject
        # stamp THIS category into the saved config: the shared cfg was
        # built from subjects[0], and downstream consumers key on it
        # (export bakes meta["subject"] for /score/<name> routing;
        # augmentation policy branches on fixed/non-fixed taxonomy)
        sub_cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, subject=subject)
        )
        path = ckpt.save_checkpoint(out, r.params, r.batch_stats, r.bank, sub_cfg)
        # identical per-category artifacts to `train`: best-val-loss
        # snapshot + loss/accuracy history plots
        if r.best_params is not None:
            ckpt.save_checkpoint(
                out / "logs", r.best_params, r.best_batch_stats, None, sub_cfg,
                name="best_model_so_far",
            )
        vis.plot_history(
            {k: v for k, v in r.history.items() if k.startswith("projection")},
            out, mode="training",
        )
        vis.plot_history(
            {k: v for k, v in r.history.items() if k.startswith("fine_tune")},
            out, mode="fine_tune",
        )
        _write_history_json(out, r.history)
        print(f"{subject}: {path}")


def cmd_evaluate(args) -> int:
    from ssad_tpu.evaluation.evaluator import evaluate_categories

    cfg = EvalConfig(
        patch_localization=args.patch_level,
        patch_dim=args.patch_dim,
        stride=args.stride,
        imsize=(args.imsize, args.imsize),
        batch_size=args.batch_size,
        seed=args.seed,
        scorer=args.scorer,
        data_shards=args.data_shards,
        category_shards=args.category_shards,
        n_normality_images=args.n_normality_images,
        coreset=args.coreset,
        knn_k=args.knn_k,
        device_metrics=False if args.host_metrics else None,
    )
    # (coreset + scorer=mahalanobis gets its no-effect note from
    # attach_anomaly_scores — once per process, shared with `infer`)
    if args.coreset is not None and args.scorer == "knn" and args.knn_k > 1:
        print(
            f"note: --coreset with --knn-k {args.knn_k}: a maximin-spread "
            "bank makes the 2nd/3rd neighbors far by construction, "
            "inflating normal scores — consider --knn-k 1 (measured: a "
            "2.9% coreset at k=1 matches the full bank; SCORER_AB.md)",
            file=sys.stderr,
        )
    results = evaluate_categories(
        args.dataset_dir, args.models_dir, _subjects(args), cfg, args.outputs_dir
    )
    for s, r in results.items():
        row = (
            f"pixel_auroc={r.pixel_auroc:.4f} iou={r.iou:.4f} aupro={r.aupro:.4f}"
            if args.patch_level
            else f"image_auroc={r.image_auroc:.4f} f1={r.image_f1:.4f}"
        )
        print(f"{s}: {row}")
    return 0


def cmd_localize(args) -> int:
    from ssad_tpu.data import mvtec
    from ssad_tpu.evaluation import inference as inf
    from ssad_tpu.evaluation.localizer import Localizer

    cfg = EvalConfig(
        patch_localization=args.patch_level,
        patch_dim=args.patch_dim,
        stride=args.stride,
        imsize=(args.imsize, args.imsize),
    )
    engine, bank, _ = inf.load_engine(
        str(Path(args.models_dir) / args.subject / "best_model")
    )
    data = mvtec.prepare_pretext_data(args.dataset_dir, args.subject, imsize=cfg.imsize)
    test = mvtec.prepare_mvtec_test_data(args.dataset_dir, args.subject, imsize=cfg.imsize)
    loc = Localizer(engine, cfg).setup(data)
    paths = loc.localize(
        test, str(Path(args.outputs_dir) / args.subject), args.num_images,
        seed=args.seed,
    )
    print("\n".join(paths))
    return 0


def cmd_qa(args) -> int:
    """Render augmentation-QA grids (reference
    test_artificial_transformations.py:226-435)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssad_tpu.data import mvtec
    from ssad_tpu.data.synthetic import SynthSpec, batched_synthesizer
    from ssad_tpu.evaluation import visualization as vis
    from ssad_tpu.ops import image as im

    data = mvtec.prepare_pretext_data(
        args.dataset_dir, args.subject, imsize=(args.imsize, args.imsize)
    )
    spec = SynthSpec(
        subject=args.subject, imsize=(args.imsize, args.imsize),
        patch_localization=args.patch_level, patch_size=args.patch_size,
    )
    synth = jax.jit(batched_synthesizer(spec, per_image_masks=False))
    b = 64
    keys = jax.random.split(jax.random.key(args.seed), b)
    idx = np.random.default_rng(args.seed).integers(0, data.train_images.shape[0], b)
    x, y, _ = synth(
        keys, jnp.asarray(data.train_images[idx]), jnp.asarray(data.cut_pool),
        jnp.int32(data.cut_pool.shape[0]), jnp.asarray(data.fixed_mask),
        jnp.asarray(data.fixed_coords), jnp.int32(data.fixed_count),
    )
    x = np.asarray(jax.vmap(im.denormalize_imagenet)(x)).clip(0, 1)
    y = np.asarray(y)
    groups = {lbl: [x[i] for i in np.where(y == lbl)[0][:6]] for lbl in range(4)}
    out = vis.augmentation_grid(
        groups, Path(args.outputs_dir) / args.subject / "dataset_analysis",
        f"{args.subject}_augmentations.png",
    )
    counts = np.bincount(y, minlength=4).tolist()
    print(json.dumps({"grid": out, "label_counts": counts}))
    return 0


def cmd_infer(args) -> int:
    """Reference tools.inference (tools.py:310-390): load a trained
    checkpoint, forward the MVTec test set (or synthetic pretext data),
    fit the detector on normality and attach anomaly scores; writes an
    .npz with scores/labels/threshold and prints a one-line summary."""
    import json as _json

    import jax
    import numpy as np

    from ssad_tpu.data import mvtec
    from ssad_tpu.data.synthetic import SynthSpec
    from ssad_tpu.evaluation import inference as inf

    engine, bank, tcfg = inf.load_engine(
        str(Path(args.models_dir) / args.subject / "best_model")
    )
    if args.data_shards and args.data_shards > 1:
        from ssad_tpu.parallel.infer_parallel import maybe_shard_engine

        engine = maybe_shard_engine(engine, args.data_shards)
    imsize = (args.imsize, args.imsize)
    patch = args.patch_level
    if args.artificial and patch:
        # artificial prediction yields whole-sample embeddings; there is
        # no patch grid to reshape into maps (reference inference with
        # mvtec_inference=False is image-level only, tools.py:339-345)
        raise SystemExit("--artificial and --patch-level are mutually exclusive")
    data = mvtec.prepare_pretext_data(args.dataset_dir, args.subject, imsize=imsize)
    if args.artificial:
        spec = SynthSpec(subject=args.subject, imsize=imsize)
        outputs = inf.predict_artificial(
            engine, data, spec, num_samples=args.num_samples,
            batch_size=args.batch_size, seed=args.seed,
        )
    else:
        test = mvtec.prepare_mvtec_test_data(args.dataset_dir, args.subject, imsize=imsize)
        outputs = inf.predict_mvtec(
            engine, test,
            # patch mode embeds 841 patches/image — cap like the evaluator
            batch_size=args.batch_size if not patch else max(1, min(8, args.batch_size)),
            patch_localization=patch, patch_dim=args.patch_dim, stride=args.stride,
        )
    normality = inf.normality_embeddings(
        engine, None if patch else bank, data,
        patch_localization=patch, patch_dim=args.patch_dim, stride=args.stride,
        max_images=3 if patch else None, seed=args.seed,
    )
    n_img = None
    ppi = None
    if patch:
        from ssad_tpu.ops import patches as patches_mod

        side = patches_mod.grid_side(args.imsize, args.patch_dim, args.stride)
        ppi = side * side
        n_img = outputs.embeddings.shape[0] // ppi
    outputs, detector = inf.attach_anomaly_scores(
        outputs, normality, patch_localization=patch, num_images=n_img,
        patches_per_image=ppi, k=args.knn_k, seed=args.seed,
        scorer=args.scorer, coreset=args.coreset,
    )
    maps = outputs.anomaly_maps
    if patch:
        maps = inf.upsample(maps[:, 0], args.imsize)
    out = Path(args.outputs_dir) / args.subject
    out.mkdir(parents=True, exist_ok=True)
    path = out / ("inference_artificial.npz" if args.artificial else "inference.npz")
    np.savez_compressed(
        path,
        anomaly=np.asarray(maps),
        y_true=np.asarray(outputs.y_true_binary),
        y_hat=np.asarray(outputs.y_hat),
        threshold=detector.threshold,
    )
    print(_json.dumps({
        "subject": args.subject,
        "mode": "patch" if patch else "image",
        "n": int(np.asarray(outputs.y_hat).shape[0]),
        "threshold": float(detector.threshold),
        "outputs": str(path),
    }))
    return 0


# every command routes through main() below, which enables the
# persistent XLA compile cache; the implementation lives beside the
# serving commands that also call it directly
from ssad_tpu.serving.cli import compile_cache as _serving_compile_cache



def cmd_doctor(args) -> int:
    """Environment self-check, printed as one JSON line.

    The backend probe runs in a SUBPROCESS with a timeout because the
    failure mode it exists to catch — a dead remote-TPU tunnel — makes
    `jax.devices()` hang indefinitely, which would otherwise hang the
    doctor itself.  Also checks compile-cache writability and the
    native C++ loader build."""
    import os
    import subprocess
    import sys

    report = {"python": sys.version.split()[0]}
    try:
        import jax

        report["jax"] = jax.__version__
    except Exception as e:  # pragma: no cover - jax is baked in
        report["jax"] = f"import failed: {e!r}"

    plat = getattr(args, "platform", None)
    force = (
        f"import jax; jax.config.update('jax_platforms', {plat!r})\n"
        if plat else "import jax\n"
    )
    probe = force + (
        "ds = jax.devices()\n"
        "import json; print(json.dumps({'platform': ds[0].platform,"
        " 'device_kind': ds[0].device_kind, 'n_devices': len(ds)}))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=args.probe_timeout,
        )
        if out.returncode == 0:
            report["backend"] = json.loads(out.stdout.strip().splitlines()[-1])
        else:
            report["backend"] = {
                "error": (out.stderr or "").strip().splitlines()[-1:]
            }
    except subprocess.TimeoutExpired:
        report["backend"] = {
            "error": f"unreachable: jax.devices() hung >{args.probe_timeout}s "
                     "(remote-TPU tunnel down?)"
        }

    cache = os.environ.get("SSAD_JAX_CACHE", "/tmp/ssad_tpu_jax_cache")
    try:
        Path(cache).mkdir(parents=True, exist_ok=True)
        probe_file = Path(cache) / ".doctor_probe"
        probe_file.write_text("ok")
        probe_file.unlink()
        report["compile_cache"] = {"dir": cache, "writable": True}
    except OSError as e:
        report["compile_cache"] = {"dir": cache, "writable": False,
                                   "error": repr(e)}

    try:
        from ssad_tpu import native

        report["native_loader"] = {"available": bool(native.available())}
    except Exception as e:
        report["native_loader"] = {"available": False, "error": repr(e)}

    ok = (
        isinstance(report.get("backend"), dict)
        and "error" not in report["backend"]
        and report["compile_cache"]["writable"]
    )
    report["ok"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 1


def cmd_profile(args) -> int:
    """Capture a jax.profiler device trace of a hot program — the fused
    train step (--what train) or the fused patch-scoring program
    (--what patch, the serving-relevant inference unit) — view with
    TensorBoard/xprof (SURVEY §5.1 — absent in the ref)."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from ssad_tpu.data import mvtec
    from ssad_tpu.utils import profiling

    cfg = _train_cfg(args)

    if getattr(args, "what", "train") == "patch":
        import numpy as np

        from ssad_tpu.evaluation.inference import InferenceEngine
        from ssad_tpu.models.peranet import build_model, init_model

        h, w = cfg.data.imsize
        bs = args.profile_batch
        model = build_model(cfg.model)
        params, stats = init_model(model, jax.random.key(cfg.seed), (1, 64, 64, 3))
        engine = InferenceEngine(model, params, stats)
        rng = np.random.default_rng(cfg.seed)
        bank = jnp.asarray(rng.random((1000, 512), dtype=np.float32))
        x = jnp.asarray(rng.random((bs, h, w, 3), dtype=np.float32))

        def run():
            return engine.score_patch_maps(
                x, bank, dim=args.patch_dim, stride=args.stride, upsample_to=h
            )

        jax.block_until_ready(run())  # compile
        timer = profiling.StepTimer(items_per_step=bs)
        with profiling.trace(args.profile_dir):
            for _ in range(args.steps):
                timer.start()
                maps = run()
                timer.stop(sync=maps)
    else:
        from ssad_tpu.train.trainer import Trainer

        data = mvtec.prepare_pretext_data(
            cfg.data.dataset_dir, cfg.data.subject, imsize=cfg.data.imsize,
            patch_localization=cfg.data.patch_localization,
        )
        trainer = Trainer(cfg, data)
        state = trainer.init_state(jax.random.key(cfg.seed), "fine_tune")
        step, _, _, _ = trainer._get_step_fns("fine_tune")
        tr = trainer._device_data("train")
        fill = jnp.asarray(True)
        state, m = step(state, jax.random.key(1), *tr, fill)  # compile
        jax.block_until_ready(m["loss"])
        timer = profiling.StepTimer(items_per_step=cfg.data.batch_size)
        with profiling.trace(args.profile_dir):
            for i in range(args.steps):
                timer.start()
                state, m = step(state, jax.random.key(i + 2), *tr, fill)
                timer.stop(sync=m["loss"])
    print(_json.dumps({
        "trace_dir": args.profile_dir,
        **timer.summary(),
        "memory": profiling.device_memory_stats(),
    }))
    return 0


def cmd_parity(args) -> int:
    """End-to-end accuracy-parity run (see ssad_tpu/parity.py)."""
    from ssad_tpu.parity import run_parity

    subjects = None
    if args.subjects and args.subjects != "default":
        subjects = (
            list(constants.ALL_CATEGORIES) if args.subjects == "all"
            else [s.strip() for s in args.subjects.split(",") if s.strip()]
        )
    run_parity(
        dataset_dir=args.dataset_dir,
        outputs_dir=args.outputs_dir,
        subjects=subjects,
        imsize=args.imsize,
        batch_size=args.batch_size,
        projection_epochs=args.projection_epochs,
        fine_tune_epochs=args.fine_tune_epochs,
        pretrained_backbone=args.pretrained_backbone,
        backbone=args.backbone,
        patch_dim=args.patch_dim,
        stride=args.stride,
        modes=[m.strip() for m in args.modes.split(",") if m.strip()],
        seed=args.seed,
        verbose=not args.quiet,
    )
    return 0


def cmd_import_ckpt(args) -> int:
    """Import a reference-trained Lightning checkpoint (best_model.ckpt,
    tools.py:304-306) as a native checkpoint directory, so evaluate /
    infer / localize / export / serve run on a model trained with the
    reference codebase — no retraining (utils/ref_checkpoint.py)."""
    import json as _json

    from ssad_tpu.train.checkpoint import save_checkpoint
    from ssad_tpu.utils.ref_checkpoint import load_reference_checkpoint

    params, batch_stats, bank, mcfg = load_reference_checkpoint(
        args.ckpt, allow_pickle=args.allow_pickle
    )
    cfg = TrainConfig(
        data=DataConfig(subject=args.subject, imsize=(args.imsize, args.imsize)),
        model=mcfg,
    )
    out = Path(args.models_dir) / args.subject
    out.mkdir(parents=True, exist_ok=True)
    path = save_checkpoint(out, params, batch_stats, bank, cfg)
    print(_json.dumps({
        "subject": args.subject,
        "checkpoint": path,
        "bank_rows": int(bank.count) if bank is not None else 0,
        "model": dataclasses.asdict(mcfg),
    }))
    return 0


def _subjects(args):
    if args.subjects == "all":
        return list(constants.ALL_CATEGORIES)
    return [s.strip() for s in args.subjects.split(",") if s.strip()]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ssad_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, models=False):
        sp.add_argument("--dataset-dir", required=True)
        sp.add_argument("--outputs-dir", default="outputs")
        sp.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"],
                        help="force a JAX backend (the JAX_PLATFORMS env var "
                             "may be overridden by platform plugins)")
        if models:
            sp.add_argument("--models-dir", required=True)
        sp.add_argument("--imsize", type=int, default=256)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--patch-level", action="store_true")
        sp.add_argument("--patch-dim", type=int, default=32)
        sp.add_argument("--patch-size", type=int, default=64)
        sp.add_argument("--stride", type=int, default=8)
        sp.add_argument("--batch-size", type=int, default=96)

    t = sub.add_parser("train", help="train one category")
    common(t)
    t.add_argument("--subject", required=True)
    t.add_argument("--projection-epochs", type=int, default=10)
    t.add_argument("--projection-lr", type=float, default=0.03)
    t.add_argument("--fine-tune-epochs", type=int, default=30)
    t.add_argument("--fine-tune-lr", type=float, default=0.005)
    t.add_argument("--backbone", default="resnet18",
                   choices=["resnet18", "resnet34", "resnet50", "wide_resnet50_2"])
    t.add_argument("--pretrained-backbone", default=None,
                   help="path to a torchvision resnet18 state_dict (.pth)")
    t.add_argument("--data-shards", type=int, default=None,
                   help="shard the batch over the first N devices "
                        "(single-category data parallelism)")
    t.add_argument("--min-dataset-length", type=int, default=1000,
                   help="duplicate the train file list up to this length "
                        "per epoch (reference datasets.py:410)")
    t.add_argument("--resume-dir", default=None,
                   help="write epoch-granular resume snapshots here and "
                        "continue from an existing one")
    t.add_argument("--quiet", action="store_true")
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("sweep", help="train several categories")
    common(s)
    s.add_argument("--subjects", default="all")
    s.add_argument("--skip-existing", action="store_true",
                   help="skip subjects whose best_model checkpoint "
                        "already exists (restartable sweeps)")
    s.add_argument("--projection-epochs", type=int, default=10)
    s.add_argument("--projection-lr", type=float, default=0.03)
    s.add_argument("--fine-tune-epochs", type=int, default=30)
    s.add_argument("--fine-tune-lr", type=float, default=0.005)
    s.add_argument("--backbone", default="resnet18",
                   choices=["resnet18", "resnet34", "resnet50", "wide_resnet50_2"])
    s.add_argument("--pretrained-backbone", default=None)
    s.add_argument("--min-dataset-length", type=int, default=1000,
                   help="duplicate the train file list up to this length "
                        "per epoch (reference datasets.py:410)")
    s.add_argument("--resume-dir", default=None,
                   help="base directory for per-subject epoch-granular "
                        "resume snapshots (<dir>/<subject>); also arms "
                        "the SIGTERM graceful-preemption drain")
    s.add_argument("--quiet", action="store_true")
    s.set_defaults(fn=cmd_sweep)

    tm = sub.add_parser(
        "train-multi", help="train categories simultaneously on a device mesh"
    )
    common(tm)
    tm.add_argument("--subjects", default="all")
    tm.add_argument("--model-shards", type=int, default=None,
                    help="mesh 'model' axis size (default: min(#subjects, #devices))")
    tm.add_argument("--stack", type=int, default=None,
                    help="categories trained simultaneously per chunk (a "
                         "multiple of --model-shards; several categories can "
                         "stack on one chip)")
    tm.add_argument("--projection-epochs", type=int, default=10)
    tm.add_argument("--projection-lr", type=float, default=0.03)
    tm.add_argument("--fine-tune-epochs", type=int, default=30)
    tm.add_argument("--fine-tune-lr", type=float, default=0.005)
    tm.add_argument("--backbone", default="resnet18",
                    choices=["resnet18", "resnet34", "resnet50", "wide_resnet50_2"])
    tm.add_argument("--pretrained-backbone", default=None)
    tm.add_argument("--min-dataset-length", type=int, default=1000,
                    help="duplicate the train file list up to this length "
                         "per epoch (reference datasets.py:410)")
    tm.add_argument("--resume-dir", default=None,
                    help="write per-group epoch-granular resume snapshots "
                         "here and continue from existing ones; also arms "
                         "the coordinated SIGTERM drain (a signal on ANY "
                         "controller drains ALL of them at the same "
                         "persisted epoch boundary; exit 75)")
    tm.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="join a multi-controller run: every host launches "
                         "this same command against one coordinator address "
                         "(jax.distributed); the global mesh spans all "
                         "hosts' devices and the category 'model' axis "
                         "rides DCN")
    tm.add_argument("--num-processes", type=int, default=None,
                    help="total controller processes in the "
                         "--coordinator run")
    tm.add_argument("--process-id", type=int, default=None,
                    help="this controller's index (0-based; process 0 "
                         "writes all artifacts)")
    tm.add_argument("--local-devices", type=int, default=None,
                    help="provision N virtual CPU devices in this process "
                         "before joining (dev/test rigs; real TPU hosts "
                         "auto-discover their chips)")
    tm.add_argument("--quiet", action="store_true")
    tm.set_defaults(fn=cmd_train_multi)

    e = sub.add_parser("evaluate", help="evaluate trained categories")
    common(e, models=True)
    e.add_argument("--subjects", default="all")
    e.add_argument("--scorer", default="knn", choices=["knn", "mahalanobis"],
                   help="anomaly scorer: the reference's k-NN cosine "
                        "detector or the parametric Gaussian alternative")
    e.add_argument("--data-shards", type=int, default=None,
                   help="shard scoring batches over the first N devices "
                        "(data-parallel inference via shard_map)")
    e.add_argument("--category-shards", type=int, default=None,
                   help="evaluate N categories concurrently, one whole "
                        "category per device (replica parallelism, zero "
                        "collectives; mutually exclusive with "
                        "--data-shards)")
    e.add_argument("--n-normality-images", type=int,
                   default=EvalConfig().n_normality_images,
                   help="patch mode: training images re-embedded for "
                        "normality (raise together with --coreset)")
    e.add_argument("--coreset", type=int, default=None,
                   help="distill normality to N rows by k-center-greedy "
                        "coreset selection before fitting the detector "
                        "(default: keep every row)")
    e.add_argument("--knn-k", type=int, default=EvalConfig().knn_k,
                   help="k-NN neighbors for anomaly scoring (reference "
                        "models.py:354 uses 3; with --coreset, k=1 is "
                        "the PatchCore-faithful choice — a maximin-"
                        "spread bank makes the 2nd/3rd neighbors far by "
                        "construction, inflating normal scores)")
    e.add_argument("--host-metrics", action="store_true",
                   help="force the host numpy metric oracles instead of "
                        "the fused on-device pixel-metrics program "
                        "(default: device metrics on accelerators)")
    e.set_defaults(fn=cmd_evaluate)

    inf_p = sub.add_parser(
        "infer", help="score a category with a trained model (tools.inference)"
    )
    common(inf_p, models=True)
    inf_p.add_argument("--subject", required=True)
    inf_p.add_argument("--artificial", action="store_true",
                       help="score synthetic pretext data instead of the "
                            "MVTec test set (mvtec_inference=False)")
    inf_p.add_argument("--num-samples", type=int, default=256)
    inf_p.add_argument("--knn-k", type=int, default=EvalConfig().knn_k,
                       help="k-NN neighbors for anomaly scoring "
                            "(models.py:354; keep in lockstep with evaluate)")
    inf_p.add_argument("--scorer", default="knn", choices=["knn", "mahalanobis"])
    inf_p.add_argument("--data-shards", type=int, default=None,
                       help="shard scoring batches over the first N devices "
                            "(data-parallel inference via shard_map)")
    inf_p.add_argument("--coreset", type=int, default=None,
                       help="distill normality to N rows by k-center-greedy "
                            "coreset selection before fitting the detector")
    inf_p.set_defaults(fn=cmd_infer)

    ic = sub.add_parser(
        "import-ckpt",
        help="import a reference-trained Lightning checkpoint "
             "(best_model.ckpt) as a native checkpoint directory",
    )
    ic.add_argument("--ckpt", required=True,
                    help="path to the reference best_model.ckpt")
    ic.add_argument("--models-dir", required=True,
                    help="checkpoint root; writes <models-dir>/<subject>/best_model")
    ic.add_argument("--subject", required=True)
    ic.add_argument("--imsize", type=int, default=256)
    ic.add_argument("--allow-pickle", action="store_true",
                    help="permit full unpickling when the safe torch loader "
                         "rejects the file (trusted checkpoints only)")
    ic.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"],
                    help="force a JAX backend (conversion itself is host work)")
    ic.set_defaults(fn=cmd_import_ckpt)

    pr = sub.add_parser(
        "profile", help="capture a device trace of the fused train step "
                        "or the fused patch-scoring program"
    )
    common(pr)
    pr.add_argument("--subject", required=True)
    pr.add_argument("--profile-dir", required=True)
    pr.add_argument("--steps", type=int, default=5)
    pr.add_argument("--what", default="train", choices=["train", "patch"],
                    help="program to trace: the fused train step, or the "
                         "fused patch scorer (timing is weight-independent; "
                         "random weights + bank at the product geometry)")
    pr.add_argument("--profile-batch", type=int, default=8,
                    help="image batch for --what patch")
    pr.add_argument("--projection-epochs", type=int, default=10)
    pr.add_argument("--projection-lr", type=float, default=0.03)
    pr.add_argument("--fine-tune-epochs", type=int, default=30)
    pr.add_argument("--fine-tune-lr", type=float, default=0.005)
    pr.add_argument("--backbone", default="resnet18",
                    choices=["resnet18", "resnet34", "resnet50", "wide_resnet50_2"])
    pr.add_argument("--pretrained-backbone", default=None)
    pr.set_defaults(fn=cmd_profile)

    # serving subcommands (export / serve / serve-bench / score /
    # evaluate-artifact) live in serving/cli.py with their shared
    # loaders; registered here so `python -m ssad_tpu.cli serve ...`
    # is unchanged
    from ssad_tpu.serving import cli as serving_cli

    serving_cli.register(sub)

    dr = sub.add_parser(
        "doctor",
        help="environment self-check (hang-proof backend probe, compile "
             "cache, native loader); exit 0 iff healthy",
    )
    dr.add_argument("--probe-timeout", type=float, default=60.0,
                    help="seconds before declaring the backend "
                         "unreachable (a dead remote-TPU tunnel hangs "
                         "jax.devices() forever)")
    dr.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    dr.set_defaults(fn=cmd_doctor)

    l = sub.add_parser("localize", help="qualitative localization panels")
    common(l, models=True)
    l.add_argument("--subject", required=True)
    l.add_argument("--num-images", type=int, default=5)
    l.set_defaults(fn=cmd_localize)

    q = sub.add_parser("qa", help="augmentation visual-QA grids")
    common(q)
    q.add_argument("--subject", required=True)
    q.set_defaults(fn=cmd_qa)

    pa = sub.add_parser(
        "parity",
        help="end-to-end accuracy-parity run (synthetic 3-category dataset "
             "by default; --dataset-dir runs the real MVTec sweep)",
    )
    pa.add_argument("--dataset-dir", default=None,
                    help="MVTec root; omit to generate the synthetic dataset")
    pa.add_argument("--outputs-dir", default="outputs/parity")
    pa.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    pa.add_argument("--subjects", default="default",
                    help="'default' (synthetic trio or all-15), 'all', or a list")
    pa.add_argument("--imsize", type=int, default=256)
    pa.add_argument("--batch-size", type=int, default=96)
    pa.add_argument("--projection-epochs", type=int, default=5)
    pa.add_argument("--fine-tune-epochs", type=int, default=15)
    pa.add_argument("--pretrained-backbone", default=None)
    pa.add_argument("--backbone", default="resnet18",
                    choices=["resnet18", "resnet34", "resnet50", "wide_resnet50_2"])
    pa.add_argument("--patch-dim", type=int, default=32)
    pa.add_argument("--stride", type=int, default=8)
    pa.add_argument("--modes", default="image,patch")
    pa.add_argument("--seed", type=int, default=0)
    pa.add_argument("--quiet", action="store_true")
    pa.set_defaults(fn=cmd_parity)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    _serving_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
