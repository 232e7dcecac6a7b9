"""Serving-side CLI subcommands (export / serve / serve-bench / score /
evaluate-artifact).

Split out of the main `ssad_tpu.cli` module: these five commands are
the deployment surface (AOT artifacts + the HTTP serving stack) and
share loaders/front-end glue none of the training/eval commands use.
They register into the main parser via `register(sub)`; `python -m
ssad_tpu.cli serve ...` is unchanged.  Module scope stays jax-free so
building the argparse tree never pays the jax import.

The reference has no deployment path at all — its inference is a live
Lightning predict loop (tools.py:310-390).
"""

from __future__ import annotations

import json
from pathlib import Path


def compile_cache():
    """Persistent XLA compile cache (every command, via main()): the
    first TPU compile goes through a remote tunnel (20 s–minutes per
    program), and no command — a serving restart, a train/evaluate
    rerun — should re-pay it.  Override the location with
    SSAD_JAX_CACHE; kept as a separate function because library users
    bypass main()."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SSAD_JAX_CACHE", "/tmp/ssad_tpu_jax_cache"),
    )



def cmd_export(args) -> int:
    """Checkpoint → self-contained AOT serving artifact (weights + bank
    + calibrated threshold baked into one serialized StableHLO program;
    serving/export.py).  The reference has no deployment path at all —
    its inference is a live Lightning predict loop (tools.py:310-390)."""
    import sys

    from ssad_tpu.serving.export import export_checkpoint

    compile_cache()
    if args.coreset is not None and args.scorer == "mahalanobis":
        print(
            "note: --coreset has no effect with --scorer mahalanobis (the "
            "Gaussian's mean/precision are fixed size regardless of row "
            "count; a maximin subset would bias the moments) — flag ignored",
            file=sys.stderr,
        )
    elif args.coreset is not None and (args.knn_k is None or args.knn_k > 1):
        print(
            "note: --coreset with k>1 scoring: a maximin-spread bank makes "
            "the 2nd/3rd neighbors far by construction, inflating normal "
            "scores — consider --knn-k 1 (SCORER_AB.md)",
            file=sys.stderr,
        )
    ckpt = str(Path(args.models_dir) / args.subject / "best_model")
    out = args.out or str(
        Path(args.models_dir) / args.subject / f"{args.subject}_{args.mode}.ssadexp"
    )
    path = export_checkpoint(
        ckpt, out, mode=args.mode, batch=args.batch,
        imsize=(args.imsize, args.imsize) if args.imsize else None,
        k=args.knn_k, platform=args.export_platform,
        patch_dim=args.patch_dim, stride=args.stride,
        dataset_dir=args.dataset_dir,
        n_normality_images=args.n_normality_images,
        dtype=args.dtype, scorer=args.scorer, seed=args.seed,
        coreset=args.coreset,
    )
    validation = None
    if getattr(args, "validate", False):
        import numpy as np

        from ssad_tpu.serving.export import load_scorer

        scorer = load_scorer(path)
        h, w = scorer.meta["imsize"]
        rng = np.random.default_rng(args.seed)
        x = rng.uniform(size=(args.batch, h, w, 3)).astype(np.float32)
        res = tuple(np.asarray(r) for r in scorer(x))
        validation = {
            "finite": bool(all(np.isfinite(r).all() for r in res)),
        }
        if args.dtype:
            # quantized export: drift vs a float export of the SAME
            # config.  Identical seed → identical normality fit and
            # threshold calibration, so the comparison isolates the
            # quantization (at the cost of re-running the export —
            # acceptable for an explicit --validate pass).
            ref_path = export_checkpoint(
                ckpt, str(Path(out).with_suffix(".float_ref.ssadexp")),
                mode=args.mode, batch=args.batch,
                imsize=(args.imsize, args.imsize) if args.imsize else None,
                k=args.knn_k, platform=args.export_platform,
                patch_dim=args.patch_dim, stride=args.stride,
                dataset_dir=args.dataset_dir,
                n_normality_images=args.n_normality_images,
                dtype=None, scorer=args.scorer, seed=args.seed,
                coreset=args.coreset,
            )
            try:
                ref = tuple(np.asarray(r) for r in load_scorer(ref_path)(x))
                validation["max_abs_score_drift"] = float(
                    np.max(np.abs(res[0].astype(np.float64) - ref[0]))
                )
                if args.mode == "image":
                    validation["label_agreement"] = float(
                        np.mean(res[1] == ref[1])
                    )
            finally:
                # the multi-MB float reference is a comparison scratch
                # artifact — never leave it beside the real export,
                # even when scoring it fails
                Path(ref_path).unlink(missing_ok=True)

    print(json.dumps({
        "artifact": path,
        "validation": validation,
        "mode": args.mode,
        "bytes": Path(path).stat().st_size,
    }))
    return 0


def _load_artifact_models(paths, max_delay_ms: float, max_queue, devices: int = 1):
    """Artifact paths → ({name: (BatchingScorer, meta)}, warmup_s).

    Each program is warmed BEFORE accepting traffic: the first
    execution of a deserialized program triggers (remote-tunneled)
    compilation that must not land on a live request's latency budget.
    With `devices` != 1 every model is replicated across that many
    local devices (0 = all; serving/replicas.py) and EACH replica is
    warmed — every placement compiles its own executable.
    Shared by `serve` and `serve-bench` so the benchmarked stack IS
    the served one."""
    from ssad_tpu.serving.export import load_scorer
    from ssad_tpu.serving.server import BatchingScorer

    devs = None
    if devices != 1:
        from ssad_tpu.serving.replicas import pick_devices

        devs = pick_devices(devices)
    models = {}
    total_warmup = 0.0
    for path in paths:
        scorer = load_scorer(path)
        name = scorer.meta.get("subject") or Path(path).stem
        if name in models:
            raise SystemExit(f"duplicate model name {name!r} ({path})")
        if devs is None:
            total_warmup += scorer.warmup()
            fns = scorer
        else:
            from ssad_tpu.serving.replicas import device_replicas

            reps = device_replicas(scorer, devs)
            for r in reps:
                total_warmup += r.warmup()
            fns = reps
        models[name] = (
            BatchingScorer(fns, batch=scorer.batch,
                           max_delay_ms=max_delay_ms,
                           max_queue=max_queue or None),
            scorer.meta,
        )
    return models, total_warmup


def _make_http_server(frontend: str, max_queue=None, **kw):
    """Pick the HTTP front end: 'stdlib' (serving/server.py,
    ThreadingHTTPServer) or 'native' (serving/native_frontend.py, the
    C++ epoll transport — measured 1.7× the qps at concurrency 16 on a
    1-core host; see README).  'native' falls back LOUDLY to stdlib
    when the C++ library cannot be built here.

    `max_queue` reaches the NATIVE transport's shed bound (the C++
    layer sheds before Python sees a request; 0/None disables).  The
    stdlib front end has no transport bound — its admission control
    lives entirely in the BatchingScorer, which both front ends already
    get via _load_artifact_models — so the flag must not silently mean
    a different depth per front end."""
    if frontend == "native":
        from ssad_tpu.serving import native_frontend

        if native_frontend.available():
            return (
                native_frontend.NativeAnomalyHTTPServer(
                    max_queue=max_queue, **kw
                ),
                "native",
            )
        print("WARNING: native front end unavailable (g++/build failed "
              "or SSAD_NATIVE=0); falling back to the stdlib front end",
              flush=True)
    from ssad_tpu.serving.server import AnomalyHTTPServer

    return AnomalyHTTPServer(**kw), "stdlib"


def cmd_serve(args) -> int:
    """Serve an exported artifact over HTTP with dynamic batching
    (serving/server.py).  Blocks until interrupted."""
    import time as _time

    compile_cache()
    models, total_warmup = _load_artifact_models(
        args.artifact, args.max_delay_ms, args.max_queue,
        devices=args.devices,
    )
    # POST /admin/reload re-runs THIS loader: re-reads the same
    # artifact paths (replaced on disk by a newer export), warms the
    # programs, and hot-swaps them without dropping traffic
    reloader = lambda: _load_artifact_models(  # noqa: E731
        args.artifact, args.max_delay_ms, args.max_queue,
        devices=args.devices,
    )
    server, frontend = _make_http_server(
        args.frontend, host=args.host, port=args.port,
        score_timeout=args.score_timeout, models=models,
        reloader=reloader, max_queue=args.max_queue,
    )
    server.start()
    print(json.dumps({
        "host": args.host,
        "port": server.port,
        "frontend": frontend,
        "models": {n: m.get("mode") for n, (_, m) in models.items()},
        "devices": args.devices,
        "warmup_s": round(total_warmup, 2),
    }), flush=True)
    # SIGTERM (the fleet-manager stop signal) drains like Ctrl-C:
    # in-flight requests finish, batchers close, the socket closes
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def cmd_serve_bench(args) -> int:
    """Load-benchmark the serving stack (serving/loadgen.py): closed-loop
    concurrent POSTs against either a freshly started in-process server
    (--artifact, warmed before traffic) or an already-running one
    (--url).  Prints one JSON line: qps, client latency percentiles,
    shed/error counts, and the server's batcher stats."""
    from urllib.parse import urlparse

    from ssad_tpu.serving import loadgen

    if bool(args.url) == bool(args.artifact):
        raise SystemExit("pass exactly one of --url or --artifact")

    server = None
    if args.artifact:
        compile_cache()
        models, _ = _load_artifact_models(
            args.artifact, args.max_delay_ms, args.max_queue,
            devices=args.devices,
        )
        server, _frontend = _make_http_server(
            args.frontend, host="127.0.0.1", port=0,
            score_timeout=args.score_timeout, models=models,
            max_queue=args.max_queue,
        )
        server.start()
        host, port = "127.0.0.1", server.port
        # validate --model in BOTH branches: silently benchmarking a
        # different model than the one the operator named is worse
        # than an error
        if args.model and args.model not in models:
            raise SystemExit(f"--model {args.model!r} not among {sorted(models)}")
        if len(models) == 1:
            name, (_, meta) = next(iter(models.items()))
            path = "/score"
        else:
            name = args.model or sorted(models)[0]
            meta = models[name][1]
            path = f"/score/{name}"
        imsize = tuple(meta["imsize"])
    else:
        u = urlparse(args.url)
        if u.scheme not in ("", "http"):
            raise SystemExit(
                f"--url scheme {u.scheme!r} is not supported (the load "
                f"generator speaks plain http)"
            )
        if not u.hostname:
            raise SystemExit(f"cannot parse host from --url {args.url!r}")
        host, port = u.hostname, u.port or 80
        path = f"/score/{args.model}" if args.model else (
            u.path if u.path and u.path != "/" else "/score"
        )
        imsize = (args.imsize, args.imsize)

    body = loadgen.npy_body(imsize, seed=args.seed)
    try:
        if args.warmup:
            # uncounted: warms connections, server threads, and (for a
            # cold remote server) the per-program-hash backend warmup
            loadgen.run_load(host, port, body, path=path,
                             concurrency=min(args.concurrency, 4),
                             total=args.warmup)
        report = loadgen.run_load(
            host, port, body, path=path,
            concurrency=args.concurrency, total=args.requests,
            timeout=args.score_timeout + 30.0, rate=args.rate,
        )
        report["target"] = f"http://{host}:{port}{path}"
        report["server_stats"] = loadgen.fetch_stats(host, port)
    finally:
        if server is not None:
            server.stop()
    print(json.dumps(report))
    return 0


def cmd_score(args) -> int:
    """Offline batch scoring of arbitrary image files with an exported
    AOT artifact — the deployment twin of `serve`: no MVTec layout, no
    checkpoint, no model code on the host.  Takes files and/or
    directories, writes scores.csv (and heatmap PNGs in patch mode with
    --heatmaps), prints one JSON summary line.  (The reference can only
    score data arranged as an MVTec category via its predict loop,
    tools.py:310-390.)"""
    import csv

    import numpy as np

    from ssad_tpu.data.mvtec import load_image
    from ssad_tpu.serving.export import load_scorer

    if bool(args.url) == bool(args.artifact):
        raise SystemExit("pass exactly one of --artifact or --url")
    if args.url:
        return _score_remote(args)

    compile_cache()
    scorer = load_scorer(args.artifact)
    h, w = scorer.meta["imsize"]
    mode = scorer.meta.get("mode", "image")

    paths = _collect_images(args.images)

    # fail on mis-shaped .npy files BEFORE any scoring happens (header
    # read only, no data load): a bad file sorting last must not abort
    # a folder run after hours of tunneled-TPU work
    for p in paths:
        if p.suffix.lower() == ".npy":
            with open(p, "rb") as f:
                version = np.lib.format.read_magic(f)
                reader = {
                    (1, 0): np.lib.format.read_array_header_1_0,
                    (2, 0): np.lib.format.read_array_header_2_0,
                }.get(tuple(version))
                if reader is None:
                    arr = np.load(p)
                    shape, dtype = arr.shape, arr.dtype
                else:
                    shape, _, dtype = reader(f)
            if shape != (h, w, 3):
                raise SystemExit(
                    f"{p}: .npy must be ({h}, {w}, 3) to match the "
                    f"artifact geometry, got {shape}"
                )
            if dtype != np.uint8 and not np.issubdtype(dtype, np.floating):
                raise SystemExit(
                    f"{p}: .npy dtype must be float or uint8, got {dtype}"
                )

    def load_any(p: Path) -> np.ndarray:
        if p.suffix.lower() == ".npy":
            # same [0,1]/uint8 contract the HTTP front end enforces
            from ssad_tpu.serving.server import coerce_image_array

            return coerce_image_array(np.load(p), (h, w))
        return load_image(p, (h, w))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    heat_dir = None
    if args.heatmaps:
        if mode != "patch":
            raise SystemExit("--heatmaps needs a patch-mode artifact")
        heat_dir = out_dir / "heatmaps"
        heat_dir.mkdir(exist_ok=True)

    n_rows = 0
    n_anomalous = 0
    csv_path = out_dir / "scores.csv"
    # rows are written as each chunk completes, so a crash/interrupt
    # partway keeps everything scored so far; host-side chunking bounds
    # peak memory and ServedScorer additionally chunks to the compiled
    # batch internally
    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["path", "map_max", "map_mean"] if mode == "patch"
                    else ["path", "score", "label"])
        for lo in range(0, len(paths), args.chunk):
            batch_paths = paths[lo : lo + args.chunk]
            imgs = np.stack([load_any(p) for p in batch_paths])
            results = scorer(imgs)
            if mode == "patch":
                maps = np.asarray(results[0])
                for i, (p, m) in enumerate(zip(batch_paths, maps)):
                    wr.writerow([str(p), float(m.max()), float(m.mean())])
                    if heat_dir is not None:
                        from PIL import Image

                        from ssad_tpu.serving.server import heatmap_to_uint8

                        # index prefix: stems alone collide across
                        # subfolders (MVTec itself reuses 000.png)
                        Image.fromarray(heatmap_to_uint8(m)).save(
                            heat_dir / f"{lo + i:05d}_{p.stem}.png"
                        )
            else:
                scores = np.asarray(results[0])
                labels = np.asarray(results[1])
                n_anomalous += int(labels.sum())
                for p, s, y in zip(batch_paths, scores, labels):
                    wr.writerow([str(p), float(s), int(y)])
            n_rows += len(batch_paths)
            f.flush()

    summary = {
        "mode": mode,
        "n": n_rows,
        "csv": str(csv_path),
        "threshold": scorer.meta.get("threshold"),
    }
    if mode == "image":
        summary["n_anomalous"] = n_anomalous
    if heat_dir is not None:
        summary["heatmaps"] = str(heat_dir)
    print(json.dumps(summary))
    return 0


def _collect_images(items) -> list:
    """Files and/or directories → sorted list of image paths (shared by
    the local-artifact and remote `cli score` modes)."""
    exts = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".npy"}
    paths = []
    for item in items:
        p = Path(item)
        if p.is_dir():
            paths.extend(
                q for q in sorted(p.rglob("*")) if q.suffix.lower() in exts
            )
        elif p.exists():
            paths.append(p)
        else:
            raise SystemExit(f"no such file or directory: {item}")
    if not paths:
        raise SystemExit("no images found under the given paths")
    return paths


def _score_remote(args) -> int:
    """`cli score --url`: thin-client folder scoring against a RUNNING
    server (serving/client.py) — raw file bytes are posted, the server
    decodes and resizes, nothing model-specific lives on this host.
    Per-file client errors (bad geometry/scale → HTTP 400) are recorded
    in errors.csv and the run continues: one bad file must not abort a
    folder sweep."""
    import csv

    from ssad_tpu.serving.client import ServingClient, ServingError

    client = ServingClient(args.url, model=args.model, timeout=300.0,
                           retries=4)
    health = client.healthz()
    if "models" in health:
        if not args.model:
            raise SystemExit(
                f"server hosts several models ({sorted(health['models'])}); "
                "pass --model"
            )
        if args.model not in health["models"]:
            raise SystemExit(
                f"server does not host model {args.model!r}; available: "
                f"{sorted(health['models'])}"
            )
        mode = health["models"][args.model]
    else:
        mode = health.get("mode", "image")

    if args.heatmaps and mode != "patch":
        raise SystemExit("--heatmaps needs a patch-mode model")

    paths = _collect_images(args.images)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    heat_dir = None
    if args.heatmaps:
        heat_dir = out_dir / "heatmaps"
        heat_dir.mkdir(exist_ok=True)

    csv_path = out_dir / "scores.csv"
    err_path = out_dir / "errors.csv"
    n_rows = n_anomalous = 0
    errors = []
    threshold = None
    def flush_errors():
        if errors:
            with open(err_path, "w", newline="") as ef:
                ew = csv.writer(ef)
                ew.writerow(["path", "status", "error"])
                ew.writerows(errors)

    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["path", "map_max", "map_mean"] if mode == "patch"
                    else ["path", "score", "label"])
        for i, p in enumerate(paths):
            try:
                out = client.score_file(p, heatmap=bool(heat_dir))
            except ServingError as e:
                if e.status >= 500:
                    flush_errors()
                    raise SystemExit(f"{p}: server failure — {e}")
                errors.append((str(p), e.status, str(e)))
                continue
            except OSError as e:
                # connection-level failure mid-sweep (server died,
                # network drop): keep the partial scores.csv and the
                # per-file errors recorded so far, and exit with a
                # usable message instead of a raw traceback
                flush_errors()
                raise SystemExit(
                    f"{p}: connection to {args.url} failed after "
                    f"{n_rows} scored files — {e!r}; partial results in "
                    f"{csv_path}"
                )
            if mode == "patch":
                wr.writerow([str(p), out["map_max"], out["map_mean"]])
                if heat_dir is not None:
                    from PIL import Image

                    Image.fromarray(out["heatmap"]).save(
                        heat_dir / f"{i:05d}_{p.stem}.png"
                    )
            else:
                threshold = out.get("threshold", threshold)
                n_anomalous += int(out["label"])
                wr.writerow([str(p), out["score"], out["label"]])
            n_rows += 1
            f.flush()
    flush_errors()

    summary = {
        "mode": mode, "n": n_rows, "csv": str(csv_path),
        "url": args.url, "n_errors": len(errors),
    }
    if errors:
        summary["errors_csv"] = str(err_path)
    if mode == "image":
        summary["n_anomalous"] = n_anomalous
        summary["threshold"] = threshold
    if heat_dir is not None:
        summary["heatmaps"] = str(heat_dir)
    print(json.dumps(summary))
    return 0


def cmd_evaluate_artifact(args) -> int:
    """Accuracy of a deployed AOT artifact on labeled MVTec data — the
    deployment-validation step quantized (int8/bf16) artifacts need
    before going live: the EXPORTED program (not the live engine) is
    what gets measured, baked threshold included.  Prints one JSON
    line: image AUROC/F1 (image mode) or pixel AUROC/IoU/AUPRO (patch
    mode)."""
    import numpy as np

    from ssad_tpu.data import mvtec
    from ssad_tpu.evaluation import metrics as M
    from ssad_tpu.serving.export import load_scorer

    compile_cache()
    scorer = load_scorer(args.artifact)
    meta = scorer.meta
    subject = args.subject or meta.get("subject")
    if not subject:
        raise SystemExit(
            f"{args.artifact} has no subject in its header; pass --subject"
        )
    h, w = meta["imsize"]
    test = mvtec.prepare_mvtec_test_data(args.dataset_dir, subject, imsize=(h, w))
    labels = test.labels > 0
    out = {
        "artifact": str(args.artifact),
        "subject": subject,
        "mode": meta.get("mode"),
        "dtype": meta.get("dtype"),
        "scorer": meta.get("scorer", "knn"),
        "n_test": int(labels.shape[0]),
    }
    chunks = []
    for lo in range(0, test.images.shape[0], args.chunk):
        chunks.append(scorer(test.images[lo : lo + args.chunk]))
    results = tuple(np.concatenate(parts) for parts in zip(*chunks))
    if meta.get("mode") == "image":
        scores, served_labels = results[0], results[1]
        fpr, tpr, _ = M.roc_curve(labels, scores)
        thr_opt = M.optimal_f1_threshold(labels, scores)
        out.update({
            "image_auroc": round(float(M.auc(fpr, tpr)), 4),
            "f1_optimal": round(float(M.f1_score(labels, scores, thr_opt)), 4),
            # the number production actually sees: verdicts from the
            # threshold calibrated at export time
            "baked_threshold": meta.get("threshold"),
            "f1_at_baked_threshold": round(float(M.f1_score(
                labels, scores, float(meta["threshold"])
            )), 4),
            "served_anomaly_rate": round(float(np.mean(served_labels)), 4),
        })
    else:
        maps = results[0]  # (N, H, W), upsampled by the program
        gts = np.asarray(test.ground_truths)
        flat_gt = gts.ravel() > 0
        flat_scores = np.nan_to_num(maps.ravel())
        if flat_gt.any() and not flat_gt.all():
            fpr, tpr, _ = M.roc_curve(flat_gt, flat_scores)
            thr = M.optimal_f1_threshold(flat_gt, flat_scores)
            fprs, pros = M.compute_pro(maps, gts)
            out.update({
                "pixel_auroc": round(float(M.auc(fpr, tpr)), 4),
                "iou": round(float(M.iou_score(
                    gts.ravel(), flat_scores, thr
                )), 4),
                "aupro": round(float(M.compute_aupro(
                    fprs, pros, args.aupro_fpr_limit
                )), 4),
            })
        else:
            out["error"] = "test set has no (or only) defective pixels"
    print(json.dumps(out))
    return 0


def register(sub) -> None:
    """Add the serving subcommand parsers to the main CLI's subparsers."""
    ex = sub.add_parser(
        "export", help="export a checkpoint as a self-contained AOT serving artifact"
    )
    ex.add_argument("--models-dir", required=True)
    ex.add_argument("--subject", required=True)
    ex.add_argument("--out", default=None,
                    help="artifact path (default: "
                         "<models-dir>/<subject>/<subject>_<mode>.ssadexp)")
    ex.add_argument("--mode", default="image", choices=["image", "patch"])
    ex.add_argument("--dataset-dir", default=None,
                    help="MVTec root — REQUIRED for --mode patch (patch "
                         "normality is re-embedded from training images; "
                         "the checkpoint's bank holds whole-image "
                         "embeddings, the wrong distribution)")
    ex.add_argument("--n-normality-images", type=int, default=None,
                    help="cap the training images embedded for patch "
                         "normality (default: all)")
    ex.add_argument("--coreset", type=int, default=None,
                    help="distill normality to N rows by k-center-greedy "
                         "coreset selection before fitting (keeps the "
                         "baked bank small while covering many images)")
    ex.add_argument("--dtype", default=None, choices=["bfloat16", "int8"],
                    help="serving weight compression: bfloat16 cast (halves "
                         "the artifact) or weight-only per-channel int8 "
                         "(~4x, serving/quant.py); bank + k-NN stay f32")
    ex.add_argument("--batch", type=int, default=8,
                    help="fixed serving batch the program is compiled for")
    ex.add_argument("--imsize", type=int, default=None,
                    help="default: the checkpoint's training imsize")
    ex.add_argument("--knn-k", type=int, default=None,
                    help="default: EvalConfig().knn_k")
    ex.add_argument("--scorer", default="knn",
                    choices=["knn", "mahalanobis"],
                    help="anomaly scorer baked into the artifact: k-NN "
                         "bank (reference parity) or Mahalanobis Gaussian "
                         "(same choices as evaluate/infer)")
    ex.add_argument("--patch-dim", type=int, default=32)
    ex.add_argument("--stride", type=int, default=8)
    ex.add_argument("--export-platform", default=None,
                    choices=["cpu", "tpu", "gpu"],
                    help="lowering target (default: the active backend)")
    ex.add_argument("--validate", action="store_true",
                    help="post-export self-check: run the artifact on "
                         "seeded random inputs (finiteness); with "
                         "--dtype, also export a float twin of the same "
                         "config and report max score drift + label "
                         "agreement")
    ex.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    ex.add_argument("--seed", type=int, default=0)
    ex.set_defaults(fn=cmd_export)

    sv = sub.add_parser(
        "serve", help="serve an exported artifact over HTTP (dynamic batching)"
    )
    sv.add_argument("--artifact", required=True, nargs="+",
                    help="one or more .ssadexp artifacts; several load "
                         "behind one port, routed by POST /score/<subject>")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="max time a request waits for its batch to fill")
    sv.add_argument("--max-queue", type=int, default=256,
                    help="admission bound: requests beyond this many "
                         "pending get HTTP 503 (load shedding) instead "
                         "of unbounded queueing; 0 disables")
    sv.add_argument("--score-timeout", type=float, default=60.0,
                    help="per-request scoring timeout in seconds")
    sv.add_argument("--frontend", default="stdlib",
                    choices=["stdlib", "native"],
                    help="HTTP transport: stdlib ThreadingHTTPServer or "
                         "the C++ epoll front end (native/"
                         "http_frontend.cpp; higher qps, lower latency; "
                         "needs g++ on first use, falls back loudly)")
    sv.add_argument("--devices", type=int, default=1,
                    help="replicate each model over the first N local "
                         "devices, one micro-batch in flight per chip "
                         "(serving/replicas.py); 0 = all devices. "
                         "Scoring is embarrassingly parallel, so "
                         "replicas beat SPMD sharding: single-chip "
                         "latency, ~linear qps, zero ICI traffic")
    sv.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    sv.set_defaults(fn=cmd_serve)

    sb = sub.add_parser(
        "serve-bench",
        help="load-benchmark the serving stack (qps + client latency "
             "percentiles + shed rate)",
    )
    sb.add_argument("--artifact", nargs="+", default=None,
                    help="start an in-process server over these .ssadexp "
                         "artifacts and benchmark it")
    sb.add_argument("--url", default=None,
                    help="benchmark a RUNNING server instead (e.g. "
                         "http://127.0.0.1:8000)")
    sb.add_argument("--model", default=None,
                    help="model name for multi-model servers "
                         "(POST /score/<name>)")
    sb.add_argument("--concurrency", type=int, default=8,
                    help="closed-loop workers, each keeping one request "
                         "in flight")
    sb.add_argument("--requests", type=int, default=200)
    sb.add_argument("--rate", type=float, default=None,
                    help="open-loop mode: offer this many requests/sec "
                         "on a fixed schedule and measure latency from "
                         "the SCHEDULED arrival (no coordinated "
                         "omission) — the SLO question. Default: "
                         "closed-loop (the capacity question)")
    sb.add_argument("--warmup", type=int, default=16,
                    help="uncounted warmup requests before timing; 0 skips")
    sb.add_argument("--imsize", type=int, default=256,
                    help="--url mode only: request image side (artifact "
                         "mode reads it from the artifact)")
    sb.add_argument("--max-delay-ms", type=float, default=5.0)
    sb.add_argument("--max-queue", type=int, default=256,
                    help="admission bound for the in-process server; 0 "
                         "disables")
    sb.add_argument("--score-timeout", type=float, default=60.0)
    sb.add_argument("--frontend", default="stdlib",
                    choices=["stdlib", "native"],
                    help="HTTP transport for the in-process server "
                         "(see `serve --frontend`)")
    sb.add_argument("--seed", type=int, default=0)
    sb.add_argument("--devices", type=int, default=1,
                    help="replicate the in-process server's models over "
                         "the first N local devices (see `serve "
                         "--devices`); 0 = all")
    sb.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    sb.set_defaults(fn=cmd_serve_bench)

    ea = sub.add_parser(
        "evaluate-artifact",
        help="accuracy of a deployed AOT artifact on labeled MVTec data "
             "(validate quantized exports before going live)",
    )
    ea.add_argument("--artifact", required=True)
    ea.add_argument("--dataset-dir", required=True)
    ea.add_argument("--subject", default=None,
                    help="default: the artifact header's subject")
    ea.add_argument("--chunk", type=int, default=32,
                    help="test images scored per call")
    ea.add_argument("--aupro-fpr-limit", type=float, default=0.3)
    ea.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    ea.set_defaults(fn=cmd_evaluate_artifact)

    sc = sub.add_parser(
        "score",
        help="offline batch scoring of arbitrary image files/folders "
             "with an exported artifact (scores.csv + optional heatmaps)",
    )
    sc.add_argument("--artifact", default=None,
                    help="one .ssadexp artifact (image or patch mode)")
    sc.add_argument("--url", default=None,
                    help="score against a RUNNING server instead of a "
                         "local artifact (thin client: raw file bytes "
                         "are posted, the server decodes/resizes; "
                         "per-file 4xx errors go to errors.csv and the "
                         "run continues)")
    sc.add_argument("--model", default=None,
                    help="with --url: model name on a multi-model server")
    sc.add_argument("images", nargs="+",
                    help="image files and/or directories (searched "
                         "recursively for png/jpg/bmp/tif/npy)")
    sc.add_argument("--out", default="outputs/score",
                    help="output directory for scores.csv (and heatmaps/)")
    sc.add_argument("--heatmaps", action="store_true",
                    help="patch mode: also write one normalized heatmap "
                         "PNG per image")
    sc.add_argument("--chunk", type=int, default=64,
                    help="images decoded/held on host per scoring call")
    sc.add_argument("--platform", default=None, choices=["cpu", "tpu", "gpu"])
    sc.set_defaults(fn=cmd_score)

