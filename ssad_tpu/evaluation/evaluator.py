"""Category evaluation + 15-category sweep with score tables.

Re-design of reference src/evaluator.py (:128-698) and the library
Evaluator (tools.py:28-146):

* image-level: artificial + MVTec prediction, k-NN scores from the
  memory bank (or train-set embeddings), image AUROC + optimal-F1;
  optional Grad-CAM anomaly maps (evaluator.py:262-281);
* patch-level: per-image sliding-window embeddings → k-NN scores →
  blur+upsample maps → pixel AUROC / IoU / AUPRO (evaluator.py:286-374);
* sweep: per-category rows + average, plus textures/objects aggregate
  tables, exported csv/latex/markdown (evaluator.py:496-564), and
  multi-curve ROC/PRO plots.

Deviations from the reference (documented, deliberate):
  - the patch branch evaluates ALL test images (the reference scores
    only the first test dataloader batch, evaluator.py:306);
  - normality embeddings come from `n_normality_images` train images
    (default 3; the reference uses 1 at evaluator.py:207).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssad_tpu import constants
from ssad_tpu.config import AugConfig, EvalConfig
from ssad_tpu.constants import EvaluationScores, ModelOutputs
from ssad_tpu.data import mvtec
from ssad_tpu.data.synthetic import SynthSpec
from ssad_tpu.evaluation import metrics as M
from ssad_tpu.evaluation import inference as inf
from ssad_tpu.models.detector import AnomalyDetector
from ssad_tpu.ops import image as im


# --- library-level metric dispatch (reference tools.Evaluator) --------------


class Evaluator:
    """Metric dispatch over a ModelOutputs container
    (reference tools.py:28-137), with the same mode-validity rules:
    f1-score is image-level only, aupro/iou are patch-level only."""

    def __init__(self, evaluation_metrics: Sequence[str] = ()):
        unknown = set(evaluation_metrics) - set(constants.METRICS)
        if unknown:
            raise ValueError(
                f"unknown metrics {sorted(unknown)}; valid: {list(constants.METRICS)}"
            )
        self.evaluation_metrics = tuple(evaluation_metrics)
        self.scores = EvaluationScores()

    def evaluate(
        self,
        outputs: ModelOutputs,
        subject: str,
        outputs_dir: Optional[str] = None,
        patch_level: bool = False,
        aupro_fpr_limit: float = 0.3,
    ) -> EvaluationScores:
        if patch_level:
            labels = np.asarray(outputs.ground_truths).ravel()
            scores = np.asarray(outputs.anomaly_maps).ravel()
        else:
            labels = np.asarray(outputs.y_true_binary).ravel()
            scores = np.asarray(outputs.anomaly_maps).ravel()
        threshold = M.optimal_f1_threshold(labels > 0, scores)

        if "auroc" in self.evaluation_metrics:
            fpr, tpr, _ = M.roc_curve(labels > 0, scores)
            self.scores.auroc = M.auc(fpr, tpr)
            if outputs_dir:
                from ssad_tpu.evaluation import visualization as vis

                name = f"{subject}_{'pixel' if patch_level else 'image'}_roc.png"
                vis.plot_curve(fpr, tpr, self.scores.auroc, outputs_dir,
                               f"Roc curve for {subject.upper()}", name)
        if "f1-score" in self.evaluation_metrics:
            if patch_level:
                raise ValueError("'f1-score' is not valid in patch-level mode")
            self.scores.f1_score = M.f1_score(labels > 0, scores, threshold)
        if "aupro" in self.evaluation_metrics:
            if not patch_level:
                raise ValueError("'aupro' is not valid in image-level mode")
            maps = np.asarray(outputs.anomaly_maps)
            gts = np.asarray(outputs.ground_truths)
            if maps.ndim == 4:
                maps = maps[:, 0]
            fprs, pros = M.compute_pro(maps, gts)
            self.scores.aupro = M.compute_aupro(fprs, pros, aupro_fpr_limit)
            if outputs_dir:
                from ssad_tpu.evaluation import visualization as vis

                vis.plot_curve(fprs, pros, self.scores.aupro, outputs_dir,
                               f"Pro curve for {subject.upper()}", f"{subject}_pro.png")
        if "iou" in self.evaluation_metrics:
            if not patch_level:
                raise ValueError("'iou' is not valid in image-level mode")
            self.scores.iou = M.iou_score(labels, scores, threshold)
        return self.scores


# --- artificial (pretext) evaluation ----------------------------------------


PRETEXT_CLASS_NAMES = ("good", "polygon patch", "scar", "line")


@dataclasses.dataclass
class ArtificialScores:
    accuracy: float
    f1_macro: float
    auroc_binary: float
    #: per-class rows {name: (precision, recall, f1, support)} — the
    #: reference prints sklearn's full classification_report
    #: (evaluator.py:31-126)
    per_class: Optional[Dict[str, Tuple[float, float, float, int]]] = None

    def classification_report(self) -> str:
        """Plain-text per-class report (precision/recall/f1/support),
        matching the shape of the reference's printed sklearn report."""
        lines = [f"{'':>14} {'precision':>9} {'recall':>9} {'f1-score':>9} {'support':>9}"]
        for name, (p, r, f1, n) in (self.per_class or {}).items():
            lines.append(f"{name:>14} {p:9.4f} {r:9.4f} {f1:9.4f} {n:9d}")
        lines.append("")
        lines.append(f"{'accuracy':>14} {'':>9} {'':>9} {self.accuracy:9.4f}")
        lines.append(f"{'macro f1':>14} {'':>9} {'':>9} {self.f1_macro:9.4f}")
        lines.append(f"{'binary auroc':>14} {'':>9} {'':>9} {self.auroc_binary:9.4f}")
        return "\n".join(lines)


def evaluate_artificial(outputs: ModelOutputs) -> ArtificialScores:
    """4-way pretext classification quality (reference
    ArtificialEvaluator, evaluator.py:31-126): per-class
    precision/recall/F1/support, multiclass accuracy, macro F1, and
    binary good-vs-defect AUROC from softmax scores."""
    y = np.asarray(outputs.y_true_multiclass)
    logits = np.asarray(outputs.raw_predictions, np.float64)
    y_hat = np.argmax(logits, axis=1)
    accuracy = float((y_hat == y).mean())
    per_class: Dict[str, Tuple[float, float, float, int]] = {}
    f1s = []
    for c in range(logits.shape[1]):
        tp = float(((y_hat == c) & (y == c)).sum())
        fp = float(((y_hat == c) & (y != c)).sum())
        fn = float(((y_hat != c) & (y == c)).sum())
        support = int((y == c).sum())
        prec = tp / max(tp + fp, 1e-12)
        rec = tp / max(tp + fn, 1e-12)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        name = PRETEXT_CLASS_NAMES[c] if c < len(PRETEXT_CLASS_NAMES) else str(c)
        per_class[name] = (prec, rec, f1, support)
        # sklearn macro-F1 averages over the union of true and predicted
        # labels: a class absent from y_true but predicted contributes
        # f1=0 (the reference prints sklearn's classification_report)
        if support or tp + fp > 0:
            f1s.append(f1)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    defect_score = 1.0 - probs[:, 0]
    auroc_bin = M.auroc(y > 0, defect_score)
    return ArtificialScores(accuracy, float(np.mean(f1s)), auroc_bin, per_class)


def _render_eval_gradcams(
    engine: inf.InferenceEngine,
    outputs: ModelOutputs,
    outputs_dir: str,
    subject: str,
    max_images: int = 8,
    cam_maps: Optional[np.ndarray] = None,
) -> List[str]:
    """Grad-CAM heatmap overlays for test images the classifier calls
    defective (reference evaluator.py:271-284 renders a saliency map for
    every y_hat>0 image during image-level evaluation).

    cam_maps: precomputed per-test-image maps (the pixel-metric block
    already computes them for EVERY image) — passing them avoids a
    second jitted Grad-CAM program and redundant backward passes."""
    from ssad_tpu.evaluation import visualization as vis

    y_hat = np.asarray(outputs.y_hat)
    picks = np.where(y_hat > 0)[0][:max_images]
    if not len(picks):
        return []
    gradcam = None
    if cam_maps is None:
        from ssad_tpu.models.gradcam import make_gradcam_fn

        gradcam = make_gradcam_fn(engine.model, engine.params, engine.batch_stats)
    paths = []
    for i in picks:
        if cam_maps is not None:
            maps = cam_maps[i : i + 1]
        else:
            x = jnp.asarray(outputs.tensor_data[i])[None]
            maps = gradcam(x, y_hat[i : i + 1])
        raw = np.asarray(outputs.original_data[i])
        overlay = vis.heatmap_overlay(raw, np.asarray(maps[0]))
        paths.append(
            vis.save_image(
                overlay, Path(outputs_dir) / "gradcam" / f"{subject}_{i}_gradcam.png"
            )
        )
    return paths


# --- per-category full evaluation -------------------------------------------


def _use_device_metrics(cfg: EvalConfig, gts: np.ndarray) -> bool:
    """Fused on-device pixel metrics (metrics_device.py) when enabled —
    auto: accelerator backends only — and the problem is non-degenerate
    (the device program requires both pixel classes; the host oracles
    keep their degenerate-input behavior)."""
    use = cfg.device_metrics
    if use is None:
        use = jax.default_backend() != "cpu"
    if not use:
        return False
    pos = (gts > 0).any()
    return bool(pos) and not bool((gts > 0).all())


@dataclasses.dataclass
class CategoryResult:
    subject: str
    image_auroc: Optional[float] = None
    image_f1: Optional[float] = None
    pixel_auroc: Optional[float] = None
    iou: Optional[float] = None
    aupro: Optional[float] = None
    artificial: Optional[ArtificialScores] = None
    image_roc: Optional[Tuple[np.ndarray, np.ndarray]] = None
    pixel_roc: Optional[Tuple[np.ndarray, np.ndarray]] = None
    pro_curve: Optional[Tuple[np.ndarray, np.ndarray]] = None
    #: image-mode pixel metrics scored on Grad-CAM saliency maps
    #: (reference evaluator.py:271-284 computes the maps in image mode;
    #: its committed image_level outputs include pixel_roc/pro per
    #: category — the metric hookup, bit-rotted in the reference, is
    #: restored here)
    gradcam_pixel_auroc: Optional[float] = None
    gradcam_aupro: Optional[float] = None


def evaluate_category(
    engine: inf.InferenceEngine,
    bank,
    data: mvtec.PretextData,
    test_data: mvtec.MVTecTestData,
    cfg: EvalConfig,
    subject: str,
    outputs_dir: Optional[str] = None,
    with_artificial: bool = True,
    n_normality_images: Optional[int] = None,
) -> CategoryResult:
    result = CategoryResult(subject=subject)
    h, w = cfg.imsize
    if n_normality_images is None:
        n_normality_images = cfg.n_normality_images

    if not cfg.patch_localization:
        # --- image level (evaluator.py:243-281, :334-352) ---
        outputs = inf.predict_mvtec(engine, test_data, batch_size=cfg.batch_size)
        normality = inf.normality_embeddings(
            engine, bank, data, batch_size=cfg.batch_size
        )
        outputs, detector = inf.attach_anomaly_scores(
            outputs, normality, k=cfg.knn_k, seed=cfg.seed, scorer=cfg.scorer,
            coreset=cfg.coreset,
        )
        labels = np.asarray(outputs.y_true_binary)
        scores = np.asarray(outputs.anomaly_maps)
        fpr, tpr, _ = M.roc_curve(labels > 0, scores)
        result.image_auroc = M.auc(fpr, tpr)
        result.image_roc = (fpr, tpr)
        thr = M.optimal_f1_threshold(labels > 0, scores)
        result.image_f1 = M.f1_score(labels > 0, scores, thr)

        if with_artificial:
            spec = SynthSpec(subject=subject, imsize=cfg.imsize, aug=AugConfig())
            art = inf.predict_artificial(
                engine, data, spec, num_samples=256, batch_size=cfg.batch_size,
                seed=cfg.seed,
            )
            result.artificial = evaluate_artificial(art)
            if outputs_dir:
                from ssad_tpu.evaluation import visualization as vis

                Path(outputs_dir).mkdir(parents=True, exist_ok=True)
                (Path(outputs_dir) / f"{subject}_artificial_report.txt").write_text(
                    result.artificial.classification_report() + "\n"
                )
                # misclassified-artificial panels (reference ErrorAnalyzer
                # tools.py:150-200; its committed outputs contain
                # <subject>_errors.png but the driver wiring is lost —
                # restored here)
                from ssad_tpu.evaluation.error_analysis import ErrorAnalyzer

                ErrorAnalyzer(art).analyze(
                    output_path=str(Path(outputs_dir) / f"{subject}_errors.png"),
                    seed=cfg.seed,
                )
                vis.plot_tsne(
                    np.concatenate([np.asarray(art.embeddings), np.asarray(outputs.embeddings)]),
                    np.concatenate([
                        np.asarray(art.y_true_multiclass),
                        np.asarray(outputs.y_true_multiclass),
                    ]),
                    outputs_dir, f"{subject.upper()} feature visualization",
                    f"{subject}_tsne.png",
                )
        # Grad-CAM anomaly maps for EVERY test image (zero map where the
        # classifier predicts 'good'), scored at pixel level — reference
        # evaluator.py:262-284 computes exactly these in image mode and
        # its committed image_level outputs carry pixel_roc/pro per
        # category; the (bit-rotted) metric hookup is restored here.
        from ssad_tpu.models.gradcam import make_gradcam_fn

        gradcam = make_gradcam_fn(engine.model, engine.params, engine.batch_stats)
        y_hat = np.asarray(outputs.y_hat)
        n_test = outputs.tensor_data.shape[0]
        bs = max(1, min(8, cfg.batch_size))
        cam_list = []
        for lo in range(0, n_test, bs):
            # ragged final chunk padded to bs: a second static shape
            # would recompile the jitted Grad-CAM program (minutes
            # through the remote compile tunnel)
            x, b = inf.pad_to_batch(jnp.asarray(outputs.tensor_data[lo : lo + bs]), bs)
            yh, _ = inf.pad_to_batch(jnp.asarray(y_hat[lo : lo + bs]), bs)
            cam_list.append(gradcam(x, yh)[:b])
        cam_maps = np.concatenate([np.asarray(c) for c in cam_list], axis=0)
        gts = np.asarray(outputs.ground_truths)
        flat_gt = gts.ravel() > 0
        flat_scores = np.nan_to_num(cam_maps.ravel())
        if flat_gt.any() and not flat_gt.all():
            if _use_device_metrics(cfg, gts):
                from ssad_tpu.evaluation import metrics_device as MD

                pm = MD.pixel_metrics(cam_maps, gts, fpr_limit=cfg.aupro_fpr_limit)
                result.gradcam_pixel_auroc = pm.auroc
                result.gradcam_aupro = pm.aupro
                (fpr_px, tpr_px), (fprs_pro, pros) = pm.roc, pm.pro
            else:
                fpr_px, tpr_px, _ = M.roc_curve(flat_gt, flat_scores)
                result.gradcam_pixel_auroc = M.auc(fpr_px, tpr_px)
                fprs_pro, pros = M.compute_pro(cam_maps, gts)
                result.gradcam_aupro = M.compute_aupro(fprs_pro, pros, cfg.aupro_fpr_limit)

        if outputs_dir:
            from ssad_tpu.evaluation import visualization as vis

            vis.plot_curve(fpr, tpr, result.image_auroc, outputs_dir,
                           f"Roc curve for {subject.upper()}", f"{subject}_image_roc.png")
            if result.gradcam_pixel_auroc is not None:
                vis.plot_curve(
                    fpr_px, tpr_px, result.gradcam_pixel_auroc, outputs_dir,
                    f"Roc curve for {subject.upper()}",
                    f"{subject}_pixel_roc.png",
                )
                vis.plot_curve(
                    fprs_pro, pros, result.gradcam_aupro, outputs_dir,
                    f"Pro curve for {subject.upper()}", f"{subject}_pro.png",
                )
            # Grad-CAM overlay renders for predicted-defect test images
            # (reference renders these during image-level evaluation) —
            # reusing the maps the pixel-metric block just computed
            _render_eval_gradcams(engine, outputs, outputs_dir, subject,
                                  cam_maps=cam_maps)
    else:
        # --- patch level (evaluator.py:286-374) ---
        normality = inf.normality_embeddings(
            engine, None, data, batch_size=4,
            patch_localization=True, patch_dim=cfg.patch_dim, stride=cfg.stride,
            min_bank_rows=10**9,  # patch mode always re-embeds (evaluator.py:297-300)
            max_images=n_normality_images,
            seed=cfg.seed,
        )
        if cfg.scorer == "mahalanobis":
            # coreset is ignored here: the Gaussian's moments are fixed
            # size regardless of row count, and a maximin subset would
            # bias them toward boundary rows
            from ssad_tpu.models.detector import MahalanobisDetector

            detector = MahalanobisDetector().fit(
                normality, jax.random.key(cfg.seed)
            )
        else:
            # coreset selection happens INSIDE fit, after the 70/30
            # calibration split (see AnomalyDetector.fit for why the
            # order matters)
            detector = AnomalyDetector(k=cfg.knn_k).fit(
                normality, jax.random.key(cfg.seed), coreset=cfg.coreset
            )

        maps_list = []
        n = test_data.images.shape[0]
        bs = max(1, min(8, cfg.batch_size))
        for lo in range(0, n, bs):
            # ragged final chunk padded to bs: a smaller trailing batch
            # is a new static shape — a full second compile of the
            # fused scoring program for a few leftover images
            raw, b = inf.pad_to_batch(jnp.asarray(test_data.images[lo : lo + bs]), bs)
            x = jax.vmap(im.normalize_imagenet)(raw)
            # fused extract→embed→score→blur→upsample, one program; keep
            # results on device so batches pipeline through the queue
            if cfg.scorer == "mahalanobis":
                maps = engine.score_patch_maps_mahalanobis(
                    x, detector.mean, detector.precision,
                    dim=cfg.patch_dim, stride=cfg.stride,
                    upsample_to=cfg.upsample_size,
                )
            else:
                maps = engine.score_patch_maps(
                    x, detector.bank, dim=cfg.patch_dim, stride=cfg.stride,
                    k=cfg.knn_k, upsample_to=cfg.upsample_size,
                )
            maps_list.append(maps[:b])
        gts = np.asarray(test_data.ground_truths)

        if _use_device_metrics(cfg, gts):
            # maps never leave the chip: one fused sort program returns
            # the scalars + downsampled plot curves
            from ssad_tpu.evaluation import metrics_device as MD

            pm = MD.pixel_metrics(
                jnp.concatenate(maps_list, axis=0), gts,
                fpr_limit=cfg.aupro_fpr_limit,
            )
            result.pixel_auroc = pm.auroc
            result.pixel_roc = pm.roc
            result.iou = pm.iou
            result.aupro = pm.aupro
            result.pro_curve = pm.pro
            fpr, tpr = pm.roc
            fprs, pros = pm.pro
        else:
            anomaly_maps = np.concatenate(
                [np.asarray(m) for m in maps_list], axis=0
            )
            labels_flat = gts.ravel()
            scores_flat = np.nan_to_num(anomaly_maps.ravel())
            fpr, tpr, _ = M.roc_curve(labels_flat > 0, scores_flat)
            result.pixel_auroc = M.auc(fpr, tpr)
            result.pixel_roc = (fpr, tpr)
            thr = M.optimal_f1_threshold(labels_flat > 0, scores_flat)
            result.iou = M.iou_score(labels_flat, scores_flat, thr)
            fprs, pros = M.compute_pro(anomaly_maps, gts)
            result.aupro = M.compute_aupro(fprs, pros, cfg.aupro_fpr_limit)
            result.pro_curve = (fprs, pros)
        if outputs_dir:
            from ssad_tpu.evaluation import visualization as vis

            vis.plot_curve(fpr, tpr, result.pixel_auroc, outputs_dir,
                           f"Roc curve for {subject.upper()}", f"{subject}_pixel_roc.png")
            vis.plot_curve(fprs, pros, result.aupro, outputs_dir,
                           f"Pro curve for {subject.upper()}", f"{subject}_pro.png")
    return result


# --- the sweep ---------------------------------------------------------------


def _rows_with_average(rows: Dict[str, List[float]], index: List[str]):
    avg = {k: float(np.mean(v)) for k, v in rows.items()}
    out = {k: list(v) + [avg[k]] for k, v in rows.items()}
    return M.scores_dataframe(out, index=index + ["average"])


def export_score_tables(df, tables_dir: str, stem: str):
    for mode, sub, ext in (("csv", "csv", "csv"), ("latex", "latex", "tex"),
                           ("markdown", "markdown", "md")):
        M.export_dataframe(df, Path(tables_dir) / sub, f"{stem}.{ext}", mode)


def evaluate_categories(
    dataset_dir: str,
    models_dir: str,
    subjects: Sequence[str],
    cfg: EvalConfig,
    outputs_dir: str,
    checkpoint_name: str = "best_model",
) -> Dict[str, CategoryResult]:
    """Sweep subjects, write per-category plots + aggregate tables
    (reference evaluate(), evaluator.py:432-564).

    With cfg.category_shards > 1 the subjects evaluate CONCURRENTLY,
    one whole category pinned per local device (round-robin) — the
    evaluation analog of `train-multi`.  Categories are independent, so
    this is replica parallelism with zero collectives (the same
    argument as serving/replicas.py): per-category wall time stays at
    the single-device number and the sweep scales ~linearly with
    devices.  Each worker thread enters `jax.default_device(dev)`
    (thread-local in JAX), so every array and compiled program it
    creates lands on its own chip; matplotlib rendering is serialized
    inside visualization.py (`_PLT_LOCK`)."""

    def _eval_one(subject: str, device=None) -> CategoryResult:
        import contextlib

        ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
        with ctx:
            engine, bank, _ = inf.load_engine(
                str(Path(models_dir) / subject / checkpoint_name)
            )
            if cfg.data_shards and cfg.data_shards > 1:
                from ssad_tpu.parallel.infer_parallel import maybe_shard_engine

                engine = maybe_shard_engine(engine, cfg.data_shards)
            data = mvtec.prepare_pretext_data(
                dataset_dir, subject, imsize=cfg.imsize, seed=cfg.seed
            )
            test_data = mvtec.prepare_mvtec_test_data(
                dataset_dir, subject, imsize=cfg.imsize
            )
            return evaluate_category(
                engine, bank, data, test_data, cfg, subject,
                outputs_dir=str(Path(outputs_dir) / subject),
            )

    results: Dict[str, CategoryResult] = {}
    shards = cfg.category_shards or 1
    if shards > 1:
        if cfg.data_shards and cfg.data_shards > 1:
            raise ValueError(
                "category_shards and data_shards are mutually exclusive: "
                "one parallelizes across categories, the other within a batch"
            )
        from concurrent.futures import ThreadPoolExecutor

        devices = jax.local_devices()
        if shards > len(devices):
            raise ValueError(
                f"category_shards={shards} > {len(devices)} local devices"
            )
        with ThreadPoolExecutor(max_workers=shards) as pool:
            futures = {
                subject: pool.submit(_eval_one, subject, devices[i % shards])
                for i, subject in enumerate(subjects)
            }
            for subject, fut in futures.items():
                results[subject] = fut.result()
    else:
        for subject in subjects:
            results[subject] = _eval_one(subject)

    # aggregate tables: all / textures / objects (evaluator.py:496-564)
    tables_dir = str(Path(outputs_dir) / "tables")
    subjects = list(subjects)
    if cfg.patch_localization:
        rows = {
            "AUC (pixel)": [results[s].pixel_auroc for s in subjects],
            "IOU": [results[s].iou for s in subjects],
            "AUPRO": [results[s].aupro for s in subjects],
        }
        stem = "patch"
    else:
        rows = {
            "AUC (image)": [results[s].image_auroc for s in subjects],
            "F1 (image)": [results[s].image_f1 for s in subjects],
        }
        stem = "image"
    df = _rows_with_average(rows, subjects)
    export_score_tables(df, tables_dir, f"{stem}_all_scores")

    # artificial pretext-task table (reference artificial_all_scores.csv)
    if not cfg.patch_localization and any(results[s].artificial for s in subjects):
        art_rows = {
            "accuracy": [getattr(results[s].artificial, "accuracy", float("nan")) for s in subjects],
            "f1": [getattr(results[s].artificial, "f1_macro", float("nan")) for s in subjects],
            "auroc": [getattr(results[s].artificial, "auroc_binary", float("nan")) for s in subjects],
        }
        export_score_tables(
            _rows_with_average(art_rows, subjects), tables_dir, "artificial_all_scores"
        )

    # per-group tables + aggregate ROC/PRO curve overlays
    # (reference evaluator.py:496-564)
    from ssad_tpu.evaluation import visualization as vis

    for group_name, group in (
        ("textures", [s for s in subjects if constants.is_texture(s)]),
        ("objects", [s for s in subjects if not constants.is_texture(s)]),
    ):
        if not group:
            continue
        sub_rows = {k: [v[subjects.index(s)] for s in group] for k, v in rows.items()}
        export_score_tables(
            _rows_with_average(sub_rows, group), tables_dir, f"{stem}_{group_name}_scores"
        )
        if cfg.patch_localization:
            curves = [
                (s,) + results[s].pixel_roc + (results[s].pixel_auroc,)
                for s in group if results[s].pixel_roc
            ]
            if curves:
                vis.plot_multiple_curves(
                    curves, tables_dir, f"{group_name} pixel ROC",
                    f"{group_name}_pixel_rocs.png",
                )
            pro = [
                (s,) + results[s].pro_curve + (results[s].aupro,)
                for s in group if results[s].pro_curve
            ]
            if pro:
                vis.plot_multiple_curves(
                    pro, tables_dir, f"{group_name} PRO", f"{group_name}_pros.png"
                )
        else:
            curves = [
                (s,) + results[s].image_roc + (results[s].image_auroc,)
                for s in group if results[s].image_roc
            ]
            if curves:
                vis.plot_multiple_curves(
                    curves, tables_dir, f"{group_name} image ROC",
                    f"{group_name}_rocs.png",
                )

    return results
