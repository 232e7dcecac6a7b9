"""AOT model export for deployment: one self-contained artifact file.

The reference has no deployment story at all — its inference path is a
Lightning `Trainer.predict` loop over a live Python checkpoint
(tools.py:310-390).  For TPU serving the natural unit is an
ahead-of-time lowered program: `jax.export` serializes the traced
scoring computation (StableHLO bytes + calling convention), which a
serving host deserializes and compiles ONCE — no Flax module tree, no
checkpoint restore, no Python model code on the serving side.

An artifact bundles, in one file:

  * a JSON header — mode ('image' | 'patch'), input geometry
    (batch/imsize), scorer hyperparameters (k, threshold), the lowering
    platform, and the framework version;
  * the serialized exported program, with the trained weights AND the
    fitted normality bank baked in as constants (a ResNet-18 artifact
    is ~50 MB f32, ~25 MB with ``dtype='bfloat16'``; self-containment
    beats the weights-as-arguments rule the live `InferenceEngine`
    follows, because a serving binary wants one file, not a checkpoint
    directory).

The exported callable maps RAW [0,1] float images (B, H, W, 3) —
ImageNet normalization happens inside the program:

  * image mode → `(scores (B,), labels (B,), logits (B, C))`:
    k-NN cosine distance of the image embedding to the baked bank,
    thresholded at the detector's calibrated threshold;
  * patch mode → `(maps (B, H, W),)`: the fused sliding-window program
    (extract → embed → k-NN → blur → upsample) of
    `InferenceEngine.score_patch_maps`.

Platform note: kernel dispatch (Pallas vs XLA k-NN, ops/knn.py) is
resolved at TRACE time from the active backend — which
`jax.default_device` does NOT change — so cross-lowering pins the
dispatch explicitly via `knn.force_impl`: a TPU-host export for
``platform='cpu'`` bakes the XLA k-NN (the Pallas custom call cannot
lower for CPU).  Cross-lowering requires a local device of the target
platform; a CPU-only host cannot emit TPU artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"SSADEXP1"


def _scorer_fn(engine, bank, threshold: float, k: int, mode: str,
               patch_dim: int, stride: int, upsample_to: Optional[int],
               dtype: Optional[str] = None, scorer: str = "knn",
               mean=None, precision=None):
    """The raw-image scoring closure that gets traced and exported.
    Weights + the scorer's normality statistics (k-NN bank, or
    Mahalanobis mean/precision) ride as closure constants (baked into
    the program)."""
    from ssad_tpu.ops import image as im
    from ssad_tpu.ops.knn import knn_cosine_scores

    variables = engine._variables
    if dtype == "int8":
        # weight-only int8 (serving/quant.py): per-output-channel
        # symmetric quantization of every ≥2-D float leaf.  The int8
        # tensors are the closure constants jax.export bakes (~4× the
        # f32 artifact shrink); the dequantize runs INSIDE the traced
        # program so compute stays bf16 and BN/bias leaves stay exact.
        from ssad_tpu.serving.quant import dequantize_tree, quantize_tree

        qt = quantize_tree(variables)

        def resolve_variables():
            return dequantize_tree(qt)

    elif dtype is not None:
        # serving weight cast (e.g. bf16): halves the artifact and the
        # weight traffic of the memory-bound forward.  The bank and the
        # k-NN stay f32 (scores are 1−cos with cos≈1 — see ops note).
        # materialize as jax arrays: numpy closure constants (e.g. from
        # an Orbax-restored checkpoint) get eagerly const-folded through
        # the model's f32 promotion at trace time, re-inflating the
        # baked weights back to f32 — jax.Array constants stay bf16 in
        # the exported module (measured: 50.8 vs 25.5 MB for ResNet-18)
        target = jnp.dtype(dtype)
        cast = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, target)
            if jnp.issubdtype(jnp.result_type(x), jnp.floating)
            else jnp.asarray(x),
            variables,
        )

        def resolve_variables():
            return cast

    else:

        def resolve_variables():
            return variables

    if scorer == "mahalanobis":
        # normality statistics are a fitted Gaussian, not a bank
        # (models/detector.py:MahalanobisDetector — a rebuild-only
        # scorer; selectable everywhere --scorer is, incl. here)
        mean = jnp.asarray(mean, jnp.float32)
        precision = jnp.asarray(precision, jnp.float32)

        def _maha(emb):
            from ssad_tpu.models.detector import mahalanobis_distances

            return mahalanobis_distances(emb, mean, precision)

    elif scorer == "knn":
        bank = jnp.asarray(bank, jnp.float32)
    else:
        raise ValueError(f"unknown scorer {scorer!r}; valid: knn, mahalanobis")

    if mode == "image":

        def fn(x):
            v = resolve_variables()
            xn = jax.vmap(im.normalize_imagenet)(x)
            logits, emb = engine._forward.__wrapped__(v, xn)
            if scorer == "mahalanobis":
                scores = _maha(emb)
            else:
                scores = knn_cosine_scores(emb, bank, k=k)
            labels = (scores > threshold).astype(jnp.int32)
            return scores, labels, logits

    elif mode == "patch":

        def fn(x):
            v = resolve_variables()
            xn = jax.vmap(im.normalize_imagenet)(x)
            if scorer == "mahalanobis":
                maps = engine._score_patches_mahalanobis.__wrapped__(
                    v, xn, mean, precision, patch_dim, stride, upsample_to
                )
            else:
                maps = engine._score_patches.__wrapped__(
                    v, xn, bank, patch_dim, stride, k, upsample_to
                )
            return (maps,)

    else:
        raise ValueError(f"unknown mode {mode!r}; valid: image, patch")
    return fn


def export_scorer(
    engine,
    bank,
    mode: str = "image",
    batch: int = 8,
    imsize: Tuple[int, int] = (256, 256),
    k: int = 3,
    threshold: float = 0.0,
    patch_dim: int = 32,
    stride: int = 8,
    upsample_to: Optional[int] = None,
    platform: Optional[str] = None,
    dtype: Optional[str] = None,
    scorer: str = "knn",
    mean=None,
    precision=None,
) -> Tuple["jax.export.Exported", dict]:
    """Trace + lower the scoring program for ONE fixed input geometry.

    Fixed shapes are deliberate (serving pads to `batch`; one
    compilation, no shape-polymorphic recompiles on the hot path).
    ``dtype='bfloat16'`` casts the baked weights for serving (bank and
    k-NN stay f32).  ``scorer='mahalanobis'`` bakes a fitted Gaussian
    (pass ``mean``/``precision``) instead of the k-NN bank.  Returns
    (Exported, header_meta).
    """
    import contextlib

    from jax import export as jexp

    from ssad_tpu.ops import knn as knn_mod

    host = jax.default_backend()
    platform = platform or host
    try:
        device = jax.local_devices(backend=platform)[0]
    except RuntimeError as e:
        raise ValueError(
            f"no local {platform!r} device to lower against ({e}); "
            "cross-lowering needs a local device of the target platform "
            "(a CPU-only host cannot emit TPU artifacts)"
        ) from None
    if upsample_to is None and mode == "patch":
        upsample_to = imsize[0]
    if scorer == "mahalanobis" and (mean is None or precision is None):
        raise ValueError("scorer='mahalanobis' needs mean and precision")
    fn = _scorer_fn(engine, bank, threshold, k, mode, patch_dim, stride,
                    upsample_to, dtype=dtype, scorer=scorer, mean=mean,
                    precision=precision)
    spec = jax.ShapeDtypeStruct((batch, imsize[0], imsize[1], 3), jnp.float32)
    # kernel dispatch keys on jax.default_backend(), which the
    # default_device context does NOT change — pin it for cross-lowering.
    # 'pallas' is size-aware: banks beyond the resident kernel's VMEM
    # envelope (every multi-image patch bank) trace the streaming-tiled
    # kernel; the header records which one actually rode into the
    # artifact so the served kernel is never misreported.
    oversized = (
        scorer == "knn"
        and bank is not None
        and bank.shape[0] > knn_mod.PALLAS_MAX_BANK_ROWS
    )
    if platform == "tpu":
        knn_impl = "pallas_tiled" if oversized else "pallas"
    else:
        knn_impl = "xla"
    # Always pin the dispatch while tracing — even when platform == host:
    # the unforced auto-dispatch can silently degrade to XLA on a kernel
    # tracing failure, and the header would then misreport the served
    # kernel.  Forced 'pallas' raises instead of falling back.
    impl_ctx = (
        knn_mod.force_impl("pallas" if knn_impl.startswith("pallas") else "xla")
        if scorer == "knn"
        else contextlib.nullcontext()
    )
    with impl_ctx, jax.default_device(device):
        exported = jexp.export(jax.jit(fn), platforms=(platform,))(spec)
    meta = {
        "format": "ssad_tpu.serving/1",
        "mode": mode,
        "batch": batch,
        "imsize": list(imsize),
        "k": k,
        "threshold": float(threshold),
        "patch_dim": patch_dim,
        "stride": stride,
        "upsample_to": upsample_to,
        "platform": platform,
        "knn_impl": knn_impl if scorer == "knn" else None,
        "weights_dtype": dtype or "float32",
        "scorer": scorer,
        "num_classes": engine.model.num_classes,
    }
    return exported, meta


def save_artifact(path: str | Path, exported, meta: dict) -> str:
    """`SSADEXP1 | u64 header_len | header JSON | exported bytes`."""
    payload = exported.serialize()
    header = json.dumps(meta).encode("utf-8")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(payload)
    return str(path)


def warm_call(call, x, max_calls: int = 16, settled_s: float = 0.25) -> float:
    """Execute `call(x)` until the per-call wall time settles under
    `settled_s`; returns total seconds spent.  Every result leaf is read
    back to the host each round (`block_until_ready` under-reports on
    tunneled backends).  Shared by ServedScorer.warmup and the
    per-device replicas (serving/replicas.py)."""
    import time

    t0 = time.perf_counter()
    for _ in range(max_calls):
        t1 = time.perf_counter()
        res = call(x)
        for leaf in jax.tree_util.tree_leaves(res):
            np.asarray(leaf)
        if time.perf_counter() - t1 < settled_s:
            break
    return time.perf_counter() - t0


@dataclasses.dataclass
class ServedScorer:
    """A deserialized artifact, callable on numpy image batches.

    Sub-`batch` inputs are zero-padded to the exported geometry and the
    padding rows dropped from the outputs — callers never see the fixed
    batch.  Larger inputs are chunked.
    """

    meta: dict
    _call: Any  # Exported.call

    @classmethod
    def from_file(cls, path: str | Path) -> "ServedScorer":
        from jax import export as jexp

        blob = Path(path).read_bytes()
        if blob[: len(_MAGIC)] != _MAGIC:
            raise ValueError(f"{path}: not an ssad_tpu serving artifact")
        off = len(_MAGIC)
        (hlen,) = struct.unpack_from("<Q", blob, off)
        off += 8
        meta = json.loads(blob[off : off + hlen].decode("utf-8"))
        exported = jexp.deserialize(blob[off + hlen :])
        return cls(meta=meta, _call=jax.jit(exported.call))

    @property
    def batch(self) -> int:
        return int(self.meta["batch"])

    def warmup(self, max_calls: int = 16, settled_s: float = 0.25) -> float:
        """Compile + execute on zeros until the per-call time settles;
        returns total wall seconds spent.  Serving hosts call this
        BEFORE accepting traffic: the first execution triggers
        compilation (20 s–minutes through a remote-compile tunnel), and
        tunneled backends additionally warm PER PROGRAM HASH — a
        freshly-compiled program can execute 100×+ slower for its first
        calls, so a single call is not enough.  Every result leaf is
        read back to the host (`block_until_ready` under-reports on
        tunneled backends)."""
        h, w = self.meta["imsize"]
        x = jnp.zeros((self.batch, h, w, 3), jnp.float32)
        return warm_call(self._call, x, max_calls=max_calls, settled_s=settled_s)

    def __call__(self, images: np.ndarray) -> Tuple[np.ndarray, ...]:
        x = np.asarray(images, dtype=np.float32)
        if x.ndim == 3:
            x = x[None]
        h, w = self.meta["imsize"]
        if x.shape[1:] != (h, w, 3):
            raise ValueError(
                f"expected (B, {h}, {w}, 3) images, got {x.shape}"
            )
        if x.shape[0] == 0:
            # the pipelined chunk loop below needs ≥1 chunk; fail with
            # a named error instead of an unpacking TypeError
            raise ValueError("cannot score an empty batch (0 images)")
        # pipelined chunk loop: dispatch chunk i+1 BEFORE reading back
        # chunk i (jax dispatch is async), so host readback/convert
        # overlaps device compute on multi-chunk inputs
        outs = []
        pending = None  # (device results, valid rows)
        for lo in range(0, x.shape[0], self.batch):
            chunk = x[lo : lo + self.batch]
            n = chunk.shape[0]
            if n < self.batch:
                chunk = np.pad(chunk, ((0, self.batch - n),) + ((0, 0),) * 3)
            res = self._call(jnp.asarray(chunk))
            if pending is not None:
                pres, pn = pending
                outs.append(tuple(np.asarray(r)[:pn] for r in pres))
            pending = (res, n)
        pres, pn = pending
        outs.append(tuple(np.asarray(r)[:pn] for r in pres))
        return tuple(np.concatenate(parts, axis=0) for parts in zip(*outs))


def load_scorer(path: str | Path) -> ServedScorer:
    return ServedScorer.from_file(path)


def export_checkpoint(
    checkpoint_path: str,
    out_path: str,
    mode: str = "image",
    batch: int = 8,
    imsize: Optional[Tuple[int, int]] = None,
    k: Optional[int] = None,
    platform: Optional[str] = None,
    patch_dim: int = 32,
    stride: int = 8,
    normality: Optional[np.ndarray] = None,
    threshold: Optional[float] = None,
    dataset_dir: Optional[str] = None,
    n_normality_images: Optional[int] = None,
    dtype: Optional[str] = None,
    scorer: str = "knn",
    seed: int = 0,
    coreset: Optional[int] = None,
) -> str:
    """Checkpoint directory → serving artifact (the `cli export` body).

    The detector is fitted here, once, at export time, with the same
    normality policy the evaluators use per-session
    (evaluation/evaluator.py image vs patch branches), moved offline:

    * image mode → rows from the checkpoint's memory bank (whole-image
      eval-mode embeddings), or an explicit ``normality`` array;
    * patch mode → the bank holds the WRONG distribution (whole-image
      embeddings, not patch embeddings — the evaluator always re-embeds
      patches, evaluator.py `min_bank_rows=10**9`), so patch normality
      is re-embedded here from the training images: pass
      ``dataset_dir`` (subject comes from the checkpoint config) or an
      explicit patch-embedding ``normality`` array.

    The 70/30 split threshold calibration matches the evaluator's fit.
    ``coreset`` distills the k-NN bank inside that fit (selection after
    the split; AnomalyDetector.fit docstring); Mahalanobis ignores it —
    its mean/precision are fixed size, and a maximin subset would bias
    the moments toward boundary rows.
    """
    from ssad_tpu.evaluation import inference as inf
    from ssad_tpu.models.detector import AnomalyDetector
    from ssad_tpu.train.memory_bank import newest_first

    engine, bank, cfg = inf.load_engine(checkpoint_path)
    if imsize is None:
        imsize = tuple(cfg.data.imsize) if cfg is not None else (256, 256)
    data = None  # patch-mode training images (doubles as calibration input)
    if normality is None:
        if mode == "patch":
            if dataset_dir is None:
                raise ValueError(
                    "patch-mode export needs patch-embedding normality: "
                    "pass dataset_dir (to re-embed training images, the "
                    "evaluator's policy) or an explicit `normality` "
                    "array — the checkpoint's memory bank holds "
                    "whole-image embeddings, the wrong distribution for "
                    "patch scoring"
                )
            from ssad_tpu.data import mvtec

            subject = cfg.data.subject if cfg is not None else None
            if not subject:
                raise ValueError(
                    f"{checkpoint_path} has no subject in its config; "
                    "cannot locate training images under dataset_dir"
                )
            data = mvtec.prepare_pretext_data(
                dataset_dir, subject, imsize=imsize
            )
            normality = inf.normality_embeddings(
                engine, None, data, batch_size=4,
                patch_localization=True, patch_dim=patch_dim, stride=stride,
                min_bank_rows=10**9, max_images=n_normality_images,
                seed=seed,
            )
        else:
            if bank is None or int(bank.count) == 0:
                raise ValueError(
                    f"{checkpoint_path} has no memory bank; pass `normality`"
                )
            normality = np.asarray(newest_first(bank))
    if k is None:
        from ssad_tpu.config import EvalConfig

        k = EvalConfig().knn_k
    if scorer == "mahalanobis":
        from ssad_tpu.models.detector import MahalanobisDetector

        det = MahalanobisDetector().fit(
            jnp.asarray(normality), jax.random.key(seed)
        )
        thr = float(det.threshold) if threshold is None else float(threshold)
        exported, meta = export_scorer(
            engine, None, mode=mode, batch=batch, imsize=imsize, k=k,
            threshold=thr, patch_dim=patch_dim, stride=stride,
            platform=platform, dtype=dtype, scorer=scorer,
            mean=det.mean, precision=det.precision,
        )
    else:
        # coreset selection happens inside fit, after the calibration
        # split (AnomalyDetector.fit docstring); the baked bank is the
        # whole coreset and the threshold comes from raw held-out rows
        det = AnomalyDetector(k=k).fit(
            jnp.asarray(normality), jax.random.key(seed), coreset=coreset
        )
        thr = float(det.threshold) if threshold is None else float(threshold)
        exported, meta = export_scorer(
            engine, det.bank, mode=mode, batch=batch, imsize=imsize, k=k,
            threshold=thr, patch_dim=patch_dim, stride=stride,
            platform=platform, dtype=dtype,
        )
    meta["checkpoint"] = str(checkpoint_path)
    if cfg is not None and cfg.data.subject:
        meta["subject"] = cfg.data.subject
    meta["calibration"] = _calibration_summary(
        engine, det, mode, scorer, data, imsize, patch_dim, stride,
        meta.get("upsample_to"), k,
    )
    return save_artifact(out_path, exported, meta)


def _calibration_summary(engine, det, mode, scorer, data, imsize,
                         patch_dim, stride, upsample_to, k,
                         max_images: int = 32):
    """The score-drift baseline baked into the artifact header
    (serving/drift.py): a quantile grid over calibration scores of the
    SAME quantity the server tracks per request.

    * image mode — the detector's fit-time validation-split scores
      (per-image anomaly scores, exactly what `POST /score` returns);
    * patch mode — per-image anomaly-map maxima over held-out training
      images, scored through the live engine's fused patch program with
      the fitted bank (the per-patch fit scores are the wrong quantity:
      the server only sees the blurred/upsampled map; for quantized
      artifacts the residual gap is the `export --validate` drift
      report, far below drift-alert resolution).  Needs training images
      on the export host; None when only an explicit normality array
      was given.
    """
    from ssad_tpu.ops import image as im
    from ssad_tpu.serving.drift import quantile_summary

    if mode == "image":
        summary = quantile_summary(np.asarray(det.calibration_scores))
        summary["source"] = f"fit-val-{scorer}"
        return summary
    if data is None:
        return None
    images = data.val_images if len(data.val_images) else data.train_images
    images = images[:max_images]
    maxima = []
    for lo in range(0, images.shape[0], 4):
        chunk = images[lo : lo + 4]
        n_real = chunk.shape[0]
        if n_real < 4:
            # pad the ragged final chunk to the same batch shape: a
            # second batch size would compile a second engine program —
            # 20 s–minutes through the remote tunnel (CLAUDE.md) for one
            # throwaway calibration pass
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], 4 - n_real, axis=0)]
            )
        xn = jax.vmap(im.normalize_imagenet)(jnp.asarray(chunk))
        if scorer == "mahalanobis":
            maps = engine.score_patch_maps_mahalanobis(
                xn, det.mean, det.precision, dim=patch_dim, stride=stride,
                upsample_to=upsample_to,
            )
        else:
            maps = engine.score_patch_maps(
                xn, det.bank, dim=patch_dim, stride=stride, k=k,
                upsample_to=upsample_to,
            )
        maxima.extend(np.asarray(maps).max(axis=(1, 2))[:n_real].tolist())
    summary = quantile_summary(maxima)
    summary["source"] = f"val-image-map-max-{scorer}"
    return summary
