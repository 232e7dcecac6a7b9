"""Inference orchestration: dataset prediction + anomaly scoring.

Re-design of reference tools.inference (tools.py:310-390):
  * `predict_images` runs the jitted forward over a dataset in fixed
    batches and returns a ModelOutputs pytree (the reference loops a
    Lightning Trainer.predict with batch_size=1);
  * patch mode extracts the sliding-window grid in-graph and scores
    every patch (models.py:211-216 / functional.py:77-82);
  * normality selection: the memory bank when it holds enough rows,
    else fresh embeddings of the train set.  (Reference quirk, kept out
    deliberately: its bank test `shape[0] > 1000` can never fire since
    the deque caps at exactly 1000 (models.py:281), and its fallback
    embeds only the first dataloader batch (tools.py:379) — one image.
    Here the fallback embeds the full train set, batched.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssad_tpu.config import TrainConfig
from ssad_tpu.constants import ModelOutputs
from ssad_tpu.data import mvtec
from ssad_tpu.data.synthetic import SynthSpec
from ssad_tpu.models.detector import AnomalyDetector
from ssad_tpu.models.peranet import PeraNet, build_model
from ssad_tpu.ops import image as im
from ssad_tpu.ops import patches as patches_mod
from ssad_tpu.train.memory_bank import MemoryBank, newest_first
from ssad_tpu.utils import convert


@dataclasses.dataclass
class InferenceEngine:
    """Jitted forward passes for one trained model."""

    model: PeraNet
    params: Any
    batch_stats: Any
    #: route 32×32 patch batches through the fused
    #: stem+BN+ReLU+maxpool (ops/stem_pool.py) — numerically equivalent
    #: to the folded-stem module path (f32-affine, tested).  Honored
    #: only where stem_pool.fused_available() says the fused path is
    #: profitable/compilable (CPU: XLA impl; TPU: probe-gated Pallas)
    fused_stem: bool = True
    #: opt-in output-parity s2d stem for sliding-grid scoring — a
    #: measured NEGATIVE result on current v5e XLA (stem_pool_s2d
    #: docstring records the numbers); kept selectable for equivalence
    #: tests and future compiler stacks
    s2d_stem: bool = False

    def __post_init__(self):
        # variables travel as jit ARGUMENTS, not closure constants:
        # closed-over arrays get baked into the HLO as literals, which
        # bloats the program past the remote-compile upload limit for
        # large backbones (wide_resnet50_2's ~270 MB of f32 weights)
        model = self.model
        use_fused_stem = self.fused_stem
        use_s2d_stem = self.s2d_stem

        def patch_forward(variables, flat):
            """Forward a (N, d, d, 3) patch batch; 32×32 patches take
            the fused external stem when enabled."""
            from ssad_tpu.ops import stem_pool

            if (
                use_fused_stem
                and flat.shape[1] == 32
                and flat.shape[2] == 32
                and stem_pool.fused_available()
            ):
                k4, scale, bias = stem_pool.folded_stem_affine(variables)
                x_stem = stem_pool.stem_pool(flat, k4, scale, bias)
                return model.apply(
                    variables, x_stem, train=False, method=PeraNet.from_stem
                )
            return model.apply(variables, flat, train=False)

        def embed_grid(variables, x, dim, stride):
            """Sliding-grid extraction + forward → (outputs, inv, b, n).

            With ``s2d_stem`` enabled, 32×32 grids with an even stride
            run the output-parity fused stem (ops/stem_pool.
            stem_pool_s2d): patches are extracted directly in
            space-to-depth layout (same grid, same inverse permutation —
            tested) and the parity conv + shifted-max pool replace the
            stem→maxpool round trip of the module path.  OFF by default:
            measured on v5e the parity-conv route loses despite the
            traffic argument (see stem_pool_s2d docstring) — the flag
            exists for future XLA stacks and for equivalence tests.
            Default geometries take plain extraction + patch_forward."""
            from ssad_tpu.ops import stem_pool

            if (
                use_s2d_stem
                and dim == 32
                and stride % 2 == 0
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                xs = stem_pool.s2d_image(x.astype(jnp.bfloat16))
                p, inv = patches_mod.extract_patches_shuffled(
                    xs, dim=16, stride=stride // 2
                )
                b, n = p.shape[0], p.shape[1]
                flat = p.reshape((b * n,) + p.shape[2:])
                k4, scale, bias = stem_pool.folded_stem_affine(variables)
                pooled = stem_pool.stem_pool_s2d(flat, k4, scale, bias)
                out = model.apply(
                    variables, pooled, train=False, method=PeraNet.from_stem
                )
                return out, inv, b, n
            p, inv = patches_mod.extract_patches_shuffled(
                x.astype(jnp.bfloat16), dim=dim, stride=stride
            )
            b, n = p.shape[0], p.shape[1]
            flat = p.reshape((b * n,) + p.shape[2:])
            return patch_forward(variables, flat), inv, b, n

        @jax.jit
        def forward(variables, x):
            out = model.apply(variables, x, train=False)
            return out["classifier"], out["latent_space"]

        @functools.partial(jax.jit, static_argnames=("dim", "stride", "k", "upsample_to"))
        def score_patches(variables, x, bank, dim, stride, k, upsample_to):
            # ONE program: extract → embed → k-NN → map (+ optional
            # blur/upsample).  Fusing avoids a dispatch round-trip per
            # stage, and the row-major inverse permutation lands on the
            # scalar scores (B, P) instead of the (B·P, 512) embeddings
            # — the gather is 512× cheaper.
            from ssad_tpu.ops.knn import knn_cosine_scores

            out, inv, b, n = embed_grid(variables, x, dim, stride)
            scores = knn_cosine_scores(out["latent_space"], bank, k=k)
            side = int(round(n ** 0.5))
            maps = scores.reshape(b, n)[:, inv].reshape(b, side, side)
            if upsample_to is not None:
                maps = im.upsample_anomaly_maps(maps, upsample_to)
            return maps

        @functools.partial(jax.jit, static_argnames=("dim", "stride", "upsample_to"))
        def score_patches_mahalanobis(variables, x, mean, precision, dim, stride,
                                      upsample_to):
            # fused extract → embed → Mahalanobis → map: same one-program
            # structure as the k-NN path, with the bank matmul replaced
            # by one (B·P, D) × (D, D) precision matmul
            from ssad_tpu.models.detector import mahalanobis_distances

            out, inv, b, n = embed_grid(variables, x, dim, stride)
            scores = mahalanobis_distances(out["latent_space"], mean, precision)
            side = int(round(n ** 0.5))
            maps = scores.reshape(b, n)[:, inv].reshape(b, side, side)
            if upsample_to is not None:
                maps = im.upsample_anomaly_maps(maps, upsample_to)
            return maps

        @functools.partial(jax.jit, static_argnames=("dim", "stride"))
        def forward_patches(variables, x, dim, stride):
            # (B, H, W, 3) → (B·P, d, d, 3) → embeddings (B·P, 512),
            # row-major patch order.  The gather-free tiled extraction
            # produces patches in tiling order; outputs are permuted
            # back (small static row gathers).
            out, inv, b, n = embed_grid(variables, x, dim, stride)
            logits, emb = out["classifier"], out["latent_space"]
            logits = logits.reshape(b, n, -1)[:, inv].reshape(b * n, -1)
            emb = emb.reshape(b, n, -1)[:, inv].reshape(b * n, -1)
            return logits, emb, n

        self._variables = {"params": self.params, "batch_stats": self.batch_stats}
        self._forward = forward
        self._forward_patches = forward_patches
        self._score_patches = score_patches
        self._score_patches_mahalanobis = score_patches_mahalanobis

    def predict_batch(self, x_normalized) -> Tuple[jax.Array, jax.Array]:
        return self._forward(self._variables, jnp.asarray(x_normalized))

    def predict_patches(self, x_normalized, dim: int = 32, stride: int = 8):
        return self._forward_patches(self._variables, jnp.asarray(x_normalized), dim, stride)

    def score_patch_maps(
        self,
        x_normalized,
        bank,
        dim: int = 32,
        stride: int = 8,
        k: int = 3,
        upsample_to: Optional[int] = None,
    ) -> jax.Array:
        """(B, side, side) k-NN anomaly maps — or (B, upsample_to,
        upsample_to) blurred+upsampled maps — in one fused program."""
        return self._score_patches(
            self._variables, jnp.asarray(x_normalized), jnp.asarray(bank),
            dim, stride, k, upsample_to,
        )

    def score_patch_maps_mahalanobis(
        self,
        x_normalized,
        mean,
        precision,
        dim: int = 32,
        stride: int = 8,
        upsample_to: Optional[int] = None,
    ) -> jax.Array:
        """Fused patch anomaly maps scored by Mahalanobis distance to a
        fitted Gaussian (models/detector.py:MahalanobisDetector)."""
        return self._score_patches_mahalanobis(
            self._variables, jnp.asarray(x_normalized), jnp.asarray(mean),
            jnp.asarray(precision), dim, stride, upsample_to,
        )


def pad_to_batch(x: jax.Array, batch_size: int):
    """Zero-pad the leading axis up to `batch_size`; returns (padded,
    n_real).  Every inference loop pads its ragged FINAL chunk with
    this before entering a jitted program: a smaller trailing batch is
    a new static shape, i.e. a full second compile of the fused program
    — 20 s–minutes through the remote compile tunnel (CLAUDE.md) for a
    few leftover rows.  Callers slice outputs back to n_real."""
    n = x.shape[0]
    if n >= batch_size:
        return x, n
    pad = batch_size - n
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), n


def predict_mvtec(
    engine: InferenceEngine,
    data: mvtec.MVTecTestData,
    batch_size: int = 32,
    patch_localization: bool = False,
    patch_dim: int = 32,
    stride: int = 8,
) -> ModelOutputs:
    """Forward the real MVTec test set (reference predict_step mvtec
    branch, models.py:314-317, and the patch path of evaluator.py:286-332).
    """
    chunks = []
    n = data.images.shape[0]
    num_classes = engine.model.num_classes
    for lo in range(0, n, batch_size):
        raw = jnp.asarray(data.images[lo : lo + batch_size])
        x = jax.vmap(im.normalize_imagenet)(raw)
        out = ModelOutputs(original_data=raw, tensor_data=x)
        gts = jnp.asarray(data.ground_truths[lo : lo + batch_size])
        out.ground_truths = gts
        out.y_true_binary = convert.gt2label(gts)
        out.y_true_multiclass = convert.gt2label(gts, negative=-1, positive=num_classes)
        xp, b = pad_to_batch(x, batch_size)
        if patch_localization:
            logits, emb, ppi = engine.predict_patches(xp, patch_dim, stride)
            logits, emb = logits[: b * ppi], emb[: b * ppi]
        else:
            logits, emb = engine.predict_batch(xp)
            logits, emb = logits[:b], emb[:b]
        out.raw_predictions = logits
        out.embeddings = emb
        out.y_hat = convert.prediction_class(logits)
        chunks.append(out)
    return ModelOutputs.concat(chunks)


def predict_artificial(
    engine: InferenceEngine,
    data: mvtec.PretextData,
    spec: SynthSpec,
    num_samples: int = 500,
    batch_size: int = 32,
    seed: int = 0,
) -> ModelOutputs:
    """Forward synthetic pretext batches built from the held-out *val*
    split of the train-good images (falling back to the train split when
    the val split is empty).  Matches the reference: inference with
    mvtec_inference=False builds a PretextTaskDatamodule over the
    train-good folder (tools.py:339-345) and predict_step's artificial
    branch scores its batches (models.py:318-320)."""
    from ssad_tpu.data.synthetic import batched_synthesizer

    use_val = len(data.val_images) > 0
    images = jnp.asarray(data.val_images if use_val else data.train_images)
    # NON_FIXED subjects (hazelnut/screw/metal_nut) pose differently per
    # image: use each sampled image's own mask/coords, exactly like the
    # trainer (trainer.py _make_batch) and the reference
    # (datasets.py:232-235 recomputes obj_mask per image) — the fixed
    # image-0 mask would paste defects onto background for them.
    pm = data.val_masks if use_val else data.train_masks
    pc = data.val_coords if use_val else data.train_coords
    pn = data.val_counts if use_val else data.train_counts
    per_image = spec.is_non_fixed and pm is not None
    synth = jax.jit(batched_synthesizer(spec, per_image_masks=per_image))
    pool = jnp.asarray(data.cut_pool)
    if per_image:
        masks_all = jnp.asarray(pm)
        coords_all = jnp.asarray(pc)
        counts_all = jnp.asarray(pn, jnp.int32)
    else:
        mask = jnp.asarray(data.fixed_mask)
        coords = jnp.asarray(data.fixed_coords)
        count = jnp.int32(data.fixed_count)
    rng = jax.random.key(seed)
    chunks = []
    remaining = num_samples
    while remaining > 0:
        b = min(batch_size, remaining)
        rng, k_idx, k_syn = jax.random.split(rng, 3)
        # always synthesize + forward the FULL batch shape (one compiled
        # program each) and slice the trailing chunk down to b after —
        # a ragged final batch would recompile both fused programs
        idx = jax.random.randint(k_idx, (batch_size,), 0, images.shape[0])
        keys = jax.random.split(k_syn, batch_size)
        if per_image:
            m, c, cnt = masks_all[idx], coords_all[idx], counts_all[idx]
        else:
            m, c, cnt = mask, coords, count
        x, y, orig = synth(
            keys, images[idx], pool, jnp.int32(pool.shape[0]), m, c, cnt
        )
        logits, emb = engine.predict_batch(x)
        out = ModelOutputs(
            original_data=orig[:b],
            tensor_data=x[:b],
            y_true_multiclass=y[:b],
            y_true_binary=convert.multiclass2binary(y[:b]),
            raw_predictions=logits[:b],
            embeddings=emb[:b],
            y_hat=convert.prediction_class(logits[:b]),
        )
        chunks.append(out)
        remaining -= b
    return ModelOutputs.concat(chunks)


def normality_embeddings(
    engine: InferenceEngine,
    bank: Optional[MemoryBank],
    data: mvtec.PretextData,
    batch_size: int = 32,
    patch_localization: bool = False,
    patch_dim: int = 32,
    stride: int = 8,
    min_bank_rows: int = 100,
    max_images: Optional[int] = None,
    seed: int = 0,
) -> jax.Array:
    """Normality source: bank when populated, else train-set embeddings
    (tools.py:359-381; see module docstring for the deviations).

    When capped by max_images, the images are a seeded *random* sample
    of the train set (the reference picks random ones too,
    localizer.py:55-90)."""
    if bank is not None and int(bank.count) >= min_bank_rows:
        return jnp.asarray(newest_first(bank))
    images = data.train_images
    if max_images is not None and images.shape[0] > max_images:
        pick = np.random.default_rng(seed).choice(
            images.shape[0], size=max_images, replace=False
        )
        images = images[np.sort(pick)]
    embs = []
    for lo in range(0, images.shape[0], batch_size):
        raw, b = pad_to_batch(jnp.asarray(images[lo : lo + batch_size]), batch_size)
        xp = jax.vmap(im.normalize_imagenet)(raw)
        if patch_localization:
            _, emb, ppi = engine.predict_patches(xp, patch_dim, stride)
            emb = emb[: b * ppi]
        else:
            _, emb = engine.predict_batch(xp)
            emb = emb[:b]
        embs.append(emb)
    return jnp.concatenate(embs, axis=0)


def attach_anomaly_scores(
    outputs: ModelOutputs,
    normality: jax.Array,
    patch_localization: bool = False,
    num_images: Optional[int] = None,
    patches_per_image: Optional[int] = None,
    k: int = 3,
    seed: int = 0,
    scorer: str = "knn",
    coreset: Optional[int] = None,
):
    """Fit the selected detector on normality and score
    `outputs.embeddings` (tools.py:351-389).  scorer: 'knn' (reference
    detector) or 'mahalanobis' (parametric Gaussian alternative).
    coreset distills the k-NN bank by k-center-greedy selection inside
    AnomalyDetector.fit (selection AFTER the calibration split — see
    its docstring for why the order matters); None keeps every row.
    Mahalanobis ignores it: the Gaussian's mean/precision are fixed
    size regardless of row count, so distillation buys nothing and a
    maximin subset would bias the moments toward boundary rows."""
    if scorer == "mahalanobis":
        from ssad_tpu.models.detector import MahalanobisDetector

        if coreset is not None and not getattr(
            attach_anomaly_scores, "_coreset_noted", False
        ):
            import sys

            attach_anomaly_scores._coreset_noted = True  # once per process
            print(
                "note: coreset has no effect with scorer=mahalanobis (the "
                "Gaussian's moments are fixed size; a maximin subset would "
                "bias them) — ignored",
                file=sys.stderr,
            )
        detector = MahalanobisDetector(
            patch_level=patch_localization,
            batch=num_images,
            num_patches=patches_per_image,
        )
    elif scorer == "knn":
        detector = AnomalyDetector(
            patch_level=patch_localization,
            batch=num_images,
            num_patches=patches_per_image,
            k=k,
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r}; valid: knn, mahalanobis")
    if scorer == "knn":
        detector.fit(normality, jax.random.key(seed), coreset=coreset)
    else:
        detector.fit(normality, jax.random.key(seed))
    outputs.anomaly_maps = detector.predict(outputs.embeddings)
    return outputs, detector


def load_engine(checkpoint_path: str) -> Tuple[InferenceEngine, Optional[MemoryBank], Optional[TrainConfig]]:
    """Build an InferenceEngine from a saved checkpoint directory."""
    from ssad_tpu.train.checkpoint import load_checkpoint

    from ssad_tpu.config import ModelConfig

    params, batch_stats, bank, cfg = load_checkpoint(checkpoint_path)
    model = build_model(cfg.model if cfg is not None else ModelConfig())
    return InferenceEngine(model, params, batch_stats), bank, cfg


def upsample(anomaly_maps, target_size: int = 256):
    """Blur → ReLU → bilinear upsample (reference tools.py:394-399).

    Assumes NON-NEGATIVE inputs (k-NN / Mahalanobis anomaly scores are
    ≥ 0 by construction): the fused path treats the mid-pipeline ReLU
    as a no-op and folds blur⊗upsample into one linear operator.  For
    signed maps (gradcam-like or residual scores) use
    `ops.image.upsample_anomaly_maps_staged`, where the ReLU between
    the two linear stages is load-bearing."""
    return im.upsample_anomaly_maps(anomaly_maps, target_size)
