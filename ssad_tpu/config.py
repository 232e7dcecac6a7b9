"""Dataclass configuration system.

The reference has no config layer at all — hyperparameters live in
function kwargs (tools.py:204-215), a constants class (`CPP`,
datasets.py:33-47) and hand-edited __main__ blocks.  Here every knob is
an explicit, serializable dataclass; drivers build them from CLI flags.

All defaults reproduce the reference's values, with `file:line`
citations into /root/reference/src.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Synthetic-defect ("CutPaste++") hyperparameters.

    Defaults mirror the reference CPP namespace (datasets.py:33-47) and
    the hard-coded values inside PretextTaskDataset.__getitem__.
    """

    jitter_offset: float = 0.1  # ColorJitter b/c/s (datasets.py:34)

    # polygon-patch defect (label 1)
    patch_area_ratio: Tuple[float, float] = (0.03, 0.07)  # image-wise (datasets.py:37)
    patch_area_ratio_patchmode: Tuple[float, float] = (0.2, 0.5)  # patch-wise (datasets.py:36)
    patch_aspect_ratio: Tuple[Tuple[float, float], Tuple[float, float]] = (
        (0.3, 0.5),
        (1.0, 3.3),
    )  # datasets.py:38

    # scar defect (label 2)
    scar_area_ratio: Tuple[float, float] = (0.003, 0.007)  # datasets.py:41
    scar_area_ratio_patchmode: Tuple[float, float] = (0.02, 0.05)  # datasets.py:40
    scar_aspect_ratio: Tuple[Tuple[float, float], Tuple[float, float]] = (
        (0.3, 0.5),
        (2.5, 3.3),
    )  # datasets.py:42
    scar_angle_range: Tuple[int, int] = (-45, 45)  # datasets.py:342
    scar_copies: Tuple[int, int] = (2, 5)  # datasets.py:341

    # line defect (label 3)
    line_points_image: int = 60  # datasets.py:360
    line_points_patch: int = 30  # datasets.py:360
    line_width_image: int = 3  # datasets.py:388
    line_width_patch: int = 1  # datasets.py:385
    line_splits: int = 10  # datasets.py:375

    # paste containers (datasets.py:238-239; 1.0 in patch mode :255-256)
    container_scale_patch: float = 1.75
    container_scale_scar: float = 2.0

    # colorization mix for patch/scar crops: crop / average / random color
    # (datasets.py:270, :311)
    color_probs: Tuple[float, float, float] = (0.7, 0.15, 0.15)
    #: brightness retouch when defect is color-similar to the image
    #: (datasets.py:295-299)
    similarity_threshold: float = 0.99
    brightness_low: Tuple[float, float] = (0.75, 0.9)
    brightness_high: Tuple[float, float] = (1.1, 1.15)

    # random affine applied to fixed-pose subjects at image level
    # (datasets.py:220-222)
    affine_degrees: float = 3.0
    affine_scale: Tuple[float, float] = (1.05, 1.1)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset discovery and batching (reference datasets.py:401-433)."""

    dataset_dir: str = "dataset"
    subject: str = "bottle"
    imsize: Tuple[int, int] = (256, 256)
    batch_size: int = 96  # tools.py:212 default
    train_val_split: float = 0.2  # datasets.py:408
    seed: int = 0
    min_dataset_length: int = 1000  # datasets.py:410
    duplication: bool = True
    patch_localization: bool = False
    patch_size: int = 64  # training crop in patch mode (datasets.py:174)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PeraNet architecture (reference models.py:21-146)."""

    backbone: str = "resnet18"
    #: multi-scale feature taps concatenated with the pooled output
    #: (models.py:26, hooks at :123-129)
    layer_outputs: Tuple[str, ...] = ("layer2", "layer3")
    latent_space_layers: int = 5  # models.py:27
    latent_dim: int = 512  # models.py:28 (+ last_dim override :137)
    num_classes: int = 4  # models.py:29
    memory_bank_size: int = 1000  # models.py:30
    #: rows of the batch considered for memory-bank fill per step.
    #: None (default) = all rows, the reference behavior (it embeds
    #: every accepted y==0∧ŷ==0 row, models.py:270-275).  The fill needs
    #: a second, eval-mode forward of the clean originals (see
    #: trainer.bank_fill_embeddings), so embedding the whole batch costs
    #: ~⅓ extra step time during the fill phase; setting e.g. 32 embeds
    #: only an iid prefix (same bank content distribution, ~⅓ the fill
    #: rate) — safe for the default 30-epoch schedule, where ~150 fill
    #: steps × ~8 accepted rows still overfill the 1000-row bank, but
    #: short runs (parity smoke configs) would end half-full.
    bank_fill_rows: Optional[int] = None
    #: parameter/compute dtype for the backbone on TPU
    compute_dtype: str = "bfloat16"
    #: space-to-depth stem: 2×2 blocks fold conv1's stride into the
    #: layout — exact 7×7/s2 equivalence with a denser input channel
    #: dim (3→12) for the MXU (resnet.StemConv; measured A/B in bench)
    stem_s2d: bool = False
    #: optional path to a torchvision resnet18 IMAGENET1K_V1 state_dict;
    #: when None the backbone is He-initialized (the reference always
    #: starts from ImageNet weights, models.py:59)
    pretrained_backbone: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Two-phase schedule (reference tools.py:213-214, models.py:336-341)."""

    projection_epochs: int = 10
    projection_lr: float = 0.03
    fine_tune_epochs: int = 30
    fine_tune_lr: float = 0.005
    momentum: float = 0.9
    weight_decay: float = 5e-4
    #: save best-val-loss checkpoint cadence in fine-tune (tools.py:290)
    checkpoint_every_n_epochs: int = 5
    #: validation batches per epoch; None = the reference's full val
    #: pass (tools.py:284-306); set a small cap to shorten smoke runs
    val_batches: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout — new capability, absent in the reference
    (devices=1 everywhere, tools.py:266).

    The framework trains C independent per-category models as one
    stacked, vmapped program sharded over the 'model' mesh axis, with
    batch data-parallelism over the 'data' axis.  Live meshes are built
    from this config via ``parallel.mesh.mesh_from_config`` — a config
    loaded from a checkpoint rebuilds the exact mesh its run used.
    """

    data_axis: int = -1  # data-parallel extent; -1: all remaining devices
    model_axis: int = 1  # number of category shards


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    aug: AugConfig = dataclasses.field(default_factory=AugConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    outputs_dir: str = "outputs"
    seed: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        raw = json.loads(s)

        def _build(cls, d):
            kw = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "data",
                    "aug",
                    "model",
                    "optim",
                    "mesh",
                ):
                    sub = {"data": DataConfig, "aug": AugConfig, "model": ModelConfig,
                           "optim": OptimConfig, "mesh": MeshConfig}[f.name]
                    kw[f.name] = _build(sub, v)
                elif isinstance(v, list):
                    kw[f.name] = _to_tuple(v)
                else:
                    kw[f.name] = v
            return cls(**kw)

        return _build(TrainConfig, raw)


def _to_tuple(v):
    if isinstance(v, list):
        return tuple(_to_tuple(x) for x in v)
    return v


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation sweep options (reference evaluator.py:432-444)."""

    metrics: Tuple[str, ...] = ("auroc", "f1-score")
    patch_localization: bool = False
    patch_dim: int = 32
    stride: int = 8
    #: anomaly-map upsample target.  None (default) tracks imsize — the
    #: GT masks load at imsize, and pixel metrics need both on the same
    #: grid (the reference hard-codes 256 for its fixed 256px protocol,
    #: tools.py:394-399).  An explicit int overrides.
    upsample_size: Optional[int] = None
    aupro_fpr_limit: float = 0.3  # evaluator.py / tools.py:118
    knn_k: int = 3  # models.py:354
    #: anomaly scorer: 'knn' (the reference's k-NN cosine detector,
    #: models.py:345-370) or 'mahalanobis' (parametric Gaussian
    #: alternative, models/detector.py:MahalanobisDetector)
    scorer: str = "knn"
    #: patch mode: how many training images to re-embed for normality
    #: (the reference's localizer embeds a handful, localizer.py:55-90)
    n_normality_images: int = 3
    #: distill the normality embeddings to this many rows by
    #: k-center-greedy coreset selection (ops/coreset.py) before
    #: fitting the detector — lets MANY more training images back the
    #: bank at the same scoring cost.  None = keep every row (the
    #: reference behavior).
    coreset: Optional[int] = None
    imsize: Tuple[int, int] = (256, 256)
    batch_size: int = 32
    seed: int = 0
    #: data-parallel inference: shard scoring batches over this many
    #: devices (parallel/infer_parallel.ShardedEngine); None/1 = single
    #: device (the reference's only mode, tools.py:327 devices=1)
    data_shards: Optional[int] = None
    #: category-parallel sweep: evaluate subjects concurrently, one
    #: whole category per device (the eval analog of `train-multi` —
    #: categories are independent, so this is collective-free replica
    #: parallelism, like serving/replicas.py).  Mutually exclusive with
    #: data_shards (which instead splits each batch across devices).
    category_shards: Optional[int] = None
    #: pixel metrics (ROC AUC / optimal-F1 / IoU / AUPRO) fused into ONE
    #: on-device sort program (evaluation/metrics_device.py) instead of
    #: three host argsorts over every test pixel.  None = auto: on when
    #: the default backend is an accelerator, off on CPU (where the host
    #: oracles are as fast and bit-match the reference algorithms).
    device_metrics: Optional[bool] = None

    def __post_init__(self):
        if self.upsample_size is None:
            object.__setattr__(self, "upsample_size", self.imsize[0])
