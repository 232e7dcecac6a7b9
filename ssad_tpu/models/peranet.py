"""PeraNet: ResNet-18 backbone + concat head + latent MLP + classifier.

Functional re-design of the reference LightningModule (models.py:21-341):

* multi-scale taps are explicit returns, not forward hooks;
* patch mode is handled by the caller (ops/patches.extract_patches →
  flatten to a big batch), not by module state flags
  (models.py:211-216);
* the memory bank lives in the train state as an on-device ring buffer
  (train/memory_bank.py), not a CPU deque;
* `backbone_features` / `head` are separately applyable methods so
  Grad-CAM can differentiate the head w.r.t. layer-4 activations with
  plain jax.grad — no forward/backward hooks (cf. gradcam.py:14-23).

Architecture parity (models.py:58-99, :132-146):
  backbone  resnet18, fc → Identity                       → f4 (512)
  taps      layer2 (128), layer3 (256), adaptive-avg-pooled
  concat    [f2, f3, f4] = 896 → Dense(512, no bias) + BN
  latent    3 × [Dense(512, no bias) + BN + ReLU]
            + Dense(512, bias) + BN                        → embedding
  classifier Dense(512 → 4)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssad_tpu.config import ModelConfig
from ssad_tpu.models.resnet import make_backbone
from ssad_tpu.ops.image import resize_nearest


class PeraNet(nn.Module):
    """__call__ returns {'classifier': (B, num_classes),
    'latent_space': (B, 512)} like the reference forward
    (models.py:251-253)."""

    num_classes: int = 4
    backbone_arch: str = "resnet18"  # | resnet34 | resnet50 | wide_resnet50_2
    layer_outputs: Sequence[str] = ("layer2", "layer3")
    latent_space_layers: int = 5
    latent_dim: int = 512
    compute_dtype: Any = jnp.bfloat16
    #: route even-sized ≥64px inputs through the space-to-depth stem
    #: (exact 7×7/s2 equivalence; see resnet.StemConv)
    stem_s2d: bool = False

    def setup(self):
        self.backbone = make_backbone(self.backbone_arch, dtype=self.compute_dtype, name="backbone")
        self.concatenator_dense = nn.Dense(
            self.latent_dim, use_bias=False, name="concatenator_dense"
        )
        self.concatenator_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="concatenator_bn")
        # (latent_space_layers - 2) ReLU blocks + projection
        # (models.py:65-88 via the size arithmetic at :137-141)
        n_blocks = max(self.latent_space_layers - 2, 0)
        self.latent_denses = [
            nn.Dense(self.latent_dim, use_bias=False, name=f"latent_{i}_dense")
            for i in range(n_blocks)
        ]
        self.latent_bns = [
            nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"latent_{i}_bn")
            for i in range(n_blocks)
        ]
        self.latent_out_dense = nn.Dense(self.latent_dim, use_bias=True, name="latent_out_dense")
        self.latent_out_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="latent_out_bn")
        self.classifier_head = nn.Dense(self.num_classes, name="classifier")

    def backbone_features(self, x, train: bool = True) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """(pooled (B, 512), {'layer1'..'layer4': NHWC feature maps}).

        Inputs below 64px are nearest-upsampled first (models.py:218-219).
        32×32 inputs (the sliding-window patch size) take the folded-stem
        path instead: the ×2 nearest upsample is algebraically folded
        into the stem conv (see resnet.StemConv) — same output, 3× fewer
        stem MACs, no 4× activation materialization.
        """
        if x.shape[1] == 32 and x.shape[2] == 32:
            return self.backbone(x, train=train, stem_fold_2x=True)
        if x.shape[1] < 64 or x.shape[2] < 64:
            x = jax.vmap(lambda i: resize_nearest(i, (64, 64)))(x)
        use_s2d = self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        return self.backbone(x, train=train, stem_s2d=use_s2d)

    def from_stem(self, x_stem, train: bool = False) -> Dict[str, jax.Array]:
        """Forward from a precomputed post-maxpool stem output — the
        re-entry point for the fused Pallas stem (ops/stem_pool.py),
        which computes conv1+bn1+relu+maxpool for 32×32 patches outside
        the module to keep the conv output in VMEM."""
        pooled, feats = self.backbone.forward_stages(x_stem, train=train)
        return self.head(feats, pooled, train=train)

    def head(self, feats: Dict[str, jax.Array], pooled: jax.Array, train: bool = True):
        """Concat head → latent MLP → classifier, from feature maps."""
        ura = not train
        parts = []
        for tap in self.layer_outputs:  # concat order [f2, f3, f4] (models.py:240-245)
            f = jnp.mean(feats[tap], axis=(1, 2), dtype=jnp.float32)
            parts.append(f)
        parts.append(pooled)
        features = jnp.concatenate(parts, axis=-1)

        h = self.concatenator_dense(features)
        h = self.concatenator_bn(h, use_running_average=ura)
        for dense, bn in zip(self.latent_denses, self.latent_bns):
            h = dense(h)
            h = bn(h, use_running_average=ura)
            h = nn.relu(h)
        h = self.latent_out_dense(h)
        embedding = self.latent_out_bn(h, use_running_average=ura)
        logits = self.classifier_head(embedding)
        return {"classifier": logits, "latent_space": embedding}

    def __call__(self, x, train: bool = True) -> Dict[str, jax.Array]:
        pooled, feats = self.backbone_features(x, train=train)
        return self.head(feats, pooled, train=train)


def build_model(cfg: ModelConfig) -> PeraNet:
    return PeraNet(
        num_classes=cfg.num_classes,
        backbone_arch=cfg.backbone,
        layer_outputs=tuple(cfg.layer_outputs),
        latent_space_layers=cfg.latent_space_layers,
        latent_dim=cfg.latent_dim,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        stem_s2d=cfg.stem_s2d,
    )


def init_model(
    model: PeraNet, rng: jax.Array, input_shape: Tuple[int, ...] = (1, 64, 64, 3)
):
    """Initialize parameters/batch_stats with a dummy batch."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return variables["params"], variables["batch_stats"]
