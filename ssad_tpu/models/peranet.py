"""PeraNet: ResNet-18 backbone + concat head + latent MLP + classifier.

Functional re-design of the reference LightningModule (models.py:21-341):

* multi-scale taps are explicit returns, not forward hooks;
* patch mode is handled by the caller (ops/patches.extract_patches →
  flatten to a big batch), not by module state flags
  (models.py:211-216);
* the memory bank lives in the train state as an on-device ring buffer
  (train/memory_bank.py), not a CPU deque.

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
from ssad_tpu.models.resnet import ResNet18
from ssad_tpu.ops.image import resize_nearest

_TAP_DIMS = {"layer1": 64, "layer2": 128, "layer3": 256}


class PeraNet(nn.Module):
    """Returns {'classifier': (B, num_classes), 'latent_space': (B, 512)}
    like the reference forward (models.py:251-253)."""

    num_classes: int = 4
    layer_outputs: Sequence[str] = ("layer2", "layer3")
    latent_space_layers: int = 5
    latent_dim: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> Dict[str, jax.Array]:
        # inputs below 64px are nearest-upsampled (models.py:218-219)
        if x.shape[1] < 64 or x.shape[2] < 64:
            x = jax.vmap(lambda i: resize_nearest(i, (64, 64)))(x)

        pooled, feats = ResNet18(dtype=self.compute_dtype, name="backbone")(x, train=train)

        parts = []
        for tap in self.layer_outputs:  # concat order [f2, f3, f4] (models.py:240-245)
            f = jnp.mean(feats[tap], axis=(1, 2))  # adaptive_avg_pool2d → (B, C)
            parts.append(f.astype(jnp.float32))
        parts.append(pooled)
        features = jnp.concatenate(parts, axis=-1)

        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )

        # concatenator: Dense(896→512, no bias) + BN (models.py:91-95)
        h = nn.Dense(self.latent_dim, use_bias=False, name="concatenator_dense")(features)
        h = norm("concatenator_bn")(h)

        # latent space: (latent_space_layers - 2) × [Dense+BN+ReLU] then
        # Dense(bias)+BN (models.py:65-88 via the -1/-1 size arithmetic
        # at :137-141: 5 layers → 3 ReLU blocks + final projection)
        n_blocks = max(self.latent_space_layers - 2, 0)
        for i in range(n_blocks):
            h = nn.Dense(self.latent_dim, use_bias=False, name=f"latent_{i}_dense")(h)
            h = norm(f"latent_{i}_bn")(h)
            h = nn.relu(h)
        h = nn.Dense(self.latent_dim, use_bias=True, name="latent_out_dense")(h)
        embedding = norm("latent_out_bn")(h)

        logits = nn.Dense(self.num_classes, name="classifier")(embedding)
        return {"classifier": logits, "latent_space": embedding}


def build_model(cfg: ModelConfig) -> PeraNet:
    return PeraNet(
        num_classes=cfg.num_classes,
        layer_outputs=tuple(cfg.layer_outputs),
        latent_space_layers=cfg.latent_space_layers,
        latent_dim=cfg.latent_dim,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )


def init_model(
    model: PeraNet, rng: jax.Array, input_shape: Tuple[int, ...] = (1, 64, 64, 3)
):
    """Initialize parameters/batch_stats with a dummy batch."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return variables["params"], variables["batch_stats"]
