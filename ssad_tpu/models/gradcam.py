"""Grad-CAM saliency for image-level localization.

The reference registers forward/backward hooks on backbone layer4 and
runs an explicit .backward() at inference (gradcam.py:7-48) — the only
backward pass in its inference path.  In JAX the same map is one
`jax.grad` of the classification score w.r.t. the layer-4 activations,
with the head re-applied as a pure function (PeraNet.head):

    α_k = spatial-mean ∂score/∂A_k ;  saliency = ReLU(Σ_k α_k A_k)
    → bilinear upsample to input size → global min-max normalize
      (gradcam.py:40-47)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ssad_tpu.models.peranet import PeraNet
from ssad_tpu.ops.image import resize_bilinear


def compute_gradcam(
    model: PeraNet,
    params: Any,
    batch_stats: Any,
    x: jax.Array,
    class_idx: Optional[int] = None,
) -> jax.Array:
    """Saliency maps (B, H, W) in [0, 1] for a normalized input batch.

    class_idx: target class, or None for each sample's argmax
    (reference gradcam.py:32-35).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    h, w = x.shape[1], x.shape[2]

    pooled, feats = model.apply(
        variables, x, train=False, method=PeraNet.backbone_features
    )
    a4 = feats["layer4"]

    logits0 = model.apply(variables, feats, pooled, train=False, method=PeraNet.head)[
        "classifier"
    ]
    targets = (
        jnp.argmax(logits0, axis=-1)
        if class_idx is None
        else jnp.full((x.shape[0],), class_idx)
    )

    def score_sum(a4_var):
        pooled_var = jnp.mean(a4_var, axis=(1, 2), dtype=jnp.float32)
        feats_var = dict(feats)
        feats_var["layer4"] = a4_var
        logits = model.apply(
            variables, feats_var, pooled_var, train=False, method=PeraNet.head
        )["classifier"]
        return jnp.sum(jnp.take_along_axis(logits, targets[:, None], axis=1))

    grads = jax.grad(score_sum)(a4)
    alpha = jnp.mean(grads, axis=(1, 2), dtype=jnp.float32)  # (B, 512)
    sal = jax.nn.relu(jnp.sum(a4.astype(jnp.float32) * alpha[:, None, None, :], axis=-1))
    sal = jax.vmap(lambda s: resize_bilinear(s, (h, w)))(sal)
    # per-SAMPLE min-max: the reference normalizes each saliency map on
    # its own (it only ever runs batch=1, gradcam.py:40-47), so batched
    # calls must not couple samples through a global min/max
    lo = jnp.min(sal, axis=(1, 2), keepdims=True)
    hi = jnp.max(sal, axis=(1, 2), keepdims=True)
    return (sal - lo) / jnp.maximum(hi - lo, 1e-12)


def gradcam_or_zero(model, params, batch_stats, x, predicted_classes) -> jax.Array:
    """Anomaly maps for a batch: zero map where the model predicts
    'good', Grad-CAM of the predicted defect class elsewhere (reference
    localizer.py:133-140)."""
    maps = compute_gradcam(model, params, batch_stats, x)
    good = jnp.asarray(predicted_classes) == 0
    return jnp.where(good[:, None, None], jnp.zeros_like(maps), maps)


def make_gradcam_fn(model, params, batch_stats):
    """Jitted (x, predicted_classes) → maps closure.

    Callers that loop over images must use this instead of calling
    gradcam_or_zero eagerly: on the tunneled TPU backend every eager op
    is a host round-trip, which makes the unjitted path ~100× slower.
    Params ride as jit arguments (closure constants would embed the
    weights in the HLO and overflow the remote-compile upload limit for
    wide backbones).
    """
    @jax.jit
    def fn(p, bs, x, predicted):
        return gradcam_or_zero(model, p, bs, x, predicted)

    return lambda x, predicted: fn(params, batch_stats, x, predicted)
