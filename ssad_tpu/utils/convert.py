"""Label / tensor conversion helpers.

Parity with reference src/self_supervised/converters.py, expressed as
vectorized jnp ops instead of python list comprehensions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gt2label(gt_masks, negative: int = 0, positive: int = 1):
    """Per-image binary label from ground-truth masks (converters.py:7-9).

    gt_masks: (B, H, W) or (B, H, W, C); label is `positive` when any
    pixel is non-zero.
    """
    g = jnp.asarray(gt_masks)
    flat = g.reshape(g.shape[0], -1)
    any_defect = jnp.sum(flat, axis=1) > 0
    return jnp.where(any_defect, positive, negative)


def multiclass2binary(labels):
    """Pretext labels {0..3} → binary anomaly labels (converters.py:11-12)."""
    return (jnp.asarray(labels) > 0).astype(jnp.int32)


def image_to_uint8(img):
    """Float image in [0,1] (H,W,C) → uint8 array (converters.py:27-30)."""
    arr = np.asarray(img)
    return (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)


def heatmap2mask(heatmap, threshold: float = 0.7):
    """Threshold a [0,1] heatmap into a binary mask (converters.py:33)."""
    return jnp.asarray(heatmap) > threshold


def prediction_class(logits):
    """Argmax class ids from logits (functional.py:27-29)."""
    return jnp.argmax(jnp.asarray(logits), axis=-1)


def minmax_normalize(x, eps: float = 0.0):
    """Min-max normalize to [0,1] (functional.py:85-88)."""
    x = jnp.asarray(x)
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps) if eps else (x - lo) / (hi - lo)


def normalize_in_interval(x, lo: float, hi: float):
    """Min-max rescale into [lo, hi], rounded to integers
    (functional.py:91-94)."""
    x = np.asarray(x, np.float64)
    span = x.max() - x.min()
    out = (x - x.min()) / (span if span else 1.0) * (hi - lo) + lo
    return np.rint(out)
