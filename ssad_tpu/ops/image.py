"""Jittable image primitives (float HWC in [0,1], channels-last).

These replace the reference's host-side PIL / torchvision transforms
(datasets.py:44-47, :220-222, :391; tools.py:394-399) with pure,
fixed-shape JAX ops that run fused on the TPU VPU.  Everything here is
vmap- and jit-safe; randomness is explicit `jax.random` keys.

Conventions:
  * images are (H, W, C) float arrays in [0, 1] — channels-last is the
    TPU-native layout (the lane dimension maps to the last axis);
  * batched variants are `jax.vmap` of the single-image ops.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ssad_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

# --- normalization ----------------------------------------------------------


def normalize_imagenet(img: jax.Array) -> jax.Array:
    """(x - mean) / std per channel (reference datasets.py:430-433)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return (img - mean) / std


def denormalize_imagenet(img: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return img * std + mean


# --- resize ------------------------------------------------------------------


def resize_bilinear(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Half-pixel-centers bilinear resize (== F.interpolate align_corners=False)."""
    h, w = size
    shape = (h, w) + img.shape[2:] if img.ndim >= 2 else (h, w)
    return jax.image.resize(img, shape, method="bilinear")


def resize_nearest(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest resize (== reference F.interpolate mode='nearest',
    models.py:218-219 upsampling of <64px patches)."""
    h, w = size
    shape = (h, w) + img.shape[2:] if img.ndim >= 2 else (h, w)
    return jax.image.resize(img, shape, method="nearest")


# --- gaussian blur ------------------------------------------------------------


def _gaussian_kernel1d(ksize: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def torchvision_default_sigma(ksize: int) -> float:
    """Sigma used by torchvision when none is given (gaussian_blur docs)."""
    return 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float | None = None) -> jax.Array:
    """Separable gaussian blur with reflect padding.

    Matches torchvision.transforms.functional.gaussian_blur as used for
    anomaly-map smoothing (reference tools.py:397: ksize=7, default
    sigma).  Accepts (H, W), (H, W, C) or (B, H, W, C).
    """
    if sigma is None:
        sigma = torchvision_default_sigma(ksize)
    k = _gaussian_kernel1d(ksize, float(sigma)).astype(img.dtype)
    pad = ksize // 2

    squeeze_axes = []
    x = img
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze_axes = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze_axes = [0]

    b, h, w, c = x.shape
    # depthwise separable: blur H then W via conv_general_dilated
    xpad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    kh = k.reshape(ksize, 1, 1, 1)  # HWIO, feature_group_count=c
    kh = jnp.broadcast_to(kh, (ksize, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        xpad, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    xpad = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    kw = k.reshape(1, ksize, 1, 1)
    kw = jnp.broadcast_to(kw, (1, ksize, 1, c))
    x = jax.lax.conv_general_dilated(
        xpad, kw, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    for ax in reversed(squeeze_axes):
        x = jnp.squeeze(x, axis=ax)
    return x


# --- color adjustments (torchvision semantics) --------------------------------


def _rgb_to_gray(img: jax.Array) -> jax.Array:
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def adjust_brightness(img: jax.Array, factor: jax.Array) -> jax.Array:
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: jax.Array, factor: jax.Array) -> jax.Array:
    mean = jnp.mean(_rgb_to_gray(img))
    return jnp.clip(img * factor + mean * (1.0 - factor), 0.0, 1.0)


def adjust_saturation(img: jax.Array, factor: jax.Array) -> jax.Array:
    gray = _rgb_to_gray(img)
    return jnp.clip(img * factor + gray * (1.0 - factor), 0.0, 1.0)


def color_jitter(
    key: jax.Array,
    img: jax.Array,
    brightness: float = 0.1,
    contrast: float = 0.1,
    saturation: float = 0.1,
) -> jax.Array:
    """ColorJitter(b, c, s) with torchvision semantics.

    Factors ~ U[max(0, 1-v), 1+v]; the three adjustments are applied in
    a uniformly random order (reference CPP.jitter_transforms,
    datasets.py:44-47, applied at :391).
    """
    k_perm, kb, kc, ks = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)

    ops = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
    ]
    orders = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]

    def make_branch(order):
        def branch(x):
            for i in order:
                x = ops[i](x)
            return x
        return branch

    which = jax.random.randint(k_perm, (), 0, len(orders))
    return jax.lax.switch(which, [make_branch(o) for o in orders], img)


# --- affine -------------------------------------------------------------------


def affine_nearest(
    img: jax.Array,
    angle_deg: jax.Array,
    scale: jax.Array,
    fill: float = 0.0,
) -> jax.Array:
    """Rotate-and-scale about the center, nearest sampling, zero fill.

    Matches torchvision RandomAffine(degrees, scale=...) with its default
    InterpolationMode.NEAREST (reference datasets.py:220-222).  The
    inverse map sends output pixel p to input coords
    `center + R(-θ)·(p - center)/s`.
    """
    h, w = img.shape[0], img.shape[1]
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    theta = angle_deg * (math.pi / 180.0)
    cos_t = jnp.cos(theta) / scale
    sin_t = jnp.sin(theta) / scale

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_x = cos_t * xx + sin_t * yy + cx
    src_y = -sin_t * xx + cos_t * yy + cy

    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    out = img[iyc, ixc]
    return jnp.where(valid[..., None], out, jnp.asarray(fill, img.dtype))


def random_affine(
    key: jax.Array,
    img: jax.Array,
    degrees: float = 3.0,
    scale_range: Tuple[float, float] = (1.05, 1.1),
) -> jax.Array:
    ka, ks = jax.random.split(key)
    angle = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
    scale = jax.random.uniform(ks, (), minval=scale_range[0], maxval=scale_range[1])
    return affine_nearest(img, angle, scale)


# --- misc ---------------------------------------------------------------------


def mean_color(img: jax.Array) -> jax.Array:
    """Mean RGB of an image region, shape (3,)."""
    return jnp.mean(img, axis=(0, 1))


def color_cosine_similarity(a_mean: jax.Array, b_mean: jax.Array, eps: float = 1e-12):
    """Cosine similarity of two mean-RGB vectors
    (reference check_color_similarity, dataset_generator.py:147-159)."""
    num = jnp.sum(a_mean * b_mean)
    den = jnp.sqrt(jnp.sum(a_mean**2)) * jnp.sqrt(jnp.sum(b_mean**2))
    return num / (den + eps)


def upsample_anomaly_maps(maps: jax.Array, target_size: int = 256) -> jax.Array:
    """Blur(k=7) → ReLU → bilinear upsample (reference tools.py:394-399).

    maps: (B, s, s) or (B, 1, s, s); returns (B, target, target).
    """
    m = jnp.asarray(maps)
    if m.ndim == 4:  # (B,1,s,s) reference layout
        m = m[:, 0]
    m = m[..., None]  # (B,s,s,1)
    m = gaussian_blur(m, ksize=7)
    m = jax.nn.relu(m)
    m = jax.vmap(lambda x: resize_bilinear(x, (target_size, target_size)))(m)
    return m[..., 0]
