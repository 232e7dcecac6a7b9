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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    models.py:218-219 upsampling of <64px patches).

    Integer upscale factors use repeat (broadcast+reshape — the generic
    jax.image.resize nearest lowers to a serialized gather loop on TPU
    and cost ~20 ms/batch in the patch-scoring path)."""
    h, w = size
    ih, iw = img.shape[0], img.shape[1]
    if h % ih == 0 and w % iw == 0 and (h > ih or w > iw):
        out = jnp.repeat(img, h // ih, axis=0)
        return jnp.repeat(out, w // iw, axis=1)
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
    # accumulate the mean in f32 (a bf16-accumulated mean over 64k
    # pixels loses most of its precision)
    mean = jnp.mean(_rgb_to_gray(img), dtype=jnp.float32).astype(img.dtype)
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

    fb = fb.astype(img.dtype)
    fc = fc.astype(img.dtype)
    fs = fs.astype(img.dtype)
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

    NOTE: this is the exact oracle implementation (per-pixel gather) —
    fine on CPU and for tests, but arbitrary-index gathers serialize on
    TPU; the production augmentation path uses `random_affine` below
    (shear + separable-resample formulation).
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


def _shear(img: jax.Array, shift_per_line: jax.Array, axis: int, max_shift: int) -> jax.Array:
    """Shear by integer per-row (axis=1 shifts columns) or per-column
    (axis=0 shifts rows) offsets, zero-filled.

    Implemented as an accumulate-select over the static shift range —
    static rolls are fused VPU passes, whereas the equivalent
    arbitrary-index gather serializes on the TPU scalar core.
    """
    n_lines = img.shape[0] if axis == 1 else img.shape[1]
    line_axis = 0 if axis == 1 else 1
    out = jnp.zeros_like(img)
    size = img.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, img.shape[:2], axis)
    for d in range(-max_shift, max_shift + 1):
        shifted = jnp.roll(img, d, axis=axis)
        valid = (pos - d >= 0) & (pos - d < size)  # zero fill, no wrap
        sel = shift_per_line == d  # (n_lines,)
        selb = jnp.expand_dims(sel, axis) if line_axis == 0 else sel[None, :]
        out = jnp.where((selb & valid)[..., None], shifted, out)
    return out


def _shear_2level(
    img: jax.Array, shift_per_line: jax.Array, axis: int, max_shift: int
) -> jax.Array:
    """_shear, decomposed as d = stride·q + f on a padded canvas.

    Direct _shear unrolls 2·max_shift+1 full-image roll passes (pure
    HBM traffic); splitting into a fine pass (stride candidates) and a
    coarse pass (~2·max/stride+1 candidates) does the same shear in
    ~2·√(2·max+1) passes.  Exactness: the final validity mask is the
    full 0 ≤ pos−d < size condition, and the pad margin keeps the fine
    roll from wrapping live pixels — bit-identical to _shear (tested).
    """
    size = img.shape[axis]
    stride = max(3, int(round(math.sqrt(2 * max_shift + 1))))
    fmax = stride // 2
    q = jnp.floor_divide(shift_per_line + fmax, stride)
    f = shift_per_line - stride * q
    q_lo = math.floor((-max_shift + fmax) / stride)
    q_hi = math.floor((max_shift + fmax) / stride)

    # pad by fmax along the shear axis so the fine roll never wraps a
    # live pixel into a position the coarse pass reads
    pad = [(0, 0)] * img.ndim
    pad[axis] = (fmax, fmax)
    padded = jnp.pad(img, pad)
    psize = size + 2 * fmax
    ppos = jax.lax.broadcasted_iota(jnp.int32, padded.shape[:2], axis)

    def linesel(sel, to_shape):
        return jnp.expand_dims(sel, axis) if axis == 1 else sel[None, :]

    # fine pass: t[p] = padded[p − f(line)], zero-filled
    t = jnp.zeros_like(padded)
    for d in range(-fmax, fmax + 1):
        shifted = jnp.roll(padded, d, axis=axis)
        valid = (ppos - d >= 0) & (ppos - d < psize)
        selb = linesel(f == d, padded.shape)
        t = jnp.where((selb & valid)[..., None], shifted, t)

    # coarse pass back onto the unpadded canvas, with the exact final
    # validity test: out[p] = t[p + fmax − stride·q] = img[p − d]
    pos = jax.lax.broadcasted_iota(jnp.int32, img.shape[:2], axis)
    shift_b = linesel(shift_per_line, img.shape)
    final_valid = (pos - shift_b >= 0) & (pos - shift_b < size)
    out = jnp.zeros_like(img)
    for qv in range(q_lo, q_hi + 1):
        # roll t by stride·qv − fmax, then take the leading `size` slice
        rolled = jnp.roll(t, stride * qv - fmax, axis=axis)
        sliced = jax.lax.slice_in_dim(rolled, 0, size, axis=axis)
        selb = linesel(q == qv, img.shape)
        out = jnp.where((selb & final_valid)[..., None], sliced, out)
    return out


def rotate_small_angle(img: jax.Array, angle_deg: jax.Array, max_degrees: float) -> jax.Array:
    """Rotation about the center via the exact 3-shear decomposition
    R(θ) = Shx(-tan θ/2) · Shy(sin θ) · Shx(-tan θ/2), integer shifts.

    `max_degrees` (static) bounds the shift range so every shear is a
    small unrolled roll-accumulate.
    """
    h, w = img.shape[0], img.shape[1]
    theta = jnp.deg2rad(angle_deg)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    max_t = math.tan(math.radians(max_degrees) / 2.0)
    max_s = math.sin(math.radians(max_degrees))
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    rows = jnp.arange(h, dtype=jnp.float32) - cy
    cols = jnp.arange(w, dtype=jnp.float32) - cx

    sx1 = jnp.round(a * rows).astype(jnp.int32)  # column shift per row
    sy = jnp.round(b * cols).astype(jnp.int32)  # row shift per column
    # tight bounds: |round(x)| ≤ floor(max|x| + 0.5); every unrolled
    # shift candidate is a full-image roll pass, so slack is pure HBM
    # traffic (±3° @256px: 33 passes vs 43 with ceil+1)
    mx = int(math.floor(max_t * max(cy, cx) + 0.5))
    my = int(math.floor(max_s * max(cy, cx) + 0.5))

    out = _shear_best(img, sx1, axis=1, max_shift=mx)
    out = _shear_best(out, sy, axis=0, max_shift=my)
    out = _shear_best(out, sx1, axis=1, max_shift=mx)
    return out


def _shear_best(img, shift_per_line, axis: int, max_shift: int):
    """Pick direct vs two-level shear by unrolled-pass count (each pass
    is one full-image HBM sweep)."""
    direct = 2 * max_shift + 1
    stride = max(3, int(round(math.sqrt(direct))))
    fmax = stride // 2
    two_level = (
        (2 * fmax + 1)
        + (math.floor((max_shift + fmax) / stride) - math.floor((-max_shift + fmax) / stride) + 1)
    )
    if two_level + 2 < direct:  # +2: pad/slice copies
        return _shear_2level(img, shift_per_line, axis, max_shift)
    return _shear(img, shift_per_line, axis, max_shift)


def apply_separable(img: jax.Array, m_r: jax.Array, m_c: jax.Array) -> jax.Array:
    """out[i, k, c] = Σ_{j,l} m_r[i, j] · img[j, l, c] · m_c[k, l].

    The workhorse of every dynamic spatial move in this framework
    (crop, paste, zoom): two one-hot / interpolation-weight matmuls on
    the MXU in bf16.  img: (H, W) or (H, W, C)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    dtype = img.dtype
    out_h, out_w = m_r.shape[0], m_c.shape[0]
    tmp = jnp.matmul(m_r.astype(jnp.bfloat16), img.reshape(h, w * c).astype(jnp.bfloat16))
    tmp = tmp.reshape(out_h, w, c)
    out = jnp.einsum("jlc,kl->jkc", tmp, m_c.astype(jnp.bfloat16))
    out = out.astype(dtype)
    return out[..., 0] if squeeze else out


def _tent_matrix(n: int, scale: jax.Array) -> jax.Array:
    """(n, n) bilinear resampling weights for a zoom about the center:
    row i interpolates the source coordinate c + (i - c)/scale."""
    c = (n - 1) / 2.0
    i = jnp.arange(n, dtype=jnp.float32)
    src = c + (i - c) / scale
    j = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def scale_about_center(img: jax.Array, scale: jax.Array) -> jax.Array:
    """Zoom about the image center — bilinear, separable, bf16 MXU
    matmuls (jax.image.scale_and_translate forces f32 layout copies
    worth ~5 ms/batch on TPU)."""
    h, w = img.shape[0], img.shape[1]
    return apply_separable(img, _tent_matrix(h, scale), _tent_matrix(w, scale))


def random_affine(
    key: jax.Array,
    img: jax.Array,
    degrees: float = 3.0,
    scale_range: Tuple[float, float] = (1.05, 1.1),
) -> jax.Array:
    """RandomAffine(degrees, scale) equivalent (reference
    datasets.py:220-222): rotation ±degrees + zoom, about the center.

    TPU note: PIL/torchvision resample by arbitrary-index gather; here
    rotation is the 3-shear roll-accumulate and scale a separable
    resample, both VPU/MXU-native (see _shear).  Interpolation is
    bilinear-ish rather than PIL's nearest — a distribution-level
    equivalent for this mild pose jitter.
    """
    ka, ks = jax.random.split(key)
    angle = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
    scale = jax.random.uniform(ks, (), minval=scale_range[0], maxval=scale_range[1])
    dtype = img.dtype
    out = scale_about_center(img, scale).astype(dtype)
    out = rotate_small_angle(out, angle, max_degrees=degrees)
    return jnp.clip(out, 0.0, 1.0).astype(dtype)


# --- misc ---------------------------------------------------------------------


def mean_color(img: jax.Array) -> jax.Array:
    """Mean RGB of an image region, shape (3,), f32 accumulation."""
    return jnp.mean(img, axis=(0, 1), dtype=jnp.float32)


def color_cosine_similarity(a_mean: jax.Array, b_mean: jax.Array, eps: float = 1e-12):
    """Cosine similarity of two mean-RGB vectors
    (reference check_color_similarity, dataset_generator.py:147-159)."""
    num = jnp.sum(a_mean * b_mean)
    den = jnp.sqrt(jnp.sum(a_mean**2)) * jnp.sqrt(jnp.sum(b_mean**2))
    return num / (den + eps)


def upsample_anomaly_maps(maps: jax.Array, target_size: int = 256) -> jax.Array:
    """Blur(k=7) → ReLU → bilinear upsample (reference tools.py:394-399).

    maps: (B, s, s) or (B, 1, s, s); returns (B, target, target).

    Anomaly scores are non-negative by construction (mean k-NN cosine
    distance ≥ 0, Mahalanobis distance ≥ 0), which makes the ReLU
    between the two linear stages a mathematical no-op — so the whole
    pipeline is one linear operator per axis and runs as two matmuls
    against a precomputed (target, s) blur⊗upsample matrix (the fused
    path below; equal to the staged pipeline to f32 roundoff for any
    non-negative input — tested).  `upsample_anomaly_maps_staged` keeps
    the literal conv→ReLU→resize order as the oracle.
    """
    m = jnp.asarray(maps)
    if m.ndim == 4:  # (B,1,s,s) reference layout
        m = m[:, 0]
    return upsample_anomaly_maps_fused(m, target_size)


def upsample_anomaly_maps_staged(maps: jax.Array, target_size: int = 256) -> jax.Array:
    """The literal staged pipeline (depthwise blur convs → ReLU →
    jax.image.resize) — the semantics oracle for the fused path, and
    the correct choice for inputs that can be negative (there the ReLU
    between stages is load-bearing and the composition differs)."""
    m = jnp.asarray(maps)
    if m.ndim == 4:
        m = m[:, 0]
    m = m[..., None]  # (B,s,s,1)
    m = gaussian_blur(m, ksize=7)
    m = jax.nn.relu(m)
    m = jax.vmap(lambda x: resize_bilinear(x, (target_size, target_size)))(m)
    return m[..., 0]


def _reflect_blur_matrix(s: int, ksize: int, sigma: float) -> np.ndarray:
    """(s, s) matrix of the reflect-padded separable gaussian blur along
    one axis — row i is the kernel centered at i with jnp.pad 'reflect'
    index folding (no repeated edge)."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()  # numpy twin of _gaussian_kernel1d (jit-safe)
    pad = ksize // 2

    def fold(j: int) -> int:
        # jnp.pad 'reflect' index folding, valid for ANY overhang —
        # small maps (s < ksize, e.g. 2×2 test grids) reflect more
        # than once, so fold modulo the 2s-2 reflection period
        if s == 1:
            return 0
        period = 2 * s - 2
        j %= period
        return period - j if j >= s else j

    mat = np.zeros((s, s), np.float64)
    for i in range(s):
        for t in range(ksize):
            mat[i, fold(i + t - pad)] += k[t]
    return mat


@functools.lru_cache(maxsize=16)
def _blur_upsample_matrix(s: int, target: int, ksize: int = 7) -> np.ndarray:
    """(target, s) composite operator: reflect-pad gaussian blur then
    half-pixel-centers bilinear upsample, one axis.  The bilinear half
    is materialized by resizing the identity with jax.image.resize
    itself, so the composite is EXACTLY upsample∘blur by construction
    (tested against the staged pipeline to f32 roundoff)."""
    sigma = torchvision_default_sigma(ksize)
    blur = _reflect_blur_matrix(s, ksize, sigma)
    # ensure_compile_time_eval: callers sit inside a jit trace, where
    # omnistaging would turn this constant resize into a tracer
    with jax.ensure_compile_time_eval():
        up = np.asarray(
            jax.image.resize(jnp.eye(s, dtype=jnp.float32), (target, s), "bilinear")
        ).astype(np.float64)
    return (up @ blur).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("target_size",))
def upsample_anomaly_maps_fused(maps: jax.Array, target_size: int = 256) -> jax.Array:
    """blur→ReLU→bilinear for NON-NEGATIVE (B, s, s) maps as two
    matmuls per image against the composed (target, s) operator.

    Replaces two depthwise convs + jax.image.resize in the fused patch
    scoring program (evaluation/inference.py): the operator matrices
    are trace-time constants (256×29 floats), and the only HBM traffic
    left is the unavoidable (B, target, target) output write.  f32 at
    HIGHEST precision — scores feed metrics directly.
    """
    m = jnp.asarray(maps, jnp.float32)
    s = m.shape[-1]
    op = jnp.asarray(_blur_upsample_matrix(s, target_size))
    tmp = jnp.einsum("ij,bjl->bil", op, m, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bil,kl->bik", tmp, op, precision=jax.lax.Precision.HIGHEST)
    return jax.nn.relu(out)
