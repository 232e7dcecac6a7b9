"""Fixed-shape rasterization primitives for on-device defect synthesis.

The reference draws defects with PIL on CPU dataloader workers
(ImageDraw.polygon in dataset_generator.py:99, Image.rotate+paste in
datasets.py:344-355, ImageDraw.line in datasets.py:383-388).  Here every
shape is rasterized as a pure, fixed-shape array program directly in
*image* coordinates, so the whole synthetic pipeline stays inside one
jit/vmap region on the TPU.

All functions take float coordinates in (x, y) order and return float
masks of a static (H, W) shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pixel_grid(shape: Tuple[int, int]):
    h, w = shape
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return px, py


def polygon_mask(vertices: jax.Array, num_vertices: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Even-odd fill of a simple polygon with up to MAX vertices.

    vertices: (MAX, 2) float (x, y) in image coordinates; entries at
    index >= num_vertices are ignored (pad them by repeating the last
    valid vertex so the padded edges are degenerate).
    Returns a float {0,1} mask of `shape`.

    Equivalent of PIL ImageDraw.polygon fill (reference
    dataset_generator.py:99-100), via a per-pixel crossing-number test.
    """
    max_v = vertices.shape[0]
    idx = jnp.arange(max_v)
    # replicate the last valid vertex into the padding slots
    last = vertices[jnp.maximum(num_vertices - 1, 0)]
    verts = jnp.where((idx < num_vertices)[:, None], vertices, last[None, :])

    px, py = _pixel_grid(shape)

    # all edges at once: (max_v, 1, 1) vs (H, W) broadcast, one VPU pass
    nxt = jnp.roll(verts, -1, axis=0)
    x1 = verts[:, 0][:, None, None]
    y1 = verts[:, 1][:, None, None]
    x2 = nxt[:, 0][:, None, None]
    y2 = nxt[:, 1][:, None, None]
    cond = (y1 > py) != (y2 > py)
    denom = jnp.where(y2 == y1, 1.0, y2 - y1)
    xint = x1 + (py - y1) * (x2 - x1) / denom
    crossings = jnp.sum((cond & (px < xint)).astype(jnp.int32), axis=0)
    return (crossings % 2).astype(jnp.float32)


def polyline_mask(
    points: jax.Array,
    num_points: jax.Array,
    width: float,
    shape: Tuple[int, int],
) -> jax.Array:
    """Thick polyline mask: pixels within width/2 of any active segment.

    points: (MAX, 2) float (x, y); segments i→i+1 are active for
    i < num_points - 1.  Replaces PIL ImageDraw.line width=1/3
    (reference datasets.py:383-388).
    """
    px, py = _pixel_grid(shape)
    half = width / 2.0
    max_p = points.shape[0]

    # all segments at once: (S, 1, 1) vs (H, W) broadcast
    a = points[:-1]  # (S, 2)
    b = points[1:]
    ax = a[:, 0][:, None, None]
    ay = a[:, 1][:, None, None]
    abx = (b[:, 0] - a[:, 0])[:, None, None]
    aby = (b[:, 1] - a[:, 1])[:, None, None]
    denom = jnp.maximum(abx * abx + aby * aby, 1e-12)
    t = jnp.clip(((px - ax) * abx + (py - ay) * aby) / denom, 0.0, 1.0)
    dx = px - (ax + t * abx)
    dy = py - (ay + t * aby)
    d2 = dx * dx + dy * dy
    active = (jnp.arange(max_p - 1) < num_points - 1)[:, None, None]
    hit = jnp.any(active & (d2 <= half * half), axis=0)
    return hit.astype(jnp.float32)


def rotated_rect_mask(
    center: jax.Array,
    rect_w: jax.Array,
    rect_h: jax.Array,
    angle_deg: jax.Array,
    shape: Tuple[int, int],
) -> jax.Array:
    """Mask of a w×h rectangle rotated by `angle_deg` (CCW) about `center`.

    This is the alpha channel of the reference's rotated scar: PIL
    Image.rotate(angle, expand=True) keeps alpha=255 inside the rotated
    rectangle and 0 in the expanded corners (datasets.py:344, pasted with
    itself as mask at :355).
    """
    px, py = _pixel_grid(shape)
    theta = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = px - center[0]
    dy = py - center[1]
    # rotate pixel back into the rectangle frame (y axis points down, so a
    # CCW image rotation is CW in array coords; the mask is symmetric anyway)
    u = c * dx - s * dy
    v = s * dx + c * dy
    inside = (jnp.abs(u) <= rect_w / 2.0) & (jnp.abs(v) <= rect_h / 2.0)
    return inside.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def savgol_matrix(n: int, window: int = 10, polyorder: int = 2) -> np.ndarray:
    """Savitzky–Golay smoothing as a precomputed (n, n) linear operator.

    SG filtering is linear in its input, so applying scipy's
    savgol_filter to the identity yields the exact operator — including
    scipy's edge handling and even-window behavior.  The reference
    smooths sampled line points with savgol_filter(points, 10, 2, axis=0)
    (datasets.py:373); on device the smoothing is then a single (n,n)
    matmul.
    """
    try:
        from scipy.signal import savgol_filter

        return savgol_filter(np.eye(n), window, polyorder, axis=0).astype(np.float32)
    except Exception:
        # fallback: centered moving-average of the same window
        m = np.zeros((n, n), dtype=np.float32)
        half = window // 2
        for i in range(n):
            lo = max(0, i - half)
            hi = min(n, i + half + 1)
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m


def smooth_polyline(points: jax.Array, window: int = 10, polyorder: int = 2) -> jax.Array:
    """Apply the Savitzky–Golay operator to (N, 2) points."""
    s = jnp.asarray(savgol_matrix(points.shape[0], window, polyorder))
    return s @ points
