"""Sliding-window patch extraction.

Replaces the reference's Tensor.unfold path (functional.py:77-82, used
in-graph by PeraNet.forward at models.py:211-216) with a single XLA
gather.  Patch ordering is row-major over window positions (rows of
windows first), matching torch's unfold(2).unfold(3), so downstream
reshapes to a (side, side) anomaly map stay compatible
(models.py:368-369).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_side(image_size: int, dim: int, stride: int) -> int:
    """Number of window positions along one axis."""
    return (image_size - dim) // stride + 1


def extract_patches(x: jax.Array, dim: int = 32, stride: int = 4) -> jax.Array:
    """(B, H, W, C) → (B, P, dim, dim, C) sliding windows, row-major
    position order.

    P = grid_side(H)·grid_side(W); e.g. 841 patches for 256px images at
    stride 8, 3249 at stride 4 (SURVEY.md §3 patch counts).
    """
    p, inv = extract_patches_shuffled(x, dim, stride)
    return p[:, inv]


def extract_patches_shuffled(x: jax.Array, dim: int, stride: int):
    """(patches (B, P, dim, dim, C) in tiling order, inv (P,) int32).

    `patches[:, inv]` is row-major position order; equivalently a score
    vector computed in tiling order is reordered by `scores[inv]`.

    When stride divides dim, every window position lies on one of
    (dim/stride)² offset grids whose windows tile without overlap —
    extraction is then pure static slices + reshapes (no gather: a
    6.3M-index gather costs ~7 ms/batch on TPU; this path is ~0).
    Consumers that reduce per-patch (k-NN scores) should prefer this
    and reorder the small score vector instead of the patch tensor.

    The slicing runs in a merged (W·C) lane layout: TPU pads the minor
    (lane) dimension to 128, so transposing with minor dims (dim, C=3)
    materializes intermediates at ~42× their logical size (measured
    142 MB/image of traffic for ~5 MB of patches at 256px/32/8).
    Reshaping (B, H, W, C) → (B, H, W·C) once keeps lanes dense through
    every slice/transpose (dim·C = 96 pads only to 128), and the final
    split of C back out of the minor dim is a free row-major reshape —
    measured 0.27 → 0.14 ms/image, 142 → 73 MB/image on v5e.
    """
    b, h, w, c = x.shape
    oh = grid_side(h, dim, stride)
    ow = grid_side(w, dim, stride)
    if dim % stride != 0:
        # fallback: advanced-indexing gather
        ii = (jnp.arange(oh) * stride)[:, None] + jnp.arange(dim)[None, :]
        jj = (jnp.arange(ow) * stride)[:, None] + jnp.arange(dim)[None, :]
        p = x[:, ii[:, None, :, None], jj[None, :, None, :], :]
        return p.reshape(b, oh * ow, dim, dim, c), jnp.arange(oh * ow)

    k = dim // stride
    xm = x.reshape(b, h, w * c)
    parts = []
    positions = []
    for i in range(k):
        for j in range(k):
            ys, xs = i * stride, j * stride
            nh = (h - ys) // dim
            nw = (w - xs) // dim
            if nh <= 0 or nw <= 0:
                continue
            sub = xm[:, ys : ys + nh * dim, xs * c : (xs + nw * dim) * c]
            sub = sub.reshape(b, nh, dim, nw, dim * c)
            sub = sub.transpose(0, 1, 3, 2, 4).reshape(b, nh * nw, dim, dim * c)
            parts.append(sub)
            for r in range(nh):
                for cc in range(nw):
                    positions.append((i + r * k) * ow + (j + cc * k))
    patches = jnp.concatenate(parts, axis=1).reshape(b, -1, dim, dim, c)
    pos = np.asarray(positions)
    inv = np.empty_like(pos)
    inv[pos] = np.arange(len(pos))
    return patches, jnp.asarray(inv, jnp.int32)


def patch_grid_shape(h: int, w: int, dim: int, stride: int) -> Tuple[int, int]:
    return grid_side(h, dim, stride), grid_side(w, dim, stride)
