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


def grid_side(image_size: int, dim: int, stride: int) -> int:
    """Number of window positions along one axis."""
    return (image_size - dim) // stride + 1


def extract_patches(x: jax.Array, dim: int = 32, stride: int = 4) -> jax.Array:
    """(B, H, W, C) → (B, P, dim, dim, C) sliding windows.

    P = grid_side(H)·grid_side(W); e.g. 841 patches for 256px images at
    stride 8, 3249 at stride 4 (SURVEY.md §3 patch counts).
    """
    b, h, w, c = x.shape
    oh = grid_side(h, dim, stride)
    ow = grid_side(w, dim, stride)
    ii = (jnp.arange(oh) * stride)[:, None] + jnp.arange(dim)[None, :]  # (oh, dim)
    jj = (jnp.arange(ow) * stride)[:, None] + jnp.arange(dim)[None, :]  # (ow, dim)
    # broadcasted advanced indexing → (b, oh, ow, dim, dim, c)
    p = x[:, ii[:, None, :, None], jj[None, :, None, :], :]
    return p.reshape(b, oh * ow, dim, dim, c)


def patch_grid_shape(h: int, w: int, dim: int, stride: int) -> Tuple[int, int]:
    return grid_side(h, dim, stride), grid_side(w, dim, stride)
