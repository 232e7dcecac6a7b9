"""Host-side object-mask precomputation.

The reference computes an object segmentation per subject (or per image
for NON_FIXED_OBJECTS) with skimage Canny + binary morphology + largest
connected component (dataset_generator.py:27-39), plus a SLIC
superpixel pre-posterization for 'cable' (datasets.py:201-205).

Connected components and hysteresis edge tracking don't map onto XLA,
and they only run once per subject/image, so this stays a host-side
precompute (cv2 + numpy; skimage is not a dependency of this
framework).  The resulting masks and their packed coordinate lists are
uploaded once and consumed by the on-device synthesis engine.

Packing convention: `np.where(mask)` row-major order, flipped to (x, y)
pairs — exactly the reference's coords_map (datasets.py:263-264).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def object_mask(image_u8: np.ndarray) -> np.ndarray:
    """Binary object mask from an RGB uint8 image.

    Pipeline (mirroring dataset_generator.py:27-39):
      gray → blur(σ=1.5) → Canny(5, 15) → dilate 3×3 → close 3×3 →
      fill holes → erode 4×4 → largest connected component.
    Falls back to all-ones when no component survives (the reference's
    argmax-over-empty-bincount quirk yields labels==0, i.e. full white).
    """
    if not _HAS_CV2:
        return _object_mask_numpy(image_u8)

    gray = cv2.cvtColor(image_u8, cv2.COLOR_RGB2GRAY)
    # skimage canny(sigma=1.5, low=5, high=15): gaussian pre-smooth +
    # low absolute gradient thresholds → very sensitive edges
    blurred = cv2.GaussianBlur(gray, (0, 0), sigmaX=1.5)
    edges = cv2.Canny(blurred, 5, 15)

    k3 = np.ones((3, 3), np.uint8)
    m = cv2.dilate(edges, k3)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k3)
    m = fill_holes(m > 0).astype(np.uint8) * 255
    m = cv2.erode(m, np.ones((4, 4), np.uint8))

    mask = (m > 0).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    if n <= 1:  # nothing found → full-white fallback (reference quirk)
        return np.ones_like(mask)
    largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
    return (labels == largest).astype(np.uint8)


def _object_mask_numpy(image_u8: np.ndarray) -> np.ndarray:  # pragma: no cover
    """cv2-free fallback: gradient-magnitude threshold + fill."""
    gray = image_u8.astype(np.float32).mean(axis=-1)
    gy, gx = np.gradient(gray)
    mag = np.hypot(gx, gy)
    mask = (mag > 5).astype(np.uint8)
    mask = fill_holes(mask > 0).astype(np.uint8)
    return mask if mask.any() else np.ones_like(mask)


def fill_holes(mask: np.ndarray) -> np.ndarray:
    """Flood-fill from the border; anything unreached is a hole → filled."""
    h, w = mask.shape
    m = mask.astype(np.uint8).copy()
    if _HAS_CV2:
        # pad with a zero ring before flood-filling from (0, 0): the
        # ring 4-connects every border background region, so ONE seed
        # reaches them all (matching scipy binary_fill_holes and the
        # BFS fallback below, which seed every border pixel).  Filling
        # the unpadded mask from the corner misclassifies any border
        # region not connected to (0, 0) as a hole — and if (0, 0)
        # itself is foreground, ALL background becomes "holes".
        ff = np.pad(m, 1)
        cv2_mask = np.zeros((h + 4, w + 4), np.uint8)
        cv2.floodFill(ff, cv2_mask, (0, 0), 1)
        holes = (ff[1:-1, 1:-1] == 0) & (m == 0)
        return mask | holes
    # BFS fallback
    from collections import deque

    outside = np.zeros((h, w), bool)
    dq = deque()
    for i in range(h):
        for j in (0, w - 1):
            if not m[i, j] and not outside[i, j]:
                outside[i, j] = True
                dq.append((i, j))
    for j in range(w):
        for i in (0, h - 1):
            if not m[i, j] and not outside[i, j]:
                outside[i, j] = True
                dq.append((i, j))
    while dq:
        i, j = dq.popleft()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ni, nj = i + di, j + dj
            if 0 <= ni < h and 0 <= nj < w and not m[ni, nj] and not outside[ni, nj]:
                outside[ni, nj] = True
                dq.append((ni, nj))
    return mask | (~outside & (m == 0))


def posterize_cable(image_u8: np.ndarray, n_segments: int = 5, seed: int = 0) -> np.ndarray:
    """Color-quantize an image into ~n_segments LAB clusters.

    Stand-in for the reference's SLIC(n_segments=5, sigma=2, lab) +
    label2rgb(kind='avg') pre-posterization of 'cable'
    (datasets.py:201-205): k-means over blurred LAB pixels, each pixel
    painted with its cluster's mean RGB.  (skimage SLIC is spatial
    k-means; for the downstream Canny mask the color quantization is
    the part that matters.)
    """
    if not _HAS_CV2:  # pragma: no cover
        return image_u8
    blurred = cv2.GaussianBlur(image_u8, (0, 0), sigmaX=2.0)
    lab = cv2.cvtColor(blurred, cv2.COLOR_RGB2LAB).reshape(-1, 3).astype(np.float32)
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 20, 1.0)
    _, labels, _ = cv2.kmeans(
        lab, n_segments, None, criteria, 3, cv2.KMEANS_PP_CENTERS
    )
    labels = labels.reshape(image_u8.shape[:2])
    out = np.zeros_like(image_u8)
    flat = image_u8.reshape(-1, 3)
    for k in range(n_segments):
        sel = labels.reshape(-1) == k
        if sel.any():
            out.reshape(-1, 3)[sel] = flat[sel].mean(axis=0).astype(np.uint8)
    return out


def subject_mask(image_u8: np.ndarray, subject: str) -> np.ndarray:
    """Object mask for one subject image, with the cable special case
    (reference datasets.py:195-206)."""
    from ssad_tpu import constants

    if constants.is_texture(subject):
        return np.ones(image_u8.shape[:2], np.uint8)
    src = posterize_cable(image_u8) if subject == "cable" else image_u8
    return object_mask(src)


def pack_coords(mask: np.ndarray, max_coords: int | None = None) -> tuple[np.ndarray, int]:
    """Mask → ((max_coords, 2) int32 (x, y) row-major, count).

    Row-major (x, y) ordering matches the reference coords_map
    (np.flip of np.where column stack, datasets.py:263-264).  Padding
    repeats the last coordinate (or the center for an empty mask) so
    out-of-range gathers stay harmless on device.
    """
    h, w = mask.shape
    if max_coords is None:
        max_coords = h * w
    ys, xs = np.nonzero(mask)
    count = int(xs.size)
    out = np.zeros((max_coords, 2), np.int32)
    if count == 0:
        out[:] = (w // 2, h // 2)
        return out, 0
    n = min(count, max_coords)
    out[:n, 0] = xs[:n]
    out[:n, 1] = ys[:n]
    out[n:] = out[n - 1]
    return out, n
