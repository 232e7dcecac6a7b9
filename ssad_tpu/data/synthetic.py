"""On-device synthetic-defect engine (the 4-way pretext task).

The reference generates defects per sample with PIL/skimage/scipy on
CPU dataloader workers (PretextTaskDataset.__getitem__,
datasets.py:209-394) — the throughput bottleneck of the whole system.
Here the entire pipeline is a pure, fixed-shape JAX program: one
`make_synthesizer(spec)` call returns a per-sample function that is
vmapped over the batch and jitted together with the train step, so
augmentation runs fused on the TPU's VPU at memory bandwidth.

Label semantics (datasets.py:215, :261-388):
    0 — good (no defect)
    1 — polygon patch: crop (or flat color) pasted under a random
        convex-ish 4-8-gon alpha mask
    2 — scar: small crop rotated ±45° and pasted 2-5 times
    3 — line: smoothed polyline through the object mask

Every data-dependent PIL shape (crop sizes, rotated bounding boxes,
polygon vertex counts) becomes a masked composite over the full canvas;
`lax.switch` under vmap evaluates all branches and selects — 4× the
arithmetic of the reference per sample, but each branch is a handful of
VPU passes and the batch runs entirely on device.

Object masks / coordinate lists are host-precomputed once per subject
(see data/masks.py) and passed in as arrays; the packed-coordinate
convention matches the reference's coords_map (datasets.py:263-264).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssad_tpu import constants
from ssad_tpu.config import AugConfig
from ssad_tpu.ops import image as im
from ssad_tpu.ops import rasterize

# Subject-specific pre-crops used in patch mode (datasets.py:243-248),
# as (left, top, right, bottom) on the 256px canvas.
PATCH_MODE_PRECROPS = {
    "capsule": (0, 50, 255, 200),
    "screw": (25, 25, 230, 230),
}

_LINE_COLORS = np.array(
    [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [192 / 255.0] * 3], np.float32
)  # black / white / silver (datasets.py:369)


@dataclasses.dataclass(frozen=True)
class SynthSpec:
    """Static (hashable) configuration of the synthesizer for one
    (subject, mode) pair — one XLA compilation each."""

    subject: str
    imsize: Tuple[int, int] = (256, 256)
    patch_localization: bool = False
    patch_size: int = 64
    aug: AugConfig = dataclasses.field(default_factory=AugConfig)

    @property
    def is_texture(self) -> bool:
        return constants.is_texture(self.subject)

    @property
    def is_non_fixed(self) -> bool:
        return constants.is_non_fixed_object(self.subject)

    @property
    def precrop(self) -> Optional[Tuple[int, int, int, int]]:
        if self.patch_localization:
            return PATCH_MODE_PRECROPS.get(self.subject)
        return None

    @property
    def canvas(self) -> Tuple[int, int]:
        if self.patch_localization:
            return (self.patch_size, self.patch_size)
        return self.imsize

    @property
    def patch_area_ratio(self) -> Tuple[float, float]:
        return (
            self.aug.patch_area_ratio_patchmode
            if self.patch_localization
            else self.aug.patch_area_ratio
        )

    @property
    def scar_area_ratio(self) -> Tuple[float, float]:
        return (
            self.aug.scar_area_ratio_patchmode
            if self.patch_localization
            else self.aug.scar_area_ratio
        )

    @property
    def container_scale_patch(self) -> float:
        return 1.0 if self.patch_localization else self.aug.container_scale_patch

    @property
    def container_scale_scar(self) -> float:
        return 1.0 if self.patch_localization else self.aug.container_scale_scar

    @property
    def line_points(self) -> int:
        return (
            self.aug.line_points_patch if self.patch_localization else self.aug.line_points_image
        )

    @property
    def line_width(self) -> float:
        return float(
            self.aug.line_width_patch if self.patch_localization else self.aug.line_width_image
        )

    def _tile(self, area_hi: float, aspect_hi: float, rotated: bool) -> int:
        """Static tile size covering the largest possible defect crop.

        Defect content is sampled on a small fixed tile and composited
        via dynamic slices — full-image dynamic gathers are pathologically
        slow on TPU (scalar-core bound), tiles keep everything on the VPU.
        """
        import math

        h, w = self.canvas
        side = math.sqrt(area_hi * h * w * aspect_hi)
        if rotated:
            side *= math.sqrt(2.0)  # expand=True bounding box
        return int(math.ceil((side + 2) / 8.0) * 8)

    @staticmethod
    def _aspect_extreme(ranges) -> float:
        """Largest side-stretch factor over both aspect intervals: width
        grows with aspect (√aspect), height with 1/aspect (√(1/aspect)).
        Evaluated over EVERY interval endpoint — assuming interval 0 is
        the below-1 one and interval 1 the above-1 one (the CPP default
        split) would under-size the tile for custom AugConfigs whose
        intervals are swapped or both wide, silently truncating extreme-
        aspect crops against the static tile."""
        vals = [v for r in ranges for v in r]
        return max(max(vals), 1.0 / min(vals))

    @property
    def poly_tile(self) -> int:
        return self._tile(
            self.patch_area_ratio[1], self._aspect_extreme(self.aug.patch_aspect_ratio),
            False,
        )

    @property
    def scar_tile(self) -> int:
        return self._tile(
            self.scar_area_ratio[1], self._aspect_extreme(self.aug.scar_aspect_ratio),
            True,
        )


# --- small shared helpers -------------------------------------------------


def _randint_incl(key, lo, hi):
    """random.randint semantics: inclusive bounds (traced ok)."""
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.maximum(jnp.asarray(hi, jnp.int32), lo)
    u = jax.random.uniform(key, ())
    return lo + jnp.floor(u * (hi - lo + 1).astype(jnp.float32)).astype(jnp.int32)


class PackedCoords(NamedTuple):
    """Host-precomputed packed mask coordinates."""

    coords: jax.Array  # (M, 2) int32
    count: jax.Array  # scalar int32


class CdfCoords(NamedTuple):
    """On-device mask sampler: inclusive prefix-sum of the flat mask.

    Sampling the r-th set pixel is `sum(cdf <= r)` — a vector compare +
    reduction, unlike packed compaction which needs a per-sample argsort
    (a TPU while-loop measured ~70 ms/batch for 64² masks).
    """

    cdf: jax.Array  # (S,) int32 inclusive prefix sum
    total: jax.Array  # scalar int32
    width: int  # static canvas width


def make_cdf_coords(mask_bin) -> CdfCoords:
    flat = mask_bin.reshape(-1).astype(jnp.int32)
    cdf = jnp.cumsum(flat)
    return CdfCoords(cdf, cdf[-1], mask_bin.shape[1])


def _ranks_to_coords(cs: CdfCoords, ranks):
    """ranks (K,) int in [0, total) → (K, 2) int32 (x, y) coordinates."""
    idx = jnp.sum((cs.cdf[None, :] <= ranks[:, None]).astype(jnp.int32), axis=1)
    idx = jnp.clip(idx, 0, cs.cdf.shape[0] - 1)
    return jnp.stack([idx % cs.width, idx // cs.width], axis=1)


class Presampled(NamedTuple):
    """Mask coordinates pre-sampled *outside* the vmapped per-sample
    program (image-level mode).

    Gathering from a shared coords array inside vmap makes XLA
    broadcast the whole (65536, 2) table per sample (~5 ms/batch);
    hoisting the gather outside the vmap makes it one small indexed
    read."""

    poly: jax.Array  # (2,) int32
    scars: jax.Array  # (max_copies, 2) int32
    walk: jax.Array  # (n, 2) float32


def presample_indices(key, count, n_walk: int, max_copies: int):
    """(1 + max_copies + n_walk,) indices into a packed coords list:
    polygon coord, scar coords (uniform), then a sorted walk."""
    kp, ks, kw = jax.random.split(key, 3)
    i_poly = _randint_incl(kp, 0, jnp.maximum(count - 1, 0))
    u_s = jax.random.uniform(ks, (max_copies,))
    i_scars = (u_s * jnp.maximum(count, 1).astype(jnp.float32)).astype(jnp.int32)
    i_scars = jnp.clip(i_scars, 0, jnp.maximum(count - 1, 0))
    i_walk = _walk_ranks(kw, count, n_walk)
    return jnp.concatenate([i_poly[None], i_scars, i_walk])


def _sample_mask_coord(key, cs):
    """Uniform coordinate from the object mask (reference
    get_random_coordinate, dataset_generator.py:259-265)."""
    if isinstance(cs, PackedCoords):
        idx = _randint_incl(key, 0, jnp.maximum(cs.count - 1, 0))
        return cs.coords[idx]  # (x, y) int32
    u = jax.random.uniform(key, ())
    rank = (u * jnp.maximum(cs.total, 1).astype(jnp.float32)).astype(jnp.int32)
    return _ranks_to_coords(cs, rank[None])[0]


def _walk_ranks(key, count, n: int):
    """(n,) monotone int32 ranks into the mask's row-major coord list,
    matching the reference's progressive recurrence (datasets.py:362-368):
    index_0 = 0, index_i = randint(index_{i-1}, floor(M·i/n)).

    In continuous form x_i = (1−u_i)·x_{i−1} + u_i·b_i with
    b_i = floor(M·i/n) — an affine recurrence, so it lowers to ONE
    associative_scan (O(log n) depth) instead of a sequential loop.
    This is NOT equivalent to n sorted uniforms (the round-2
    implementation): the stationary lag L ⩾ 0 below the diagonal obeys
    L =ᵈ (1−U)(L+δ), giving spacing variance δ²/2 vs δ² for sorted
    uniforms — a two-sample KS test tells them apart easily
    (tests/test_ref_distributions.py pins this to the reference policy).
    """
    u = jax.random.uniform(key, (n,))
    m = jnp.maximum(count, 1).astype(jnp.float32)
    b = jnp.floor(m * jnp.arange(n, dtype=jnp.float32) / n)
    a = 1.0 - u
    c = u * b

    def combine(left, right):
        la, lc = left
        ra, rc = right
        return la * ra, lc * ra + rc

    _, xs = jax.lax.associative_scan(combine, (a, c))
    return jnp.clip(xs.astype(jnp.int32), 0, jnp.maximum(count - 1, 0))


def _sample_mask_walk(key, cs, n: int):
    """(n, 2) float points walking monotonically through the mask in
    row-major order via the reference's index recurrence
    (datasets.py:362-368; see _walk_ranks)."""
    if isinstance(cs, PackedCoords):
        ranks = _walk_ranks(key, cs.count, n)
        return cs.coords[ranks].astype(jnp.float32)
    ranks = _walk_ranks(key, cs.total, n)
    return _ranks_to_coords(cs, ranks).astype(jnp.float32)


def _container_clamp(canvas_hw, patch_w, patch_h, cx, cy, scale: float):
    """Clamp a paste box into the central container
    (reference check_valid_coordinates_by_container,
    dataset_generator.py:104-144: note it uses imsize[0] — PIL's WIDTH
    — for both axes; canvas_hw is (H, W), so the faithful quirk
    reproduction reads canvas_hw[1])."""
    center = canvas_hw[1] // 2
    # reference: left = int(center - center/scale) — truncation applies
    # AFTER the subtraction (Container, dataset_generator.py:15-24); for
    # scale 1.75 this differs by 1 from center - int(center/scale)
    left = jnp.int32(center - center / scale)
    top = left
    right = jnp.int32(center + center / scale)
    bottom = right

    half_w = patch_w // 2
    half_h = patch_h // 2
    paste_left = cx - half_w
    paste_top = cy - half_h
    paste_right = cx + half_w
    paste_bottom = cy + half_h

    paste_left = jnp.where(paste_right > right, right - patch_w, paste_left)
    paste_top = jnp.where(paste_bottom > bottom, bottom - patch_h, paste_top)
    paste_left = jnp.where(paste_left < left, left, paste_left)
    paste_top = jnp.where(paste_top < top, top, paste_top)
    return paste_left, paste_top


def _gen_crop_geometry(key, area_ratio, aspect_ratio, cut_hw):
    """Crop size + position sampling (reference generate_patch,
    dataset_generator.py:164-210).  Returns (pw, ph, src_left, src_top)."""
    k_area, k_pick, k_a1, k_a2, k_l, k_t = jax.random.split(key, 6)
    cut_h, cut_w = cut_hw
    img_area = jnp.float32(cut_h * cut_w)
    area = jax.random.uniform(k_area, (), minval=area_ratio[0], maxval=area_ratio[1]) * img_area
    a1 = jax.random.uniform(k_a1, (), minval=aspect_ratio[0][0], maxval=aspect_ratio[0][1])
    a2 = jax.random.uniform(k_a2, (), minval=aspect_ratio[1][0], maxval=aspect_ratio[1][1])
    aspect = jnp.where(jax.random.bernoulli(k_pick), a1, a2)
    pw = jnp.maximum(jnp.int32(jnp.sqrt(area * aspect)), 2)
    ph = jnp.maximum(jnp.int32(jnp.sqrt(area / aspect)), 2)
    w = jnp.maximum(cut_w - pw, 1)
    h = jnp.maximum(cut_h - ph, 1)
    src_left = _randint_incl(k_l, 0, w)
    src_top = _randint_incl(k_t, 0, h)
    return pw, ph, src_left, src_top


def _rect_mean_color(img, left, top, w, h):
    """Mean RGB over a dynamic rectangle of img (H, W, C), as two
    indicator-vector contractions.

    The divisor is the FULL w·h requested area, not the in-bounds pixel
    count: the reference's PIL crop pads out-of-bounds area with black
    and means over the whole crop (dataset_generator.py:206), so crops
    that extend past the canvas are darkened by the padding.

    TPU note: this replaced a per-sample summed-area table — the two
    full-image cumsums cost 6.5 ms/batch (40% of the whole synthesis
    program, measured 96×256² on v5e); the indicator reduction is one
    read of an operand the branch already touches."""
    hh, ww = img.shape[0], img.shape[1]
    b = jnp.minimum(top + h, hh)
    r = jnp.minimum(left + w, ww)
    rows = jnp.arange(hh)
    cols = jnp.arange(ww)
    rvec = ((rows >= jnp.maximum(top, 0)) & (rows < b)).astype(jnp.float32)
    cvec = ((cols >= jnp.maximum(left, 0)) & (cols < r)).astype(jnp.float32)
    total = jnp.einsum(
        "j,jlc,l->c", rvec, img.astype(jnp.float32), cvec,
        precision=jax.lax.Precision.HIGHEST,
    )
    cnt = jnp.maximum(jnp.asarray(w * h, jnp.float32), 1.0)
    return total / cnt


def _colorize(key, cut, src_left, src_top, pw, ph, probs):
    """Colorization mode and flat color (datasets.py:267-293, :311-333).

    Returns (t, flat_color): t=0 crop pixels, t=1 average color of the
    crop region, t=2 uniform random color.
    """
    k_t, k_r, k_g, k_b = jax.random.split(key, 4)
    u = jax.random.uniform(k_t, ())
    t = jnp.where(u < probs[0], 0, jnp.where(u < probs[0] + probs[1], 1, 2))
    avg = _rect_mean_color(cut, src_left, src_top, pw, ph)
    # reference 'average' rounds to int 0-255 (dataset_generator.py:206)
    avg = jnp.floor(avg * 255.0) / 255.0
    rand = (
        jnp.stack(
            [
                _randint_incl(k_r, 0, 255),
                _randint_incl(k_g, 0, 255),
                _randint_incl(k_b, 0, 255),
            ]
        ).astype(jnp.float32)
        / 255.0
    )
    flat = jnp.where(t == 1, avg, rand)
    return t, flat, avg


def _brightness_factor(key, x_mean, patch_mean, aug: AugConfig):
    """Brightness retouch applied when the defect's mean color is
    nearly collinear with the canvas mean (datasets.py:295-299): two
    successive PIL Brightness.enhance calls, each factor chosen from
    {low, high} with low~U(0.75,0.9), high~U(1.1,1.15)."""
    k_lo, k_hi, k_c1, k_c2 = jax.random.split(key, 4)
    sim = im.color_cosine_similarity(x_mean, patch_mean)
    low = jax.random.uniform(k_lo, (), minval=aug.brightness_low[0], maxval=aug.brightness_low[1])
    high = jax.random.uniform(
        k_hi, (), minval=aug.brightness_high[0], maxval=aug.brightness_high[1]
    )
    f1 = jnp.where(jax.random.bernoulli(k_c1), low, high)
    f2 = jnp.where(jax.random.bernoulli(k_c2), low, high)
    return jnp.where(sim > aug.similarity_threshold, f1 * f2, 1.0)


def _polygon_vertices(key, pw, ph):
    """Random 4-8-gon on the border of a (pw, ph) rectangle.

    Reference rect2poly(sides=8) (dataset_generator.py:63-98): each of
    the four sides contributes 1 or 2 points; two-point sides emit them
    in the reference's specific half-range order so the walk stays a
    simple polygon.  Returns ((8, 2) float vertices in patch-local
    coords, vertex count).
    """
    keys = jax.random.split(key, 13)
    w = pw.astype(jnp.int32)
    h = ph.astype(jnp.int32)
    hw = w // 2
    hh = h // 2
    two = jax.random.bernoulli(keys[0], 0.5, (4,))  # randint(1,2)==2 per side

    fi = lambda v: v.astype(jnp.float32)
    zero = jnp.float32(0.0)

    # per side: single point, or (p1, p2) in reference order
    l_single = jnp.stack([zero, fi(_randint_incl(keys[1], 1, h))])
    l_p1 = jnp.stack([zero, fi(_randint_incl(keys[2], hh + 1, h))])
    l_p2 = jnp.stack([zero, fi(_randint_incl(keys[3], 1, hh))])

    t_single = jnp.stack([fi(_randint_incl(keys[4], 1, w)), zero])
    t_p1 = jnp.stack([fi(_randint_incl(keys[5], 1, hw)), zero])
    t_p2 = jnp.stack([fi(_randint_incl(keys[6], hw + 1, w)), zero])

    r_single = jnp.stack([fi(w), fi(_randint_incl(keys[7], 1, h))])
    r_p1 = jnp.stack([fi(w), fi(_randint_incl(keys[8], 1, hh))])
    r_p2 = jnp.stack([fi(w), fi(_randint_incl(keys[9], hh + 1, h))])

    b_single = jnp.stack([fi(_randint_incl(keys[10], 1, w)), fi(h)])
    b_p1 = jnp.stack([fi(_randint_incl(keys[11], hw + 1, w)), fi(h)])
    b_p2 = jnp.stack([fi(_randint_incl(keys[12], 1, hw)), fi(h)])

    singles = jnp.stack([l_single, t_single, r_single, b_single])
    firsts = jnp.stack([l_p1, t_p1, r_p1, b_p1])
    seconds = jnp.stack([l_p2, t_p2, r_p2, b_p2])

    # one-hot row selects instead of `.at[off].set(...)`: `off` is
    # traced, and a batched dynamic_update_slice under the synthesis
    # vmap serializes into an XLA while-loop over the batch (the
    # _shift_matrix rule below); the elementwise-where form vectorizes
    verts = jnp.zeros((8, 2), jnp.float32)
    row = jnp.arange(8)
    off = jnp.int32(0)
    for side in range(4):
        p1 = jnp.where(two[side], firsts[side], singles[side])
        verts = jnp.where((row == off)[:, None], p1[None, :], verts)
        verts = jnp.where(
            ((row == off + 1) & two[side])[:, None],
            seconds[side][None, :], verts,
        )
        off = off + 1 + two[side].astype(jnp.int32)
    return verts, off


# --- defect branches --------------------------------------------------------


def _shift_matrix(n_out: int, n_in: int, offset):
    """One-hot (n_out, n_in) matrix M with M[i, j] = 1 iff j == i + offset,
    i.e. (M @ v)[i] = v[i + offset], zero where out of range.

    TPU note: every data-dependent move in this engine — crop, paste,
    random crop — is expressed as a pair of these one-hot matmuls.
    The "obvious" lowering (vmapped dynamic_slice / dynamic_update_slice
    / gather) serializes: XLA:TPU turns batched dynamic slices into a
    while-loop over the batch (~16 ms/op measured) and arbitrary-index
    gathers run ~10 ns/element on the scalar core.  One-hot matmuls run
    on the MXU and vectorize over the batch for free.
    """
    oi = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return (ji == oi + offset).astype(jnp.bfloat16)


def _shift2d(img, row_offset, col_offset, out_h: int, out_w: int):
    """out[i, k] = img[i + row_offset, k + col_offset] (zero padded),
    as two one-hot matmuls (see ops.image.apply_separable).

    Default (bf16-input) MXU precision: one-hot values are exact in
    bf16, and pixel values quantize at ~2⁻⁸ relative — the same level
    as the reference's uint8 images.
    """
    m_r = _shift_matrix(out_h, img.shape[0], row_offset)
    m_c = _shift_matrix(out_w, img.shape[1], col_offset)
    return im.apply_separable(img, m_r, m_c)


def _crop_tile(cut, src_l, src_t, tile: int):
    """(tile, tile, 3) window of `cut` starting at (src_l, src_t);
    reads past the image edge come back black, matching PIL's
    out-of-bounds crop (generate_patch can request crops larger than
    the canvas in patch mode)."""
    return _shift2d(cut, src_t, src_l, tile, tile)


def _composite_tiles(x, tiles):
    """Alpha-paste (T, T) tiles onto the canvas, PIL paste-with-mask
    semantics (later pastes win only where their alpha is set).

    tiles: list of (rgb (T,T,3), alpha (T,T), paste_l, paste_t).  Each
    tile is scattered to its dynamic position by the one-hot matmul
    placement (see _shift_matrix) and blended with an elementwise
    select — no gathers, no dynamic slices.
    """
    hc, wc = x.shape[0], x.shape[1]
    for rgb, alpha, paste_l, paste_t in tiles:
        rgba = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        # placed[i, k] = rgba[i - paste_t, k - paste_l]
        placed = _shift2d(rgba, -paste_t, -paste_l, hc, wc)
        x = jnp.where(placed[..., 3:4] > 0, placed[..., :3], x)
    return x


def _paste_polygon_patch(key, spec: SynthSpec, x, x_mean, cut, cs):
    """Label-1 defect (datasets.py:267-308)."""
    aug = spec.aug
    hc, wc = x.shape[0], x.shape[1]
    tile = spec.poly_tile
    k_geo, k_col, k_bri, k_coord, k_poly = jax.random.split(key, 5)

    pw, ph, src_l, src_t = _gen_crop_geometry(
        k_geo, spec.patch_area_ratio, aug.patch_aspect_ratio, (cut.shape[0], cut.shape[1])
    )
    t, flat, avg = _colorize(k_col, cut, src_l, src_t, pw, ph, aug.color_probs)
    patch_mean = jnp.where(t == 0, avg, flat)
    bright = _brightness_factor(k_bri, x_mean, patch_mean, aug)

    c = cs.poly if isinstance(cs, Presampled) else _sample_mask_coord(k_coord, cs)
    paste_l, paste_t = _container_clamp(
        (hc, wc), pw, ph, c[0], c[1], spec.container_scale_patch
    )

    # content + alpha on the (tile, tile) canvas, in patch-local coords
    crop_val = _crop_tile(cut, src_l, src_t, tile)
    flat = flat.astype(crop_val.dtype)
    content = jnp.where(t == 0, crop_val, jnp.broadcast_to(flat, crop_val.shape))
    content = jnp.clip(content * bright.astype(content.dtype), 0.0, 1.0)

    verts, n_verts = _polygon_vertices(k_poly, pw, ph)
    poly = rasterize.polygon_mask(verts, n_verts, (tile, tile)) > 0
    ty = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    tx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    alpha = (poly & (tx < pw) & (ty < ph)).astype(content.dtype)

    return _composite_tiles(x, [(content, alpha, paste_l, paste_t)])


def _shear_cols(img, shifts):
    """out[r, c] = img[r, c - shifts[r]] (zero fill) via a per-row
    one-hot batched matmul — T is small (a defect tile), so the (T,T,T)
    one-hot stack is cheap and the contraction runs on the MXU."""
    t_r, t_c = img.shape[0], img.shape[1]
    ci = jax.lax.broadcasted_iota(jnp.int32, (t_r, t_c, t_c), 1)  # out col
    cj = jax.lax.broadcasted_iota(jnp.int32, (t_r, t_c, t_c), 2)  # in col
    p = (cj == ci - shifts[:, None, None]).astype(jnp.bfloat16)
    out = jnp.einsum("rij,rjc->ric", p, img.astype(jnp.bfloat16))
    return out.astype(img.dtype)


def _rotate_tile(rgba, angle_deg):
    """Rotate a centered (T, T, C) tile by angle_deg (CW in array
    coords) with the Paeth 3-shear decomposition — integer per-line
    shifts as batched one-hot matmuls.  Replaces a (T²·B)-element
    arbitrary gather (~10 ns/element on the TPU scalar core) with three
    MXU contractions; nearest-neighbor quality, like PIL rotate.
    """
    t = rgba.shape[0]
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    center = (t - 1) / 2.0
    lines = jnp.arange(t, dtype=jnp.float32) - center
    s_col = jnp.round(a * lines).astype(jnp.int32)
    s_row = jnp.round(b * lines).astype(jnp.int32)

    out = _shear_cols(rgba, s_col)
    out = jnp.swapaxes(_shear_cols(jnp.swapaxes(out, 0, 1), s_row), 0, 1)
    return _shear_cols(out, s_col)


def _paste_scar(key, spec: SynthSpec, x, x_mean, cut, cs):
    """Label-2 defect: a crop rotated ±45° pasted 2-5 times
    (datasets.py:309-355)."""
    aug = spec.aug
    hc, wc = x.shape[0], x.shape[1]
    k_geo, k_col, k_bri, k_angle, k_k, k_pastes = jax.random.split(key, 6)

    pw, ph, src_l, src_t = _gen_crop_geometry(
        k_geo, spec.scar_area_ratio, aug.scar_aspect_ratio, (cut.shape[0], cut.shape[1])
    )
    t, flat, avg = _colorize(k_col, cut, src_l, src_t, pw, ph, aug.color_probs)
    patch_mean = jnp.where(t == 0, avg, flat)
    bright = _brightness_factor(k_bri, x_mean, patch_mean, aug)

    angle = _randint_incl(k_angle, aug.scar_angle_range[0], aug.scar_angle_range[1])
    angle_f = angle.astype(jnp.float32)
    theta = jnp.deg2rad(angle_f)
    cos_a = jnp.abs(jnp.cos(theta))
    sin_a = jnp.abs(jnp.sin(theta))
    pwf = pw.astype(jnp.float32)
    phf = ph.astype(jnp.float32)
    # PIL rotate(expand=True) output bbox
    exp_w = jnp.int32(jnp.ceil(pwf * cos_a + phf * sin_a))
    exp_h = jnp.int32(jnp.ceil(pwf * sin_a + phf * cos_a))

    k_copies = _randint_incl(k_k, aug.scar_copies[0], aug.scar_copies[1])
    max_copies = aug.scar_copies[1]
    tile = spec.scar_tile

    # un-rotated scar, CENTERED in the tile: crop shifted so the scar
    # rect's center lands on the tile center, with a centered rect alpha
    off_r = src_t - (tile - ph) // 2
    off_c = src_l - (tile - pw) // 2
    crop_tile = _shift2d(cut, off_r, off_c, tile, tile)
    ty = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    tx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    in_rect = (
        (tx >= (tile - pw) // 2)
        & (tx < (tile - pw) // 2 + pw)
        & (ty >= (tile - ph) // 2)
        & (ty < (tile - ph) // 2 + ph)
    )
    flat = flat.astype(crop_tile.dtype)
    content = jnp.where(t == 0, crop_tile, jnp.broadcast_to(flat, crop_tile.shape))
    content = jnp.clip(content * bright.astype(content.dtype), 0.0, 1.0)
    rgba = jnp.concatenate([content, in_rect[..., None].astype(content.dtype)], axis=-1)
    # every paste reuses the same rotated scar (datasets.py:344)
    rgba = _rotate_tile(rgba, angle_f)
    content = rgba[..., :3]
    alpha = (rgba[..., 3] > 0.5).astype(content.dtype)

    keys = jax.random.split(k_pastes, max_copies)
    # unrolled: max_copies is a small static bound (5); all pastes go
    # into one shared canvas, disabled copies paste zero alpha
    tiles = []
    for i in range(max_copies):
        c = cs.scars[i] if isinstance(cs, Presampled) else _sample_mask_coord(keys[i], cs)
        paste_l, paste_t = _container_clamp(
            (hc, wc), exp_w, exp_h, c[0], c[1], spec.container_scale_scar
        )
        # place the tile so its center sits at the expanded-box center
        off_l = paste_l + (exp_w - tile) // 2
        off_t = paste_t + (exp_h - tile) // 2
        a = alpha * (i < k_copies)
        tiles.append((content, a, off_l, off_t))
    return _composite_tiles(x, tiles)


def _draw_line(key, spec: SynthSpec, x, cs):
    """Label-3 defect: smoothed polyline through the object mask
    (datasets.py:357-388)."""
    n = spec.line_points
    hc, wc = x.shape[0], x.shape[1]
    k_side, k_steps, k_color, k_split = jax.random.split(key, 4)

    side_left = jax.random.bernoulli(k_side)  # choice(['left','top'])

    pts = cs.walk if isinstance(cs, Presampled) else _sample_mask_walk(k_steps, cs, n)

    # sort by x when growing from the left (datasets.py:371-372).
    # n is tiny, so sort = stable rank + one-hot matmul (a jnp.sort would
    # lower to a per-sample while-loop on TPU)
    xcoord = pts[:, 0]
    ii = jnp.arange(n)
    before = (xcoord[None, :] < xcoord[:, None]) | (
        (xcoord[None, :] == xcoord[:, None]) & (ii[None, :] < ii[:, None])
    )
    ranks = jnp.sum(before.astype(jnp.int32), axis=1)  # (n,)
    onehot = (ranks[:, None] == ii[None, :]).astype(pts.dtype)  # (src, dst)
    pts_sorted = onehot.T @ pts
    pts = jnp.where(side_left, pts_sorted, pts)

    pts = rasterize.smooth_polyline(pts, window=10, polyorder=2)

    if not spec.patch_localization:
        # split into 10 runs of n//10 points, keep one (datasets.py:374-377).
        # one-hot matmul, not dynamic_slice: the offset is traced, and a
        # batched dynamic_slice under the synthesis vmap serializes into
        # a per-sample while-loop (see _shift_matrix)
        seg = n // spec.aug.line_splits
        kpick = _randint_incl(k_split, 0, spec.aug.line_splits - 1)
        pts = _shift_matrix(seg, n, kpick * seg).astype(pts.dtype) @ pts
        n_active = seg
    else:
        n_active = n

    color = jnp.asarray(_LINE_COLORS)[_randint_incl(k_color, 0, 2)].astype(x.dtype)
    lmask = rasterize.polyline_mask(
        pts, jnp.int32(n_active), spec.line_width, (hc, wc)
    )
    return jnp.where(lmask[..., None] > 0, color, x)


# --- the synthesizer ---------------------------------------------------------


def make_synthesizer(spec: SynthSpec):
    """Build the per-sample synthesis function for a (subject, mode).

    Returned signature::

        synth(key, image, cut_pool, n_cut, mask, coords, n_coords)
            -> (x_normalized, y, original)

    * image: (H, W, 3) float [0,1] — the subject train image (resized)
    * cut_pool: (K, H, W, 3) — first image of each category, used as
      cut sources by texture subjects (datasets.py:189-193, :225-228)
    * mask: (H, W) float {0,1} object mask (all ones for textures)
    * coords / n_coords: packed mask coordinates (ignored in patch mode,
      where they are recomputed on device after cropping)

    Wrap with `batched_synthesizer` for the vmapped batch version.
    """
    aug = spec.aug
    ph_, pw_ = spec.canvas

    def synth(key, image, cut_pool, n_cut, mask, coords, n_coords, pre=None,
              cut_img=None):
        keys = jax.random.split(key, 8)
        y = _randint_incl(keys[0], 0, 3)  # datasets.py:215
        # internal pipeline runs bf16: every pass is bandwidth-bound and
        # bf16's 2^-8 relative rounding matches the reference's uint8
        # quantization anyway
        x = image.astype(jnp.bfloat16)
        original = image

        # random affine for fixed-pose subjects at image level
        # (datasets.py:220-222)
        if not spec.patch_localization and not spec.is_non_fixed:
            x = im.random_affine(keys[1], x, aug.affine_degrees, aug.affine_scale)

        # cut source (datasets.py:225-228)
        if spec.is_texture:
            if cut_img is not None:
                # pre-gathered by batched_synthesizer outside the vmap —
                # the per-sample cut_pool[idx] gather under vmap
                # broadcasts the whole pool per sample (README rule 7)
                cut = cut_img.astype(jnp.bfloat16)
            else:
                cut_idx = _randint_incl(keys[2], 0, jnp.maximum(n_cut - 1, 0))
                cut = cut_pool[cut_idx].astype(jnp.bfloat16)
        else:
            # always the un-affined, un-cropped original (datasets.py:228)
            cut = original.astype(jnp.bfloat16)

        if spec.patch_localization:
            if spec.precrop is not None:
                l, t, r, b = spec.precrop
                x = x[t:b, l:r]
                mask = mask[t:b, l:r]
            # random patch_size crop of canvas + mask (datasets.py:249-252)
            kx, kyk, kc = jax.random.split(keys[3], 3)
            max_l = x.shape[1] - spec.patch_size
            max_t = x.shape[0] - spec.patch_size
            left = _randint_incl(kx, 0, max_l)
            top = _randint_incl(kyk, 0, max_t)
            x = _shift2d(x, top, left, spec.patch_size, spec.patch_size)
            mask = _shift2d(mask, top, left, spec.patch_size, spec.patch_size)
            # cut image gets an independent RandomCrop (datasets.py:253)
            kcl, kct = jax.random.split(kc)
            c_l = _randint_incl(kcl, 0, cut.shape[1] - spec.patch_size)
            c_t = _randint_incl(kct, 0, cut.shape[0] - spec.patch_size)
            cut = _shift2d(cut, c_t, c_l, spec.patch_size, spec.patch_size)
            mask_bin = mask > 0.5
            # degenerate working area → force 'good' (datasets.py:258-259).
            # The reference sums ToTensor() of an RGB segmentation — every
            # object pixel counts 3× — against patch²/2, so the effective
            # coverage threshold is patch²/6, not patch²/2.
            y = jnp.where(
                3.0 * jnp.sum(mask_bin)
                < (spec.patch_size * spec.patch_size) / 2.0,
                0,
                y,
            )
            cs = make_cdf_coords(mask_bin)
        elif pre is not None:
            cs = pre
        else:
            cs = PackedCoords(coords, n_coords)

        x_mean = im.mean_color(x)
        branches = [
            lambda k: x,
            lambda k: _paste_polygon_patch(k, spec, x, x_mean, cut, cs),
            lambda k: _paste_scar(k, spec, x, x_mean, cut, cs),
            lambda k: _draw_line(k, spec, x, cs),
        ]
        x = jax.lax.switch(y, branches, keys[4])

        # final jitter + imagenet normalization (datasets.py:391, :430-433)
        x = im.color_jitter(keys[5], x, aug.jitter_offset, aug.jitter_offset, aug.jitter_offset)
        x = im.normalize_imagenet(x)
        return x.astype(jnp.float32), y, original

    return synth


def batched_synthesizer(spec: SynthSpec, per_image_masks: bool | None = None):
    """vmap of make_synthesizer over (keys, images[, masks, coords, counts]).

    per_image_masks: whether mask/coords/count inputs carry a batch axis
    (True for NON_FIXED_OBJECTS at image level, where the reference
    recomputes obj_mask per image, datasets.py:232-235).  Defaults to
    spec.is_non_fixed.
    """
    if per_image_masks is None:
        per_image_masks = spec.is_non_fixed
    synth = make_synthesizer(spec)
    ax = 0 if per_image_masks else None
    cut_ax = 0 if spec.is_texture else None

    def pre_cut_images(keys, cut_pool, n_cut):
        """One batched pool gather outside the vmap, using the SAME key
        slot the per-sample path would use (split(key, 8)[2]) — so the
        hoist is bit-identical to the in-vmap gather it replaces."""
        if not spec.is_texture:
            return None
        idx = jax.vmap(
            lambda k: _randint_incl(
                jax.random.split(k, 8)[2], 0, jnp.maximum(n_cut - 1, 0)
            )
        )(keys)
        return cut_pool[idx]

    if spec.patch_localization:
        inner_patch = jax.vmap(
            synth, in_axes=(0, 0, None, None, ax, ax, ax, None, cut_ax)
        )

        def run_patch(keys, images, cut_pool, n_cut, masks, coords, counts):
            cuts = pre_cut_images(keys, cut_pool, n_cut)
            return inner_patch(
                keys, images, cut_pool, n_cut, masks, coords, counts, None, cuts
            )

        return run_patch

    n_walk = spec.line_points
    max_copies = spec.aug.scar_copies[1]
    inner = jax.vmap(synth, in_axes=(0, 0, None, None, ax, None, None, 0, cut_ax))

    def run(keys, images, cut_pool, n_cut, masks, coords, counts):
        if coords.shape[-2] == 1:
            raise ValueError(
                "image-level synthesis received 1-row placeholder "
                "coordinates — this PretextData was prepared with "
                "patch_localization=True (prepare_pretext_data skips "
                "packing coords in patch mode); re-prepare it for "
                "image-level use"
            )
        sample_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5A11))(keys)
        idx = jax.vmap(presample_indices, in_axes=(0, 0 if per_image_masks else None, None, None))(
            sample_keys, counts, n_walk, max_copies
        )  # (B, 1 + max_copies + n_walk)
        if per_image_masks:
            pts = jnp.take_along_axis(coords, idx[:, :, None], axis=1)
        else:
            pts = coords[idx]  # one gather, outside the vmap
        pre = Presampled(
            pts[:, 0],
            pts[:, 1 : 1 + max_copies],
            pts[:, 1 + max_copies :].astype(jnp.float32),
        )
        cuts = pre_cut_images(keys, cut_pool, n_cut)
        return inner(keys, images, cut_pool, n_cut, masks, None, None, pre, cuts)

    return run
