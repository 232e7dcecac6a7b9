"""On-device pixel metrics: ONE sort → ROC AUC + optimal-F1 threshold +
F1/IoU + MVTec-official AUPRO + plot curves, in one jitted program.

The host implementations in `evaluation/metrics.py` are the oracles
(validated against sklearn/torchmetrics); they re-argsort the flattened
score maps once per metric — three O(n log n) host sorts over millions
of f64 pixels per category (reference metrics.py:59-161 does the same
on CPU).  On the 1-core TPU host that is seconds per category and the
anomaly maps must leave the chip first.  Here the maps stay on device:
one `lax.sort` co-sorts the positive-pixel and PRO-weight payloads with
the scores, every curve statistic is a cumulative scan over the sorted
order, and only scalars plus a fixed-size downsampled curve return to
the host.

Tie handling matches the oracles exactly without any segment gather:
every curve point is evaluated only at the LAST element of each
equal-score run (metrics.py keeps last-of-run points), and the previous
run's endpoint is recovered with a shifted cumulative max (cumsums are
nondecreasing, so the prefix max of end-masked values IS the previous
run end) — a `cummax` instead of the arbitrary-index gather that would
serialize on the TPU scalar core (CLAUDE.md rule #1).

Shapes are bucketed to the next power of two (scores padded with -inf
sort last; a sorted-position iota < n_real recovers the valid mask), so
a 15-category sweep with per-category test-set sizes compiles a couple
of programs, not fifteen.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssad_tpu.evaluation.metrics import _connected_components

#: downsampled plot-curve length (the exact curves have one point per
#: distinct pixel score — millions; a PNG cannot resolve more than this)
CURVE_POINTS = 2048

_MIN_BUCKET = 1 << 20


def _bucket(n: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b <<= 1
    return b


def _prev_end_fill(values: jax.Array, is_end: jax.Array) -> jax.Array:
    """For each position, the value at the END of the previous
    equal-score run (0 before the first run).  `values` must be
    nondecreasing and nonnegative — then the prefix max of end-masked
    values equals the latest preceding run-end value."""
    masked = jnp.where(is_end, values, jnp.zeros_like(values))
    shifted = jnp.concatenate([jnp.zeros_like(masked[:1]), masked[:-1]])
    return jax.lax.cummax(shifted)


@functools.lru_cache(maxsize=8)
def _build_program(n_pad: int, curve_points: int):
    @jax.jit
    def program(scores, pos, pro, n_real, total_pos, total_neg,
                num_regions, fpr_limit):
        f32 = jnp.float32
        # one ascending sort by -score == descending by score; -inf pads
        # become +inf keys and land at the tail
        neg_s, pos_s, pro_s = jax.lax.sort(
            (-scores, pos.astype(jnp.int32), pro), num_keys=1
        )
        s = -neg_s
        idx = jax.lax.iota(jnp.int32, n_pad)
        valid = idx < n_real
        is_end = jnp.concatenate(
            [s[1:] != s[:-1], jnp.ones((1,), bool)]
        )

        pos_i = pos_s * valid.astype(jnp.int32)
        neg_i = (1 - pos_s) * valid.astype(jnp.int32)
        tps = jnp.cumsum(pos_i)
        fps = jnp.cumsum(neg_i)
        pros_cum = jnp.cumsum(pro_s)

        P = jnp.maximum(total_pos, 1).astype(f32)
        N = jnp.maximum(total_neg, 1).astype(f32)
        R = jnp.maximum(num_regions, 1).astype(f32)

        # ROC: trapezoid between consecutive run ends (the first run's
        # predecessor is the (0, 0) origin the oracle prepends)
        tpr = jnp.minimum(tps.astype(f32) / P, 1.0)
        fpr = jnp.minimum(fps.astype(f32) / N, 1.0)
        tpr_prev = _prev_end_fill(tpr, is_end)
        fpr_prev = _prev_end_fill(fpr, is_end)
        seg = 0.5 * (tpr + tpr_prev) * (fpr - fpr_prev)
        auroc = jnp.sum(jnp.where(is_end, seg, 0.0), dtype=f32)

        # PRO curve shares the x axis with ROC (num_ok == total_neg:
        # compute_pro's fp_change marks exactly the gt==0 pixels);
        # bounded trapezoid with the boundary point interpolated at
        # fpr_limit (metrics.py:190-209), normalized by the limit
        pro_y = jnp.minimum(pros_cum / R, 1.0)
        pro_prev = _prev_end_fill(pro_y, is_end)
        x0, x1 = fpr_prev, fpr
        y0, y1 = pro_prev, pro_y
        dx = jnp.maximum(x1 - x0, 1e-30)
        y_at_limit = y0 + (y1 - y0) * (fpr_limit - x0) / dx
        seg_full = 0.5 * (y0 + y1) * (x1 - x0)
        seg_cut = 0.5 * (y0 + y_at_limit) * (fpr_limit - x0)
        seg = jnp.where(
            x0 >= fpr_limit, 0.0, jnp.where(x1 <= fpr_limit, seg_full, seg_cut)
        )
        aupro = jnp.sum(jnp.where(is_end, seg, 0.0), dtype=f32) / fpr_limit

        # optimal-F1 threshold: the PR sweep counts scores >= t, so at
        # run end i the support is i+1; among tied F1 maxima the oracle
        # (ascending thresholds, first argmax) picks the SMALLEST
        # threshold — in this descending order that is the LAST argmax
        support = (idx + 1).astype(f32)
        precision = tps.astype(f32) / support
        recall = tps.astype(f32) / P
        f1_curve = (2 * precision * recall) / (precision + recall + 1e-10)
        cand = jnp.where(is_end & valid, f1_curve, -1.0)
        best = n_pad - 1 - jnp.argmax(cand[::-1])
        thr = jnp.nextafter(s[best], jnp.asarray(-jnp.inf, s.dtype))

        # F1 / IoU at that threshold (strict >, torchmetrics semantics)
        pred = (s > thr) & valid
        y = pos_s.astype(bool) & valid
        tp = jnp.sum(pred & y)
        fp = jnp.sum(pred & ~y & valid)
        fn = jnp.sum(~pred & y)
        denom = (2 * tp + fp + fn).astype(f32)
        f1 = jnp.where(denom > 0, 2 * tp.astype(f32) / denom, 0.0)
        inter1 = tp
        union1 = jnp.sum((pred | y) & valid)
        inter0 = jnp.sum(~pred & ~y & valid)
        union0 = jnp.sum((~pred | ~y) & valid)
        iou1 = inter1.astype(f32) / jnp.maximum(union1, 1).astype(f32)
        iou0 = inter0.astype(f32) / jnp.maximum(union0, 1).astype(f32)
        w1 = (union1 > 0).astype(f32)
        w0 = (union0 > 0).astype(f32)
        iou = (iou0 * w0 + iou1 * w1) / jnp.maximum(w0 + w1, 1.0)

        # downsampled curves for plotting: curve_points quantile
        # positions of the REAL range (a fixed-size gather — small
        # enough to be free; a static stride over the padded array
        # would waste most points on the -inf tail).  f32 index
        # arithmetic is exact to 2^24 and a few positions of plotting
        # drift past that is invisible.
        step = n_real.astype(f32) / curve_points
        qidx = jnp.minimum(
            (jnp.arange(1, curve_points + 1, dtype=f32) * step).astype(jnp.int32),
            n_real - 1,
        )
        curve = (fpr[qidx], tpr[qidx], pro_y[qidx])
        return auroc, thr, f1, iou, aupro, curve

    return program


@dataclasses.dataclass
class PixelMetrics:
    auroc: float
    threshold: float
    f1: float
    iou: float
    aupro: Optional[float]
    #: downsampled (fpr, tpr) / (fpr, pro) polylines for plotting
    roc: Tuple[np.ndarray, np.ndarray]
    pro: Optional[Tuple[np.ndarray, np.ndarray]]


def pro_changes(gts: np.ndarray) -> Tuple[np.ndarray, int]:
    """(pro_change, num_regions) from GT masks (N, H, W): per-pixel
    PRO increments 1/|region| on each 8-connected GT component
    (reference metrics.py:59-107's per-region bookkeeping, built with
    one bincount pass per image instead of a loop over regions)."""
    gts = np.asarray(gts)
    pro = np.zeros(gts.shape, np.float32)
    num_regions = 0
    for i in range(gts.shape[0]):
        labeled, n = _connected_components(gts[i] > 0)
        if n == 0:
            continue
        num_regions += n
        sizes = np.bincount(labeled.ravel(), minlength=n + 1).astype(np.float64)
        sizes[0] = 1.0  # background: unused (weight forced to 0 below)
        w = 1.0 / sizes
        w[0] = 0.0
        pro[i] = w[labeled]
    return pro, num_regions


def pixel_metrics(
    anomaly_maps,
    ground_truths,
    fpr_limit: float = 0.3,
    with_pro: bool = True,
    curve_points: int = CURVE_POINTS,
) -> PixelMetrics:
    """All pixel-level metrics of one category in ONE device program.

    anomaly_maps: (N, H, W) scores — may already live on device; they
    never come back to the host.  ground_truths: (N, H, W) host masks
    (connected components need the host; they depend only on GT, not on
    scores).  Requires at least one positive and one negative pixel
    (callers guard, as they do for the host path).
    """
    gts = np.asarray(ground_truths)
    pos_host = (gts > 0).reshape(-1)
    total_pos = int(pos_host.sum())
    total_neg = int(pos_host.size - total_pos)
    if total_pos == 0 or total_neg == 0:
        raise ValueError("pixel metrics need both positive and negative pixels")

    if with_pro:
        pro_host, num_regions = pro_changes(gts)
        pro_flat = pro_host.reshape(-1)
    else:
        pro_flat = np.zeros((0,), np.float32)
        num_regions = 0

    maps = jnp.asarray(anomaly_maps)
    if maps.ndim == 4:  # (B, 1, H, W) reference layout
        maps = maps[:, 0]
    scores = jnp.nan_to_num(maps.astype(jnp.float32)).reshape(-1)
    n = scores.shape[0]
    assert n == pos_host.size, (n, pos_host.size)
    n_pad = _bucket(n)

    pad = n_pad - n
    scores = jnp.concatenate(
        [scores, jnp.full((pad,), -jnp.inf, jnp.float32)]
    )
    pos = jnp.concatenate(
        [jnp.asarray(pos_host, jnp.int8), jnp.zeros((pad,), jnp.int8)]
    )
    if with_pro:
        pro = jnp.concatenate(
            [jnp.asarray(pro_flat, jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
    else:
        pro = jnp.zeros((n_pad,), jnp.float32)

    program = _build_program(n_pad, curve_points)
    auroc, thr, f1, iou, aupro, curve = program(
        scores, pos, pro,
        jnp.int32(n), jnp.int32(total_pos), jnp.int32(total_neg),
        jnp.int32(num_regions), jnp.float32(fpr_limit),
    )
    fpr_c, tpr_c, pro_c = (np.asarray(c, np.float64) for c in curve)
    # pin the exact endpoints the oracle curves carry
    roc = (
        np.r_[0.0, fpr_c, 1.0],
        np.r_[0.0, tpr_c, 1.0],
    )
    pro_curve = (
        (np.r_[0.0, fpr_c, 1.0], np.r_[0.0, pro_c, 1.0])
        if with_pro and num_regions > 0
        else None
    )
    return PixelMetrics(
        auroc=float(auroc),
        threshold=float(thr),
        f1=float(f1),
        iou=float(iou),
        aupro=float(aupro) if with_pro and num_regions > 0 else None,
        roc=roc,
        pro=pro_curve,
    )
