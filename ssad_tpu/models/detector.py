"""AnomalyDetector: k-NN cosine scoring against a normal-embedding bank.

Functional re-design of the reference's sklearn-backed detector
(models.py:345-370): fit() splits the normality embeddings 70/30,
indexes the train part, and calibrates the threshold as the *max* mean
k-NN distance on the validation part (models.py:352-361 — note the
reference's max is outlier-sensitive; kept for parity, with an optional
quantile alternative).  predict() scores queries by mean cosine distance
to the k nearest bank rows — one MXU matmul via ops/knn (the reference
round-trips to sklearn on CPU per batch).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ssad_tpu.ops.knn import knn_cosine_scores, l2_normalize


@dataclasses.dataclass
class AnomalyDetector:
    """k-NN cosine anomaly scorer.

    patch_level / batch / num_patches mirror the reference constructor
    (models.py:346-349): in patch mode predict() reshapes flat patch
    scores to (B, 1, side, side) anomaly maps.
    """

    patch_level: bool = False
    batch: Optional[int] = None
    num_patches: Optional[int] = None
    k: int = 3
    #: 'max' reproduces the reference threshold rule (models.py:361);
    #: 'quantile' uses the .99 quantile (robust to outliers)
    threshold_rule: str = "max"

    bank: Optional[jax.Array] = None  # (M, D) fitted normality bank
    threshold: Optional[float] = None
    #: scores of the 30% validation split, retained by fit() — the
    #: calibration distribution serving drift monitoring compares the
    #: live score stream against (serving/drift.py)
    calibration_scores: Optional[jax.Array] = None

    def fit(self, embeddings: jax.Array, key: Optional[jax.Array] = None,
            coreset: Optional[int] = None) -> "AnomalyDetector":
        """Fit on normal embeddings: 70/30 split, threshold from val part.

        The reference uses sklearn train_test_split with its global RNG
        (models.py:353); randomness here is an explicit key.

        coreset: distill the TRAIN part to this many rows by
        k-center-greedy selection (ops/coreset.py) and keep the WHOLE
        coreset as the bank.  The ordering matters: selection must
        happen after the split, never before.  Every k-center row is
        the sole cover of its region of the normal manifold, so
        splitting a pre-selected coreset (the round-3 wiring) randomly
        deleted 30% of the cover — normal queries near removed centers
        scored high, costing 0.09 pixel AUROC / 0.18 AUPRO in the
        scorer A/B (outputs/scorer_ab).  Calibration also improves:
        the val rows are raw held-out embeddings scored against the
        final bank — the same distribution deployment scoring sees —
        instead of coreset rows scored against a punctured version of
        themselves (which inflated the threshold by the covering
        radius).
        """
        emb = jnp.asarray(embeddings)
        m = emb.shape[0]
        if m < self.k + 1:
            raise ValueError(
                f"need at least k+1={self.k + 1} normality embeddings, got {m}"
            )
        if key is None:
            key = jax.random.key(0)
        perm = jax.random.permutation(key, m)
        n_val = max(int(round(m * 0.3)), 1)
        n_train = m - n_val
        if n_train < self.k:
            n_train, n_val = self.k, m - self.k
        # n_train + n_val == m in both branches above, so the split is
        # always a clean partition of the permutation
        train = emb[perm[n_val:]]
        val = emb[perm[:n_val]]
        if coreset is not None and train.shape[0] > coreset:
            from ssad_tpu.ops.coreset import coreset_select

            train = coreset_select(train, coreset, jax.random.fold_in(key, 1))

        self.bank = train
        val_scores = knn_cosine_scores(val, train, k=self.k)
        self.calibration_scores = val_scores
        if self.threshold_rule == "quantile":
            self.threshold = float(jnp.quantile(val_scores, 0.99))
        else:
            self.threshold = float(jnp.max(val_scores))
        return self

    def predict(self, queries: jax.Array) -> jax.Array:
        """Anomaly scores: mean cosine distance to the k nearest bank
        rows.  Patch mode reshapes to (B, 1, side, side) maps
        (models.py:363-370)."""
        if self.bank is None:
            raise RuntimeError("fit() before predict()")
        scores = knn_cosine_scores(jnp.asarray(queries), self.bank, k=self.k)
        if self.patch_level:
            if not self.batch or not self.num_patches:
                raise ValueError("patch mode needs batch and num_patches")
            side = int(self.num_patches**0.5)
            scores = scores.reshape(self.batch, 1, side, side)
        return scores

    def predict_labels(self, queries: jax.Array) -> jax.Array:
        """Binary anomaly decision by the calibrated threshold."""
        return (self.predict(queries) > self.threshold).astype(jnp.int32)


def normalize_embeddings(embeddings: jax.Array) -> jax.Array:
    """L2-normalize embeddings (the image-level evaluator normalizes
    before scoring, reference evaluator.py:262-263)."""
    return l2_normalize(jnp.asarray(embeddings))


def mahalanobis_distances(queries: jax.Array, mean: jax.Array,
                          precision: jax.Array) -> jax.Array:
    """sqrt(max((q-μ)ᵀ P (q-μ), 0)) per query row, f32 at
    Precision.HIGHEST.

    The ONE Mahalanobis scoring formula — shared by the detector's
    fit/threshold calibration, the fused patch-map program
    (evaluation/inference.py) and the AOT export (serving/export.py).
    The threshold is calibrated here at fit time, so every scorer MUST
    compute the distance at the same matmul precision: a default-
    precision copy would flip labels for borderline samples on TPU.
    """
    q = jnp.asarray(queries, jnp.float32) - mean
    d2 = jnp.einsum(
        "qd,de,qe->q", q, precision, q,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@dataclasses.dataclass
class MahalanobisDetector:
    """Gaussian-density anomaly scorer: fit a single Gaussian to the
    normality embeddings, score by Mahalanobis distance.

    An alternative to the k-NN bank (no counterpart in the reference —
    added as the standard parametric baseline; BASELINE.json north
    star).  Shrinkage regularizes the covariance toward a scaled
    identity (Ledoit-Wolf-style fixed coefficient), which keeps the
    inverse well-conditioned when M < D.  All O(D²)/O(D³) work happens
    once at fit; predict is one (Q, D) × (D, D) matmul.
    """

    shrinkage: float = 0.1
    patch_level: bool = False
    batch: Optional[int] = None
    num_patches: Optional[int] = None

    mean: Optional[jax.Array] = None  # (D,)
    precision: Optional[jax.Array] = None  # (D, D)
    threshold: Optional[float] = None
    #: validation-split scores retained by fit() (see AnomalyDetector)
    calibration_scores: Optional[jax.Array] = None

    def fit(self, embeddings: jax.Array, key: Optional[jax.Array] = None) -> "MahalanobisDetector":
        emb = jnp.asarray(embeddings, jnp.float32)
        m, d = emb.shape
        if m < 2:
            raise ValueError("need at least 2 normality embeddings")
        if key is None:
            key = jax.random.key(0)
        perm = jax.random.permutation(key, m)
        n_val = max(int(round(m * 0.3)), 1)
        train = emb[perm[n_val:]] if m - n_val >= 2 else emb
        val = emb[perm[:n_val]]

        mu = jnp.mean(train, axis=0)
        x = train - mu
        cov = (x.T @ x) / jnp.maximum(train.shape[0] - 1, 1)
        trace_scaled = jnp.trace(cov) / d
        cov = (1.0 - self.shrinkage) * cov + self.shrinkage * trace_scaled * jnp.eye(d)
        self.mean = mu
        self.precision = jnp.linalg.inv(cov)
        self.calibration_scores = self._scores(val)
        self.threshold = float(jnp.max(self.calibration_scores))
        return self

    def _scores(self, queries: jax.Array) -> jax.Array:
        return mahalanobis_distances(queries, self.mean, self.precision)

    def predict(self, queries: jax.Array) -> jax.Array:
        if self.precision is None:
            raise RuntimeError("fit() before predict()")
        scores = self._scores(queries)
        if self.patch_level:
            if not self.batch or not self.num_patches:
                raise ValueError("patch mode needs batch and num_patches")
            side = int(self.num_patches**0.5)
            scores = scores.reshape(self.batch, 1, side, side)
        return scores

    def predict_labels(self, queries: jax.Array) -> jax.Array:
        return (self.predict(queries) > self.threshold).astype(jnp.int32)
