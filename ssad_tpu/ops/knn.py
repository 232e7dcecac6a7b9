"""Batched k-NN cosine scoring: mean of the k smallest cosine distances.

This is the anomaly-scoring hot path.  The reference fits sklearn
NearestNeighbors(metric='cosine', k=3) on CPU and calls kneighbors per
batch (models.py:352-370) — a host round-trip per image.  Here the whole
thing is one MXU matmul against the (≤1024, 512) memory bank plus an
in-register top-k, fused into a single Pallas kernel (with a pure-XLA
fallback used on CPU and for testing).

For unit vectors, cosine distance = 1 − q·b, so the mean of the k
smallest distances is 1 − (mean of k largest similarities).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_cosine_scores_xla(queries: jax.Array, bank: jax.Array, k: int = 3) -> jax.Array:
    """Reference XLA implementation: (N, D), (M, D) → (N,) scores."""
    q = l2_normalize(queries.astype(jnp.float32))
    b = l2_normalize(bank.astype(jnp.float32))
    sims = jnp.dot(q, b.T, precision=jax.lax.Precision.HIGHEST)  # (N, M)
    top, _ = jax.lax.top_k(sims, k)
    return 1.0 - jnp.mean(top, axis=-1)


# --- Pallas TPU kernel ---------------------------------------------------------

_TILE_Q = 256


def _knn_kernel(q_ref, b_ref, nvalid_ref, out_ref, *, k: int):
    """One query tile vs the whole bank.

    q_ref: (TILE_Q, D) normalized queries in VMEM
    b_ref: (D, M) normalized bank (transposed, padded to 128 multiple)
    nvalid_ref: (1, 1) number of real bank rows (SMEM)
    out_ref: (TILE_Q,) mean top-k cosine distance
    """
    # HIGHEST: full-f32 MXU passes — anomaly scores are 1−sim with sim
    # close to 1, so bf16 inputs would cost ~3 digits of the signal
    sims = jnp.dot(
        q_ref[:], b_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    m = b_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    valid = col < nvalid_ref[0, 0]
    sims = jnp.where(valid, sims, -jnp.inf)

    total = jnp.zeros((sims.shape[0], 1), dtype=jnp.float32)
    for _ in range(k):
        cur = jnp.max(sims, axis=1, keepdims=True)  # (TILE_Q, 1)
        total = total + cur
        # eliminate exactly ONE occurrence of the max (the first), not
        # every tie: the bank legitimately holds duplicate rows (the
        # same image sampled twice in a batch inserts bit-identical
        # embeddings), and top-k semantics — lax.top_k, sklearn
        # kneighbors — count each duplicate separately.  Masking all
        # ties would substitute the (k+1)-th neighbor and inflate
        # scores vs the XLA/sklearn oracles.
        first = jnp.argmax(sims, axis=1, keepdims=True)  # (TILE_Q, 1)
        sims = jnp.where(col == first, -jnp.inf, sims)
    # out block is (TILE_Q, 128) — lane-aligned; scores broadcast across
    # lanes, the caller reads column 0
    out_ref[:] = jnp.broadcast_to(1.0 - total / k, out_ref.shape)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k",))
def knn_cosine_scores_pallas(queries: jax.Array, bank: jax.Array, k: int = 3) -> jax.Array:
    """Pallas TPU kernel: grid over query tiles, bank resident in VMEM.

    The bank is at most (1024, 512) f32 = 2 MB — comfortably inside the
    ~16 MB VMEM budget, so each tile is one (TILE_Q×D)·(D×M) MXU matmul
    plus k vector-max passes, with no HBM round-trips for the scores.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = queries.shape
    m = bank.shape[0]
    q = l2_normalize(queries.astype(jnp.float32))
    b = l2_normalize(bank.astype(jnp.float32))

    n_pad = _round_up(max(n, 8), _TILE_Q)
    m_pad = _round_up(max(m, 128), 128)
    d_pad = _round_up(d, 128)
    q = jnp.pad(q, ((0, n_pad - n), (0, d_pad - d)))
    bt = jnp.pad(b.T, ((0, d_pad - d), (0, m_pad - m)))
    nvalid = jnp.array([[m]], dtype=jnp.int32)

    grid = (n_pad // _TILE_Q,)
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_Q, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_Q, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(q, bt, nvalid)
    return out[:n, 0]


_warned_fallback = False

# Read once at import: the dispatch choice gets baked into jit-compiled
# callers (e.g. the fused score_patches program) at trace time, so a
# per-call read would silently ignore changes made after the first
# trace.  Set the variable before importing ssad_tpu.
import os as _os

_FORCE_PALLAS = _os.environ.get("SSAD_FORCE_PALLAS") == "1"

# trace-time dispatch override for cross-platform lowering: the choice
# below keys on jax.default_backend(), which `jax.default_device(...)`
# does NOT change — so a TPU host exporting a CPU serving artifact
# (serving/export.py) must force the XLA path explicitly or the Pallas
# custom call fails to lower for the CPU target.
_IMPL_OVERRIDE = None


import contextlib as _contextlib


@_contextlib.contextmanager
def force_impl(impl):
    """Force k-NN dispatch to ``'pallas'`` / ``'xla'`` (``None`` resets)
    for traces started inside the context.  Remember that jit CACHES by
    trace: a function first traced inside the context keeps that
    dispatch choice afterwards."""
    global _IMPL_OVERRIDE
    if impl not in (None, "pallas", "xla"):
        raise ValueError(f"impl must be 'pallas', 'xla' or None, got {impl!r}")
    prev = _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


#: the Pallas kernel keeps the WHOLE bank VMEM-resident — its design
#: envelope is the product's ≤1000-row ring bank (2 MB f32 padded to
#: 1024×512).  Larger normality sets (multi-image patch banks,
#: --coreset > 1024) must take the XLA matmul path: embedded in an
#: outer jitted program, a VMEM-overflowing bank only fails at Mosaic
#: compile time, where the try/except below — which guards TRACING —
#: cannot catch it, and the whole scoring program dies.  The guard is a
#: static shape check, so it composes with outer jits.
PALLAS_MAX_BANK_ROWS = 1024


def knn_cosine_scores(queries: jax.Array, bank: jax.Array, k: int = 3) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere.

    ``SSAD_FORCE_PALLAS=1`` (read at module import — see above) makes a
    kernel failure fatal (so TPU tests can assert the kernel path
    actually executes); otherwise a broken kernel warns once and
    degrades to the XLA implementation.  Banks beyond the kernel's
    VMEM envelope (PALLAS_MAX_BANK_ROWS) always take the XLA path —
    there one big MXU matmul is the right program anyway.
    """
    if _IMPL_OVERRIDE == "xla":
        return knn_cosine_scores_xla(queries, bank, k=k)
    if _IMPL_OVERRIDE == "pallas":
        return knn_cosine_scores_pallas(queries, bank, k=k)
    if bank.shape[0] > PALLAS_MAX_BANK_ROWS:
        return knn_cosine_scores_xla(queries, bank, k=k)
    force = _FORCE_PALLAS
    if force or jax.default_backend() == "tpu":
        try:
            return knn_cosine_scores_pallas(queries, bank, k=k)
        except Exception as e:
            if force:
                raise
            global _warned_fallback
            if not _warned_fallback:
                _warned_fallback = True
                import warnings

                warnings.warn(
                    f"Pallas kNN kernel failed, falling back to XLA: {e!r}",
                    RuntimeWarning,
                )
    return knn_cosine_scores_xla(queries, bank, k=k)
