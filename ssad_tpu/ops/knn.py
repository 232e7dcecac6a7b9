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


# --- tiled Pallas kernel for banks beyond the VMEM envelope --------------------
#
# The resident kernel above needs the whole bank in VMEM (≤1024 rows).
# Wide patch normality (`--n-normality-images 50` → ~42k rows) used to
# fall back to XLA: one (N, M) f32 HIGHEST matmul + lax.top_k.  Measured
# on v5e at N=6728, M=35840 that is 14.5 ms/batch — 4.8 ms of it
# lax.top_k and ~2.4 ms writing + re-reading the 964 MB sims matrix.
# This kernel streams bank tiles through VMEM, keeps a running top-k in
# scratch, and never materializes sims in HBM: the top-k and the sims
# round-trip disappear and the matmul's HBM traffic (bank re-read per
# query tile) pipelines behind the MXU.
#
# Precision: the sims matmul is bf16x3 (each f32 operand split into a
# bf16 hi/lo pair, three DEFAULT-precision MXU passes accumulating in
# f32) — half the MXU passes of HIGHEST (bf16x6).  Measured at the
# shapes above: HIGHEST 9.9 ms/batch, bf16x3 5.9 ms, max |Δscore| vs
# the f32 oracle 9e-6 (scores are O(1e-2..0.5) cosine distances, so
# ~1e-5 absolute is far below threshold sensitivity; the ≤1000-row
# resident kernel keeps full HIGHEST fidelity).  The split must be done
# with BIT MASKING, not convert-round: XLA's excess-precision rule
# folds f32→bf16→f32 round-trips to a no-op on TPU, so the idiomatic
# `lo = x - f32(bf16(x))` silently evaluates to zero and the correction
# terms vanish (observed: bf16x3-by-convert == plain-bf16 error).

_TILE_M = 1024  # bank rows per grid step: (512, 1024) bf16 ×2 = 2 MB double-buffered


def _split_bf16x2(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~2^-16 relative.

    hi is x with the low 16 mantissa bits zeroed (exactly representable
    in bf16); lo = x − hi is exact in f32 and loses only its own low
    bits to the final bf16 cast.  Bit ops, not converts — see the
    excess-precision note above."""
    import numpy as np

    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFF0000), jnp.float32
    )
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _knn_tiled_kernel(qh_ref, ql_ref, bh_ref, bl_ref, nvalid_ref, out_ref,
                      *tops, k: int, n_btiles: int):
    """Grid (query tiles, bank tiles), bank innermost.

    qh/ql_ref: (TILE_Q, D) normalized queries, bf16 hi/lo split (VMEM,
               revisited across j)
    bh/bl_ref: (D, TILE_M) normalized bank tile, bf16 hi/lo split (VMEM)
    nvalid_ref: (1, 1) number of real bank rows (SMEM)
    tops:    k VMEM scratches (TILE_Q, 128) -- PER-LANE running top-k,
             sorted t0 >= t1 >= ... per lane
    out_ref: (TILE_Q, 128) mean top-k cosine distance (written at j last)

    The top-k is STREAMED: each 128-column slice of the sims tile is
    inserted into per-lane sorted registers with a max/min cascade
    (2k VPU ops/element, no argmax, no concat copy -- the per-tile
    k-pass selection this replaces cost ~3x more VPU work and dominated
    the MXU matmul).  Every candidate is inserted individually, so
    duplicate bank rows count like lax.top_k/sklearn.  The cross-lane
    reduction of the k*128 survivors happens once per query tile at the
    last bank step.
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        for t in tops:
            t[:] = jnp.full_like(t, -jnp.inf)

    # bf16x3: (qh+ql)·(bh+bl) minus the negligible ql·bl term
    sims = jnp.dot(qh_ref[:], bh_ref[:], preferred_element_type=jnp.float32)
    sims += jnp.dot(qh_ref[:], bl_ref[:], preferred_element_type=jnp.float32)
    sims += jnp.dot(ql_ref[:], bh_ref[:], preferred_element_type=jnp.float32)
    tile_m = bh_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    valid = (j * tile_m + col) < nvalid_ref[0, 0]
    sims = jnp.where(valid, sims, -jnp.inf)

    ts = [t[:] for t in tops]
    for g in range(tile_m // 128):
        v = sims[:, g * 128:(g + 1) * 128]
        for i in range(k):
            hi = jnp.maximum(ts[i], v)
            v = jnp.minimum(ts[i], v)
            ts[i] = hi
    for t, val in zip(tops, ts):
        t[:] = val

    @pl.when(j == n_btiles - 1)
    def _emit():
        # global top-k of the k*128 per-lane survivors (any row-global
        # top-k element is within its lane's top-k); one tied max
        # eliminated per pass preserves duplicate counting
        cand = jnp.concatenate(ts, axis=1)  # (TILE_Q, k*128)
        ccol = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        total = jnp.zeros((cand.shape[0], 1), jnp.float32)
        for _ in range(k):
            cur = jnp.max(cand, axis=1, keepdims=True)
            total = total + cur
            first = jnp.argmax(cand, axis=1, keepdims=True)
            cand = jnp.where(ccol == first, -jnp.inf, cand)
        out_ref[:] = jnp.broadcast_to(1.0 - total / k, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_cosine_scores_pallas_tiled(
    queries: jax.Array, bank: jax.Array, k: int = 3
) -> jax.Array:
    """Streaming-bank Pallas kernel: any bank size, fused top-k.

    Measured v5e, N=6728 queries, 35840-row bank: 14.5 ms/batch (XLA
    HIGHEST + lax.top_k) → 9.9 ms (fused, HIGHEST) → 5.9 ms (fused,
    bf16x3 sims — see the precision note above; max |Δscore| vs the
    f32 oracle 9e-6)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = queries.shape
    m = bank.shape[0]
    q = l2_normalize(queries.astype(jnp.float32))
    b = l2_normalize(bank.astype(jnp.float32))

    n_pad = _round_up(max(n, 8), _TILE_Q)
    m_pad = _round_up(max(m, 128), _TILE_M)
    d_pad = _round_up(d, 128)
    q = jnp.pad(q, ((0, n_pad - n), (0, d_pad - d)))
    bt = jnp.pad(b.T, ((0, d_pad - d), (0, m_pad - m)))
    qh, ql = _split_bf16x2(q)
    bh, bl = _split_bf16x2(bt)
    nvalid = jnp.array([[m]], dtype=jnp.int32)

    grid = (n_pad // _TILE_Q, m_pad // _TILE_M)
    qspec = pl.BlockSpec((_TILE_Q, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((d_pad, _TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_knn_tiled_kernel, k=k, n_btiles=grid[1]),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        grid=grid,
        in_specs=[
            qspec, qspec, bspec, bspec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_Q, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TILE_Q, 128), jnp.float32) for _ in range(k)
        ],
    )(qh, ql, bh, bl, nvalid)
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
    for traces started inside the context.  ``'pallas'`` picks the
    size-appropriate kernel (bank-resident ≤ PALLAS_MAX_BANK_ROWS,
    streaming-tiled above).  Remember that jit CACHES by trace: a
    function first traced inside the context keeps that dispatch choice
    afterwards."""
    global _IMPL_OVERRIDE
    if impl not in (None, "pallas", "xla"):
        raise ValueError(f"impl must be 'pallas', 'xla' or None, got {impl!r}")
    prev = _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


#: resident↔tiled kernel crossover: the resident kernel keeps the WHOLE
#: bank VMEM-resident — its design envelope is the product's ≤1000-row
#: ring bank (2 MB f32 padded to 1024×512).  Larger normality sets
#: (multi-image patch banks, --coreset > 1024) dispatch to the
#: streaming-tiled kernel, which never overflows VMEM: embedded in an
#: outer jitted program, a VMEM-overflowing resident bank would only
#: fail at Mosaic compile time, where the try/except below — which
#: guards TRACING — cannot catch it, and the whole scoring program
#: dies.  The guard is a static shape check, so it composes with outer
#: jits.
PALLAS_MAX_BANK_ROWS = 1024


def _pallas_kernel_for(bank: jax.Array):
    if bank.shape[0] > PALLAS_MAX_BANK_ROWS:
        return knn_cosine_scores_pallas_tiled
    return knn_cosine_scores_pallas


def knn_cosine_scores(queries: jax.Array, bank: jax.Array, k: int = 3) -> jax.Array:
    """Dispatch to a Pallas kernel on TPU, XLA elsewhere.

    ``SSAD_FORCE_PALLAS=1`` (read at module import — see above) makes a
    kernel failure fatal (so TPU tests can assert the kernel path
    actually executes); otherwise a broken kernel warns once and
    degrades to the XLA implementation.  Banks beyond the resident
    kernel's VMEM envelope (PALLAS_MAX_BANK_ROWS) take the
    streaming-tiled kernel, which fuses the top-k into the bank-tile
    matmul loop instead of materializing the (N, M) sims matrix in HBM
    like the XLA path.
    """
    if _IMPL_OVERRIDE == "xla":
        return knn_cosine_scores_xla(queries, bank, k=k)
    if _IMPL_OVERRIDE == "pallas":
        return _pallas_kernel_for(bank)(queries, bank, k=k)
    force = _FORCE_PALLAS
    if force or jax.default_backend() == "tpu":
        try:
            return _pallas_kernel_for(bank)(queries, bank, k=k)
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
