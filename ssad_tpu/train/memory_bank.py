"""On-device memory bank: fixed-capacity ring buffer of embeddings.

The reference accumulates accepted embeddings in a CPU-side torch
tensor, trimming to the newest 1000 with a python deque at epoch end
(models.py:270-282) — a device→host sync every training step.  Here the
bank is a fixed-shape (capacity, dim) device array with a write cursor;
masked batched inserts are pure array ops inside the jitted train step,
and "newest N" is the ring invariant, no trim pass needed.

Under data parallelism the bank is part of the replicated train state:
insertion happens on the *global* batch (XLA all-gathers the accepted
rows), so every replica holds the same bank — semantically identical to
the reference's single-device deque.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MemoryBank(NamedTuple):
    data: jax.Array  # (capacity, dim)
    cursor: jax.Array  # scalar int32: next write slot
    count: jax.Array  # scalar int32: valid rows (≤ capacity)

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


def init_bank(capacity: int, dim: int, dtype=jnp.float32) -> MemoryBank:
    return MemoryBank(
        data=jnp.zeros((capacity, dim), dtype),
        cursor=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def insert(bank: MemoryBank, embeddings: jax.Array, mask: jax.Array) -> MemoryBank:
    """Insert `embeddings[i]` where `mask[i]`, preserving batch order.

    Accepted rows are compacted to ring slots (cursor + prefix_rank) mod
    capacity via a one-hot matmul scatter — vectorized on the MXU, no
    serializing scatter op (cf. ops note in data/synthetic._shift_matrix).
    """
    cap = bank.capacity
    b = embeddings.shape[0]
    mask = mask.astype(jnp.int32)
    # rank among accepted rows (exclusive prefix sum)
    rank = jnp.cumsum(mask) - mask
    slot = (bank.cursor + rank) % cap  # (b,)
    n_inserted = jnp.sum(mask)
    # slots are unique while ≤ cap rows are accepted; beyond that, rows
    # cap apart in rank collide and sequential-ring semantics say the
    # NEWEST must win — a plain one-hot matmul would SUM colliding rows.
    # An accepted row survives iff it is in the last `cap` accepted:
    last_wins = rank >= (n_inserted - cap)
    write = (mask > 0) & last_wins
    # one-hot scatter: onehot[s, i] = 1 iff surviving row i targets slot s
    slots = jax.lax.broadcasted_iota(jnp.int32, (cap, b), 0)
    onehot = ((slots == slot[None, :]) & write[None, :]).astype(embeddings.dtype)
    written = onehot @ embeddings  # (cap, dim)
    keep = 1.0 - jnp.max(onehot, axis=1, keepdims=True)
    data = bank.data * keep.astype(bank.data.dtype) + written.astype(bank.data.dtype)
    return MemoryBank(
        data=data,
        cursor=(bank.cursor + n_inserted) % cap,
        count=jnp.minimum(bank.count + n_inserted, cap),
    )


def snapshot(bank: MemoryBank) -> Tuple[jax.Array, jax.Array]:
    """(data, count): rows beyond count are stale/zero — callers slice
    on host with int(count)."""
    return bank.data, bank.count


def newest_first(bank: MemoryBank) -> jax.Array:
    """Valid rows ordered newest→oldest (host-side convenience)."""
    import numpy as np

    data = np.asarray(bank.data)
    count = int(bank.count)
    cursor = int(bank.cursor)
    cap = bank.capacity
    order = [(cursor - 1 - i) % cap for i in range(count)]
    return data[order]
