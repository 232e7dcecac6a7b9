"""Multi-process (multi-host / multi-slice) support.

The reference is strictly single-process (`devices=1` everywhere,
tools.py:266); this module is the DCN story SURVEY §5.8/§7-stage-7
scopes: several controller processes — one per host/slice — build ONE
global ('model', 'data') mesh, and the same global-view stacked step
(category_parallel.make_multi_category_step) runs unchanged, with XLA
routing the per-category gradient reductions over the 'data' axis
(ICI within a slice) while the embarrassingly-parallel 'model' axis
spans slices over DCN.

Multi-controller JAX rules this encodes (scaling-book recipe):
  * every process executes the SAME program on the SAME global values;
  * host data enters global arrays via `jax.make_array_from_callback`
    (each process materialises only its addressable shards) — a plain
    `jax.device_put` of a process-local array onto a global sharding
    raises;
  * results come back via `multihost_utils.process_allgather`.

Validated by tests/test_multiprocess.py: two coordinated CPU processes
with 4 virtual devices each build the global 2×4 mesh and reproduce the
single-process 8-device step bit-for-bit (Gloo collectives).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_cpu_devices: Optional[int] = None,
    shutdown_timeout_seconds: int = 1200,
) -> None:
    """`jax.distributed.initialize` wrapper.

    local_cpu_devices: provision N virtual CPU devices in this process
    first (test/dev rigs; real TPU hosts discover their local chips).
    Must run before the backend is first used.

    shutdown_timeout_seconds raises the coordination service's exit-time
    Shutdown-barrier deadline from jax's 300 s default: controllers can
    be skewed at exit by however long process 0 spends writing artifacts
    (checkpoints + matplotlib histories — minutes on a contended host),
    and a process that exits early sits in that barrier the whole time.
    `barrier()` below removes the skew for the train-multi path; the
    larger deadline is the belt for every other exit.
    """
    if local_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        shutdown_timeout_seconds=shutdown_timeout_seconds,
    )


def barrier(name: str, timeout_s: float = 1200.0) -> None:
    """Block every controller at a named coordination-service barrier.

    This is a pure key-value rendezvous on the coordinator
    (`wait_at_barrier`) — no device collectives, so it cannot trip the
    gloo clique-rendezvous deadline `warmup_collectives` exists for, and
    the timeout is explicit.  Use it to hold fast controllers alive
    while a slow one (process 0) finishes host-side work: without it the
    early-exiting process falls into jax.distributed's atexit Shutdown
    barrier, and once that deadline lapses the coordination service
    fatally kills the still-working process mid-write (observed as
    'Terminating process because the JAX distributed service detected
    fatal errors' on the train-multi CLI path).  No-op single-process.
    """
    if not is_multiprocess():
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    assert client is not None
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def warmup_collectives(mesh) -> None:
    """Create the cross-process communicators for every clique the mesh
    will use, while all controllers are still in lockstep.

    The FIRST collective on a device clique performs a KV-store
    rendezvous with a ~30 s deadline baked into XLA (observed:
    ``DEADLINE_EXCEEDED: GetKeyValue() timed out ... cpu:gloo/...``);
    jax 0.9 exposes no knob for it.  Mid-run, controllers can be skewed
    by far more than that — each one compiles the big train/eval
    programs independently, minutes apiece on a contended host — so the
    first real collective would spuriously time out.  Warming the
    cliques with a trivial chained-psum program (per-axis subgroups +
    the full device set, covering step collectives and
    ``process_allgather``) turns every later rendezvous into plain
    socket traffic with no deadline.  No-op in a single process."""
    if not is_multiprocess():
        return
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def body(v):
        for ax in axes:  # one clique per axis subgroup
            v = jax.lax.psum(v, ax)
        return jax.lax.psum(v, axes)  # the full-device-set clique

    warm = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P(axes), out_specs=P())
    )
    x = put_global(
        np.zeros((int(np.prod([mesh.shape[a] for a in axes])),), np.float32),
        NamedSharding(mesh, P(axes)),
    )
    jax.block_until_ready(warm(x))
    # process_allgather of replicated host values runs over a separate
    # one-device-per-process clique (observed: cpu:gloo/0,2048) — warm
    # it the same way, it is what to_host uses for metrics
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros((1,), np.float32))


def global_any(flag: bool) -> bool:
    """Cross-process OR of a per-process boolean at a lockstep point.

    The consensus primitive of the coordinated preemption drain: a
    SIGTERM lands on ONE controller, but every controller must take the
    same stop-or-continue branch at the same epoch boundary — a process
    that stops stepping while the others enter the next epoch's
    collectives deadlocks the stacked program.  One process_allgather
    of a single float over the warmed one-device-per-process clique
    (the same clique to_host uses) gives every process the same answer.
    Single-process: the flag itself.
    """
    if not is_multiprocess():
        return bool(flag)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(
        np.asarray([1.0 if flag else 0.0], np.float32)
    )
    return bool(np.max(out) > 0.0)


def put_global(x, sharding) -> jax.Array:
    """Place identical-on-every-process host data onto a (possibly
    non-fully-addressable) global sharding.

    Single-process this is exactly `jax.device_put`; multi-process it
    uses `make_array_from_callback`, each process materialising only its
    addressable shards.  Every process MUST pass the same `x` — the
    standard replicated-host-input contract of multi-controller JAX.
    """
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def put_global_tree(tree, shardings) -> Any:
    """`put_global` over a pytree (shardings: matching tree or a single
    sharding applied to every leaf)."""
    if isinstance(shardings, jax.sharding.Sharding):
        return jax.tree_util.tree_map(lambda x: put_global(x, shardings), tree)
    return jax.tree_util.tree_map(put_global, tree, shardings)


def to_host(tree) -> Any:
    """Fetch (possibly non-fully-addressable) global arrays back to host
    numpy on EVERY process.  Single-process: plain np.asarray."""
    if not is_multiprocess():
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True)
    )


def make_stacked_keys(stack: int, mesh) -> Any:
    """jit-compiled (key → (stack,) keys sharded over 'model') splitter.

    Key generation must happen INSIDE jit with explicit out_shardings:
    splitting on host would produce a process-local array that cannot be
    device_put onto the global mesh.  The raw uint32 key data rides in
    as a replicated host input (identical on all processes).
    """
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    model_sharding = NamedSharding(mesh, P("model"))

    @functools.partial(jax.jit, out_shardings=model_sharding)
    def split(key_data):
        return jax.random.split(jax.random.wrap_key_data(key_data), stack)

    def make(key) -> jax.Array:
        return split(np.asarray(jax.random.key_data(key)))

    return make
