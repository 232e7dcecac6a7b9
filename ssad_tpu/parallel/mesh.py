"""Device-mesh construction and sharding for scaled training.

The reference is strictly single-device (`devices=1` at tools.py:266,
:299, :327) — parallelism here is a new, TPU-native capability:

* **data axis** — the per-category batch is sharded across 'data';
  the jitted train step's gradient reduction and memory-bank insert
  become XLA all-reduces/all-gathers over ICI automatically (we write
  global-view array code under `jax.sharding.use_mesh` / NamedSharding).
* **model axis** — MVTec trains 15 *independent* category models; they
  are stacked into one leading axis and vmapped, with parameters and
  optimizer state sharded over 'model'.  This is embarrassingly
  parallel (no cross-category collectives), so the axis can safely map
  onto DCN across slices while 'data' rides ICI.

The same step function runs unchanged on 1 device or N: shardings are
annotations, XLA inserts the collectives (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_model: int = 1,
    n_data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('model', 'data') mesh over the available devices.

    n_data defaults to all remaining devices after the model axis.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devs) % n_model:
            raise ValueError(f"{len(devs)} devices not divisible by model={n_model}")
        n_data = len(devs) // n_model
    use = np.array(devs[: n_model * n_data]).reshape(n_model, n_data)
    # The ICI-only guarantee for 'data' all-reduces holds when each
    # mesh row stays inside one process (one host/slice).  The row-major
    # reshape satisfies that whenever n_data divides the per-process
    # device count; otherwise (e.g. auto n_model=1 with many hosts)
    # gradient all-reduces silently cross DCN — warn, don't fail, since
    # a DCN 'data' axis is slow but correct.
    if jax.process_count() > 1:
        for row in use:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                import warnings

                warnings.warn(
                    f"'data' mesh row spans processes {sorted(procs)}: "
                    "batch-gradient all-reduces will ride DCN, not ICI. "
                    "Pick --model-shards = a multiple of the host count "
                    "so each data row stays within one host.",
                    stacklevel=2,
                )
                break
    return Mesh(use, ("model", "data"))


def mesh_from_config(mesh_cfg, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ('model', 'data') mesh a MeshConfig describes.

    ``model_axis`` is the number of category shards; ``data_axis`` is
    the data-parallel extent (-1 = all remaining devices).  This is the
    single translation point from the serialized config to a live mesh —
    checkpointed configs rebuild the exact mesh a run used.
    """
    n_data = None if mesh_cfg.data_axis in (-1, None) else mesh_cfg.data_axis
    return make_mesh(n_model=mesh_cfg.model_axis, n_data=n_data, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Per-category batch: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Multi-category stacked batch (C, B, ...): C over 'model', B over 'data'."""
    return NamedSharding(mesh, P("model", "data"))


def stacked_param_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked per-category parameters (C, ...): C over 'model',
    replicated over 'data'."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def shard_stacked_tree(mesh: Mesh, tree):
    """Put a stacked (leading C axis) pytree onto the 'model' axis."""
    s = stacked_param_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
