"""Checkpointing: params + batch_stats + memory bank + config, via Orbax.

Reference parity: Lightning checkpoints carry the memory bank through
on_save_checkpoint/on_load_checkpoint (models.py:199-207) and every
consumer loads 'best_model.ckpt' (tools.py:322, evaluator.py:236).
Here a checkpoint is a directory with an Orbax PyTree payload plus the
TrainConfig JSON, restorable without constructing the model first.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from ssad_tpu.config import TrainConfig
from ssad_tpu.train.memory_bank import MemoryBank

CHECKPOINT_NAME = "best_model"  # directory name, reference file name parity


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _checkpointer():
    """PyTree checkpointer honoring the single-writer contract.

    In multi-controller runs ONLY process 0 writes artifacts (hosts may
    not share a filesystem — cli.py train-multi).  Orbax's default
    Checkpointer, however, runs a sync_global_devices barrier over ALL
    processes inside save(); with a sole writer that deadlocks: process
    0 blocks in the save barrier while the others wait at the command's
    exit barrier (observed via faulthandler stacks on the two-process
    CLI test).  Scoping active_processes to the CALLING process makes
    every barrier a self-barrier, which is correct here because each
    payload is plain host numpy (already gathered by dist.to_host) and
    written to a process-local path — there is nothing to coordinate.
    """
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me,
                active_processes={me},
                barrier_sync_key_prefix=f"proc{me}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    outputs_dir: str | Path,
    params: Any,
    batch_stats: Any,
    bank: Optional[MemoryBank],
    cfg: Optional[TrainConfig] = None,
    name: str = CHECKPOINT_NAME,
) -> str:
    import orbax.checkpoint as ocp

    path = (Path(outputs_dir) / name).absolute()
    payload: Dict[str, Any] = {
        "params": _to_numpy_tree(params),
        "batch_stats": _to_numpy_tree(batch_stats),
    }
    if bank is not None:
        payload["bank"] = {
            "data": np.asarray(bank.data),
            "cursor": np.asarray(bank.cursor),
            "count": np.asarray(bank.count),
        }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if cfg is not None:
        (path / "train_config.json").write_text(cfg.to_json())
    return str(path)


def load_checkpoint(path: str | Path):
    """Returns (params, batch_stats, bank_or_None, cfg_or_None)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = _checkpointer()
    payload = ckptr.restore(path)
    bank = None
    if "bank" in payload and payload["bank"] is not None:
        b = payload["bank"]
        bank = MemoryBank(
            data=jax.numpy.asarray(b["data"]),
            cursor=jax.numpy.asarray(b["cursor"]),
            count=jax.numpy.asarray(b["count"]),
        )
    cfg = None
    cfg_file = path / "train_config.json"
    if cfg_file.exists():
        cfg = TrainConfig.from_json(cfg_file.read_text())
    return payload["params"], payload["batch_stats"], bank, cfg
