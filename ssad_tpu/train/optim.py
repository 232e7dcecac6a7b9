"""Optimizer construction: torch-style SGD, cosine schedule, freezing.

Reference parity (models.py:336-341, tools.py:252-306):
  * SGD(lr, momentum=0.9, weight_decay=5e-4) — torch semantics
    (decay added to the gradient *before* the momentum buffer);
  * CosineAnnealingWarmRestarts(T_0=epochs) stepped per epoch, active
    only in the fine-tune stage (with max_epochs == T_0 no restart ever
    fires — it is a plain cosine decay to 0);
  * phase 1 freezes the backbone (requires_grad=False); phase 2 trains
    everything.  Freezing = optax.multi_transform routing frozen
    subtrees to set_to_zero (parameters stay bit-identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ssad_tpu.config import OptimConfig


def cosine_warm_restarts(base_lr: float, t0_epochs: int, steps_per_epoch: int):
    """Per-step schedule equal to torch CosineAnnealingWarmRestarts
    stepped once per epoch with T_0 = t0_epochs, eta_min = 0."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        t_cur = jnp.mod(epoch, t0_epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t0_epochs))

    return schedule


def torch_sgd(lr_or_schedule, momentum: float, weight_decay: float):
    """grad → grad + wd·p → buf = μ·buf + grad → p -= lr·buf."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_or_schedule),
    )


def is_backbone_path(path) -> bool:
    """Param-tree predicate for backbone parameters (the reference's
    freeze_net(['backbone']), models.py:185-189)."""
    return any(getattr(p, "key", None) == "backbone" for p in path)


def build_optimizer(
    cfg: OptimConfig,
    stage: str,
    steps_per_epoch: int,
    params,
):
    """Optimizer for a training stage.

    stage='projection': head-only training, constant lr (reference
    tools.py:252-270 — no scheduler in this stage, models.py:339-341).
    stage='fine_tune': everything trainable, cosine decay.
    """
    if stage == "projection":
        tx = torch_sgd(cfg.projection_lr, cfg.momentum, cfg.weight_decay)
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if is_backbone_path(path) else "train", params
        )
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    elif stage == "fine_tune":
        schedule = cosine_warm_restarts(
            cfg.fine_tune_lr, cfg.fine_tune_epochs, steps_per_epoch
        )
        return torch_sgd(schedule, cfg.momentum, cfg.weight_decay)
    raise ValueError(f"unknown stage {stage!r}")
