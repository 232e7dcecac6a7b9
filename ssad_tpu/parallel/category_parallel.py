"""Category-parallel training: C independent models as one SPMD program.

MVTec trains 15 independent per-category models (the reference trains
them one at a time on one GPU; tools.py:204 is called per subject).
TPU-natively, the models are *stacked*: every parameter, optimizer and
memory-bank leaf gains a leading category axis, the per-category train
step is vmapped over it, and the stack is sharded over the mesh's
'model' axis while each category's batch is data-parallel over 'data'.
XLA inserts the gradient all-reduces over ICI; categories never
communicate (embarrassingly parallel, DCN-safe).

The fused step = synthesis + fwd/bwd + SGD + bank insert, identical
math to train/trainer.py's single-category step.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssad_tpu.config import TrainConfig
from ssad_tpu.data.synthetic import SynthSpec, batched_synthesizer
from ssad_tpu.parallel import distributed as dist
from ssad_tpu.models.peranet import build_model, init_model
from ssad_tpu.train import optim as optim_mod
from ssad_tpu.train.memory_bank import MemoryBank, init_bank, insert
from ssad_tpu.train.trainer import (
    _epoch_steps,
    bank_fill_embeddings,
    bank_fill_subset,
)


class StackedState(NamedTuple):
    """TrainState with a leading category axis on every leaf."""

    params: Any
    batch_stats: Any
    opt_state: Any
    bank: MemoryBank
    step: jax.Array


class CategoryData(NamedTuple):
    """Per-category device data, stacked on axis 0 (C categories with
    identical shapes — images padded/subsampled to a common N)."""

    images: jax.Array  # (C, N, H, W, 3)
    cut_pool: jax.Array  # (K, H, W, 3), shared
    masks: jax.Array  # (C, H, W)
    coords: jax.Array  # (C, H·W, 2)
    counts: jax.Array  # (C,)


def make_multi_category_step(
    cfg: TrainConfig,
    spec: SynthSpec,
    mesh: Mesh,
    stage: str = "fine_tune",
    steps_per_epoch: int | None = None,
    stack_size: int | None = None,
):
    """Build (init_fn, step_fn) for the stacked trainer.

    step_fn(state, keys (C,), data, fill) → (state, metrics (C, 2)).
    All array programs are written in global view; shardings are
    annotated and XLA lowers the collectives (scaling-book recipe).

    steps_per_epoch feeds the fine-tune cosine schedule; pass the value
    from ``_epoch_steps`` on the group's common image count so stacked
    and single-category runs of the same config train identical step
    counts (default approximates it from min_dataset_length alone).

    stack_size: number of categories C in the stack (a multiple of the
    mesh 'model' extent — each model shard carries C/n_model categories,
    so several categories can train simultaneously even on one chip).
    Defaults to the 'model' extent.
    """
    model = build_model(cfg.model)
    # per-category template for the optimizer's label tree — the same
    # two-phase construction as the single-category Trainer (frozen
    # backbone in 'projection', cosine decay in 'fine_tune')
    template_params, _ = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    if steps_per_epoch is None:
        steps_per_epoch = _epoch_steps(
            cfg.data.min_dataset_length, cfg.data.min_dataset_length,
            cfg.data.batch_size,
        )
    tx = optim_mod.build_optimizer(cfg.optim, stage, steps_per_epoch, template_params)
    synth = batched_synthesizer(spec, per_image_masks=False)
    b = cfg.data.batch_size

    model_sharding = NamedSharding(mesh, P("model"))
    replicated = NamedSharding(mesh, P())
    batch_spec = P("model", "data")

    def init_fn(rng) -> StackedState:
        n_cat = stack_size or mesh.shape["model"]

        def one(key):
            params, stats = init_model(model, key, (1, 64, 64, 3))
            if cfg.model.pretrained_backbone:
                from ssad_tpu.utils import torch_weights

                params, stats = torch_weights.load_resnet18_into(
                    params, cfg.model.pretrained_backbone, stats
                )
            return params, stats, tx.init(params), init_bank(
                cfg.model.memory_bank_size, cfg.model.latent_dim
            )

        keys = jax.random.split(rng, n_cat)
        if cfg.model.pretrained_backbone:
            # torch.load is host-side → init sequentially and stack
            parts = [one(k) for k in keys]
            params, stats, opt, bank = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *parts
            )
        else:
            params, stats, opt, bank = jax.vmap(one)(keys)
        state = StackedState(params, stats, opt, bank, jnp.zeros((), jnp.int32))
        shardings = jax.tree_util.tree_map(lambda _: model_sharding, state)
        shardings = shardings._replace(step=replicated)
        # multi-process-safe put: every process computed the same state
        return dist.put_global_tree(state, shardings)

    def per_category_step(params, batch_stats, opt_state, bank, key, images, cut_pool,
                          mask, coords, count, fill):
        k_idx, k_syn = jax.random.split(key)
        idx = jax.random.randint(k_idx, (b,), 0, images.shape[0])
        keys = jax.random.split(k_syn, b)
        x, y, orig = synth(keys, images[idx], cut_pool, jnp.int32(cut_pool.shape[0]),
                           mask, coords, count)
        # shard the per-category batch across 'data'
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out["classifier"], y
            ).mean()
            return loss, (mutated["batch_stats"], out["classifier"], out["latent_space"])

        (loss, (new_stats, logits, emb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        y_hat = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((y_hat == y).astype(jnp.float32))
        orig_rows, emb_rows, mask_fill = bank_fill_subset(
            cfg.model.bank_fill_rows, y, y_hat, orig, emb, fill
        )
        emb_eval = bank_fill_embeddings(
            model, new_params, new_stats, orig_rows, fill, emb_rows
        )
        new_bank = insert(bank, emb_eval, mask_fill)
        return new_params, new_stats, new_opt, new_bank, jnp.stack([loss, acc])

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
    )
    def step_fn(state: StackedState, keys, data: CategoryData, fill):
        params, stats, opt, bank, metrics = jax.vmap(
            per_category_step,
            in_axes=(0, 0, 0, 0, 0, 0, None, 0, 0, 0, None),
        )(
            state.params, state.batch_stats, state.opt_state, state.bank,
            keys, data.images, data.cut_pool, data.masks, data.coords,
            data.counts, fill,
        )
        new_state = StackedState(params, stats, opt, bank, state.step + 1)
        shardings = jax.tree_util.tree_map(lambda _: model_sharding, new_state)
        shardings = shardings._replace(step=replicated)
        new_state = jax.lax.with_sharding_constraint(new_state, shardings)
        return new_state, metrics

    return init_fn, step_fn


def make_multi_category_eval(cfg: TrainConfig, spec: SynthSpec, mesh: Mesh):
    """Stacked validation step: the single-category Trainer's eval_step
    math (synthesize a val batch, eval-mode forward, CE loss + accuracy;
    trainer.py:211-219) vmapped over the category stack.

    Returns eval_fn(params, batch_stats, keys (C,), data) → (C, 2)
    [loss, accuracy] per category.
    """
    model = build_model(cfg.model)
    synth = batched_synthesizer(spec, per_image_masks=False)
    b = cfg.data.batch_size

    def per_category_eval(params, batch_stats, key, images, cut_pool, mask,
                          coords, count):
        k_idx, k_syn = jax.random.split(key)
        idx = jax.random.randint(k_idx, (b,), 0, images.shape[0])
        keys = jax.random.split(k_syn, b)
        x, y, _ = synth(keys, images[idx], cut_pool, jnp.int32(cut_pool.shape[0]),
                        mask, coords, count)
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))
        out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                          train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out["classifier"], y
        ).mean()
        acc = jnp.mean((jnp.argmax(out["classifier"], -1) == y).astype(jnp.float32))
        return jnp.stack([loss, acc])

    @jax.jit
    def eval_fn(params, batch_stats, keys, data: CategoryData):
        return jax.vmap(
            per_category_eval, in_axes=(0, 0, 0, 0, None, 0, 0, 0)
        )(params, batch_stats, keys, data.images, data.cut_pool, data.masks,
          data.coords, data.counts)

    return eval_fn


def _fresh_opt_and_bank(
    cfg: TrainConfig, mesh: Mesh, state: StackedState, stage: str,
    steps_per_epoch: int,
):
    """Stacked fresh optimizer state (for the carried params) + empty
    bank, without re-initializing model parameters."""
    from ssad_tpu.models.peranet import init_model as _init

    model = build_model(cfg.model)
    template, _ = _init(model, jax.random.key(0), (1, 64, 64, 3))
    tx = optim_mod.build_optimizer(cfg.optim, stage, steps_per_epoch, template)
    n_cat = jax.tree_util.tree_leaves(state.params)[0].shape[0]
    model_sharding = NamedSharding(mesh, P("model"))

    # opt state derives from the GLOBAL (possibly non-addressable)
    # stacked params, so build it in-graph with an explicit sharding
    # constraint — a host-side vmap + device_put would try to place
    # process-local arrays onto non-addressable shards and raise under
    # multi-process
    @jax.jit
    def make_opt(p):
        o = jax.vmap(tx.init)(p)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, model_sharding), o
        )

    opt = make_opt(state.params)
    # the empty bank is identical on every process → put_global is safe
    bank0 = init_bank(cfg.model.memory_bank_size, cfg.model.latent_dim)
    bank_host = jax.tree_util.tree_map(
        lambda a: np.broadcast_to(np.asarray(a), (n_cat,) + a.shape), bank0
    )
    bank = dist.put_global_tree(bank_host, model_sharding)
    return None, None, opt, bank


def group_compatible_subjects(subjects, patch_localization: bool = False):
    """Partition subjects into groups that can share one SynthSpec.

    A stacked vmapped program compiles ONE synthesis branch structure, so
    categories in a group must agree on the static spec flags: textures
    (random-pool cut source, all-ones mask) vs fixed-pose objects; in
    patch mode, capsule/screw additionally have their own pre-crops
    (PATCH_MODE_PRECROPS) and each forms a singleton group.
    NON_FIXED_OBJECTS need per-image masks, which the stacked data
    layout does not carry — they are returned separately for the
    per-category Trainer path.
    """
    from ssad_tpu import constants
    from ssad_tpu.data.synthetic import PATCH_MODE_PRECROPS

    textures = [s for s in subjects if constants.is_texture(s)]
    non_fixed = [s for s in subjects if constants.is_non_fixed_object(s)]
    precrop = [
        s for s in subjects
        if patch_localization and s in PATCH_MODE_PRECROPS and s not in non_fixed
    ]
    fixed = [
        s for s in subjects
        if s not in textures and s not in non_fixed and s not in precrop
    ]
    groups = [g for g in ([textures, fixed] + [[s] for s in precrop]) if g]
    return groups, non_fixed


class CategoryFitResult(NamedTuple):
    """Per-category outcome of a stacked run — same observability
    surface as the single-category TrainResult (trainer.py:86-94):
    final weights + bank, per-epoch history, and the best-val-loss
    snapshot tracked at the fine-tune checkpoint cadence."""

    params: Any
    batch_stats: Any
    bank: MemoryBank
    history: dict
    best_params: Any = None
    best_batch_stats: Any = None
    best_val_loss: float = float("inf")


def _group_snapshot_path(resume_dir, group):
    from pathlib import Path

    return Path(resume_dir) / ("multi_" + "-".join(group)) / "resume_snapshot.pkl"


def _save_group_snapshot(path, stage, epoch, state, rng, histories, best,
                         stack=None, backbone=None):
    """Atomic epoch-granular snapshot of the FULL stacked state (params,
    BN stats, optimizer, banks, RNG, histories, best-val copies) — the
    recovery story the single-category Trainer already has
    (trainer.py:359-382); a crash in a multi-hour train-multi run loses
    at most one epoch.

    Multi-process: every process participates in the host gather
    (collective), only process 0 writes; resume_dir must be a shared
    filesystem for cross-host restores."""
    import pickle

    payload = {
        "stage": stage,
        "epoch": epoch,
        "state": dist.to_host(state),
        "rng": np.asarray(jax.random.key_data(rng)),
        "histories": histories,
        "best": best,
        # compatibility fingerprint: the snapshot path is keyed by the
        # group's subject names only, so a rerun with a different
        # --stack or backbone would otherwise load incompatible stacked
        # leaves and die with an opaque shape error mid-restore
        "stack": stack,
        "backbone": backbone,
    }
    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    tmp.replace(path)


def fit_categories(
    cfg: TrainConfig,
    subjects,
    datas,
    mesh: Mesh,
    seed: int = 0,
    verbose: bool = True,
    stack_size: int | None = None,
    resume_dir: str | None = None,
    stop_requested=None,
):
    """Train all `subjects` simultaneously as one stacked SPMD program,
    with the reference's two-phase schedule applied to every category.

    stop_requested: optional zero-arg callable polled at epoch
    boundaries (after the group snapshot write).  In multi-process runs
    the LOCAL answers are combined by dist.global_any — a SIGTERM lands
    on one controller, but all controllers must drain at the same
    boundary or the stacked step's collectives deadlock; raising
    trainer.TrainingPreempted is therefore a synchronized, all-process
    event.

    Training-quality parity with the single-category Trainer: every
    epoch runs a stacked validation pass (reference validates every
    epoch, tools.py:301 check_val_every_n_epoch=1), per-category
    loss/accuracy histories are recorded for plot_history, best-val
    snapshots are tracked at the fine-tune checkpoint cadence
    (tools.py:284-290), and `resume_dir` enables atomic epoch-granular
    resume snapshots per group.

    Returns {subject: CategoryFitResult} — unstacked, ready for
    per-category checkpoints.  Categories are trained in chunks of
    `stack_size` (default: the mesh's 'model' extent); each model shard
    carries stack_size/n_model categories, so several categories train
    simultaneously even on a single chip.
    """
    from ssad_tpu.data.synthetic import SynthSpec

    n_model = mesh.shape["model"]
    stack = stack_size or n_model
    if stack % n_model:
        raise ValueError(f"stack_size={stack} not a multiple of model={n_model}")
    # multi-process: rendezvous every communicator clique NOW, while the
    # controllers are in lockstep — later first-collectives sit behind
    # minutes of per-process compile skew and would blow XLA's ~30 s
    # rendezvous deadline (see dist.warmup_collectives)
    dist.warmup_collectives(mesh)
    assert len(subjects) == len(datas)
    data_by_subject = dict(zip(subjects, datas))
    results = {}

    # consensus wrapper: every poll is a lockstep cross-process OR, so
    # all controllers see the same answer at the same boundary
    # (single-process: identity).  None stays None — zero overhead.
    drain_check = None
    if stop_requested is not None:
        drain_check = lambda: dist.global_any(stop_requested())  # noqa: E731

    spec_groups, non_fixed = group_compatible_subjects(
        subjects, cfg.data.patch_localization
    )
    if non_fixed:
        # per-image object masks don't fit the stacked data layout —
        # train those with the single-category Trainer
        import dataclasses as _dc
        from pathlib import Path as _Path

        from ssad_tpu.train.trainer import Trainer

        for subject in non_fixed:
            sub_cfg = _dc.replace(
                cfg, data=_dc.replace(cfg.data, subject=subject)
            )
            r = Trainer(sub_cfg, data_by_subject[subject]).fit(
                seed=seed, verbose=verbose,
                resume_dir=(
                    str(_Path(resume_dir) / subject) if resume_dir else None
                ),
                stop_requested=drain_check,
            )
            results[subject] = CategoryFitResult(
                jax.tree_util.tree_map(np.asarray, r.params),
                jax.tree_util.tree_map(np.asarray, r.batch_stats),
                jax.tree_util.tree_map(np.asarray, r.bank),
                r.history, r.best_params, r.best_batch_stats, r.best_val_loss,
            )

    flat_groups = [
        g[lo : lo + stack]
        for g in spec_groups
        for lo in range(0, len(g), stack)
    ]
    for group in flat_groups:
        group_datas = [data_by_subject[s] for s in group]
        if len(group_datas) < stack and verbose:
            # the pad trains throwaway duplicate shards for the full
            # two-phase schedule — up to (stack-len)/stack of this
            # chunk's FLOPs; pick --stack to divide the group size to
            # avoid it
            print(
                f"[{'+'.join(group)}] padding {len(group_datas)}-category "
                f"chunk to stack={stack} with duplicates "
                f"({stack - len(group_datas)}/{stack} of this chunk's "
                "compute is discarded)"
            )
        while len(group_datas) < stack:  # pad the last group
            group_datas.append(group_datas[-1])
        data = stack_category_data(group_datas, mesh)
        val_data = stack_category_data(group_datas, mesh, split="val")
        # same epoch arithmetic as the single-category Trainer
        # (duplicate-to-≥min_len then drop_last, datasets.py:447-457),
        # on the group's common (truncated-to-min) image count
        n_common = min(d.train_images.shape[0] for d in group_datas)
        steps_per_epoch = _epoch_steps(
            n_common, cfg.data.min_dataset_length, cfg.data.batch_size
        )
        val_steps = max(
            _epoch_steps(
                int(val_data.images.shape[1]), cfg.data.min_dataset_length,
                cfg.data.batch_size,
            ),
            1,
        )
        if cfg.optim.val_batches is not None:
            val_steps = min(val_steps, cfg.optim.val_batches)
        # all subjects in a group share static spec flags by construction
        spec = SynthSpec(
            subject=group[0], imsize=cfg.data.imsize,
            patch_localization=cfg.data.patch_localization,
            patch_size=cfg.data.patch_size, aug=cfg.aug,
        )
        eval_fn = make_multi_category_eval(cfg, spec, mesh)
        ckpt_every = cfg.optim.checkpoint_every_n_epochs
        histories = {s: {} for s in group}
        best = {s: {"loss": float("inf"), "params": None, "stats": None}
                for s in group}

        model_sharding = NamedSharding(mesh, P("model"))
        replicated = NamedSharding(mesh, P())

        resume = None
        snap_path = None
        if resume_dir is not None:
            snap_path = _group_snapshot_path(resume_dir, group)
            if snap_path.exists():
                import pickle

                with open(snap_path, "rb") as f:
                    resume = pickle.load(f)
                snap_stack = resume.get("stack")
                snap_backbone = resume.get("backbone")
                if (snap_stack is not None and snap_stack != stack) or (
                    snap_backbone is not None
                    and snap_backbone != cfg.model.backbone
                ):
                    raise SystemExit(
                        f"{snap_path}: snapshot was written with "
                        f"stack={snap_stack}, backbone={snap_backbone!r} "
                        f"but this run uses stack={stack}, "
                        f"backbone={cfg.model.backbone!r} — rerun with "
                        f"the original settings or delete the snapshot"
                    )
                histories = resume["histories"]
                best = resume["best"]

        make_keys = dist.make_stacked_keys(stack, mesh)

        def restore_state(snap):
            s = StackedState(*snap["state"])
            shardings = jax.tree_util.tree_map(lambda _: model_sharding, s)
            shardings = shardings._replace(step=replicated)
            state = dist.put_global_tree(s, shardings)
            return state, jax.random.wrap_key_data(jnp.asarray(snap["rng"]))

        for stage, epochs in (
            ("projection", cfg.optim.projection_epochs),
            ("fine_tune", cfg.optim.fine_tune_epochs),
        ):
            init_fn, step_fn = make_multi_category_step(
                cfg, spec, mesh, stage=stage, steps_per_epoch=steps_per_epoch,
                stack_size=stack,
            )
            start_epoch = 0
            if stage == "projection":
                if resume is not None and resume["stage"] == "fine_tune":
                    continue  # snapshot is past this stage entirely
                if resume is not None:
                    state, rng = restore_state(resume)
                    start_epoch = resume["epoch"]
                    resume = None
                else:
                    state = init_fn(jax.random.key(seed))
                    rng = jax.random.key(seed + 1)
            else:
                if resume is not None:  # resume["stage"] == "fine_tune"
                    state, rng = restore_state(resume)
                    start_epoch = resume["epoch"]
                    resume = None
                else:
                    # carry parameters + BN stats; fresh optimizer and
                    # bank (tools.py:273-281) — no full re-init needed
                    _, _, tx_ft, _bank0 = _fresh_opt_and_bank(
                        cfg, mesh, state, stage, steps_per_epoch
                    )
                    state = state._replace(opt_state=tx_ft, bank=_bank0)
                    rng = jax.random.key(seed + 2)
            import time as _time

            for epoch in range(start_epoch, epochs):
                fill = jnp.asarray(epoch > epochs // 2)
                metrics_steps = []
                t_epoch = _time.perf_counter()
                for _ in range(steps_per_epoch):
                    rng, k = jax.random.split(rng)
                    state, metrics = step_fn(state, make_keys(k), data, fill)
                    metrics_steps.append(metrics)
                m = dist.to_host(jnp.mean(jnp.stack(metrics_steps), 0))  # sync
                dt = _time.perf_counter() - t_epoch
                ips = stack * steps_per_epoch * cfg.data.batch_size / max(dt, 1e-9)

                # stacked validation pass, every epoch (tools.py:301)
                val_ms = []
                for _ in range(val_steps):
                    rng, k = jax.random.split(rng)
                    val_ms.append(
                        eval_fn(state.params, state.batch_stats, make_keys(k),
                                val_data)
                    )
                vm = dist.to_host(jnp.mean(jnp.stack(val_ms), 0))  # (C, 2)

                for i, subject in enumerate(group):
                    h = histories[subject]
                    h.setdefault(f"{stage}_train_loss", []).append(float(m[i, 0]))
                    h.setdefault(f"{stage}_train_accuracy", []).append(float(m[i, 1]))
                    h.setdefault(f"{stage}_val_loss", []).append(float(vm[i, 0]))
                    h.setdefault(f"{stage}_val_accuracy", []).append(float(vm[i, 1]))
                    h.setdefault(f"{stage}_images_per_sec", []).append(ips / stack)

                # best-val snapshot cadence (fine-tune, tools.py:284-290)
                if stage == "fine_tune" and (epoch + 1) % ckpt_every == 0:
                    improved = [
                        i for i, s in enumerate(group)
                        if float(vm[i, 0]) < best[s]["loss"]
                    ]
                    if improved:
                        # one host gather for all improving categories
                        # (per-category slicing of a global array would
                        # not be addressable under multi-process)
                        p_host = dist.to_host(state.params)
                        s_host = dist.to_host(state.batch_stats)
                        for i in improved:
                            best[group[i]] = {
                                "loss": float(vm[i, 0]),
                                "params": jax.tree_util.tree_map(
                                    lambda a: a[i], p_host
                                ),
                                "stats": jax.tree_util.tree_map(
                                    lambda a: a[i], s_host
                                ),
                            }
                if verbose:
                    print(
                        f"[{'+'.join(group)}/{stage}] epoch {epoch + 1}/{epochs} "
                        f"loss {np.round(m[:, 0], 3).tolist()} "
                        f"val_loss {np.round(vm[:, 0], 3).tolist()} "
                        f"({ips:,.0f} img/s across {stack} categories)"
                    )
                if snap_path is not None:
                    _save_group_snapshot(
                        snap_path, stage, epoch + 1, state, rng, histories,
                        best, stack=stack, backbone=cfg.model.backbone,
                    )
                # drain AFTER the snapshot write (the persisted boundary
                # is the one resumed from); the consensus poll keeps all
                # controllers on the same branch
                if drain_check is not None and epoch < epochs - 1 and drain_check():
                    from ssad_tpu.train.trainer import TrainingPreempted

                    raise TrainingPreempted(stage, epoch)

        # unstack per category (multi-process: gathers every process's
        # category shards so each controller holds all results)
        host = dist.to_host(state)
        for i, subject in enumerate(group):
            take = lambda t: jax.tree_util.tree_map(lambda a: a[i], t)
            results[subject] = CategoryFitResult(
                take(host.params),
                take(host.batch_stats),
                MemoryBank(
                    data=host.bank.data[i],
                    cursor=host.bank.cursor[i],
                    count=host.bank.count[i],
                ),
                histories[subject],
                best[subject]["params"],
                best[subject]["stats"],
                best[subject]["loss"],
            )
    return results


def stack_category_data(datas, mesh: Mesh, split: str = "train") -> CategoryData:
    """Stack per-category PretextData onto the device mesh.

    Image counts are equalized to the minimum N across categories
    (sampling is with replacement, so truncation only reduces variety).
    split='val' stacks the held-out val images (falling back to the
    train split for categories whose val split is empty).
    """
    if split == "train":
        per_cat = [d.train_images for d in datas]
    else:
        per_cat = [
            d.val_images if len(d.val_images) else d.train_images for d in datas
        ]
    n = min(imgs.shape[0] for imgs in per_cat)
    images = np.stack([imgs[:n] for imgs in per_cat])
    masks = np.stack([d.fixed_mask for d in datas])
    coords = np.stack([d.fixed_coords for d in datas])
    counts = np.asarray([d.fixed_count for d in datas], np.int32)
    pool = datas[0].cut_pool
    model_sharding = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())
    # put_global: works when the mesh spans processes (each controller
    # materialises only its addressable category shards)
    return CategoryData(
        images=dist.put_global(images, model_sharding),
        cut_pool=dist.put_global(np.asarray(pool), repl),
        masks=dist.put_global(masks, model_sharding),
        coords=dist.put_global(coords, model_sharding),
        counts=dist.put_global(counts, model_sharding),
    )
