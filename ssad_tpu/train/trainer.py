"""Two-phase trainer: one fused, jit-compiled synth→forward→backward step.

Reference flow (tools.py:204-306):
  phase 1 'projection': frozen backbone, 10 epochs @ lr .03, no
  scheduler; phase 2 'fine_tune': everything, 30 epochs @ lr .005,
  cosine schedule, best-val-loss checkpoint every 5 epochs; the memory
  bank fills during the second half of each phase's epochs with
  embeddings of samples where y==0 ∧ ŷ==0 (models.py:270-275).

TPU re-design:
  * the synthetic-defect pipeline and the train step compile into ONE
    XLA program — no host dataloader, no H2D per batch; per-step work
    is index sampling + synthesis + fwd/bwd, all on device;
  * the memory bank is an on-device ring buffer updated inside the
    step (train/memory_bank.py), not a CPU deque;
  * the step function is pure (state, key) → (state, metrics): wrapping
    it in pjit with a sharded batch axis is what parallel/mesh.py does —
    gradients and bank inserts become global automatically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssad_tpu.config import TrainConfig
from ssad_tpu.data import mvtec
from ssad_tpu.data.synthetic import SynthSpec, batched_synthesizer
from ssad_tpu.models.peranet import build_model
from ssad_tpu.train import optim as optim_mod
from ssad_tpu.train.memory_bank import MemoryBank, init_bank, insert


def bank_fill_embeddings(model, params, batch_stats, originals, fill, like):
    """Eval-mode embeddings of the clean originals for memory-bank fill,
    or zeros while the fill phase is inactive.

    Train-mode BN embeddings of augmented samples live in a different
    space than inference-time queries and score at chance (measured
    image AUROC 0.52 vs 1.00 after this fix); the reference has the
    same latent mismatch but never executes its bank branch
    (tools.py:359 compares > 1000 against a deque capped at 1000).
    """
    from ssad_tpu.ops.image import normalize_imagenet

    def eval_embed(_):
        x_clean = jax.vmap(normalize_imagenet)(originals)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x_clean, train=False
        )
        return out["latent_space"].astype(jnp.float32)

    return jax.lax.cond(
        fill, eval_embed, lambda _: jnp.zeros_like(like, dtype=jnp.float32),
        operand=None,
    )


def bank_fill_subset(bank_fill_rows, y, y_hat, orig, emb, fill):
    """(orig_rows, emb_rows, accept_mask) for the memory-bank fill.

    Only the first ``bank_fill_rows`` (iid) rows of the batch are
    considered — embedding the whole batch costs a second full forward
    while only ~¼ of rows pass y==0∧ŷ==0 (ModelConfig.bank_fill_rows
    docs).  Shared by the single-category and stacked steps so the
    parity-sensitive acceptance rule cannot diverge."""
    rows = orig.shape[0] if bank_fill_rows is None else min(bank_fill_rows, orig.shape[0])
    mask = (y[:rows] == 0) & (y_hat[:rows] == 0) & fill
    return orig[:rows], emb[:rows], mask


class TrainingPreempted(Exception):
    """Raised at an epoch boundary after a drain signal arrived; the
    resume snapshot for exactly that boundary has already been written
    (GracefulPreemption + run_stage stop_requested)."""

    def __init__(self, stage: str, epoch: int):
        super().__init__(f"preempted after {stage} epoch {epoch + 1}")
        self.stage = stage
        self.epoch = epoch


class GracefulPreemption:
    """SIGTERM-aware drain for training runs (the fleet-manager /
    preemption stop signal).

    The reference has no failure story at all — a signal kills the run
    mid-step and restart is manual (SURVEY §5.3).  Here crash-resume
    already exists (epoch-granular snapshots via ``resume_dir``); this
    context manager adds the CLEAN half: on SIGTERM the current epoch
    finishes, the end-of-epoch snapshot is written as usual, and
    ``run_stage`` raises :class:`TrainingPreempted` instead of starting
    another epoch.  The CLI maps that to exit code 75 (EX_TEMPFAIL) and
    a one-line JSON resume hint, so a supervisor restarting the same
    command continues exactly where the drain stopped.  Mirrors the
    serving stack's SIGTERM drain (serving/cli.py cmd_serve).

    Multi-controller composition: a raw per-host stop would deadlock
    the stacked step's collectives, so train-multi combines the LOCAL
    latched flags with a lockstep cross-process OR at each epoch
    boundary (parallel/distributed.py::global_any) — a SIGTERM on ANY
    controller drains ALL of them at the same persisted boundary
    (tested end-to-end in test_multiprocess.py).
    """

    def __init__(self):
        self.requested = False
        self._prev = None

    def __enter__(self):
        import signal

        def handler(signum, frame):
            self.requested = True

        self._prev = signal.signal(signal.SIGTERM, handler)
        return self

    def __exit__(self, *exc):
        import signal

        signal.signal(signal.SIGTERM, self._prev)
        return False

    def __call__(self) -> bool:
        return self.requested


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    bank: MemoryBank
    step: jax.Array  # global step counter


@dataclasses.dataclass
class TrainResult:
    params: Any
    batch_stats: Any
    bank: MemoryBank
    history: Dict[str, list]
    best_params: Any = None
    best_batch_stats: Any = None
    best_val_loss: float = float("inf")


def _epoch_steps(n_train_files: int, min_len: int, batch_size: int) -> int:
    """Reference epoch length: file list duplicated to ≥ min_len, then
    drop_last batches (datasets.py:447-457, :501-508)."""
    if n_train_files == 0:
        return 0
    dup = n_train_files * max(math.ceil(min_len / n_train_files), 1)
    return max(dup // batch_size, 1)


class Trainer:
    """Trains one category; see fit()."""

    def __init__(self, cfg: TrainConfig, data: mvtec.PretextData, mesh=None):
        self.cfg = cfg
        self.data = data
        self.mesh = mesh
        self.model = build_model(cfg.model)
        self.spec = SynthSpec(
            subject=cfg.data.subject,
            imsize=cfg.data.imsize,
            patch_localization=cfg.data.patch_localization,
            patch_size=cfg.data.patch_size,
            aug=cfg.aug,
        )
        # batched synthesis: one presampled coordinate gather per batch
        # instead of per-sample gathers inside the vmap — the identical
        # code path the stacked multi-category trainer compiles
        self.synth = batched_synthesizer(self.spec)
        self._step_cache: Dict[Tuple[str, bool], Any] = {}

    # --- batch synthesis inside the step --------------------------------

    def _make_batch(self, key, images, masks, coords, counts, pool):
        """Sample batch indices + synthesize, all on device.

        images: (N, H, W, 3); masks/coords/counts are either unbatched
        (fixed-pose subjects) or per-image stacks (NON_FIXED subjects).
        pool rides as a traced ARGUMENT (via _device_data), not a
        closure constant: a closed-over (15, 256, 256, 3) f32 array
        would be baked into every step program's HLO as a ~12 MB
        literal — the remote-compile-upload bloat inference.py's
        weights-as-arguments design exists to avoid (and
        category_parallel already passes it as CategoryData).
        """
        b = self.cfg.data.batch_size
        k_idx, k_syn = jax.random.split(key)
        n = images.shape[0]
        idx = jax.random.randint(k_idx, (b,), 0, n)
        batch_imgs = images[idx]
        keys = jax.random.split(k_syn, b)
        n_cut = jnp.int32(self.data.cut_pool.shape[0])
        per_image = masks.ndim == 3  # matches spec.is_non_fixed at image level
        if per_image:
            m, c, cnt = masks[idx], coords[idx], counts[idx]
        else:
            m, c, cnt = masks, coords, counts
        x, y, orig = self.synth(keys, batch_imgs, pool, n_cut, m, c, cnt)
        if self.mesh is not None:
            # data-parallel: shard the synthesized batch; XLA inserts the
            # gradient all-reduce over ICI in the backward pass
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
            x = jax.lax.with_sharding_constraint(x, sharding)
            y = jax.lax.with_sharding_constraint(y, NamedSharding(self.mesh, P("data")))
            orig = jax.lax.with_sharding_constraint(orig, sharding)
        return x, y, orig

    # --- fused train / eval steps ---------------------------------------

    def _get_step_fns(self, stage: str):
        if stage in self._step_cache:
            return self._step_cache[stage]

        model = self.model
        steps = _epoch_steps(
            self.data.train_images.shape[0],
            self.cfg.data.min_dataset_length,
            self.cfg.data.batch_size,
        )
        tx = optim_mod.build_optimizer(self.cfg.optim, stage, steps, self._params_template)

        def train_step(state: TrainState, key, images, masks, coords, counts, pool,
                       fill_bank):
            x, y, orig = self._make_batch(key, images, masks, coords, counts, pool)

            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                logits = out["classifier"]
                emb = out["latent_space"]
                loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
                return loss, (mutated["batch_stats"], logits, emb)

            (loss, (new_stats, logits, emb)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            y_hat = jnp.argmax(logits, axis=-1)
            acc = jnp.mean((y_hat == y).astype(jnp.float32))
            # memory-bank fill: y==0 ∧ ŷ==0 ∧ second-half-of-epochs
            # (models.py:270-275); see bank_fill_embeddings for the
            # eval-mode/clean-originals rationale
            orig_rows, emb_rows, mask = bank_fill_subset(
                self.cfg.model.bank_fill_rows, y, y_hat, orig, emb, fill_bank
            )
            emb_eval = bank_fill_embeddings(
                model, new_params, new_stats, orig_rows, fill_bank, emb_rows
            )
            bank = insert(state.bank, emb_eval, mask)

            new_state = TrainState(new_params, new_stats, new_opt, bank, state.step + 1)
            return new_state, {"loss": loss, "accuracy": acc}

        def eval_step(params, batch_stats, key, images, masks, coords, counts, pool):
            x, y, _ = self._make_batch(key, images, masks, coords, counts, pool)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            logits = out["classifier"]
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
            return {"loss": loss, "accuracy": acc}

        # donate the state: avoids a full extra copy of params/opt/bank
        jitted = (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step), tx, steps)
        self._step_cache[stage] = jitted
        return jitted

    # --- data as device arrays -------------------------------------------

    def _device_data(self, split: str):
        d = self.data
        if split == "train":
            images = jnp.asarray(d.train_images)
            masks = d.train_masks
            coords = d.train_coords
            counts = d.train_counts
        else:
            images = jnp.asarray(d.val_images)
            masks = d.val_masks
            coords = d.val_coords
            counts = d.val_counts
        if masks is None:  # fixed-pose: shared subject mask
            masks = jnp.asarray(d.fixed_mask)
            coords = jnp.asarray(d.fixed_coords)
            counts = jnp.int32(d.fixed_count)
        else:
            masks = jnp.asarray(masks)
            coords = jnp.asarray(coords)
            counts = jnp.asarray(counts)
        return images, masks, coords, counts, jnp.asarray(d.cut_pool)

    # --- the two-phase fit ------------------------------------------------

    def init_state(self, rng: jax.Array, stage: str) -> TrainState:
        from ssad_tpu.models.peranet import init_model

        h, w = self.spec.canvas
        params, batch_stats = init_model(self.model, rng, (1, max(h, 64), max(w, 64), 3))
        if self.cfg.model.pretrained_backbone:
            from ssad_tpu.utils import torch_weights

            params, batch_stats = torch_weights.load_resnet18_into(
                params, self.cfg.model.pretrained_backbone, batch_stats
            )
        self._params_template = params
        _, _, tx, _ = self._get_step_fns(stage)
        opt_state = tx.init(params)
        bank = init_bank(self.cfg.model.memory_bank_size, self.cfg.model.latent_dim)
        return TrainState(params, batch_stats, opt_state, bank, jnp.zeros((), jnp.int32))

    def run_stage(
        self,
        state: TrainState,
        stage: str,
        epochs: int,
        rng: jax.Array,
        result: TrainResult,
        log_every: Optional[int] = None,
        start_epoch: int = 0,
        on_epoch_end=None,
        stop_requested=None,
    ) -> TrainState:
        train_step, eval_step, tx, steps_per_epoch = self._get_step_fns(stage)
        tr = self._device_data("train")
        va = self._device_data("val")
        val_steps = max(
            _epoch_steps(
                max(self.data.val_images.shape[0], 1),
                self.cfg.data.min_dataset_length,
                self.cfg.data.batch_size,
            ),
            1,
        )
        ckpt_every = self.cfg.optim.checkpoint_every_n_epochs

        import time as _time

        for epoch in range(epochs):
            if epoch < start_epoch:
                continue
            fill = jnp.asarray(epoch > epochs // 2)  # models.py:270
            metrics_acc = []
            t_epoch = _time.perf_counter()
            for s in range(steps_per_epoch):
                rng, k = jax.random.split(rng)
                state, metrics = train_step(state, k, *tr, fill)
                metrics_acc.append(metrics)
            # scalar readback, not block_until_ready: the tunneled
            # backend under-reports the latter (CLAUDE.md), which would
            # over-report images/sec against the BASELINE targets
            float(metrics_acc[-1]["loss"])
            dt = _time.perf_counter() - t_epoch
            result.history.setdefault(f"{stage}_images_per_sec", []).append(
                steps_per_epoch * self.cfg.data.batch_size / max(dt, 1e-9)
            )
            train_loss = float(jnp.mean(jnp.stack([m["loss"] for m in metrics_acc])))
            train_acc = float(jnp.mean(jnp.stack([m["accuracy"] for m in metrics_acc])))

            cap = self.cfg.optim.val_batches
            val_metrics = []
            for s in range(val_steps if cap is None else min(val_steps, cap)):
                rng, k = jax.random.split(rng)
                val_metrics.append(eval_step(state.params, state.batch_stats, k, *va))
            val_loss = float(jnp.mean(jnp.stack([m["loss"] for m in val_metrics])))
            val_acc = float(jnp.mean(jnp.stack([m["accuracy"] for m in val_metrics])))

            result.history.setdefault(f"{stage}_train_loss", []).append(train_loss)
            result.history.setdefault(f"{stage}_train_accuracy", []).append(train_acc)
            result.history.setdefault(f"{stage}_val_loss", []).append(val_loss)
            result.history.setdefault(f"{stage}_val_accuracy", []).append(val_acc)

            # best-val checkpoint cadence (fine-tune, tools.py:284-290)
            if stage == "fine_tune" and (epoch + 1) % ckpt_every == 0:
                if val_loss < result.best_val_loss:
                    result.best_val_loss = val_loss
                    result.best_params = jax.tree_util.tree_map(
                        lambda a: np.asarray(a), state.params
                    )
                    result.best_batch_stats = jax.tree_util.tree_map(
                        lambda a: np.asarray(a), state.batch_stats
                    )
            if log_every and (epoch % log_every == 0 or epoch == epochs - 1):
                ips = result.history[f"{stage}_images_per_sec"][-1]
                print(
                    f"[{self.cfg.data.subject}/{stage}] epoch {epoch + 1}/{epochs} "
                    f"loss {train_loss:.4f} acc {train_acc:.3f} "
                    f"val_loss {val_loss:.4f} val_acc {val_acc:.3f} "
                    f"bank {int(state.bank.count)} ({ips:,.0f} img/s)"
                )
            if on_epoch_end is not None:
                on_epoch_end(stage, epoch, state, rng, result)
            # drain AFTER the snapshot write: the boundary the caller
            # resumes from is exactly the one that just persisted
            if stop_requested is not None and epoch < epochs - 1 and stop_requested():
                raise TrainingPreempted(stage, epoch)
        return state

    # --- resume snapshots (aux subsystem absent in the reference:
    # crashes kill its runs, SURVEY.md §5.3; here every epoch can
    # checkpoint the FULL state — params, BN stats, optimizer, bank,
    # RNG key, history — and fit() continues from it) -----------------

    @staticmethod
    def _snapshot_path(resume_dir) -> "Path":
        from pathlib import Path

        return Path(resume_dir) / "resume_snapshot.pkl"

    def save_resume_snapshot(self, resume_dir, stage, epoch, state, rng, result):
        import pickle
        from pathlib import Path

        to_np = lambda t: jax.tree_util.tree_map(lambda a: np.asarray(a), t)
        payload = {
            "stage": stage,
            "epoch": epoch,
            "state": to_np(state),
            "rng": np.asarray(jax.random.key_data(rng)),
            "history": result.history,
            "best_val_loss": result.best_val_loss,
            "best_params": to_np(result.best_params) if result.best_params else None,
            "best_batch_stats": to_np(result.best_batch_stats)
            if result.best_batch_stats
            else None,
        }
        Path(resume_dir).mkdir(parents=True, exist_ok=True)
        path = self._snapshot_path(resume_dir)
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        tmp.replace(path)  # atomic: a crash never corrupts the snapshot
        return str(path)

    def load_resume_snapshot(self, resume_dir):
        import pickle

        with open(self._snapshot_path(resume_dir), "rb") as f:
            return pickle.load(f)

    def fit(
        self,
        seed: int = 0,
        verbose: bool = True,
        resume_dir: Optional[str] = None,
        stop_requested=None,
    ) -> TrainResult:
        """Full two-phase training (reference tools.training, :204-306).

        resume_dir: when set, an end-of-epoch snapshot is written there
        and an existing snapshot is continued from (epoch granularity).
        stop_requested: optional zero-arg callable polled at each epoch
        boundary (after the snapshot write); returning True raises
        TrainingPreempted — the graceful half of the preemption story
        (GracefulPreemption docstring).
        """
        # stage keys are FOLDED from the seed, not split from a running
        # stream: a run that crashes mid-projection and resumes must
        # enter fine-tune with the SAME key as an uninterrupted run
        # (the resume path skips the projection-stage split, so a
        # sequential stream would desynchronize the two) — the same
        # stage-fixed-key discipline category_parallel.fit_categories
        # uses
        base = jax.random.key(seed)
        k_init = jax.random.fold_in(base, 0)
        k_proj = jax.random.fold_in(base, 1)
        k_ft = jax.random.fold_in(base, 2)
        result = TrainResult(params=None, batch_stats=None, bank=None, history={})

        resume = None
        if resume_dir is not None and self._snapshot_path(resume_dir).exists():
            resume = self.load_resume_snapshot(resume_dir)
            result.history = resume["history"]
            result.best_val_loss = resume["best_val_loss"]
            result.best_params = resume["best_params"]
            result.best_batch_stats = resume["best_batch_stats"]

        on_epoch_end = None
        if resume_dir is not None:
            on_epoch_end = lambda stage, epoch, state, rng_, res: self.save_resume_snapshot(
                resume_dir, stage, epoch + 1, state, rng_, res
            )

        log = 1 if verbose else None

        def restore_state(snap):
            s = snap["state"]
            state = jax.tree_util.tree_map(jnp.asarray, TrainState(*s))
            key = jax.random.wrap_key_data(jnp.asarray(snap["rng"]))
            return state, key

        # phase 1: projection-head training, frozen backbone
        if resume is None or resume["stage"] == "projection":
            if resume is None:
                state = self.init_state(k_init, "projection")
                k_stage = k_proj
                start = 0
            else:
                self.init_state(k_init, "projection")  # build step fns/template
                state, k_stage = restore_state(resume)
                start = resume["epoch"]
            state = self.run_stage(
                state, "projection", self.cfg.optim.projection_epochs, k_stage,
                result, log_every=log, start_epoch=start, on_epoch_end=on_epoch_end,
                stop_requested=stop_requested,
            )
            # bank is cleared between phases (tools.py:273)
            bank = init_bank(self.cfg.model.memory_bank_size, self.cfg.model.latent_dim)
            _, _, tx2, _ = self._get_step_fns("fine_tune")
            state = TrainState(
                state.params, state.batch_stats, tx2.init(state.params), bank,
                jnp.zeros((), jnp.int32),
            )
            k_stage = k_ft
            ft_start = 0
        else:
            self.init_state(k_init, "fine_tune")  # build step fns/template
            state, k_stage = restore_state(resume)
            ft_start = resume["epoch"]

        # phase 2: fine-tune everything, fresh optimizer with schedule
        state = self.run_stage(
            state, "fine_tune", self.cfg.optim.fine_tune_epochs, k_stage, result,
            log_every=log, start_epoch=ft_start, on_epoch_end=on_epoch_end,
            stop_requested=stop_requested,
        )

        result.params = state.params
        result.batch_stats = state.batch_stats
        result.bank = state.bank
        return result


def train_category(
    cfg: TrainConfig, data: Optional[mvtec.PretextData] = None, verbose: bool = True
) -> TrainResult:
    """Convenience entry point: discover data, train, return result."""
    if data is None:
        data = mvtec.prepare_pretext_data(
            cfg.data.dataset_dir,
            cfg.data.subject,
            imsize=cfg.data.imsize,
            val_fraction=cfg.data.train_val_split,
            seed=cfg.data.seed,
            patch_localization=cfg.data.patch_localization,
        )
    trainer = Trainer(cfg, data)
    return trainer.fit(seed=cfg.seed, verbose=verbose)
